package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 41: label-noise audit (q260), Fisher separability (q261). */
class Wave41Spec extends SparkSpec {

  test("q260: agree counts bounded by neighborhood, fence is exact") {
    val out = KnnGraph.q260LabelNoise(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nn, na, sus) = (r.getLong(2), r.getLong(3), r.getBoolean(5))
      assert(na <= nn, r.toString)
      assert(sus == (nn > 0 && 5 * na <= nn), r.toString)
      if (nn > 0) {
        val frac = math.rint(1e12 * na.toDouble / nn) / 1e12
        assert(math.abs(r.getDouble(4) - frac) < 1e-12, r.toString)
      } else assert(r.isNullAt(4))
    }
  }

  test("q261: a planted separating dimension wins its pair") {
    import spark.implicits._
    // two labels separated ONLY along dim 2 of 3; dim 1/3 identical
    val a = (1 to 20).map(i => (i.toLong, 0L,
      Array(0.5f, 0.1f + (i % 3) * 0.001f, -0.2f)))
    val b = (1 to 20).map(i => (100L + i, 1L,
      Array(0.5f, 0.9f + (i % 3) * 0.001f, -0.2f)))
    (a ++ b).toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet("/tmp/wave41_fisher/embeddings.parquet")
    val out = Clustering.q261FisherSeparability(spark, "/tmp/wave41_fisher")
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(4) == 2L, out.head.toString) // best_dim = 2
    assert(out.head.getDouble(5) > 1000.0, out.head.toString)
  }
}
