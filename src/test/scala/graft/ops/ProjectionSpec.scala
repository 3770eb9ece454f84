package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ProjectionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("signs: deterministic, balanced, and the planted projection is exact") {
    val signs = Projection.signMatrix(16, 64)
    assert(signs.flatten.forall(s => s == 1 || s == -1))
    // derived again → identical (no hidden state)
    assert(Projection.signMatrix(16, 64).flatten.toSeq == signs.flatten.toSeq)
    // md5 nibbles are uniform — a grossly unbalanced matrix would mean
    // the derivation is broken, not that we got unlucky
    val plus = signs.flatten.count(_ == 1)
    assert(plus > 1024 * 3 / 10 && plus < 1024 * 7 / 10, s"$plus/1024 positive")

    import spark.implicits._
    // planted: [1.27, -2.54, 0, ...0] quantizes to [64, -127, 0, ...]
    // (floor(63.5+0.5)=64, floor(-127+0.5)=-127), so each projected
    // coordinate is exactly 64*s(j,0) - 127*s(j,1)
    val emb = Seq(
      (1L, Array(1.27f, -2.54f) ++ Array.fill(62)(0.0f)),
      (2L, Array.empty[Float]))
      .toDF("vec_id", "embedding")
    val got = Quantize.quantized(emb)
      .select(col("vec_id"),
        when(size(col("embedding")) > 0, Projection.projectQ(col("q"), signs))
          .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)")).as("proj"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val expect = (0 until 16).map(j => 64 * signs(j)(0) - 127 * signs(j)(1))
    assert(got(1L) == expect, s"planted projection diverged: ${got(1L)}")
    assert(got(2L).isEmpty, "empty embedding must project to an empty vector")
  }

  test("projected coarse search + exact re-rank recalls the exact top-10") {
    val emb = graft.Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 5)
    val got = Projection.projectedTopK(emb, queries, k = 10, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.q28BruteForceTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.nonEmpty)
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.75, s"projected recall $recall below 0.75")
  }
}
