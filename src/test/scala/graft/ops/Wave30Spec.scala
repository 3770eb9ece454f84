package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 30: token-weighted quantiles (q222), token concentration
  * (q223). */
class Wave30Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q222: length-biased quantiles dominate the doc quantiles; hand fixture pins p50") {
    import spark.implicits._
    // 99 docs of 10 tokens + 1 of 1000: doc-median 10; half the TOKEN
    // mass (995 of 1990) sits inside the length-1000 doc → w_p50 = 1000
    val docs = ((1 to 99).map(i => ("s", ("w " * 10).trim)) :+
      (("s", ("w " * 1000).trim))).toDF("source", "text")
    val r = RobustStats.weightedQuantiles(docs).collect()(0)
    assert(r.getLong(1) == 1990L && r.getLong(2) == 1000L, s"$r")
    // corpus invariant: the weighted p50 dominates q88's doc p50
    val w50 = RobustStats.q222WeightedQuantiles(spark, dir).collect()
      .map(r2 => r2.getString(0) -> r2.getLong(2)).toMap
    val d50 = TextAnalysis.q88LengthQuantiles(spark, dir).collect()
      .map(r2 => r2.getString(0) -> r2.getLong(2)).toMap
    d50.foreach { case (src, p50) =>
      assert(w50(src) >= p50, s"$src: weighted ${w50(src)} < doc $p50")
    }
  }

  test("q223: hand fixture pins the partial-cut shares; corpus bounds hold") {
    import spark.implicits._
    // 99 docs of 10 + 1 of 1000 (m = 1990): k1 = 1 → 1000/1990;
    // k10 = 10 → (1000 + 9·10)/1990 — the cut falls INSIDE the
    // 99-doc value group, exercising the partial arithmetic
    val docs = ((1 to 99).map(i => ("s", ("w " * 10).trim)) :+
      (("s", ("w " * 1000).trim))).toDF("source", "text")
    val r = RobustStats.tokenConcentration(docs).collect()(0)
    assert(r.getLong(1) == 100L && r.getLong(2) == 1990L)
    assert(r.getDouble(3) == BigDecimal(1000.0 / 1990.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$r")
    assert(r.getDouble(4) == BigDecimal(1090.0 / 1990.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$r")
    // corpus: 0 < top1 ≤ top10 ≤ 1, and top10 ≥ 0.1 (longest-docs mass
    // can't be below uniform)
    RobustStats.q223TokenConcentration(spark, dir).collect().foreach { row =>
      val (t1, t10) = (row.getDouble(3), row.getDouble(4))
      assert(t1 > 0.0 && t1 <= t10 && t10 <= 1.0, s"$row")
      assert(t10 >= 0.1, s"$row")
    }
  }
}
