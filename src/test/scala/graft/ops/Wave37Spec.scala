package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 37: lagged cross-correlation (q244), simplified silhouette
  * (q245). */
class Wave37Spec extends SparkSpec {

  private val day = 86400000000000L

  test("q244: a planted 2-day lead is found at lag 2 with r = 1") {
    import spark.implicits._
    // type "a" fires k(d) events on day d; "b" fires k(d-2) on day d:
    // k ramps 1..10 over days 0..9, b shifted by 2 (days 2..11)
    val a = (0 until 10).flatMap(d => Seq.fill(d + 1)(("a", d.toLong * day + 1)))
    val b = (0 until 10).flatMap(d => Seq.fill(d + 1)(("b", (d + 2).toLong * day + 1)))
    val out = Correlation.laggedXcorr((a ++ b).toDF("event_type", "ts")).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(3) == 2L, r.toString)        // best_lag = +2 (a leads b)
    assert(r.getDouble(4) > 0.9, r.toString)      // strong at the true lag
  }

  test("q245: well-separated planted cells score near 1, corpus cells are in [-1, 1]") {
    val out = Clustering.q245Silhouette(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val s = r.getDouble(2)
      assert(s >= -1.0 && s <= 1.0, r.toString)
    }
    assert(out.map(_.getLong(1)).sum ==
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001").count())
  }
}
