package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 35: time-weighted average (q237), prefix-cache savings (q238),
  * unpivot (q239). */
class Wave35Spec extends SparkSpec {

  test("q237: step-hold integral on a hand series") {
    import spark.implicits._
    // one (type, day): v=2 holds 100 ns, v=10 holds 300 ns -> twa 8.0;
    // the last event carries no duration
    val ev = Seq(("t", 1L, 0L, 2.0), ("t", 2L, 100L, 10.0),
      ("t", 3L, 400L, -99.0))
      .toDF("event_type", "event_id", "ts", "value")
    val r = TimeSeries.timeWeightedAvg(ev).collect()(0)
    assert(r.getLong(2) == 3L && r.getDouble(3) == 8.0, r.toString)
    // single-event day -> null twa (no span)
    val one = Seq(("u", 1L, 5L, 3.0)).toDF("event_type", "event_id", "ts", "value")
    assert(TimeSeries.timeWeightedAvg(one).collect()(0).isNullAt(3))
  }

  test("q238: planted shared prefixes are counted per rung") {
    import spark.implicits._
    val head = "x" * 16
    val docs = Seq(
      (1L, head + "tail-one-aaaaaaaaaaaaaaa"),
      (2L, head + "tail-two-bbbbbbbbbbbbbbb"),
      (3L, "completely different text here"),
      (4L, "short")) // < 16 chars: out of scope for every rung
      .toDF("doc_id", "text")
    val out = PrefixCache.prefixCacheSavings(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r16 = out(16L)
    assert(r16.getLong(1) == 3L, r16.toString)          // docs >= 16 chars
    assert(r16.getLong(2) == 2L && r16.getLong(3) == 1L) // one 2-doc group
    assert(r16.getLong(4) == 16L)                        // (2-1)*16 saved
    val r64 = out(64L)
    assert(r64.getLong(1) == 0L && r64.getLong(3) == 0L) // nothing that long
  }

  test("q239: unpivot reconciles with the wide frame") {
    val dir = "/root/testdata/sf0.001"
    val long = graft.queries.Relational.q239MetricsUnpivot(spark, dir).collect()
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(long.length == 2 * nDocs)
    val byDoc = long.groupBy(_.getLong(0)).view.mapValues(
      _.map(r => r.getString(1) -> r.getLong(2)).toMap).toMap
    val wide = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long"),
        TextAnalysis.tokenCount(col("text"))).collect()
    wide.foreach { r =>
      val m = byDoc(r.getLong(0))
      assert(m("n_chars") == r.getLong(1) && m("n_tokens") == r.getLong(2))
    }
  }
}
