package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 38: day-of-week seasonality (q246), inter-arrival quantiles
  * (q247). */
class Wave38Spec extends SparkSpec {

  private val day = 86400000000000L

  test("q246: a planted weekly rhythm shows in rate and chi2; uniform reads ~0") {
    import spark.implicits._
    // 14 days; type "w": 10 events on dow 0 (days 0, 7), 1 on the rest;
    // type "u": 2 events every day
    val w = (0 until 14).flatMap { d =>
      Seq.fill(if (d % 7 == 0) 10 else 1)(("w", d.toLong * day + 1))
    }
    val u = (0 until 14).flatMap(d => Seq.fill(2)(("u", d.toLong * day + 1)))
    val out = TimeSeries.dowSeasonality((w ++ u).toDF("event_type", "ts"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(out(("w", 0L)).getDouble(4) == 10.0)   // rate on the loud dow
    assert(out(("w", 1L)).getDouble(4) == 1.0)
    val chiW = out(("w", 0L)).getDouble(5)
    val chiU = out(("u", 0L)).getDouble(5)
    assert(chiW > 10.0 && chiU == 0.0, s"$chiW / $chiU")
  }

  test("q247: hand gaps pin the quantiles; midnight never bridges a gap") {
    import spark.implicits._
    // type t, one day: events at 0, 10ms, 30ms, 100ms -> gaps 10, 20, 70
    val ms = 1000000L
    val ev = Seq(("t", 1L, 0L), ("t", 2L, 10 * ms), ("t", 3L, 30 * ms),
      ("t", 4L, 100 * ms),
      // next day: a single event — no intra-day gap, nothing bridges
      ("t", 5L, day + 5 * ms))
      .toDF("event_type", "event_id", "ts")
    val r = TimeSeries.interArrival(ev).collect()(0)
    assert(r.getLong(1) == 3L, r.toString)
    assert(r.getLong(2) == 20L && r.getLong(3) == 70L && r.getLong(4) == 70L)
    assert(r.getLong(5) == 70L)
  }
}
