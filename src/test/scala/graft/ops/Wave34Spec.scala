package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 34: SPRT monitor (q234), sliding actives (q235), Pareto
  * frontier (q236). */
class Wave34Spec extends SparkSpec {

  private val day = 86400000000000L

  test("q234: a sustained 4x rate accepts h1; a flat series accepts h0 or keeps sampling") {
    import spark.implicits._
    // "hot": 10 days at 20/day then 10 at 5/day (burst first — a quiet
    // lead-in would cross the h0 boundary before the burst arrives,
    // which is correct SPRT behavior, just not this test's target);
    // mu = 12.5, llr/day = +1.37 during the burst -> h1 on day 2
    val hot = (0 until 10).flatMap(d => Seq.fill(20)(("hot", d.toLong * day + 1))) ++
      (10 until 20).flatMap(d => Seq.fill(5)(("hot", d.toLong * day + 1)))
    val flat = (0 until 20).flatMap(d => Seq.fill(5)(("flat", d.toLong * day + 1)))
    val out = ChangePoint.sprtDaily((hot ++ flat).toDF("event_type", "ts"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("hot").getString(6) == "h1", out("hot").toString)
    val flatDec = Option(out("flat").getString(6))
    assert(flatDec.forall(_ == "h0"), out("flat").toString)
  }

  test("q235: hand fixture pins DAU/WAU") {
    import spark.implicits._
    // u1 active day 0 only; u2 active day 5 only — u1's visit is still
    // inside day 5's trailing-7 window, and WAU is DISTINCT users
    val ev = Seq((1L, 0L * day + 9), (2L, 5L * day + 9))
      .toDF("user_id", "ts")
    val out = TimeSeries.slidingActive(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == ((1L, 1L)))        // day 0: u1 only
    assert(out(5L) == ((1L, 2L)))        // day 5: u2 today + u1 trailing
    val st = TimeSeries.slidingActive(ev).collect()
      .find(_.getLong(0) == 5L).get.getDouble(3)
    assert(st == 0.5)
  }

  test("q236: skyline == brute-force dominance, equal points co-survive") {
    import spark.implicits._
    val pts = Seq(
      (1L, 10L, 1L),  // frontier (max x)
      (2L, 5L, 5L),   // frontier
      (3L, 5L, 5L),   // duplicate of 2 — must co-survive
      (4L, 5L, 4L),   // dominated by 2 (same x, lower y)
      (5L, 1L, 9L),   // frontier (max y)
      (6L, 9L, 1L),   // dominated by 1 (lower x, same y)
      (7L, 3L, 3L))   // dominated by 2
      .toDF("doc_id", "x", "y")
    val got = Selection.paretoFrontier(pts).collect().map(_.getLong(0)).toSet
    val rows = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, bx, by) =>
        bx >= x && by >= y && (bx > x || by > y)
      }
    }.map(_._1).toSet
    assert(got == want && got == Set(1L, 2L, 3L, 5L), s"$got vs $want")
  }
}
