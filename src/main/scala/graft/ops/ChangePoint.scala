package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** CUSUM change-point detection (Page 1954) on per-type daily event
  * volume — the monitoring read that catches a SUSTAINED small shift
  * the day it accumulates past the decision interval, where q105's
  * per-hour z-score only fires on single large spikes and q144's PSI
  * needs a whole comparison window. Reference scope note: the
  * reference engine has no monitoring surface; this extends the drift
  * family (q144/q186/q187).
  *
  * Recursion without a recursive plan: the clamped CUSUM
  * S_t = max(0, S_{t−1} + x_t − μ − k) has the closed form
  * S_t = P_t − min_{j ≤ t} P_j over the prefix sums P of (x − μ − k)
  * — so two window passes (running sum, running min) over the
  * day grid replace the sequential recursion exactly.
  *
  * Scale shape: ONE corpus-collapsing (type, day) count aggregate;
  * the day spine is the aggregated distinct-day frame cross-joined to
  * the ≤ |types| dimension (zero-filled — a silent dead day IS
  * signal); every window partitions by type over ≤ |days| rows of
  * that grid, never raw events. Baseline μ/σ come from the grid's
  * first-half days (the q144 split convention) via exact integer
  * moments.
  *
  * Determinism: counts exact; μ, σ, k = σ/2, h = 4σ rounded 12; the
  * per-day deviation y = x − μ − k is a rounded-12 double cast to
  * DECIMAL(28,12), so prefix sums and running minima are EXACT and
  * order-free; the alarm compares decimals (no ulp at the decision
  * boundary); reported statistics round 6 (the q41 rule). */
object ChangePoint {

  /** Per-type one-sided (upward) CUSUM over daily counts:
    * (event_type, n_days, mu, sigma, h, max_s, alarm_day) where
    * alarm_day = first day S_t exceeds h (null if never). `events`
    * needs (`ts` epoch-nanos long, `event_type`). */
  def cusumDaily(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_type"),
      expr("ts DIV 86400000000000").as("day"))
    val counts = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("x"))
    val days = counts.select(col("day")).distinct()
    val types = counts.select(col("event_type")).distinct()
    val grid = types.crossJoin(days)
      .join(counts, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    val split = days.agg(expr("(min(day) + max(day) + 1) DIV 2").as("__split"))
    val base = grid.crossJoin(broadcast(split))
      .filter(col("day") < col("__split"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n0"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"))
      .select(col("event_type"), col("n0"),
        round(col("s1").cast("double") / col("n0").cast("double"), 12).as("mu"),
        round(sqrt(
          (col("s2").cast("double") - col("s1").cast("double") *
            col("s1").cast("double") / col("n0").cast("double")) /
          (col("n0").cast("double") - 1.0)), 12).as("sigma"))
      .withColumn("k", round(col("sigma") / 2.0, 12))
      .withColumn("h", round(col("sigma") * 4.0, 12))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val scored = grid.join(broadcast(base), Seq("event_type"))
      .withColumn("y", round(col("x").cast("double") - col("mu") - col("k"), 12)
        .cast("decimal(28,12)"))
      .withColumn("p", sum(col("y")).over(byDay))
      .withColumn("pmin", least(min(col("p")).over(byDay), lit(0L).cast("decimal(28,12)")))
      .withColumn("s", col("p") - col("pmin"))
    scored.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        max(col("mu")).as("mu"), max(col("sigma")).as("sigma"),
        max(col("h")).as("h"),
        max(col("s")).as("max_s_d"),
        min(when(col("s") > col("h").cast("decimal(28,12)"), col("day")))
          .as("alarm_day"))
      .select(col("event_type"), col("n_days"),
        round(col("mu"), 6).as("mu"), round(col("sigma"), 6).as("sigma"),
        round(col("h"), 6).as("h"),
        round(col("max_s_d").cast("double"), 6).as("max_s"),
        col("alarm_day"))
      .orderBy(col("event_type"))
  }

  /** q195: the CUSUM read over the events corpus. */
  def q195CusumDaily(s: SparkSession, dir: String): DataFrame =
    cusumDaily(Tables.events(s, dir))
}
