package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series regularization — turning an irregular event stream into
  * the dense per-key hourly series a monitoring dashboard or a feature
  * pipeline consumes: every hour between a key's first and last
  * activity gets a row, activity-free hours carry the last observed
  * value forward (gap filling / forward fill, the `LOCF` of every
  * time-series stack).
  *
  * Scale shape — the part that matters at 100 TB: the spine is
  * generated from the PER-KEY AGGREGATE (one row per key → `sequence`
  * + `explode` bounded by the corpus hour span), never from raw
  * events, and the forward-fill window runs over the HOURLY grain. So
  * a scanner bot with 100M raw events still contributes at most
  * `span_hours` rows (720 for a 30-day corpus) to the window — the raw
  * volume is absorbed by the map-side-combined hourly aggregate, and
  * no per-key path grows with event count. That makes this one of the
  * few ordered-window operators that needs NO [[SkewWindows]] routing:
  * the grain itself is the skew bound.
  *
  * Event time is epoch-nanos integer arithmetic throughout
  * ([[Tables.events]]); the hour index is `ts / 3.6e12` in exact long
  * division, mirrored by the oracle as `epoch_us // 3.6e9`.
  */
object TimeSeries {

  /** Dense per-user hourly series over events: `hour_idx` (epoch
    * hours), `n_events` (0 on gap hours), `filled_value` (the hour's
    * exact decimal `sum(value)`, carried forward over gaps), `is_gap`.
    * `DIV` keeps the hour index in exact long arithmetic — `/` on
    * longs is double division, and epoch-nanos magnitudes exceed the
    * 2^53 mantissa (the [[graft.Tables.events]] contract).
    *
    * Plan note: the spine bounds and the hourly measures are separate
    * aggregates over the raw scan (Catalyst folds the bounds into ONE
    * direct min/max-of-hour aggregate, but the raw table is still read
    * twice). A standing 100 TB deployment feeds this from a
    * materialized hourly table ([[graft.ops.Rollup]]'s partial store
    * is exactly that shape), which drops both scans to O(user-hours);
    * the join stays broadcast while user-hours fit, and AQE falls back
    * to a (user, hour)-keyed shuffle join beyond that. */
  def hourlyGapFill(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("user_id"), expr("ts DIV 3600000000000").as("hour_idx"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(28,6)")).as("hv"))
    // One row per user; sequence() materializes the spine per key.
    val spine = hourly.groupBy(col("user_id"))
      .agg(min("hour_idx").as("mn"), max("hour_idx").as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"))).as("hour_idx"))
    val joined = spine.join(hourly, Seq("user_id", "hour_idx"), "left")
    // The fill window: bounded by span_hours per key (see object doc).
    val w = Window.partitionBy("user_id").orderBy("hour_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(
      col("user_id"), col("hour_idx"),
      coalesce(col("n_events"), lit(0L)).as("n_events"),
      last(col("hv"), ignoreNulls = true).over(w).cast("double").as("filled_value"),
      (coalesce(col("n_events"), lit(0L)) === 0L).as("is_gap"))
  }

  /** q102: the dense gap-filled hourly series, oracle-ordered. */
  def q102GapFill(s: SparkSession, dir: String): DataFrame =
    hourlyGapFill(Tables.events(s, dir))
      .orderBy(col("user_id"), col("hour_idx"))

  // --- Trailing-window anomaly detection (q105) -----------------------

  /** Per-user hourly anomaly flags: an hour is anomalous when its value
    * deviates more than `zThreshold` sample standard deviations from
    * the user's TRAILING window (`RANGE lookbackHours PRECEDING AND 1
    * PRECEDING` on the hour index — calendar hours, so inactive hours
    * thin the window instead of silently stretching it, and the current
    * hour never contaminates its own baseline). Hours with fewer than
    * `minObs` baseline observations, or a degenerate (zero-variance)
    * baseline, release a NULL z-score — "don't know" stays distinct
    * from "normal".
    *
    * Float-determinism contract (the q34 idiom): window sums ride
    * exact DECIMAL, moments are computed from the sums in double, the
    * variance is rounded to 12 digits BEFORE both the positivity guard
    * and the sqrt (an ulp-level negative from engine-specific FMA
    * fusion must not flip the guard on one engine only), and the final
    * z is rounded to 12 digits.
    *
    * Scale shape: identical to [[hourlyGapFill]] — everything after
    * the one map-side-combined hourly aggregate runs on the hourly
    * grain, so the trailing window is bounded by span-hours per key
    * and needs no skew routing. */
  def hourlyAnomalies(events: DataFrame, lookbackHours: Int = 24,
                      minObs: Int = 8, zThreshold: Double = 3.0): DataFrame = {
    val hourly = events
      .groupBy(col("user_id"), expr("ts DIV 3600000000000").as("hour_idx"))
      .agg(sum(col("value").cast("decimal(28,6)")).as("hv"))
    val w = Window.partitionBy("user_id").orderBy("hour_idx")
      .rangeBetween(-lookbackHours, -1)
    val x   = col("hv").cast("double")
    val n   = count(col("hv")).over(w)
    val sx  = sum(col("hv")).over(w).cast("double")
    val sxx = sum((x * x).cast("decimal(28,6)")).over(w).cast("double")
    val withMoments = hourly.select(
      col("user_id"), col("hour_idx"), x.as("value"),
      n.as("n_obs"), sx.as("sx"), sxx.as("sxx"))
    val nn   = col("n_obs")
    val mean = col("sx") / nn
    val vr   = round((col("sxx") - col("sx") * col("sx") / nn) / (nn - 1), 12)
    val z    = round((col("value") - mean) / sqrt(vr), 12)
    withMoments.select(
      col("user_id"), col("hour_idx"), col("value"), col("n_obs"),
      when(nn >= minObs && vr > 0, z).as("z"),
      coalesce(when(nn >= minObs && vr > 0, abs(z) > zThreshold),
        lit(false)).as("is_anomaly"))
  }

  /** q105: the trailing-24h z-score anomaly scan, oracle-ordered. */
  def q105HourlyAnomaly(s: SparkSession, dir: String): DataFrame =
    hourlyAnomalies(Tables.events(s, dir))
      .orderBy(col("user_id"), col("hour_idx"))
}
