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
    * 2^53 mantissa (the [[graft.Tables.events]] contract). */
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
}
