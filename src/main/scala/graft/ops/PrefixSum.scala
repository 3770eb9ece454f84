package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed exact prefix sums over ordered aggregated frames — the
  * scale-safe replacement for the `Window.orderBy(v)` (no partition)
  * idiom on value-histogram frames.
  *
  * The single-partition window is CORRECT on any aggregated frame and
  * fine when the frame is bounded (top-k cuts, tier tables); but the
  * ECDF/quantile family windows over DISTINCT VALUE histograms, and at
  * 100 TB a value histogram is itself 10⁷–10⁸ rows — one task then
  * funnels the whole frame (the r13 verdict's watch item). This is the
  * two-level scheme already proven driver-side in
  * [[Selection.epochShuffle]], kept fully declarative here:
  *
  *   1. RANGE-bucket the order column: bucket = clamp(⌊(v − lo) · P /
  *      (hi − lo)⌋) over a broadcast 1-row min/max aggregate — a
  *      monotone map to ≤ P buckets with no sampling pass and no
  *      driver round trip (the planner's own range partitioner would
  *      need a sample scan). Bucketing arithmetic runs in double: for
  *      any numeric order type the map stays monotone NON-DECREASING
  *      under IEEE rounding (multiplication/division by a positive
  *      constant and floor are monotone; equal values bucket equally),
  *      which is all correctness needs — the within-bucket window
  *      still orders by the EXACT value;
  *   2. per-bucket subtotals (≤ P rows) prefix-scanned with a window
  *      over that CONSTANT-bounded frame — the benign single-task case;
  *   3. within-bucket cumulative windows (bounded partitions) plus the
  *      broadcast-joined bucket offset.
  *
  * Exactness: sums of longs, grouped and added in full — bucketing
  * changes the execution tree, never the result, so oracle hashes are
  * unchanged by construction. Skew note: range bucketing balances by
  * VALUE RANGE, not row count; a histogram whose distinct values clump
  * into one range still bounds the partition by that bucket's distinct
  * count, which is the quantity this exists to cap. */
object PrefixSum {

  /** `df` extended with `out` = running sum of `value` over ascending
    * `order` — exactly `sum(value).over(Window.orderBy(order))`, built
    * with the two-level scheme. Preconditions: `order` (any numeric) is
    * UNIQUE per row (the aggregated-histogram shape: one row per
    * distinct value); `value` is long-typed. */
  def runningSum(df: DataFrame, order: Column, value: Column,
                 out: String): DataFrame = {
    val p = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    // PIN the input: three consumers follow (bounds, subtotals, the
    // final join) and `df` is typically an UNCACHED aggregate whose
    // lineage reaches back to a corpus scan — unpinned, each consumer
    // would re-run that scan (r14 soak: the ECDF family re-tokenized
    // the corpus 3× and ran 3× slower than the single-task window it
    // replaced). The frame is aggregated-small by precondition, so the
    // checkpoint is cheap.
    val keyed = df.withColumn("__psv", order)
      .withColumn("__psx", value.cast("long"))
      .localCheckpoint()
    val bounds = keyed.agg(
      min(col("__psv").cast("double")).as("__pslo"),
      max(col("__psv").cast("double")).as("__pshi"))
    val bucketed = keyed.crossJoin(broadcast(bounds))
      // the +1 in the denominator guards hi == lo (1-row frames) and
      // keeps ⌊·⌋ < P at v == hi; clamp anyway against double edges
      .withColumn("__psb", least(lit(p - 1L), greatest(lit(0L),
        floor((col("__psv").cast("double") - col("__pslo")) * lit(p.toDouble) /
          (col("__pshi") - col("__pslo") + lit(1.0))).cast("long"))))
      .drop("__pslo", "__pshi")
    // exclusive bucket offsets via a triangular self-join over the ≤ P
    // subtotals (≤ P² ≤ 1024 joined rows) — not a global window, so no
    // single-partition stage exists anywhere in this plan
    val subtotals = bucketed.groupBy(col("__psb"))
      .agg(sum(col("__psx")).as("__pst"))
      .localCheckpoint() // ≤ P rows; two consumers
    val offsets = subtotals.as("a")
      .join(subtotals.as("b"), col("b.__psb") < col("a.__psb"), "left")
      .groupBy(col("a.__psb").as("__psb_o"))
      .agg(coalesce(sum(col("b.__pst")), lit(0L)).as("__psoff"))
    bucketed
      .withColumn("__pscum",
        sum(col("__psx")).over(
          Window.partitionBy(col("__psb")).orderBy(col("__psv"))))
      .join(broadcast(offsets), col("__psb") === col("__psb_o"))
      .withColumn(out, col("__psoff") + col("__pscum"))
      .drop("__psv", "__psx", "__psb", "__psb_o", "__psoff", "__pscum")
  }
}
