package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A/B experiment analysis — the warehouse workload behind every
  * product launch: deterministic unit→variant assignment, per-metric
  * means and a Welch z-test between variants. Reference scope note:
  * the reference engine delegates ad-hoc analytics like this to its
  * query layer (the reference's cmd scripts only export); this
  * operator belongs to the engine's extension surface.
  *
  * Scale shape: assignment is a pure hash column (the Splits rule —
  * md5-prefix of the unit id, stable across runs/engines/retries, no
  * assignment table to join); the metric is per-user event counts, so
  * the corpus collapses through TWO map-side-combined hash aggregates
  * — (type, variant, user) counts, then (type, variant) moments — and
  * the final stats are in-row arithmetic on a ≤ |types| row frame with
  * the 2-row unit-universe totals attached by broadcast. Zero-active
  * users contribute 0 to Σc and Σc² by construction, so using the
  * variant's FULL unit count N in mean/variance is exact, not an
  * approximation.
  *
  * Double determinism: Σc/Σc²/N are exact longs; mean, Welch variance
  * and z are FIXED left-to-right expression trees shared with the
  * oracle, rounded to 6 (the q41 rule); the significance flag tests
  * the ROUNDED z so an ulp near the critical value cannot flip it
  * across engines. */
object Experiment {

  /** Deterministic variant id in [0, nVariants): md5-prefix uint32 of
    * the unit id, mod nVariants. */
  def variantOf(unit: Column, nVariants: Int): Column =
    pmod(conv(substring(md5(unit.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(nVariants.toLong))

  /** Per-event-type Welch z-test of variant 0 vs 1 on the
    * events-per-user metric: (event_type, n_a, n_b, mean_a, mean_b,
    * z, significant). */
  def abTest(events: DataFrame, zCrit: Double = 1.96): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"))
      .withColumn("variant", variantOf(col("user_id"), 2))
    val universe = ev.select(col("user_id"), col("variant")).distinct()
      .groupBy()
      .agg(sum(when(col("variant") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 1L, 1L).otherwise(0L)).as("n_b"))
    val perUser = ev.groupBy(col("event_type"), col("variant"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    val mom = perUser.groupBy(col("event_type"))
      .agg(
        sum(when(col("variant") === 0L, col("c")).otherwise(0L)).as("s1_a"),
        sum(when(col("variant") === 0L, col("c") * col("c")).otherwise(0L)).as("s2_a"),
        sum(when(col("variant") === 1L, col("c")).otherwise(0L)).as("s1_b"),
        sum(when(col("variant") === 1L, col("c") * col("c")).otherwise(0L)).as("s2_b"))
    val nA = col("n_a").cast("double"); val nB = col("n_b").cast("double")
    val meanA = col("s1_a").cast("double") / nA
    val meanB = col("s1_b").cast("double") / nB
    val varA = (col("s2_a").cast("double") -
      col("s1_a").cast("double") * col("s1_a").cast("double") / nA) / (nA - 1.0)
    val varB = (col("s2_b").cast("double") -
      col("s1_b").cast("double") * col("s1_b").cast("double") / nB) / (nB - 1.0)
    val se2 = varA / nA + varB / nB
    // degenerate-variant guard: a variant with < 2 users has an
    // undefined sample variance ((n-1) = 0 → Infinity here while
    // DuckDB's x/0 is NULL) — gate mean/variance/z to NULL on both
    // sides so a tiny or one-sided experiment reads as "no verdict",
    // not a crash/parity gap.
    val enough = col("n_a") >= 2L && col("n_b") >= 2L
    val z = round(when(enough && se2 > 0.0, (meanA - meanB) / sqrt(se2)), 6)
    mom.crossJoin(broadcast(universe))
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(when(enough, meanA), 6).as("mean_a"),
        round(when(enough, meanB), 6).as("mean_b"),
        z.as("z"), (abs(z) > zCrit).as("significant"))
  }

  /** q142: the per-event-type A/B read over the events corpus. */
  def q142AbTest(s: SparkSession, dir: String): DataFrame =
    abTest(Tables.events(s, dir)).orderBy(col("event_type"))
}
