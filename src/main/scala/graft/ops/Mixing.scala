package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus mixing — the sampling-weight step of assembling a training mix
  * from heterogeneous sources: big crawl domains must not drown small
  * high-quality ones, so per-source sampling weights are flattened with a
  * temperature exponent (`w_s ∝ tokens_s^α`, α < 1 — the standard
  * multilingual/multi-domain recipe; α = 1 is proportional sampling,
  * α = 0 is uniform).
  *
  * Shape at 100 TB: one partial-aggregated groupBy on `source` (the
  * per-source table is tiny — thousands of rows at most, regardless of
  * corpus size), then a broadcast one-row total. Nothing corpus-sized
  * leaves the executors.
  *
  * Cross-engine determinism: `pow` is libm — the only engine-dependent
  * step — so each raw weight is rounded to 9 digits (drift is ~1e-13
  * absolute, 4 orders below the grid) and normalized through an EXACT
  * decimal sum (order-independent, unlike summing doubles); the final
  * division then sees bit-identical inputs on both engines.
  */
object Mixing {

  /** q45: per-source token counts and temperature-flattened sampling
    * weights (α = 0.3) with an integer per-100k-document quota. */
  def q45DomainMix(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).as("n_tokens"))
    val w = per.withColumn("w9",
      round(pow(col("n_tokens").cast("double"), lit(0.3)), 9)
        .cast("decimal(20,9)"))
    val total = w.agg(sum(col("w9")).as("w_total"))
    w.crossJoin(broadcast(total))
      .withColumn("weight",
        round(col("w9").cast("double") / col("w_total").cast("double"), 12))
      .select(
        col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        floor(col("weight") * 100000).cast("long").as("quota_100k"))
      .orderBy(col("source"))
  }
}
