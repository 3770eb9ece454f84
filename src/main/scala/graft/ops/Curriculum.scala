package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Curriculum binning — order the corpus by a difficulty proxy (token
  * length here) and cut it into equal-population stages, the schedule a
  * length-curriculum trainer consumes (short docs first, long-context
  * tail last).
  *
  * The interesting part is computing an exact global NTILE without the
  * classic scale trap: `ntile(n) OVER (ORDER BY …)` funnels the whole
  * corpus through ONE task. Here the global rank is decomposed into
  * three bounded pieces, so every shuffle is keyed and every window
  * partition is small by construction:
  *
  *   rank(doc) = docsWithSmallerTokenCount        — from the aggregated
  *               token-count distribution (tiny: one row per DISTINCT
  *               count, whatever the corpus size)
  *             + docsSameCountInEarlierIdBuckets  — per-(count, bucket)
  *               totals prefix-summed within each count (aggregated
  *               input again; `bucket` = equal-width doc_id range, the
  *               q42 prefix-sum idiom, monotone in doc_id)
  *             + row_number within (count, bucket) — bounded by the
  *               bucket width, even when one token count dominates the
  *               corpus (the skew that breaks a per-count row_number)
  *
  * Integer arithmetic end-to-end (`bin = (rank-1)·n DIV total + 1`, the
  * standard NTILE formula), so the DuckDB oracle — which uses a plain
  * single-task `row_number` window, fine at oracle scale — hash-matches
  * exactly.
  */
object Curriculum {

  /** q46: 10-stage length curriculum — per stage: population, token
    * range, and mean length. */
  def q46Curriculum(s: SparkSession, dir: String, nBins: Int = 10): DataFrame = {
    val d = Par.widen(Tables.documents(s, dir))
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tok"))
    // equal-DEPTH buckets, monotone in doc_id (Selection.idDepthBuckets
    // — equal-width collapses under sparse/clustered ids)
    val bucketed = d.withColumn("bucket",
      Selection.idDepthBuckets(d, s.sparkContext.defaultParallelism))

    // distinct-count distribution: tiny whatever the corpus size
    val dist = bucketed.groupBy(col("n_tok")).agg(count(lit(1)).as("cnt"))
    // exclusive prefix = inclusive two-level running sum minus own count
    val cum = PrefixSum.runningSum(dist, col("n_tok"), col("cnt"), "cum_incl")
      .select(col("n_tok").as("c_tok"),
        (col("cum_incl") - col("cnt")).as("tok_before"))
    val total = dist.agg(sum(col("cnt")).as("n_total"))

    // per-(count, bucket) populations, prefix-summed within each count —
    // aggregated input, partitioned by count: no raw-row window anywhere
    val perBucket = bucketed.groupBy(col("n_tok"), col("bucket"))
      .agg(count(lit(1)).as("bcnt"))
    val bucketWin = Window.partitionBy(col("n_tok")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketPrefix = perBucket.select(
      col("n_tok").as("b_tok"), col("bucket").as("b_bucket"),
      coalesce(sum(col("bcnt")).over(bucketWin), lit(0L)).as("bucket_before"))

    // local order within a (count, bucket) cell — bounded by bucket width
    val localWin = Window.partitionBy(col("n_tok"), col("bucket"))
      .orderBy(col("doc_id"))
    val ranked = bucketed
      .withColumn("local_rn", row_number().over(localWin).cast("long"))
      .join(bucketPrefix,
        col("n_tok") === col("b_tok") && col("bucket") === col("b_bucket"))
      .join(broadcast(cum), col("n_tok") === col("c_tok"))
      .crossJoin(broadcast(total))
      .withColumn("rnk", col("tok_before") + col("bucket_before") + col("local_rn"))
      .withColumn("bin", expr(s"((rnk - 1) * $nBins) DIV n_total + 1"))

    ranked.groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_tok")).as("min_tokens"),
        max(col("n_tok")).as("max_tokens"),
        sum(col("n_tok")).as("sum_tokens"))
      .withColumn("avg_tokens",
        col("sum_tokens").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("bin"))
  }
}
