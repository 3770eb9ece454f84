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
  def q45DomainMix(s: SparkSession, dir: String): DataFrame =
    domainWeights(Tables.documents(s, dir))
      .select(
        col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        floor(col("weight") * 100000).cast("long").as("quota_100k"))
      .orderBy(col("source"))

  /** The per-source weight table over any (source, text) frame — q45's
    * output rows plus the normalized `weight` column, reused by q62 as
    * the per-document sampling weight. */
  def domainWeights(docs: DataFrame): DataFrame = {
    val per = docs
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
  }

  /** q62: weighted corpus sampling — DRAW the epoch's documents to match
    * the q45 mixture, not just compute its weights: each document gets
    * the Efraimidis–Spirakis key `-ln(u)/w` (u a salted-hash uniform, w
    * the per-DOCUMENT weight `weight_source / n_docs_source`, so a
    * source's expected share of the sample is its mixture weight
    * whatever its document count) and the k smallest keys win — the
    * standard one-pass weighted sample without replacement. Which
    * documents land is a pure function of (salt, doc_id, weight table):
    * rerun- and engine-stable.
    *
    * Scale shape: the weight table is per-source (tiny) and rides a
    * broadcast join; u and the key are narrow per-row expressions; the
    * k-smallest cut is `ORDER BY ... LIMIT k` — TakeOrderedAndProject
    * (per-partition heaps), never a global sort. No corpus-sized state
    * anywhere.
    *
    * Determinism: u = (h52+1)/2^52 is exact dyadic arithmetic on a
    * 52-bit hash (double-exact); `ln` is libm so ln(u) is rounded to 12
    * digits before the division, and the key once more after it (the
    * q41/q48 float rules); the per-doc weight divides two bit-identical
    * exact values; ties break by doc_id. */
  def q62WeightedSample(s: SparkSession, dir: String, k: Int = 100): DataFrame =
    weightedSample(Tables.documents(s, dir), k)

  /** The reusable core over any (doc_id, source, text) frame. */
  def weightedSample(docs: DataFrame, k: Int): DataFrame = {
    val weights = domainWeights(docs)
      .select(col("source"), col("weight"),
        (col("weight") / col("n_docs").cast("double")).as("doc_w"))
    val h52 = conv(
      substring(md5(concat(lit("wsample:"), col("doc_id").cast("string"))), 1, 13),
      16, 10).cast("long")
    val u = (h52.cast("double") + 1.0) / lit(4503599627370496.0) // 2^52
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(weights), "source")
      .withColumn("sample_key",
        round(-round(log(u), 12) / col("doc_w"), 12))
      .orderBy(col("sample_key"), col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("source"), col("weight"), col("sample_key"))
      .orderBy(col("doc_id"))
  }
}
