package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Design-based estimation from a deterministic stratified sample —
  * the Horvitz–Thompson estimator (JASA '52): when a pipeline can only
  * afford to deep-inspect a sample (quality audits, PII review, manual
  * labeling), totals are recovered as Σ y/π over sampled units, and
  * the design is trustworthy only if the inclusion probabilities π are
  * replayable. Here the design is the house hash-sampling recipe:
  * stratified by source, unit included iff md5(doc_id) % rate == 0
  * with a per-stratum rate — big strata sampled 1-in-4, small strata
  * (≤ `smallCutoff` docs) taken whole (π = 1). The output compares the
  * HT estimates against the true totals the gate can also compute —
  * the estimator's bias surface made visible, per stratum.
  *
  * Shape at 100 TB: one per-source count aggregate (broadcast back),
  * one narrow filtered pass for the sample, one aggregate over it —
  * the whole point is that only the SAMPLE is ever inspected deeply.
  * Determinism: inclusion is a pure function of doc_id (md5-hash mod —
  * the [[graft.queries]] hash recipe); sums are exact integers; the
  * two estimates and the relative error round 6. */
object Estimation {

  /** q213: per-source (n_true, tokens_true, n_sampled, rate,
    * ht_docs, ht_tokens, rel_err_tokens). */
  def q213HtEstimate(s: SparkSession, dir: String,
                     smallCutoff: Long = 20L, rate: Long = 4L): DataFrame = {
    val docs = Par.widen(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("y"))
    val truth = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_true"), sum(col("y")).as("tokens_true"))
    val withRate = docs.join(broadcast(truth), Seq("source"))
      .withColumn("rate",
        when(col("n_true") <= smallCutoff, lit(1L)).otherwise(lit(rate)))
    // inclusion: md5(doc_id) low-52-bits mod rate == 0 — the house
    // conv(substring(md5)) recipe, pure function of the key
    val sampled = withRate.filter(
      conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("long") % col("rate") === 0)
    sampled.groupBy(col("source"))
      .agg(max(col("n_true")).as("n_true"),
        max(col("tokens_true")).as("tokens_true"),
        max(col("rate")).as("rate"),
        count(lit(1)).as("n_sampled"),
        sum(col("y") * col("rate")).as("ht_tokens_l"))
      .select(col("source"), col("n_true"), col("tokens_true"),
        col("n_sampled"), col("rate"),
        (col("n_sampled") * col("rate")).as("ht_docs"),
        col("ht_tokens_l").as("ht_tokens"),
        round(abs(col("ht_tokens_l") - col("tokens_true")).cast("double") /
          col("tokens_true").cast("double"), 6).as("rel_err_tokens"))
      .orderBy(col("source"))
  }
}
