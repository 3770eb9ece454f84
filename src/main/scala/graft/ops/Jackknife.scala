package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Delete-one-BLOCK jackknife standard errors (Quenouille/Tukey; the
  * blocked form is survey statistics' standard design-based variance)
  * for the per-source mean tokens-per-doc — the uncertainty companion
  * of q193's conformal intervals: conformal bounds a PREDICTION,
  * the jackknife bounds an ESTIMATE, and a corpus report that ships
  * "source X averages 54.1 tokens" should ship ±SE with it.
  * Deterministic by construction: blocks are md5(doc_id) % G, so the
  * G leave-one-block-out means θ_(g) = (S − s_g)/(N − n_g) come from
  * per-block integer sums — no resampling, no RNG, exactly replayable
  * (the reason jackknife is chosen over bootstrap here: bootstrap's
  * resampling cannot be made engine-portable without shipping a
  * generator contract, while the jackknife is a closed form of the
  * block sums).
  *
  * Scale shape: ONE (source × block) aggregate collapses the corpus
  * (G = 20 rows per source); everything after is arithmetic on that
  * ≤ |sources|·G frame. SE² = (G−1)/G · Σ_g (θ_(g) − θ̄)².
  *
  * Determinism: block sums exact DECIMAL(38,0); each θ_(g) and θ̄
  * rounded 12; squared deviations rounded 12 into a decimal sum;
  * outputs rounded 6. */
object Jackknife {

  val Blocks = 20

  /** (source, n_docs, n_blocks, mean_loo, jk_se): the mean of the G
    * leave-one-out means and its jackknife SE. `n_blocks` < G when a
    * source is too small to populate every hash block — the SE is
    * then over the populated blocks (and the spec asserts G at
    * corpus scale). */
  def meanTokensSe(docs: DataFrame): DataFrame = {
    val d = docs.select(col("source"),
      pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(Blocks.toLong)).as("blk"),
      TextAnalysis.tokenCount(col("text")).as("y"))
    val pb = d.groupBy(col("source"), col("blk"))
      .agg(count(lit(1)).as("n_g"), sum(col("y").cast("decimal(38,0)")).as("s_g"))
    val tot = pb.groupBy(col("source"))
      .agg(sum(col("n_g")).as("n"), sum(col("s_g")).as("s"),
        count(lit(1)).as("gee"))
    val loo = pb.join(tot, Seq("source"))
      .withColumn("th", round(
        (col("s").cast("double") - col("s_g").cast("double")) /
          (col("n").cast("double") - col("n_g").cast("double")), 12))
    // θ̄ through a decimal sum, not avg(): double summation order is
    // engine-dependent and the round-12 could flip an ulp
    val m = loo.groupBy(col("source"))
      .agg(max(col("n")).as("n"), max(col("gee")).as("gee"),
        round(sum(col("th").cast("decimal(28,12)")).cast("double") /
          count(lit(1)).cast("double"), 12).as("thbar"))
    loo.select(col("source"), col("th"))
      .join(broadcast(m), Seq("source"))
      .withColumn("dev2", round((col("th") - col("thbar")) *
        (col("th") - col("thbar")), 12).cast("decimal(28,12)"))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"), max(col("gee")).as("n_blocks"),
        max(col("thbar")).as("thbar"), sum(col("dev2")).as("ss"))
      .select(col("source"), col("n_docs"), col("n_blocks"),
        round(col("thbar"), 6).as("mean_loo"),
        round(sqrt((col("n_blocks").cast("double") - 1.0) /
          col("n_blocks").cast("double") * col("ss").cast("double")), 6)
          .as("jk_se"))
      .orderBy(col("source"))
  }

  /** q199: the jackknife table over documents. */
  def q199Jackknife(s: SparkSession, dir: String): DataFrame =
    meanTokensSe(Tables.documents(s, dir))
}
