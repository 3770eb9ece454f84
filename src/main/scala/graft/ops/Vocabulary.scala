package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Vocabulary RICHNESS per source — how much of a source's word
  * distribution remains unseen at current corpus size, the pair of
  * classical estimators a data-acquisition decision reads:
  *
  *  - GOOD–TURING unseen mass P₀ = N₁/N (Good '53): the probability
  *    the next sampled token is a word never seen from this source —
  *    high P₀ = the source still yields new vocabulary, keep crawling;
  *  - CHAO1 richness (Chao '84): V + N₁²/(2·N₂) — the asymptotic
  *    vocabulary size estimate from hapax/dis-legomena counts.
  *
  * Everything reduces over the FREQUENCY-OF-FREQUENCIES table: one
  * (source, term) count aggregate (map-combined — the q69 shape), one
  * (source, r) re-aggregate of THAT (hot terms already collapsed), and
  * per-source sums over the tiny N_r grid. Exact integers throughout
  * (N via decimal r·N_r products); the two estimates round 6; N₂ = 0
  * → Chao1 NULL (the undefined case, same literal on both engines). */
object Vocabulary {

  /** q217: (source, v_observed, n_tokens, n_hapax, n_dis, p0_unseen,
    * chao1). */
  def q217VocabRichness(s: SparkSession, dir: String): DataFrame =
    richness(Tables.documents(s, dir))

  /** The estimator core over any (source, text) frame. */
  def richness(docs: DataFrame): DataFrame = {
    val tf = Par.widen(docs)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("r"))
    val fof = tf.groupBy(col("source"), col("r")).agg(count(lit(1)).as("nr"))
    fof.groupBy(col("source"))
      .agg(sum(col("nr")).as("v_observed"),
        sum(col("r").cast("decimal(19,0)") * col("nr").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("n_dec"),
        coalesce(sum(when(col("r") === 1, col("nr"))), lit(0L)).as("n_hapax"),
        coalesce(sum(when(col("r") === 2, col("nr"))), lit(0L)).as("n_dis"))
      .select(col("source"), col("v_observed"),
        col("n_dec").cast("long").as("n_tokens"),
        col("n_hapax"), col("n_dis"),
        round(col("n_hapax").cast("double") / col("n_dec").cast("double"), 6)
          .as("p0_unseen"),
        when(col("n_dis") > 0, round(
          col("v_observed").cast("double") +
            col("n_hapax").cast("double") * col("n_hapax").cast("double") /
              (lit(2.0) * col("n_dis").cast("double")), 6)).as("chao1"))
      .orderBy(col("source"))
  }
}
