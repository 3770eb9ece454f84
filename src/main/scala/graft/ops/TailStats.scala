package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Heavy-tail diagnostics of the per-source gram-frequency
  * distribution — the two standard inequality reads a corpus health
  * check runs next to q188's Zipf slope:
  *
  *  - HILL TAIL INDEX (Hill 1975): ξ̂ = (1/k) Σ_{i≤k} ln(f_(i)/f_(k+1))
  *    over the k largest frequencies — the canonical estimator of the
  *    Pareto tail exponent α = 1/ξ. Where q188 fits the whole head's
  *    log-log line, Hill reads ONLY the extreme tail: a source whose α
  *    collapses is concentrating its token mass into boilerplate.
  *  - GINI COEFFICIENT over the full frequency vector — the scalar
  *    inequality summary: G = (2Σ i·f_(i) − (n+1)Σf) / (nΣf) with
  *    frequencies ranked ascending; 0 = uniform vocabulary use,
  *    → 1 = a few grams own the corpus.
  *
  * Both run on word-3-GRAM frequencies (the unigram vocabulary of
  * this corpus is degenerate — 31 types — while grams give each
  * source a ~10³-type distribution; at web scale either works and the
  * gram form is the one dedup cares about).
  *
  * Scale shape: ONE (source × gram) count aggregate off the in-row
  * gram build (no distinct — multiplicity is the point); the Hill
  * head uses q188's two-level hot-key-safe top-k cut (64 sub-buckets
  * before the merge rank); the Gini rank is a per-source window over
  * the AGGREGATED gram table (≤ per-source vocabulary rows, the
  * q121/q167 discipline — never raw token rows).
  *
  * Determinism: frequencies exact; each ln rounded 12 into a decimal
  * sum (the q41 rule); Gini's Σi·f and Σf are DECIMAL(38,0) — exact
  * at any corpus size; outputs rounded 6. */
object TailStats {

  /** Per-source (source, gram, f) counts with multiplicity. */
  private def gramFreq(docs: DataFrame, n: Int): DataFrame =
    Par.widen(docs)
      .select(col("source"), explode(graft.functions.exprs.word_ngrams(
        TextAnalysis.tokens(col("text")), n)).as("g"))
      .groupBy(col("source"), col("g")).agg(count(lit(1)).as("f"))

  /** q197: Hill estimator at k = 100 over 3-gram frequencies:
    * (source, k, hill_xi, tail_alpha). Sources whose gram table has
    * ≤ k types emit no row (the estimator needs f_(k+1)). */
  def q197HillTail(s: SparkSession, dir: String): DataFrame =
    hillTail(Tables.documents(s, dir), 3, 100)

  def hillTail(docs: DataFrame, n: Int, k: Int): DataFrame = {
    val tf = gramFreq(docs, n)
    // two-level head cut (q188's discipline): sub-bucket ranks bound
    // every window partition before the per-source merge rank
    val sub = pmod(xxhash64(col("g")), lit(64L))
    val w1 = Window.partitionBy(col("source"), sub)
      .orderBy(col("f").desc, col("g"))
    val w2 = Window.partitionBy(col("source")).orderBy(col("f").desc, col("g"))
    val head = tf
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= k + 1)
      .withColumn("r", row_number().over(w2).cast("long"))
      .filter(col("r") <= k + 1)
    val kv = head.groupBy(col("source"))
      .agg(max(when(col("r") === (k + 1), col("f"))).as("fk1"),
        sum(when(col("r") <= k, 1L).otherwise(0L)).as("k"))
      .filter(col("fk1").isNotNull)
    head.filter(col("r") <= k)
      .join(broadcast(kv), Seq("source"))
      .groupBy(col("source"), col("k"))
      .agg(sum(round(log(col("f").cast("double") / col("fk1").cast("double")), 12)
        .cast("decimal(28,12)")).as("xs"))
      .select(col("source"), col("k"),
        round(col("xs").cast("double") / col("k").cast("double"), 6).as("hill_xi"),
        // a perfectly flat head (every top-k frequency = f_(k+1)) has
        // Σln = 0: the tail is too flat to estimate — α reads NULL,
        // not a divide-by-zero (ANSI mode throws on x/0)
        round(when(col("xs") > 0, col("k").cast("double") /
          col("xs").cast("double")), 6).as("tail_alpha"))
      .orderBy(col("source"))
  }

  /** q198: Gini concentration of 3-gram mass per source:
    * (source, n_grams, total_mass, gini). */
  def q198Gini(s: SparkSession, dir: String): DataFrame =
    gini(Tables.documents(s, dir), 3)

  def gini(docs: DataFrame, n: Int): DataFrame = {
    val tf = gramFreq(docs, n)
    val ranked = tf.withColumn("i", row_number().over(
      Window.partitionBy(col("source")).orderBy(col("f"), col("g"))).cast("long"))
    ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_grams"),
        sum(col("f").cast("decimal(38,0)")).as("sf"),
        // widen BEFORE multiplying: a single i*f in LONG can overflow at the
        // corpus scales the exactness claim covers (ANSI would abort the job)
        sum(col("i").cast("decimal(19,0)") * col("f").cast("decimal(19,0)")).as("sif"))
      .select(col("source"), col("n_grams"),
        col("sf").cast("long").as("total_mass"),
        round((lit(2.0) * col("sif").cast("double") -
          (col("n_grams").cast("double") + lit(1.0)) * col("sf").cast("double")) /
          (col("n_grams").cast("double") * col("sf").cast("double")), 6).as("gini"))
      .orderBy(col("source"))
  }
}
