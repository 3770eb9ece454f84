package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Interpolated Kneser-Ney bigram language model — the smoothing family
  * the production n-gram filters actually use (KenLM; Chen & Goodman
  * 1998): q66's maximum-likelihood bigram score is exact on the
  * training corpus but assigns −∞ to any UNSEEN transition, so it
  * cannot score held-out text at all. KN fixes both failure modes:
  * absolute discounting (D = 0.75) reserves mass from every seen
  * bigram, and the backoff distribution is the CONTINUATION count
  * (how many distinct contexts precede w₂), not the raw unigram count
  * — "francisco" is frequent but follows only "san", so its backoff
  * mass is tiny.
  *
  *   p(w₂|w₁) = (max(c(w₁w₂) − D, 0) + D·N₁₊(w₁·)·p_cont(w₂)) / c₁(w₁)
  *   p_cont(w₂) = (N₁₊(·w₂) + ½) / (B + ½·V)
  *
  * where c₁ counts bigram starts, N₁₊(w₁·) distinct followers,
  * N₁₊(·w₂) distinct predecessors, B distinct bigram types and V the
  * training vocabulary. The ½ on the continuation distribution is
  * add-half smoothing so a held-out word UNSEEN in training still has
  * mass (documented divergence from textbook KN, which leaves the
  * continuation unsmoothed and is undefined there); an unseen context
  * w₁ backs off to p_cont(w₂) directly. Every input to p is an exact
  * integer count, so both engines build the identical rational before
  * the one float step (ln, rounded to 12 digits — the q48/q66 rule),
  * and per-doc sums ride DECIMAL(28,12) occurrence-weighted.
  *
  * Shape at 100 TB: the train-side model is FOUR aggregated tables —
  * (w₁,w₂,c), (w₁,c₁,n1fw), (w₂,n1pr), and a one-row (B,V) — each
  * map-side combined off the in-row bigram transform (no positional
  * self-join). Scoring joins held-out bigram PARTIALS (doc, w₁, w₂, k)
  * against those tables: every build key is one aggregated row, so a
  * corpus-scale probe key ("of the") fans out across its own
  * partitions and AQE's skew split handles the probe side — no
  * per-key window anywhere. The one-row (B,V) rides a broadcast.
  */
object KneserNey {

  val D = 0.75

  /** q161: train interpolated-KN on the 80% split (doc_id % 5 ≠ 0),
    * score the held-out 20% per document. */
  def q161KnBigramScore(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    knBigramScore(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(5)) === 0))
  }

  /** Per-doc (doc_id, w1, w2, k) bigram partials — q66's in-row sliding
    * transform, map-side combined. */
  private def bigramPartials(docs: DataFrame): DataFrame =
    Par.widen(docs)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("l"))
      .filter(size(col("l")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("l")) - 1),
        i => struct(element_at(col("l"), i).as("w1"),
          element_at(col("l"), i + 1).as("w2")))).as("b"))
      .groupBy(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("k"))

  /** The reusable core: train on one frame, score every document of the
    * other. Zero-bigram held-out docs emit zeros (the q51 convention). */
  def knBigramScore(train: DataFrame, heldout: DataFrame): DataFrame = {
    val ln2 = 0.6931471805599453
    val tb = bigramPartials(train)
      .groupBy(col("w1"), col("w2")).agg(sum(col("k")).as("c"))
      .localCheckpoint() // three model tables below re-read this frame

    val ctx = tb.groupBy(col("w1"))
      .agg(sum(col("c")).as("c1"), count(lit(1)).as("n1fw"))
    val cont = tb.groupBy(col("w2")).agg(count(lit(1)).as("n1pr"))
    // B = distinct bigram types; V = training vocab (either side)
    val totals = tb.agg(count(lit(1)).as("big_types")).crossJoin(
      tb.select(col("w1")).union(tb.select(col("w2")))
        .distinct().agg(count(lit(1)).as("vocab")))

    val scored = bigramPartials(heldout)
      .join(tb, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      // identical expression shape on both engines: integer counts →
      // doubles → one rational → round(ln, 12)
      .withColumn("pcont",
        (coalesce(col("n1pr"), lit(0L)).cast("double") + 0.5) /
          (col("big_types").cast("double") + lit(0.5) * col("vocab").cast("double")))
      .withColumn("p", when(col("c1").isNotNull,
          (greatest(coalesce(col("c"), lit(0L)).cast("double") - D, lit(0.0)) +
            lit(D) * col("n1fw").cast("double") * col("pcont")) /
            col("c1").cast("double"))
        .otherwise(col("pcont")))
      .withColumn("lp", round(log(col("p")), 12).cast("decimal(28,12)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("lp") * col("k").cast("decimal(9,0)")).as("slp"))
      .withColumn("avg_logprob",
        round(col("slp").cast("double") / col("n_bigrams").cast("double"), 12))
      .withColumn("bits_per_bigram",
        round(-col("avg_logprob") / lit(ln2), 12))

    heldout.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"),
        coalesce(col("bits_per_bigram"), lit(0.0)).as("bits_per_bigram"))
      .orderBy(col("doc_id"))
  }
}
