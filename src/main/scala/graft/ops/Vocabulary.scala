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

  /** q229: VOCABULARY GROWTH CURVE + HEAPS' LAW FIT — distinct-type
    * count V(N) at ten corpus prefixes plus the fitted Heaps exponent
    * β (V ≈ K·N^β, Heaps '78): the number every tokenizer-vocab-size
    * and dedup-planning decision starts from, and a drift alarm in its
    * own right (β drifting toward 1 = the corpus is filling with
    * unseen-token noise; toward 0 = templated repetition).
    *
    * Prefixes WITHOUT order statistics: checkpoints are doc_id
    * thresholds d_j = (max_id·j) DIV 10 (docs arrive in id order), so
    * the growth read needs no global sort — "first occurrence" is ONE
    * `min(doc_id)` aggregate per token type (map-side combined, the
    * only vocabulary-sized shuffle), collapsed to a ≤|docs| histogram
    * before the broadcast-threshold conditional counts. The fit is a
    * 10-point OLS on (ln N, ln V): rounded-12 terms, exact decimal
    * sums, the β/ln K divisions in fixed-shape double arithmetic
    * rounded 6 (identical expression trees on both engines). */
  def q229VocabGrowth(s: SparkSession, dir: String): DataFrame =
    growthCurve(Tables.documents(s, dir))

  /** The growth core over any (doc_id, text) frame. */
  def growthCurve(docs0: DataFrame): DataFrame = {
    val docs = Par.widen(docs0)
    val thr = docs.agg(max(col("doc_id")).as("mx"))
      .select(explode(sequence(lit(1), lit(10))).as("j0"), col("mx"))
      .select(col("j0").cast("long").as("j"), expr("mx * j0 DIV 10").as("d"))
    val docStats = docs
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
      .crossJoin(broadcast(thr)).filter(col("doc_id") <= col("d"))
      .groupBy(col("j"), col("d"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val fHist = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(min(col("doc_id")).as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("c"))
    val vocabAt = fHist.crossJoin(broadcast(thr)).filter(col("f") <= col("d"))
      .groupBy(col("j")).agg(sum(col("c")).as("vocab"))
    val pts = docStats.join(vocabAt, Seq("j"), "left")
      .withColumn("vocab", coalesce(col("vocab"), lit(0L)))
    val fit = pts.filter(col("n_tokens") > 0 && col("vocab") > 0)
      .select(round(log(col("n_tokens").cast("double")), 12).as("x"),
        round(log(col("vocab").cast("double")), 12).as("y"))
      .select(col("x"), col("y"),
        round(col("x") * col("x"), 12).as("xx"),
        round(col("x") * col("y"), 12).as("xy"))
      .agg(count(lit(1)).cast("double").as("m"),
        sum(col("x").cast("decimal(28,12)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(28,12)")).cast("double").as("sy"),
        sum(col("xx").cast("decimal(28,12)")).cast("double").as("sxx"),
        sum(col("xy").cast("decimal(28,12)")).cast("double").as("sxy"))
      .select(
        (col("m") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("m") * col("sxx") - col("sx") * col("sx")).as("den"),
        col("m"), col("sx"), col("sy"))
      .select(
        when(col("den") =!= 0.0, round(col("num") / col("den"), 6)).as("heaps_beta"),
        when(col("den") =!= 0.0, round(
          (col("sy") - (col("num") / col("den")) * col("sx")) / col("m"), 6))
          .as("heaps_lnk"))
    pts.crossJoin(broadcast(fit))
      .select(col("j"), col("d").as("id_threshold"), col("n_docs"),
        col("n_tokens"), col("vocab"), col("heaps_beta"), col("heaps_lnk"))
      .orderBy(col("j"))
  }

  /** q254: OOV-RATE DRIFT against a frozen vocabulary snapshot — the
    * question a deployed tokenizer/vocab faces as data arrives: how
    * much of each new slice falls outside the training-time vocabulary
    * (token OCCURRENCES out-of-vocab, and distinct NEW TYPES), per
    * source. Snapshot = the %3=0 doc slice's distinct tokens (the q32
    * deterministic-split family); slices 1 and 2 are "new data".
    * Complements q229 (Heaps growth says vocabulary keeps growing;
    * this says how much of it YOUR frozen vocab misses, and where).
    *
    * Scale shape: ONE (slice, source, token) aggregate off the explode
    * (map-side combined — token hot keys collapse there); the snapshot
    * vocab is a projection of the same frame; the OOV flag is a
    * left-join on the AGGREGATED rows (≤ types, not occurrences).
    * Exact longs; one rounded divide. */
  def q254OovDrift(s: SparkSession, dir: String): DataFrame =
    oovDriftOf(Tables.documents(s, dir))

  /** The OOV-drift core over any (doc_id, source, text) frame. */
  private[graft] def oovDriftOf(docs: DataFrame): DataFrame = {
    val toks = Par.widen(docs)
      .select(pmod(col("doc_id"), lit(3L)).as("slice"), col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("slice"), col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds the snapshot vocab AND the drift scan
    val vocab = toks.filter(col("slice") === 0L).select(col("w")).distinct()
      .withColumn("known", lit(1L))
    toks.filter(col("slice") =!= 0L)
      .join(vocab, Seq("w"), "left")
      .groupBy(col("slice"), col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(when(col("known").isNull, col("c")).otherwise(0L)).as("n_oov"),
        sum(when(col("known").isNull, 1L).otherwise(0L)).as("n_new_types"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6))
      .orderBy(col("slice"), col("source"))
  }
}
