package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Distinctive vocabulary per source — "what words make THIS crawl
  * source different from the rest of the corpus", the standard
  * source-characterization report in a data card and the signal behind
  * targeted quality audits ("why is source X full of `casino`?").
  *
  * Method: log-odds ratio with an informative Dirichlet prior (Monroe,
  * Colaresi & Quinn, "Fightin' Words", Political Analysis 2008 — the
  * accepted fix for both raw-count bias toward common words and
  * TF-IDF/PMI bias toward rare ones): for term t in source s vs the
  * REST of the corpus,
  *
  *   δ_t = ln((y_st + a_t) / (n_s + a0 − y_st − a_t))
  *       − ln((y_rt + a_t) / (n_r + a0 − y_rt − a_t))
  *   σ²_t ≈ 1/(y_st + a_t) + 1/(y_rt + a_t),   z_t = δ_t / √σ²_t
  *
  * with the prior a_t = a0 · y_t / N taken from the whole corpus
  * (a0 = 100 pseudo-counts spread proportionally to overall usage).
  *
  * Scale shape: one tokenize pass → (source, term) counts via ONE
  * map-side-combined hash aggregate; per-source totals and the corpus
  * term totals are tiny/|vocab|-row aggregates joined back on term (a
  * shuffle join keyed on the term — the vocab frame, not the corpus);
  * "rest of corpus" counts are derived by SUBTRACTION from the corpus
  * totals, so no second pass and no per-source anti-join. The top-k
  * cut is the two-level hot-key-safe pattern: row_number inside
  * (source, hash-sub-bucket) partitions first — each sees ~vocab/64
  * rows — then a final window over the ≤ 5·64 survivors per source
  * (string ranking keys rule out the long-id top_k heap).
  *
  * Determinism: counts are exact integers; the prior and both odds
  * ratios are IEEE doubles computed in one fixed expression order; each
  * ln is rounded to 12 digits before the subtraction and z once more
  * after the division (the q41/q48 float rules), ties break on the
  * term string — the oracle replays every step. */
object Distinctive {

  /** Top-k distinctive terms per source: (source, rank, term, z_score,
    * y_source, y_rest). */
  def distinctiveTerms(docs: DataFrame, k: Int, a0: Double): DataFrame = {
    val toks = Par.widen(docs)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("t"))
    val yst = toks.groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("y_s"))
    val ns = yst.groupBy(col("source")).agg(sum(col("y_s")).as("n_s"))
    val yt = yst.groupBy(col("t")).agg(sum(col("y_s")).as("y_all"))
    val nTotal = yt.agg(sum(col("y_all")).as("n_all"))
    val scored = yst
      .join(yt, Seq("t"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(nTotal))
      .withColumn("a_t", lit(a0) * col("y_all").cast("double") / col("n_all").cast("double"))
      .withColumn("y_r", (col("y_all") - col("y_s")).cast("double"))
      .withColumn("n_r", (col("n_all") - col("n_s")).cast("double"))
      .withColumn("l_s", round(log(
        (col("y_s").cast("double") + col("a_t")) /
          (col("n_s").cast("double") + lit(a0) - col("y_s").cast("double") - col("a_t"))), 12))
      .withColumn("l_r", round(log(
        (col("y_r") + col("a_t")) /
          (col("n_r") + lit(a0) - col("y_r") - col("a_t"))), 12))
      .withColumn("z", round((col("l_s") - col("l_r")) /
        sqrt(lit(1.0) / (col("y_s").cast("double") + col("a_t")) +
             lit(1.0) / (col("y_r") + col("a_t"))), 12))
    val sub = pmod(xxhash64(col("t")), lit(64L))
    val w1 = Window.partitionBy(col("source"), sub).orderBy(col("z").desc, col("t"))
    val w2 = Window.partitionBy(col("source")).orderBy(col("z").desc, col("t"))
    scored
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= k)
      .withColumn("rank", row_number().over(w2).cast("long")).filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("t").as("term"),
        col("z").as("z_score"), col("y_s").as("y_source"),
        (col("y_all") - col("y_s")).as("y_rest"))
  }

  /** q175: top-5 Fightin'-Words terms per source, a0 = 100. */
  def q175DistinctiveTerms(s: SparkSession, dir: String): DataFrame =
    distinctiveTerms(Tables.documents(s, dir), k = 5, a0 = 100.0)
      .orderBy(col("source"), col("rank"))

  /** q188: ZIPF SLOPE per source — least-squares fit of ln(freq) on
    * ln(rank) over the top-`kTop` terms, plus the fit's r². Healthy
    * natural text follows Zipf's law with slope ≈ −1 and high r²; a
    * template farm or synthetic-data mode collapse flattens or bends
    * the head (the vocabulary-health signal next to q75's type/token
    * ratio — that one number, this the distribution SHAPE).
    *
    * Scale shape: one (source, term) count aggregate; the top-kTop
    * head comes from the q175 two-level hot-key-safe cut (a term in
    * the global per-source top-k is in its hash-sub-bucket's top-k, so
    * the second window ranks only ≤ k·64 survivors); the regression is
    * closed-form over ≤ kTop points per source — moments ride
    * rounded-product DECIMAL sums (the q34 recipe), one divide each at
    * the end. Determinism: ranks are exact integers with (freq DESC,
    * term) ties; ln's round 12 before any product. */
  def q188ZipfSlope(s: SparkSession, dir: String, kTop: Int = 100): DataFrame =
    zipfSlope(Tables.documents(s, dir), kTop)

  /** The reusable core over any (source, text) frame. */
  def zipfSlope(docs: DataFrame, kTop: Int = 100): DataFrame = {
    val toks = Par.widen(docs)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("t"))
    val tf = toks.groupBy(col("source"), col("t")).agg(count(lit(1)).as("f"))
    val sub = pmod(xxhash64(col("t")), lit(64L))
    val w1 = Window.partitionBy(col("source"), sub)
      .orderBy(col("f").desc, col("t"))
    val w2 = Window.partitionBy(col("source")).orderBy(col("f").desc, col("t"))
    val head = tf
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= kTop)
      .withColumn("r", row_number().over(w2).cast("long")).filter(col("r") <= kTop)
    val pts = head.select(col("source"),
      round(log(col("r").cast("double")), 12).as("x"),
      round(log(col("f").cast("double")), 12).as("y"))
    def dsum(c: Column) = sum(round(c, 12).cast("decimal(28,12)"))
    pts.groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
        dsum(col("x") * col("x")).as("sxx"),
        dsum(col("y") * col("y")).as("syy"),
        dsum(col("x") * col("y")).as("sxy"))
      .withColumn("num", col("n_terms") * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double"))
      .withColumn("dx", col("n_terms") * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double"))
      .withColumn("dy", col("n_terms") * col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double"))
      .select(col("source"), col("n_terms"),
        round(col("num") / col("dx"), 12).as("zipf_slope"),
        round(col("num") * col("num") / (col("dx") * col("dy")), 12).as("r2"))
      .orderBy(col("source"))
  }
}
