package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.exprs

/** Learning-to-rank feature extraction — the reranker-training data
  * prep: for each first-stage candidate (q58 BM25 over the corpus for
  * a probe document's terms), one row of the classic feature set a
  * cross-encoder distillation or GBDT reranker trains on — lexical
  * score + rank, dense cosine, n-gram Jaccard, length ratio — plus the
  * near-dup flag (the q36 bar) as a weak supervision column.
  *
  * Every feature reuses an audited recipe: BM25 = q58's scorer
  * verbatim; cosine = the q36/q151 decimal-exact two-norm form with
  * the zero-norm NULL rule; Jaccard = exact set counts over in-row
  * distinct 3-gram arrays (the q149 gram generator — intersection via
  * `array_intersect` on already-distinct arrays, union by
  * inclusion–exclusion, so both engines compare the same integers);
  * ratios are single IEEE divides of exact longs, round-9 (the q45
  * rule).
  *
  * Scale shape: the candidate set is ≤ k rows after q58's bounded
  * top-k — every feature join BROADCASTS the candidates against one
  * corpus-side pruned scan (docs for grams, embeddings for cosine);
  * nothing pair-scale ever forms. */
object Ltr {

  /** q157: top-30 BM25 candidates for probe doc 0, featurized. */
  def q157LtrFeatures(s: SparkSession, dir: String): DataFrame =
    ltrFeatures(Tables.documents(s, dir), Tables.embeddings(s, dir),
      probeId = 0L, k = 30)

  def ltrFeatures(docs: DataFrame, emb: DataFrame, probeId: Long,
                  k: Int): DataFrame = {
    val terms = docs.filter(col("doc_id") === probeId)
      .select(array_sort(array_distinct(TextAnalysis.tokens(col("text")))).as("t"))
      .head().getSeq[String](0)
    require(terms.nonEmpty, s"probe doc $probeId has no tokens")

    val cands = Retrieval.bm25TopK(docs.filter(col("doc_id") =!= probeId),
        terms, k)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rank"), col("n_tokens"),
        col("score").as("bm25"))

    // probe-side lexical profile: one row, broadcast
    val probeLex = broadcast(docs.filter(col("doc_id") === probeId)
      .select(
        array_distinct(Boilerplate.gramArrCol(
          TextAnalysis.tokens(col("text")), 3)).as("pg"),
        TextAnalysis.tokenCount(col("text")).as("pn")))

    val lex = docs.select(col("doc_id"), col("text"))
      .join(broadcast(cands), "doc_id")
      .withColumn("cg", array_distinct(Boilerplate.gramArrCol(
        TextAnalysis.tokens(col("text")), 3)))
      .crossJoin(probeLex)
      .withColumn("inter", size(array_intersect(col("cg"), col("pg"))).cast("long"))
      .withColumn("uni",
        size(col("cg")).cast("long") + size(col("pg")).cast("long") - col("inter"))
      .select(col("doc_id"), col("rank"), col("bm25"),
        when(col("uni") === 0L, lit(0.0))
          .otherwise(round(col("inter").cast("double") /
            col("uni").cast("double"), 9)).as("jaccard"),
        round(col("n_tokens").cast("double") / col("pn").cast("double"), 9)
          .as("len_ratio"))

    // dense feature: decimal-exact cosine to the probe vector over the
    // ≤ k candidate embeddings only; zero-norm on either side → NULL
    val probeVec = broadcast(emb.filter(col("vec_id") === probeId)
      .select(col("embedding").as("qe")))
    val cos = emb.join(broadcast(cands.select(col("doc_id"))),
        col("vec_id") === col("doc_id"))
      .crossJoin(probeVec)
      .withColumn("fcos", exprs.cosine_similarity(col("qe"), col("embedding")))
      .filter(!isnan(col("fcos")))
      .select(col("doc_id"),
        round(Similarity.decCosine(col("qe"), col("embedding")), 12).as("cos"))

    lex.join(cos, Seq("doc_id"), "left")
      .withColumn("near_dup", coalesce(col("cos") >= 0.45, lit(false)))
      .select(col("doc_id"), col("rank"), col("bm25"), col("jaccard"),
        col("len_ratio"), col("cos"), col("near_dup"))
      .orderBy(col("doc_id"))
  }
}
