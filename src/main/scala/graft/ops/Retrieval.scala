package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Full-text retrieval over the corpus — the data-curation tool behind
  * "find the documents most similar to this benchmark prompt" and
  * targeted-quality audits: BM25, the standard lexical ranking function
  * (Robertson et al., TREC-3; the Lucene/Elasticsearch default).
  *
  * Scale shape (the inverted-index dataflow, pre-pruned in-row):
  *  - each doc's token array is filtered to the query's terms IN-ROW
  *    (one codegen'd array scan) BEFORE the explode, so the Generate
  *    emits only matching postings — O(query hits), not O(corpus
  *    tokens). Measured at the 100× soak (500k docs, 74M tokens):
  *    explode-then-filter cost 40 s; a fully in-row variant (4
  *    `size(filter(...))` per doc per pass, no explode) cost 69 s —
  *    repeated array scans beat the explode only when the hit rate is
  *    far lower; filter-then-explode wins at 11–12 s (isolated / under
  *    soak load) by paying ONE array scan and generating 36× fewer rows;
  *  - document frequencies and the corpus totals are |query|-row and
  *    1-row aggregates, attached as broadcasts (no second corpus pass
  *    for dl: the doc-length rides WITH each posting row). dfreq's
  *    lineage textually repeats the tf aggregation, but ReuseExchange
  *    dedupes the identical exchange at runtime — folding dfreq and the
  *    totals into one up-front stats pass was measured at 29–35 s
  *    (2.5× WORSE: the combined pass defeats column pruning and runs
  *    the interpreted HOF filter over every row twice);
  *  - the final top-k is `ORDER BY ... LIMIT k` — Spark plans
  *    TakeOrderedAndProject (per-partition heaps + k-row driver merge),
  *    never a global sort.
  *  - at 100 TB a STANDING retrieval workload would move to a
  *    write-time posting-list layout (the q29 bucketed pattern);
  *    scan-time BM25 is the right shape for ad-hoc curation queries.
  *
  * Determinism (the q41/q48 float rules): idf and each per-term partial
  * score are `round(..., 12)` — both engines' `ln` may differ in final
  * ulps — and the per-doc sum runs over DECIMAL(28,12), exact and
  * order-free; everything else is IEEE-754 arithmetic on exact integer
  * inputs in an identical operation order, so the oracle hash-matches.
  */
object Retrieval {

  /** BM25 free parameters (the standard defaults). K1+1 and 1-B are
    * spelled as DECIMAL LITERALS, not computed: `1.2 + 1.0` in binary
    * can round to a different double than parsing "2.2", and the oracle
    * parses literals — computing them here would drift the last ulp. */
  val K1 = 1.2
  val B  = 0.75
  val K1Plus1   = 2.2
  val OneMinusB = 0.25

  /** q58: BM25 top-k — rank documents against a fixed query-term set.
    * Emits one row per retrieved document (the k best by score, ties by
    * doc_id), with its score, matched-term count and token length. */
  def q58Bm25(s: SparkSession, dir: String,
              query: Seq[String] = Seq("spark", "vector", "merge", "window"),
              k: Int = 20): DataFrame =
    bm25TopK(Tables.documents(s, dir), query, k)

  /** The reusable core over any (doc_id, text) frame. */
  def bm25TopK(docs: DataFrame, query: Seq[String], k: Int): DataFrame = {
    require(query.nonEmpty, "empty query")
    val d = Par.widen(docs)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("l"))
      .select(col("doc_id"), size(col("l")).cast("long").as("dl"), col("l"))

    // Corpus totals: one 1-row aggregate, broadcast into the scorer.
    val totals = d.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_total"))

    // Postings of the QUERY terms only, pre-pruned in-row: the token
    // array is filtered BEFORE the explode, so only hits become rows.
    // dl rides along (it is functionally dependent on doc_id).
    val qArr = array(query.map(lit(_)): _*)
    val tf = d
      .select(col("doc_id"), col("dl"),
        explode(filter(col("l"), x => array_contains(qArr, x))).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

    // Document frequency per query term: ≤ |query| rows.
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val tfD = col("tf").cast("double")
    val dlD = col("dl").cast("double")
    val avgdl = col("n_total").cast("double") / col("n_docs").cast("double")
    val idf = round(log(
      (col("n_docs").cast("double") - col("df").cast("double") + 0.5) /
        (col("df").cast("double") + 0.5) + 1.0), 12)

    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(totals))
      .withColumn("part", round(
        idf * (tfD * K1Plus1) /
          (tfD + lit(K1) * (lit(OneMinusB) + lit(B) * dlD / avgdl)), 12)
        .cast("decimal(28,12)"))
      .groupBy(col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("part")).as("sc"))
      .select(col("doc_id"), col("dl").as("n_tokens"), col("n_hit_terms"),
        col("sc").cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .orderBy(col("doc_id"))
  }
}
