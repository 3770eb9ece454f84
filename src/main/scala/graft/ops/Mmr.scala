package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein,
  * SIGIR'98): greedily pick k results maximizing
  * λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) — the diversity re-rank every
  * retrieval stack runs between the scorer and the user (or the RAG
  * context builder: q156 packs top-k by relevance alone; MMR spends
  * the same budget without near-duplicate passages). Relevance is
  * q58's BM25 (max-normalized), similarity the q28 engine-portable
  * embedding cosine.
  *
  * Scale shape: the corpus work is EXACTLY q58's top-k₁ (inverted
  * pre-pruned postings, TakeOrdered) plus one k₁-row embedding join;
  * the greedy loop runs on the DRIVER over the collected k₁ scores
  * and k₁² /2 pairwise cosines (k₁ = 30 → 435 pairs — bounded by
  * construction, the PAV/≤64-anchor precedent), with the cosine
  * matrix computed IN SPARK by the decimal-exact recipe so driver
  * arithmetic only compares values both engines already agree on.
  * At 100 TB nothing changes: k₁ is a knob, the corpus cost is the
  * retrieval, and the greedy stays O(k·k₁).
  *
  * Determinism: rel = round(score/max, 12); cosines round-12; each
  * MMR score = round(λ·rel − (1−λ)·maxsim, 6) (HALF_UP — Spark/
  * DuckDB/BigDecimal agree away-from-zero on halves); selection
  * ties break to the smaller doc_id. The oracle replays the greedy
  * as k unrolled CTE steps (the q68 iterCtes precedent). */
object Mmr {

  /** q203: MMR top-10 from the BM25 top-30 for the standard workload
    * query, λ = 0.7: (rank, doc_id, rel, mmr_score). */
  def q203MmrRerank(s: SparkSession, dir: String): DataFrame =
    mmrRerank(Tables.documents(s, dir), Tables.embeddings(s, dir),
      Seq("spark", "vector", "merge", "window"), 30, 10, 0.7)

  def mmrRerank(docs: DataFrame, emb: DataFrame, query: Seq[String],
                k1: Int, k: Int, lam: Double): DataFrame = {
    val s = docs.sparkSession
    val cands = Retrieval.bm25TopK(docs, query, k1)
      .select(col("doc_id"), col("score"))
    val mx = cands.agg(max(col("score")).as("m"))
    val rel = cands.crossJoin(broadcast(mx))
      .select(col("doc_id"), round(col("score") / col("m"), 12).as("rel"))
    // candidates must carry an embedding (inner join — the oracle
    // mirrors; this corpus embeds every doc)
    val we = rel.join(
        emb.select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"))
      .localCheckpoint() // read by the matrix AND the rel collect
    val relArr = we.select(col("doc_id"), col("rel"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val a = we.select(col("doc_id").as("d1"), col("embedding").as("ea"))
    val b = we.select(col("doc_id").as("d2"), col("embedding").as("eb"))
    val cosm = a.join(broadcast(b), col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        round(Similarity.decCosine(col("ea"), col("eb")), 12).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def cos(x: Long, y: Long): Double =
      cosm.getOrElse(if (x < y) (x, y) else (y, x), 0.0)
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val selected = mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val remaining = mutable.LinkedHashMap(relArr.sortBy(_._1): _*)
    while (selected.size < k && remaining.nonEmpty) {
      val pick = remaining.iterator.map { case (d, r) =>
        val ms = if (selected.isEmpty) 0.0
          else selected.iterator.map(sel => cos(d, sel._1)).max
        (d, r, r6(lam * r - (1 - lam) * ms))
      }.minBy { case (d, _, m) => (-m, d) }
      selected += pick
      remaining -= pick._1
    }
    import s.implicits._
    selected.zipWithIndex
      .map { case ((d, r, m), i) => ((i + 1).toLong, d, r, m) }.toSeq
      .toDF("rank", "doc_id", "rel", "mmr_score")
      .orderBy(col("rank"))
  }
}
