package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** RAG context assembly — the retrieval-side dataflow every
  * retrieval-augmented-generation stack runs per query: chunk the
  * corpus with overlap (q59's sliding windows), rank chunks by BM25
  * (q58's posting-pruned scorer, chunks as the retrieval unit), and
  * PACK the ranked chunks into a context-window token budget in rank
  * order — the emitted manifest (rank, source doc, offsets, running
  * token total) is exactly what gets pasted in front of the prompt.
  *
  * Packing rule: the ranked PREFIX whose running token total stays
  * within the budget — rank order is relevance order, and a cumulative
  * window over ≤ k rows decides membership (deterministic, replayable;
  * the skip-and-continue greedy variant is a knob a caller can build
  * from the same ranked frame).
  *
  * Scale shape: chunking is q59's in-row explode (corpus-linear);
  * chunk BM25 is q58's dataflow over the chunk frame unchanged —
  * postings pre-pruned in-row, |query|-row dfreq, 1-row totals,
  * `TakeOrderedAndProject` top-k; everything after the top-k cut
  * touches ≤ k rows. The chunk key packs (doc_id, chunk_id) into one
  * long — a corpus is re-chunked, never re-keyed, so the synthetic key
  * only needs to be collision-free per run (guarded). */
object Rag {

  private val ChunkKeyBase = 100000L

  /** q156: ±48-stride 64-token chunks, BM25 top-40 for the fixed query
    * set, packed into a 512-token context budget. */
  def q156RagContext(s: SparkSession, dir: String): DataFrame =
    ragContext(Tables.documents(s, dir),
      query = Seq("spark", "vector", "merge", "window"),
      maxLen = 64, stride = 48, k = 40, tokenBudget = 512)

  /** The reusable core over any (doc_id, text) frame. */
  def ragContext(docs: DataFrame, query: Seq[String], maxLen: Int,
                 stride: Int, k: Int, tokenBudget: Long): DataFrame = {
    // chunks as retrieval units: q59's window arithmetic, keeping the
    // chunk's own token slice as its "text"
    val chunks = Par.widen(docs)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("l"))
      .withColumn("n", size(col("l")).cast("long"))
      .filter(col("n") >= 1L)
      .withColumn("n_chunks",
        lit(1L) + when(col("n") > maxLen,
          expr(s"(n - $maxLen + ${stride - 1}) DIV $stride")).otherwise(lit(0L)))
      .select(col("doc_id"), col("l"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_id"))
      // the packed long key feeding q58's (doc_id, text) contract;
      // assert_true fails loudly instead of colliding silently
      .withColumn("chunk_id", coalesce(
        assert_true(col("chunk_id") < ChunkKeyBase,
          concat(lit("chunk_id overflows key base: "), col("chunk_id")))
          .cast("long"), col("chunk_id")))
      .select(
        (col("doc_id") * ChunkKeyBase + col("chunk_id")).as("doc_id"),
        array_join(slice(col("l"),
          (col("chunk_id") * stride + 1L).cast("int"), lit(maxLen)), " ")
          .as("text"))

    val ranked = Retrieval.bm25TopK(chunks, query, k)
      // ≤ k rows from here on: limited-frame windows, the benign shape
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens"))
        .over(Window.orderBy(col("rank"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ranked.filter(col("cum_tokens") <= tokenBudget)
      .select(col("rank"),
        expr(s"doc_id DIV $ChunkKeyBase").as("src_doc_id"),
        pmod(col("doc_id"), lit(ChunkKeyBase)).cast("long").as("chunk_id"),
        col("n_tokens"), col("cum_tokens").cast("long").as("cum_tokens"),
        col("score"))
      .orderBy(col("rank"))
  }
}
