package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sliding token-window chunking — the context-window preparation step:
  * long documents are cut into fixed-length overlapping token windows
  * (max `maxLen` tokens, stride `stride`, so consecutive chunks share
  * `maxLen - stride` tokens), the shape embedding models and
  * fixed-context trainers consume. Complements q42 (sequence PACKING
  * concatenates short docs; chunking SPLITS long ones).
  *
  * Scale shape: pure per-row codegen'd expressions — tokenize once,
  * explode a `sequence(0, n_chunks-1)` per document, slice the token
  * array per chunk. No shuffle anywhere (the output explode is narrow);
  * at 100 TB this is a single map stage fused into the scan, and the
  * per-row state is O(doc tokens) — the row already carried the text.
  *
  * Chunk count is exact integer arithmetic:
  * `1 + max(0, ceil((n - maxLen) / stride))` — the last window may be
  * short (clamped slice), every token lands in ≥ 1 chunk, and a doc
  * with ≤ maxLen tokens yields exactly one chunk. Blank docs (0 tokens)
  * yield zero chunks. chunk_md5 fingerprints each window's joined text
  * (the q23 fingerprint idiom), so downstream chunk-level dedup is one
  * groupBy away.
  */
object Chunking {

  /** q59: chunk the corpus into ≤64-token windows with stride 48. */
  def q59Chunking(s: SparkSession, dir: String,
                  maxLen: Int = 64, stride: Int = 48): DataFrame =
    chunk(Tables.documents(s, dir), maxLen, stride)

  /** The reusable core over any (doc_id, text) frame. */
  def chunk(docs: DataFrame, maxLen: Int, stride: Int): DataFrame =
    chunkUnsorted(docs, maxLen, stride)
      .orderBy(col("doc_id"), col("chunk_id"))

  /** `chunk` without the deterministic output sort — the streaming
    * entry point (streaming sinks reject sorts and don't need them). */
  def chunkUnsorted(docs: DataFrame, maxLen: Int, stride: Int): DataFrame = {
    require(maxLen > 0 && stride > 0 && stride <= maxLen,
      s"need 0 < stride <= maxLen, got maxLen=$maxLen stride=$stride")
    // widening inspects input files — batch-only; a micro-batch's
    // parallelism is the source's to decide
    (if (docs.isStreaming) docs else Par.widen(docs))
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("l"))
      .withColumn("n", size(col("l")).cast("long"))
      .filter(col("n") >= 1L)
      .withColumn("n_chunks",
        lit(1L) + when(col("n") > maxLen,
          expr(s"(n - $maxLen + ${stride - 1}) DIV $stride")).otherwise(lit(0L)))
      .select(col("doc_id"), col("n"), col("l"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_id"))
      .withColumn("chunk_start", col("chunk_id") * stride + 1L)
      .withColumn("chunk_len", least(lit(maxLen.toLong), col("n") - col("chunk_id") * stride))
      .withColumn("chunk_md5",
        md5(array_join(slice(col("l"), col("chunk_start").cast("int"), lit(maxLen)), " ")))
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
        col("chunk_len"), col("chunk_md5"))
  }
}
