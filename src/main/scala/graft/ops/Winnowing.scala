package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD'03 — the MOSS algorithm): hash every word k-gram, slide a
  * w-window over the hash sequence and keep each window's minimum —
  * a POSITION-AWARE fingerprint set that (unlike MinHash's global
  * signature) guarantees any shared run of ≥ w+k−1 tokens leaves at
  * least one common fingerprint, while storing only ~2/(w+1) of the
  * grams. The local-similarity complement to q25/q26: MinHash answers
  * "are these documents mostly the same?", winnowing answers "do they
  * share any sufficiently long passage?" — the plagiarism/quotation/
  * boilerplate-detection read. Reference scope note: the reference
  * engine has no similarity surface; this extends the dedup family.
  *
  * Scale shape: gram hashing AND window-min selection are both IN-ROW
  * (`transform` over the token array — the q25 shingle discipline), so
  * the corpus never shuffles until fingerprints explode into the
  * inverted index; the pair join is the q25 machinery — stop-
  * fingerprint df cap bounding per-key fan-out at cap², in-row pair
  * building from sorted posting lists. Selection density is
  * 2/(w+1) ≈ 0.22 at w=8, so the index is ~5× smaller than the full
  * gram index for the same guarantee window.
  *
  * Determinism: fingerprints are 60-bit integers from the md5 prefix
  * (conv of the first 15 hex chars — Spark and DuckDB md5/hex-parse
  * agree bit-for-bit; numeric window-min costs 8 long compares where
  * the hex-string form cost 8×32-char compares, a measured 2.4×
  * win on the selection pass), and because the fingerprint SET keeps
  * the hash (not the position), the classic rightmost-vs-leftmost tie
  * rule cannot change the output: tied minima are the same value, and
  * the set dedups them. Windows shorter than w at the sequence head
  * select from the available prefix (the "robust" boundary
  * convention), keeping every document with ≥ 1 gram represented.
  * Similarity is a ratio of exact integer set sizes. 60-bit
  * collisions at a 10⁹-gram corpus run ~10⁻¹ birthday mass — noise
  * well under the df-cap's own candidate slack for a detector whose
  * verdict is a set-overlap ratio, not an identity proof. */
object Winnowing {

  /** Per-document winnowing fingerprint set over word k-grams with
    * window w, fully narrow: (doc_id, f) rows, `f` = selected 60-bit
    * md5-prefix hash. Docs shorter than k tokens produce none. */
  def fingerprints(docs: DataFrame, k: Int, w: Int): DataFrame = {
    // hashing + window minima run in ONE codegen'd kernel call per doc
    // (graft.functions.WinnowFingerprints) — the equivalent
    // transform/sequence/array_min HOF chain is CodegenFallback and
    // paid an interpreted tree walk per gram (9.6 s → 0.5 s at sf0.1)
    Par.widen(docs)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("l"))
      .select(col("doc_id"),
        explode(graft.functions.exprs.winnow_fingerprints(col("l"), k, w)).as("f"))
  }

  /** All-pairs fingerprint-set similarity ≥ threshold via the q25
    * inverted-index machinery: stop-fingerprint cap (df ≤ maxDocFreq)
    * bounds hot-key fan-out, pair counts build in-row from sorted
    * posting lists, sizes are the CAPPED per-doc set sizes (similarity
    * over the informative fingerprints — the q25 convention). */
  def winnowPairs(docs: DataFrame, k: Int, w: Int, threshold: Double,
                  maxDocFreq: Long): DataFrame = {
    // localCheckpoint, not cache(): the frame is read by the stop-list agg
    // AND the capped join, and checkpoint blocks are released with the plan
    // reference — a cache() here leaked one cached frame per invocation
    // (4-pass bench medians, soak, tests) until LRU eviction
    val fp = fingerprints(docs, k, w).withColumnRenamed("f", "g").localCheckpoint()
    val stop = fp.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq).select(col("g"))
    val capped = fp.join(broadcast(stop), Seq("g"), "left_anti")
    val sizes = capped.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    Dedup.coGroupedPairCounts(capped)
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .withColumn("winnow_sim",
        col("c").cast("double") /
          (col("s1.n") + col("s2.n") - col("c")).cast("double"))
      .filter(col("winnow_sim") >= threshold)
      .select(col("d1"), col("d2"), col("c").as("n_common"), col("winnow_sim"))
      .orderBy(col("d1"), col("d2"))
  }

  /** q190: k=3, w=8 winnowing pairs at similarity ≥ 0.5 with the
    * production stop cap (df ≤ 50) — the declared query IS the scale
    * path, exactly as q25. */
  def q190Winnowing(s: SparkSession, dir: String): DataFrame =
    winnowPairs(Tables.documents(s, dir), 3, 8, 0.5, 50L)
}
