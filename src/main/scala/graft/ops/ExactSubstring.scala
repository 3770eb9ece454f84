package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** VERIFIED-exact substring dedup at Lee-et-al scale minimum match
  * length (ExactSubstr, "Deduplicating Training Data Makes Language
  * Models Better", ACL'22) — the long-run upgrade of the q70/q82
  * char-gram family:
  *
  *  - CANDIDATES from the O(n) rolling kernel
  *    ([[graft.functions.TextWindowOps]]): every length-L code-point
  *    window hashed in ONE pass per document, so L=50..200 costs the
  *    same scan as L=20 — where q70's in-row
  *    `substring → md5 → conv` chain pays O(n·L) interpreted
  *    expression work and materializes L× the corpus bytes in-row.
  *  - EXACT VERIFY on the candidates only: duplicated-hash positions
  *    re-extract their actual window (`substring`, code-point
  *    positions — the kernel hashed exactly these) and must agree
  *    with ≥ 2 occurrences on the STRING value. Equal strings always
  *    collide on the rolling hash, so no true duplicate is lost; a
  *    hash collision is dropped by the verify — the span output is
  *    exact, not approximately-exact, unlike fixed-width-hash q70
  *    (where the 52-bit space makes a false span astronomically rare
  *    but not impossible).
  *
  * Why not a distributed suffix array (the other route to the same
  * primitive): prefix doubling needs ⌈log₂ L⌉ corpus-wide rank+sort
  * shuffle rounds to expose length-≥L repeats; the window form finds
  * the identical maximal spans (a duplicated substring of length ≥ L
  * covers exactly the positions whose L-window duplicates) with one
  * narrow scan + one hash shuffle + a candidates-only verify join.
  * On Spark the shuffle count IS the cost model — the window form is
  * the same semantics at 1/⌈log₂ L⌉ the exchanges, and the verify
  * side stays proportional to the true duplicate volume, not the
  * corpus.
  *
  * Scale shape: the hash aggregate is map-side combined; the
  * dup-hash join is 1:N semi (a boilerplate window skews a reducer
  * but cannot blow up pairs — AQE skew split absorbs it); the verify
  * join re-reads text for candidate DOCS only; the span-merge window
  * partitions by doc_id (per-key work bounded by document length,
  * the same bound as the text column itself). Nothing corpus-sized
  * reaches the driver. */
object ExactSubstring {

  /** Verified duplicated window positions: (doc_id, pos), pos
    * 1-indexed code points, each the start of a length-L window whose
    * exact string occurs ≥ 2 times in the corpus (self-repeats
    * count). */
  private[ops] def verifiedHits(docs: DataFrame, L: Int): DataFrame = {
    val t = Par.widen(docs).select(col("doc_id"), col("text"))
    val hashed = t.select(col("doc_id"),
        posexplode(graft.functions.exprs.substr_window_hashes(col("text"), L)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("h"))
    val dupH = hashed.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("h"))
    val cand = hashed.join(dupH, Seq("h"), "left_semi")
    // exact verify: candidates re-extract their window STRING and must
    // still duplicate on the value — collision-proof by construction
    val winCol = cand.join(t, Seq("doc_id"))
      .select(col("doc_id"), col("pos"),
        expr(s"substring(text, CAST(pos AS INT), $L)").as("win"))
    val dupWin = winCol.groupBy(col("win")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("win"))
    winCol.join(dupWin, Seq("win"), "left_semi")
      .select(col("doc_id"), col("pos"))
  }

  /** Maximal verified duplicated spans per document: (doc_id,
    * span_start, span_len, n_windows); span_len covers [span_start,
    * last_window_start + L). Overlapping/adjacent windows merge (gap
    * ≤ L between consecutive duplicated starts). */
  def exactSubstringSpans(docs: DataFrame, L: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hits = verifiedHits(docs, L)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val lagPos = lag(col("pos"), 1).over(w)
    hits
      .withColumn("brk",
        when(lagPos.isNull || col("pos") - lagPos > L, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + L - min(col("pos"))).as("span_len"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_len"),
        col("n_windows"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** q207: the verified-exact duplicated-span table at L=50 — the Lee
    * et al. minimum match length, 2.5× q70's gram window, priced at
    * the same single scan by the rolling kernel. */
  def q207ExactSubstring(s: SparkSession, dir: String, L: Int = 50): DataFrame =
    exactSubstringSpans(Tables.documents(s, dir), L)
}
