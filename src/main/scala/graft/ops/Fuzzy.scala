package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fuzzy (edit-distance) dedup — the near-exact tier between exact
  * dedup (q24: byte-identical only) and shingle Jaccard (q25: robust
  * but blind to sub-token edits): titles, questions, and boilerplate
  * variants that differ by a typo or one appended character are the
  * classic miss of both. Classic blocked Levenshtein:
  *
  *  1. a deterministic short key per doc (here a title slice);
  *  2. BLOCK on a tweak-stable sub-slice — candidate pairs only form
  *     inside a block, which is what keeps the quadratic local;
  *  3. per-block self-join + exact Levenshtein, keep `dist <= maxDist`.
  *
  * Scale shape: the title/block derivation is a narrow codegen'd map;
  * the self-join shuffles ONCE on the block key; pair volume is
  * sum(|block|²) and the `maxBlock` cap drops any hot block (a
  * boilerplate prefix shared by millions of docs) on BOTH the engine
  * and the oracle — the q25 stop-shingle rule. `levenshtein` is
  * Spark's codegen'd built-in (unit-cost DP, identical to DuckDB's),
  * evaluated only on in-block pairs, never all-pairs. A production
  * corpus would block on several redundant slices (multi-pass
  * blocking) exactly as LSH uses multiple bands; one stable slice is
  * the single-band instance with the same plumbing.
  */
object Fuzzy {

  /** The deterministic near-identical fixture key: a 32-char title
    * slice, tweaked by doc id — `%5 == 1` replaces the first char,
    * `%5 == 2` appends one — so docs sharing identical text yield
    * titles at edit distance 1-2 (found), while distinct texts stay
    * far apart (filtered by the distance bound). */
  def fuzzyTitle(docId: Column, text: Column): Column = {
    val base = substring(text, 1, 32)
    when(docId % 5 === 1, concat(lit("x"), substring(text, 2, 31)))
      .when(docId % 5 === 2, concat(base, lit("q")))
      .otherwise(base)
  }

  /** Blocked edit-distance pairs over any (doc_id, title) frame:
    * `(d1 < d2, dist <= maxDist)` within tweak-stable blocks of at
    * most `maxBlock` members. */
  def fuzzyPairs(titled: DataFrame, maxDist: Int, maxBlock: Long): DataFrame = {
    // chars 9..16 are untouched by either tweak (replace-first /
    // append-last), so true near-dups land in one block
    val b = titled.withColumn("blk", substring(col("title"), 9, 8))
    val okBlocks = b.groupBy(col("blk")).count()
      .filter(col("count") <= maxBlock).select(col("blk"))
    val sized = b.join(okBlocks, Seq("blk"))
    val l = sized.select(col("blk"), col("doc_id").as("d1"), col("title").as("t1"))
    val r = sized.select(col("blk"), col("doc_id").as("d2"), col("title").as("t2"))
    l.join(r, Seq("blk"))
      .filter(col("d1") < col("d2"))
      .withColumn("dist", levenshtein(col("t1"), col("t2")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("d1"), col("d2"), col("dist"))
  }

  /** q109: fuzzy-dedup pairs over the documents corpus (dist ≤ 2,
    * block cap 64), oracle-ordered. */
  def q109FuzzyDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val titled = docs.select(col("doc_id"),
      fuzzyTitle(col("doc_id"), col("text")).as("title"))
    fuzzyPairs(titled, maxDist = 2, maxBlock = 64L)
      .orderBy(col("d1"), col("d2"))
  }

  /** One blocked pass over a frame already carrying `blk`: cap hot
    * blocks, self-join within blocks, exact Levenshtein ≤ maxDist. */
  private def blockedPass(b: DataFrame, maxDist: Int, maxBlock: Long): DataFrame = {
    val okBlocks = b.groupBy(col("blk")).count()
      .filter(col("count") <= maxBlock).select(col("blk"))
    val sized = b.join(okBlocks, Seq("blk"))
    val l = sized.select(col("blk"), col("doc_id").as("d1"), col("title").as("t1"))
    val r = sized.select(col("blk"), col("doc_id").as("d2"), col("title").as("t2"))
    l.join(r, Seq("blk"))
      .filter(col("d1") < col("d2"))
      .withColumn("dist", levenshtein(col("t1"), col("t2")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("d1"), col("d2"), col("dist"))
  }

  /** Multi-pass blocking — the scaladoc note above, WIRED: `maxDist+1`
    * disjoint title slices, one blocked pass per slice, results
    * unioned and deduped by a (d1, d2) min-dist aggregate. The
    * pigeonhole guarantee (the aHash-band argument): ≤ `maxDist`
    * SUBSTITUTIONS can disturb at most `maxDist` of the `maxDist+1`
    * slices, so some slice matches exactly and the pair is found —
    * EXACT recall for substitution edits inside the sliced region;
    * insertions/deletions shift downstream slices and recall for them
    * stays heuristic (the honest limit of positional blocking — q25's
    * shingles handle indel-heavy text). Each pass is the q109 plan:
    * one shuffle on its block key, per-block quadratic capped, so the
    * union is `maxDist+1` bounded passes, never all-pairs. */
  def multiBlockPairs(titled: DataFrame, maxDist: Int, maxBlock: Long,
                      slicedWidth: Int = 30): DataFrame = {
    val nSlices = maxDist + 1
    val sliceLen = slicedWidth / nSlices
    (0 until nSlices).map { i =>
      blockedPass(
        titled.withColumn("blk",
          concat(lit(s"$i:"), substring(col("title"), i * sliceLen + 1, sliceLen))),
        maxDist, maxBlock)
    }.reduce(_.unionByName(_))
      .groupBy(col("d1"), col("d2")).agg(min(col("dist")).as("dist"))
  }

  /** q122's fixture key: [[fuzzyTitle]] plus a MID-title substitution
    * (`%5 == 3` replaces char 12) that lands inside q109's single
    * block slice (chars 9–16) — the tweak single-pass blocking
    * provably misses and the multi-pass pigeonhole must catch. */
  def fuzzyTitle2(docId: Column, text: Column): Column =
    when(docId % 5 === 3,
      concat(substring(text, 1, 11), lit("m"), substring(text, 13, 20)))
      .otherwise(fuzzyTitle(docId, text))

  /** q122: multi-pass blocked fuzzy dedup (3 slices, dist ≤ 2, cap 64)
    * over the mid-tweak title key. */
  def q122MultiBlockFuzzy(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val titled = docs.select(col("doc_id"),
      fuzzyTitle2(col("doc_id"), col("text")).as("title"))
    multiBlockPairs(titled, maxDist = 2, maxBlock = 64L)
      .orderBy(col("d1"), col("d2"))
  }
}
