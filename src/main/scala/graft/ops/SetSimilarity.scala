package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** EXACT all-pairs set-similarity join via prefix filtering (Bayardo,
  * Ma & Srikant, "Scaling Up All Pairs Similarity Search", WWW 2007 —
  * the AllPairs/PPJoin family). The exactness upgrade of q25: the
  * capped inverted index there trades recall on hot shingles for a
  * bounded join; prefix filtering gets EVERY pair with Jaccard ≥ t
  * while still never joining on a common token.
  *
  * The theorem: order the token universe by any fixed total order
  * (rarest-first is the effective one) and keep only each set's first
  * `|x| − ⌈t·|x|⌉ + 1` tokens (its *prefix*). Two sets with
  * `J(x,y) ≥ t` MUST share a token within their prefixes — if all
  * shared tokens sat past both prefixes, the intersection would be at
  * most `min(⌈t|x|⌉, ⌈t|y|⌉) − 1 < t/(1+t)·(|x|+|y|)`, contradicting
  * `J ≥ t`. So the inverted index is built over prefixes only, and
  * rarest-first makes those posting lists the SHORT ones by
  * construction: a boilerplate shingle shared by millions of docs
  * sorts to the back of every set and never enters the index. Hot-key
  * fan-out is thus bounded by data statistics, not by a cap that
  * costs recall.
  *
  * Scale shape: one shuffle for global df, one for the per-doc sorted
  * arrays, one equi-join on prefix tokens over (token, id) rows ONLY —
  * arrays never ride the candidate join (measured dead end: an in-row
  * exactly-once ownership rule needs both prefix arrays in every
  * exploded row, which duplicated ~3 KB per prefix token and OOMed the
  * 100× soak; the groupBy dedup over 16-byte id pairs replaced it).
  * Verification joins the two sorted arrays back once per surviving
  * candidate and intersects in-row. Worst case (a corpus of identical
  * docs) degrades to the true output size, which is what "exact"
  * costs; for that regime use q25/q26's capped/banded paths.
  */
object SetSimilarity {

  /** Exact Jaccard-≥-t pairs over `(id, toks)` where `toks` is a
    * distinct-element set. Output: `(d1, d2, inter, jac)` with
    * `d1 < d2`, `jac` rounded to 6 for stable hashing (the threshold
    * compares the unrounded double). */
  def prefixFilterJoin(docSets: DataFrame, t: Double): DataFrame = {
    require(t > 0 && t <= 1, s"threshold in (0,1]: $t")
    val sets = docSets.toDF("id", "toks").filter(size(col("toks")) >= 1)
    val exploded = sets.select(col("id"), explode(col("toks")).as("tok"))
    val dfCounts = exploded.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // per-doc array sorted rarest-first; the struct's (df, tok) field
    // order IS the global total order (sort_array is lexicographic on
    // struct fields, ties broken by the token text)
    val ranked = exploded.join(dfCounts, "tok")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("arr"))
      .withColumn("n", size(col("arr")))
      .withColumn("plen",
        (col("n") - ceil(lit(t) * col("n")) + 1).cast("int"))
      .withColumn("pre", slice(col("arr"), lit(1), col("plen")))
    // SKINNY candidate generation: only (token, id) rides the prefix
    // explode and the self-join — never the arrays. (The first cut
    // carried each doc's full struct array through the explode for an
    // in-row exactly-once rule; at the 100× soak that duplicated ~3 KB
    // of array per prefix row — tens of GB on the shuffle — and OOMed.
    // A groupBy over the candidate ids dedups multi-token collisions at
    // 16 bytes/row instead, and the arrays join back exactly once per
    // SURVIVING candidate pair.)
    val prefixIdx = ranked.select(col("id"), explode(col("pre")).as("p"))
    val cands = prefixIdx.toDF("a_id", "p")
      .join(prefixIdx.toDF("b_id", "p"), Seq("p"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(first(lit(1)).as("__one"))
    val arrays = ranked.select(col("id"), col("arr"), col("n"))
    val pairs = cands
      .join(arrays.select(col("id").as("a_id"), col("arr").as("a_arr"),
        col("n").as("a_n")), Seq("a_id"))
      .join(arrays.select(col("id").as("b_id"), col("arr").as("b_arr"),
        col("n").as("b_n")), Seq("b_id"))
      .withColumn("inter", size(array_intersect(col("a_arr"), col("b_arr"))).cast("long"))
      .withColumn("uni", col("a_n").cast("long") + col("b_n") - col("inter"))
      .filter(col("inter").cast("double") / col("uni") >= t)
    pairs.select(col("a_id").as("d1"), col("b_id").as("d2"), col("inter"),
      round(col("inter").cast("double") / col("uni"), 6).as("jac"))
  }

  /** q113: exact Jaccard ≥ 0.6 near-dup pairs over distinct word-3-gram
    * shingle sets — the prefix-filtered answer q25 approximates under
    * its hot-shingle cap. */
  def q113ExactJaccard(s: SparkSession, dir: String): DataFrame = {
    val sets = Dedup.shingles(Tables.documents(s, dir), 3)
      .groupBy(col("doc_id")).agg(collect_set(col("g")).as("toks"))
    prefixFilterJoin(sets.select(col("doc_id"), col("toks")), 0.6)
      .orderBy(col("d1"), col("d2"))
  }
}
