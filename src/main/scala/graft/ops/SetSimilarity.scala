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
    * compares the unrounded double).
    *
    * Tokens are dictionary-encoded to `xxhash64` longs before ANY wide
    * stage — 16-byte (df, h) structs instead of ~45-byte strings cut
    * the df shuffle, the array build and the verify arrays ~3× (the
    * string variant overflowed this box's disk at the 100× soak).
    * Intersection COUNTS are unchanged as long as the hash is
    * injective on the corpus vocabulary, and that is ASSERTED per run
    * (one distinct-count aggregate; a collision fails loudly — the CC
    * non-convergence rule — rather than silently miscounting one
    * intersection in 2^64). Prefix correctness needs only SOME fixed
    * total order, so (df, hash) works exactly like (df, token). */
  def prefixFilterJoin(docSets: DataFrame, t: Double): DataFrame = {
    require(t > 0 && t <= 1, s"threshold in (0,1]: $t")
    val sets = docSets.toDF("id", "toks").filter(size(col("toks")) >= 1)
    val exploded = sets.select(col("id"), explode(col("toks")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    // df pass and collision check share ONE aggregate: a hash collides
    // iff some h carries ≥ 2 distinct tokens, so countDistinct(tok)
    // rides the per-h df shuffle instead of a separate whole-corpus
    // 2×countDistinct pre-pass (r14: the check alone was a full
    // tokenize+explode+shuffle before any real work). The per-h frame
    // is vocabulary-scale — pinned, it serves the check AND the rank
    // join without re-running the corpus explode.
    val dfCounts = exploded.groupBy(col("h"))
      .agg(count(lit(1)).as("df"), countDistinct(col("tok")).as("__ntok"))
      .localCheckpoint(false) // lazy: the full-scan count below materializes it
    val nColl = dfCounts.filter(col("__ntok") > 1).count()
    require(nColl == 0,
      s"xxhash64 collision in the token dictionary ($nColl hashes carry " +
        "multiple tokens) — exact intersection counts would be wrong")
    // per-doc array sorted rarest-first; the struct's (df, h) field
    // order IS the global total order (sort_array is lexicographic on
    // struct fields, ties broken by the token hash)
    val ranked = exploded.select(col("id"), col("h"))
      .join(dfCounts.select(col("h"), col("df")), "h")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("arr"))
      .withColumn("n", size(col("arr")))
      .withColumn("plen",
        (col("n") - ceil(lit(t) * col("n")) + 1).cast("int"))
      .withColumn("pre", slice(col("arr"), lit(1), col("plen")))
    // (measured, not kept: pinning `ranked` for its four downstream
    // references — 8.0 → 10.6 s at sf0.1. ReuseExchange already dedupes
    // the identical aggregation subtrees; an eager materialization of
    // the array frame only costs the write and breaks pipelining.)
    // SKINNY candidate generation: only (token, id) rides the prefix
    // explode and the self-join — never the arrays. (The first cut
    // carried each doc's full struct array through the explode for an
    // in-row exactly-once rule; at the 100× soak that duplicated ~3 KB
    // of array per prefix row — tens of GB on the shuffle — and OOMed.
    // A groupBy over the candidate ids dedups multi-token collisions at
    // 16 bytes/row instead, and the arrays join back exactly once per
    // SURVIVING candidate pair.)
    // Two exactness-preserving candidate cuts BEFORE the pair groupBy
    // (Xiao et al., PPJoin, WWW 2008): the LENGTH filter — J ≥ t forces
    // t·max(|x|,|y|) ≤ min(|x|,|y|) — and the POSITIONAL filter — a
    // shared prefix token at positions (px, py) bounds the overlap by
    // 1 + min(|x|−px, |y|−py), which must reach the required overlap
    // α = ⌈t/(1+t)·(|x|+|y|)⌉. On a corpus with dense mid-range
    // similarity these drop the candidates that share only LATE prefix
    // tokens — the volume that made verification quadratic here.
    val prefixIdx = ranked.select(col("id"), col("n"),
      posexplode(col("pre")).as(Seq("pos0", "p")))
    val cands = prefixIdx.toDF("a_id", "a_n", "a_pos", "p")
      .join(prefixIdx.toDF("b_id", "b_n", "b_pos", "p"), Seq("p"))
      .filter(col("a_id") < col("b_id"))
      .filter(greatest(col("a_n"), col("b_n")) * t <=
        least(col("a_n"), col("b_n")).cast("double"))
      // 0-based prefix position: n − pos0 = tokens from this one to the
      // end INCLUDING it — the tight PPJoin ubound needs no +1. The
      // 1e-9 guard keeps ceil from rounding α UP when t/(1+t)·(na+nb)
      // is an exact integer that double arithmetic lands a hair above
      // (e.g. t=0.9, na+nb=19 → α=9 exactly) — overshooting α by 1
      // there would DROP true pairs; undershooting by ε only keeps a
      // few extra candidates for the exact verify to discard
      .filter(least(col("a_n") - col("a_pos"), col("b_n") - col("b_pos")) >=
        ceil(lit(t / (1 + t)) * (col("a_n") + col("b_n")) - lit(1e-9)))
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

  /** q113: exact Jaccard ≥ 0.8 near-dup pairs over distinct word-3-gram
    * shingle sets — the prefix-filtered answer q25 approximates under
    * its hot-shingle cap. 0.8 is the operating point: the corpus' true
    * near-dup pairs are identical at every cut in [0.4, 0.8] (measured
    * 25/25 at sf0.01, 256/256 at sf0.1), and the t=0.6 variant paid 18 s
    * at sf0.1 purely in candidates that verify below threshold — prefix
    * length n−⌈t·n⌉+1 halves going 0.6→0.8 and candidate volume drops
    * superlinearly with it. */
  def q113ExactJaccard(s: SparkSession, dir: String): DataFrame = {
    val sets = Dedup.shingles(Tables.documents(s, dir), 3)
      .groupBy(col("doc_id")).agg(collect_set(col("g")).as("toks"))
    prefixFilterJoin(sets.select(col("doc_id"), col("toks")), 0.8)
      .orderBy(col("d1"), col("d2"))
  }
}
