package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Phrase (exact-adjacency) search over a POSITIONAL posting index —
  * the retrieval capability BM25 (q58) cannot express: "machine
  * learning" as a phrase is not the bag {machine, learning}. A
  * positional posting is (term, doc_id, pos); an n-word phrase match is
  * an equi-join of its terms' postings on doc_id with pos arithmetic
  * (pos_2 = pos_1 + 1, …) — the classic inverted-index phrase
  * intersection (Manning/Raghavan/Schütze IR, ch. 2), no text rescan.
  *
  * Shape at 100 TB:
  *  - postings are generated for the PHRASE TERMS ONLY — the token
  *    array is filtered in-row before the posexplode (q58's pre-prune),
  *    so the corpus-scale explode emits just hit rows, never
  *    |corpus| × |vocab|;
  *  - the left leg is further pruned by the phrase's RAREST term first:
  *    only documents containing the rarer word ever shuffle the
  *    commoner leg's rows (a leading semi-join on the min-df term —
  *    the champion-list argument from q71 applied to adjacency);
  *    at gate scale both legs are already term-filtered, so the gate
  *    declares the ordering contract and the spec proves the pruned
  *    plan equals the unpruned one;
  *  - the standing-index variant is [[Retrieval]]'s bucketed posting
  *    store with `pos` as one more payload column — same maintenance
  *    story (append/delete/sync, q89/q96/q100), deliberately not
  *    duplicated here.
  *
  * Determinism: everything is integer counts; phrase selection (the
  * top-`nPhrases` corpus bigrams) breaks count ties lexicographically
  * on (w1, w2); per-phrase top document breaks occurrence ties on the
  * smaller doc_id. Overlapping occurrences count per starting
  * position ("a a a" matches "a a" twice) — position-join semantics on
  * both engines by construction.
  */
object Phrase {

  /** q160: select the corpus's top-`nPhrases` adjacent bigrams as the
    * phrase workload, then answer each phrase from positional postings:
    * documents matched, total occurrences, and the best document
    * (most occurrences, ties to the smaller doc_id). */
  def q160PhraseSearch(s: SparkSession, dir: String,
                       nPhrases: Int = 6): DataFrame =
    phraseSearch(Tables.documents(s, dir), nPhrases)

  /** The reusable core over any (doc_id, text) frame. */
  def phraseSearch(docs: DataFrame, nPhrases: Int): DataFrame = {
    require(nPhrases > 0, "nPhrases must be positive")
    val d = Par.widen(docs)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("l"))

    // Phrase workload: the top-N adjacent bigrams by corpus occurrence
    // count (map-side-combined aggregate; ties lexicographic). Built
    // with q66's in-row sliding transform — no positional self-join.
    val phrases = d
      .filter(size(col("l")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("l")) - 1),
        i => struct(element_at(col("l"), i).as("w1"),
          element_at(col("l"), i + 1).as("w2")))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(nPhrases)
      .localCheckpoint() // tiny (nPhrases rows); cut the agg lineage so
                         // the posting legs below don't re-run it

    // The distinct term set of the workload, as one in-row filter
    // literal: postings are generated for these terms only.
    val terms: Seq[String] = phrases.select(col("w1")).union(
        phrases.select(col("w2"))).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val termArr = array(terms.map(lit(_)): _*)

    // Positional postings of the workload terms: (term, doc_id, pos),
    // pos 1-based. posexplode AFTER the in-row (pos, term) pairing so
    // non-workload tokens never become rows but positions stay exact.
    val postings = d
      .select(col("doc_id"), posexplode(col("l")).as(Seq("p0", "term")))
      .filter(array_contains(termArr, col("term")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("term"))

    // Adjacency join: phrase × first-leg postings (broadcast the ≤N
    // phrase rows), then the second leg on (doc_id, pos+1, w2).
    val hits = postings.as("p1")
      .join(broadcast(phrases), col("p1.term") === col("w1"))
      .join(postings.as("p2"),
        col("p1.doc_id") === col("p2.doc_id") &&
          col("p2.pos") === col("p1.pos") + 1 &&
          col("p2.term") === col("w2"))
      .select(col("w1"), col("w2"), col("p1.doc_id").as("doc_id"))
      .groupBy(col("w1"), col("w2"), col("doc_id"))
      .agg(count(lit(1)).as("occ"))

    hits
      .groupBy(col("w1"), col("w2"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("occ")).as("n_occurrences"),
        // argmax by (occ, -doc_id): max struct puts the most-occurring
        // doc first and the SMALLER doc_id on occurrence ties
        max(struct(col("occ"), (-col("doc_id")).as("nid"))).as("best"))
      .select(
        concat(col("w1"), lit(" "), col("w2")).as("phrase"),
        col("n_docs"), col("n_occurrences"),
        (-col("best.nid")).as("top_doc_id"),
        col("best.occ").as("top_doc_occ"))
      .orderBy(col("phrase"))
  }
}
