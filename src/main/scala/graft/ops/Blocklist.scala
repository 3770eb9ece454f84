package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Blocklist / watchlist scanning — the curation pass every production
  * pipeline runs (badword lists, policy phrases, license markers, PII
  * trigger strings): count every OVERLAPPING occurrence of every
  * literal pattern in every document, in ONE pass per document via the
  * codegen'd Aho–Corasick kernel ([[graft.functions.AhoCorasick]]).
  *
  * Why a kernel and not P × `contains`: a real blocklist has hundreds
  * to thousands of entries; P separate substring scans cost O(P·bytes)
  * per doc and P expression evaluations, the automaton costs
  * O(bytes + matches) — the gap grows linearly with the list. The scan
  * is a pure narrow map (no shuffle, no join): at 100 TB the only cost
  * is the read itself, and the automaton rides to executors as one
  * plan-constant reference object.
  *
  * Overlapping-count semantics (the AC native read): "aaa" contains
  * "aa" twice. The oracle replays the DEFINITION — every position
  * where the substring equals the pattern — so a failure-link bug
  * (the classic AC miss: a pattern hidden inside another's prefix)
  * breaks the hash. */
object Blocklist {

  /** The audit list: fixed literals chosen to exercise failure links —
    * "alue t" matches only MID-WORD across "value table" (suffix of
    * one pattern = prefix of another), "a a " self-overlaps in runs,
    * doubled words hit the repeated-token corpus idiom. */
  val Patterns: Seq[String] = Seq(
    "table table", "scan scan", "a a ", "value", "alue t",
    "fast", "st fa", "slow slow")

  /** q227: (doc_id, pattern_id, pattern, cnt) for every doc × pattern
    * with at least one hit. */
  def q227BlocklistScan(s: SparkSession, dir: String): DataFrame =
    blocklistScan(Tables.documents(s, dir), Patterns)

  /** The scan core over any (doc_id, text) frame. */
  def blocklistScan(docs: DataFrame, patterns: Seq[String]): DataFrame =
    Par.widen(docs)
      .select(col("doc_id"),
        graft.functions.exprs.ac_counts(col("text"), patterns).as("cnts"))
      .select(col("doc_id"), posexplode(col("cnts")).as(Seq("pid", "cnt")))
      .filter(col("cnt") > 0)
      .select(col("doc_id"), col("pid").cast("long").as("pattern_id"),
        element_at(typedlit(patterns), col("pid").cast("int") + 1).as("pattern"),
        col("cnt"))
      .orderBy(col("doc_id"), col("pattern_id"))
}
