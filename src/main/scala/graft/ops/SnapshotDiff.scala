package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus snapshot diff — the dataset-versioning primitive: given two
  * versions of a corpus, classify every document as added / removed /
  * changed / unchanged by content fingerprint, so a pipeline can
  * re-process ONLY the delta (incremental dedup, incremental index
  * build) and an audit can see exactly what a release changed.
  *
  * Scale shape: one full-outer join on doc_id comparing md5(text) — the
  * canonical diff dataflow. Both sides project to (id, fingerprint)
  * before the join, so the shuffle carries 48-byte rows, never document
  * text; the verdict is a null-pattern case on the joined row. At
  * 100 TB both snapshots shuffle once on the id — there is no cheaper
  * general diff (any correct diff must see both sides of every id) —
  * and if both snapshots are bucketed on doc_id (etl.Bucketing) the
  * exchange disappears entirely.
  *
  * The declared query derives snapshot B from the SAME documents table
  * deterministically (drop every 11th doc, rewrite every 7th, add a
  * shifted tail), so the DuckDB oracle replays the whole diff; the core
  * takes any two (doc_id, text) frames.
  */
object SnapshotDiff {

  /** q63: diff the documents table against its deterministically-derived
    * next version. Output: one row per doc_id present in either
    * snapshot, with the verdict and both fingerprints. */
  def q63SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    // derived next version:
    //  - every 11th document is REMOVED
    //  - every 7th surviving document has its text rewritten (upper)
    //  - one NEW document per 13th id, appended past the id range
    // The append shift is max(doc_id)+1 FROM THE DATA (a broadcast 1-row
    // aggregate), never a constant: a hardcoded shift collides with real
    // ids once the corpus outgrows it, duplicating doc_ids in snapshot B
    // and fanning out the diff join.
    val mx = a.agg(max(col("doc_id")).as("mx"))
    val b = a.filter(pmod(col("doc_id"), lit(11)) =!= 0)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 0, upper(col("text")))
          .otherwise(col("text")).as("text"))
      .unionByName(
        a.filter(pmod(col("doc_id"), lit(13)) === 0)
          .crossJoin(broadcast(mx))
          .select((col("doc_id") + col("mx") + 1L).as("doc_id"), col("text")))
    // the declared query pins row order; the reusable core stays
    // sort-free so index maintenance can consume it at corpus scale
    diff(a, b).orderBy(col("doc_id"))
  }

  /** The changelog a downstream store applies: one row per DELTA id —
    * `op = 'delete'` for removed ids, `op = 'upsert'` (with the new
    * text) for added/changed ids; unchanged ids are absent. The text
    * join is against the delta ids only, so full document text rides
    * the shuffle O(delta), never O(corpus) — the diff itself stays on
    * 48-byte fingerprint rows. */
  def changelog(a: DataFrame, b: DataFrame): DataFrame =
    diff(a, b).filter(col("status") =!= "unchanged")
      .select(col("doc_id"),
        when(col("status") === "removed", "delete").otherwise("upsert").as("op"))
      .join(b.select(col("doc_id"), col("text")), Seq("doc_id"), "left")

  /** Apply a changelog to a base snapshot: drop every changelog id from
    * the base (delete AND upsert — an upsert replaces), then union the
    * upsert rows. One anti-join + union keyed on the id — MERGE
    * semantics as two relational operators, Exchange-free when both
    * sides are bucketed on doc_id (`etl.Bucketing`). Applying
    * [[changelog]](a, b) to `a` reconstructs `b` exactly — q108 proves
    * it by hash. */
  def applyChangelog(base: DataFrame, log: DataFrame): DataFrame =
    base.select(col("doc_id"), col("text"))
      .join(log.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(log.filter(col("op") === "upsert")
        .select(col("doc_id"), col("text")))

  /** q108: the CDC round trip as a DECLARED query (the q100/q107
    * precedent) — derive snapshot B (q63's derivation), extract the
    * changelog, apply it to A, and emit (doc_id, fingerprint) of the
    * RECONSTRUCTED snapshot. The oracle replays the B derivation
    * directly: hash equality proves apply ∘ changelog = identity on
    * versions, end to end. */
  def q108SnapshotApply(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val mx = a.agg(max(col("doc_id")).as("mx"))
    val b = a.filter(pmod(col("doc_id"), lit(11)) =!= 0)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 0, upper(col("text")))
          .otherwise(col("text")).as("text"))
      .unionByName(
        a.filter(pmod(col("doc_id"), lit(13)) === 0)
          .crossJoin(broadcast(mx))
          .select((col("doc_id") + col("mx") + 1L).as("doc_id"), col("text")))
    applyChangelog(a, changelog(a, b))
      .select(col("doc_id"), md5(col("text")).as("md5"))
      .orderBy(col("doc_id"))
  }

  /** The reusable core: classify every id in either snapshot.
    * Unordered — callers needing a deterministic row order sort the
    * 20-byte (id, status, md5s) projection themselves. */
  def diff(a: DataFrame, b: DataFrame): DataFrame = {
    val fa = a.select(col("doc_id"), md5(col("text")).as("md5_a"))
    val fb = b.select(col("doc_id"), md5(col("text")).as("md5_b"))
    fa.join(fb, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("md5_a").isNull, "added")
          .when(col("md5_b").isNull, "removed")
          .when(col("md5_a") === col("md5_b"), "unchanged")
          .otherwise("changed"))
      .select(col("doc_id"), col("status"), col("md5_a"), col("md5_b"))
  }

  /** q185: SNAPSHOT RELEASE CARD — the per-(source, status) summary a
    * dataset release note carries: how many docs each source added /
    * removed / changed / kept between two snapshots, and what the
    * token budget did. q63 emits row-level verdicts; this is the
    * aggregate the release process reads, and the regression alarm (a
    * source whose token mass silently collapses between snapshots is a
    * crawler failure, not an editorial choice). Fixture: q63's derived
    * next version verbatim; appended docs inherit their origin doc's
    * source. Shape: the [[diff]] (fingerprint full-outer) + two narrow
    * token projections joined on the id + ONE (source × status)
    * aggregate — nothing corpus-scale beyond the scans. */
  def q185ReleaseCard(s: SparkSession, dir: String): DataFrame = {
    val d0 = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val a = d0.select(col("doc_id"), col("text"))
    val mx = a.agg(max(col("doc_id")).as("mx"))
    val b = a.filter(pmod(col("doc_id"), lit(11)) =!= 0)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 0, upper(col("text")))
          .otherwise(col("text")).as("text"))
      .unionByName(
        a.filter(pmod(col("doc_id"), lit(13)) === 0)
          .crossJoin(broadcast(mx))
          .select((col("doc_id") + col("mx") + 1L).as("doc_id"), col("text")))
    val src = d0.select(col("doc_id"), col("source"))
      .unionByName(d0.filter(pmod(col("doc_id"), lit(13)) === 0)
        .crossJoin(broadcast(mx))
        .select((col("doc_id") + col("mx") + 1L).as("doc_id"), col("source")))
    val tokA = a.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("tok_a"))
    val tokB = b.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("tok_b"))
    diff(a, b)
      .join(src, Seq("doc_id"))
      .join(tokA, Seq("doc_id"), "left")
      .join(tokB, Seq("doc_id"), "left")
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("tok_a"), lit(0L))).as("tokens_old"),
        sum(coalesce(col("tok_b"), lit(0L))).as("tokens_new"))
      .withColumn("token_delta", col("tokens_new") - col("tokens_old"))
      .orderBy(col("source"), col("status"))
  }

  /** q242: SCD2 HISTORY BUILD (gaps-and-islands) — the WRITE side of
    * q117's SCD2 lookup: given the event stream, construct the
    * versioned dimension itself — per user, the daily "current event
    * type" collapsed into validity intervals (valid_from, valid_to).
    * A run of equal types over CONSECUTIVE observed days is one
    * version; a type change OR an absence gap closes the version (the
    * standard islands rule — absence means "state unknown", not
    * "state held").
    *
    * Exact: the daily snapshot picks each (user, day)'s LAST event by
    * the (ts, event_id) struct max (the deterministic tie rule);
    * islands via the lag window over the per-user day sequence
    * (user-keyed partitions — the q115 window discipline); intervals
    * are one aggregate over (user, island id). */
  def q242Scd2History(s: SparkSession, dir: String): DataFrame =
    scd2History(graft.Tables.events(s, dir))

  /** The historization core over any (user_id, event_id, ts nanos,
    * event_type) frame. */
  def scd2History(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val snap = events
      .select(col("user_id"), expr("ts DIV 86400000000000").as("day"),
        col("ts"), col("event_id"), col("event_type"))
      .groupBy(col("user_id"), col("day"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("m"))
      .select(col("user_id"), col("day"), col("m.event_type").as("etype"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    snap
      .withColumn("brk", when(lag(col("etype"), 1).over(w).isNull ||
        lag(col("etype"), 1).over(w) =!= col("etype") ||
        lag(col("day"), 1).over(w) =!= col("day") - 1L, 1L).otherwise(0L))
      .withColumn("vid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("vid"), col("etype"))
      .agg(min(col("day")).as("valid_from"), max(col("day")).as("valid_to"),
        count(lit(1)).as("n_days"))
      .select(col("user_id"), col("vid").as("version"),
        col("etype").as("event_type"), col("valid_from"), col("valid_to"),
        col("n_days"))
      .orderBy(col("user_id"), col("version"))
  }
}
