package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Aggressive text normalization for dedup keying — casefold, strip
  * everything outside [a-z0-9 whitespace], collapse whitespace runs,
  * trim. The canonical pre-pass before exact/near dedup: two docs that
  * differ only in case, punctuation or spacing ("Hello, World!" vs
  * "hello world") normalize to the same bytes, so the cheap exact-hash
  * pass catches near-misses the raw-text key (q24) calls distinct, at
  * zero extra shuffle cost.
  *
  * Scale shape: [[normalize]] is a pure narrow column expression
  * (three codegen'd regex passes); the dedup itself reuses q24's
  * two-level bounded-member aggregation, so no buffer grows with group
  * size. Everything here is also the q101 URL-canonicalization story
  * applied to body text — one deterministic key function shared by
  * engine and oracle. */
object Normalization {

  /** lower → drop non-[a-z0-9\s] → collapse \s+ to one space → trim.
    * Deterministic, locale-free (regex classes are ASCII; non-ASCII
    * letters are dropped, which is the intended aggressive key — lang
    * is tracked separately by q22). */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", ""),
      "\\s+", " "))

  /** Duplicate groups under the normalized boilerplate-prefix key:
    * (norm_md5, canonical = min doc_id, group_size, first ≤20 member
    * ids) for groups of ≥ 2. The q24 sub-bucketed min-k aggregation on
    * md5(first 8 tokens of the NORMALIZED text) — q24's key with the
    * normalization pass in front. */
  def normalizedDupGroups(docs: DataFrame, textCol: String,
                          idCol: String): DataFrame = {
    val base = docs.select(
      md5(TextAnalysis.prefixTokens(normalize(col(textCol)), 8)).as("norm_md5"),
      col(idCol).as("doc_id"))
    val sub = base
      .groupBy(col("norm_md5"), pmod(col("doc_id"), lit(1024L)).as("sb"))
      .agg(slice(array_sort(collect_list(col("doc_id"))), 1, 20).as("m"),
        count(lit(1)).as("c"))
    sub.select(col("norm_md5"), col("c"), posexplode(col("m")).as(Seq("pos", "k")))
      .groupBy(col("norm_md5"))
      .agg(
        min(col("k")).as("canonical_id"),
        sum(when(col("pos") === 0, col("c")).otherwise(0L)).as("group_size"),
        array_join(transform(slice(array_sort(collect_list(col("k"))), 1, 20),
          x => x.cast("string")), ",").as("members"))
      .filter(col("group_size") >= 2)
  }

  /** q125: normalized dedup over deterministically "dirtied" document
    * renderings — the q122 fixture idiom: the synthetic corpus is
    * already clean (normalization over raw `text` is an exact no-op,
    * measured: identical groups), so each doc is first rendered the
    * way real crawl copies diverge (doc_id mod 3: verbatim / upcased /
    * comma-riddled). The normalized key recovers ALL 23 q24 boilerplate
    * groups; the raw q24 key on the same renderings finds only 9
    * (measured at sf0.01) — the gap IS the operator's value, and the
    * spec asserts membership equality with q24. */
  def q125NormalizedDedup(s: SparkSession, dir: String): DataFrame = {
    val rendered = Tables.documents(s, dir).withColumn("rendered",
      when(pmod(col("doc_id"), lit(3)) === 0, col("text"))
        .when(pmod(col("doc_id"), lit(3)) === 1, upper(col("text")))
        .otherwise(regexp_replace(col("text"), " ", ", ")))
    normalizedDupGroups(rendered, "rendered", "doc_id")
      .orderBy(col("norm_md5"))
  }
}
