package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** q67: the per-source dataset "data card" — the one-page datasheet a
  * training-data owner publishes with a corpus release: composition
  * (docs, languages, dominant language and its share), size (total and
  * median tokens), duplication rate and quality keep-rate. Assembled
  * from the engine's own audited building blocks — q39's verdict rules
  * (via `filterVerdicts`, the ONE definition), q24's exact-dup key,
  * q33's order-statistic selection — so the card's numbers are by
  * construction consistent with what the pipeline operators would do.
  *
  * Scale shape: ONE narrow projection computes every per-doc signal
  * (verdict, dup key, token count) in a single pass over the corpus;
  * everything after runs on aggregated frames bounded by |sources| ×
  * |distinct token counts| — no window ever sees a raw document row
  * (PlanSpec-asserted). The median is q33's selection idiom collapsed
  * to one phase: the token-count axis is already a bounded histogram,
  * so the cumulative window runs over (source, n_tokens) partials. The
  * one corpus-cardinality aggregate is the exact distinct dup-key
  * count; it rides the same shuffle with map-side partials (a 100 TB
  * run that tolerates ±2% swaps in `approx_count_distinct` by changing
  * one line). Ties for the top language break to the smallest language
  * code via a min over (-count, lang) structs — integer arithmetic, no
  * rank window.
  */
object DataCard {

  def q67DataCard(s: SparkSession, dir: String): DataFrame =
    dataCard(Tables.documents(s, dir))

  /** The reusable core over any (doc_id, text, source, lang) frame. */
  def dataCard(docs: DataFrame): DataFrame = {
    val d = Par.widen(docs)
    // the single per-doc pass: q39 verdict signals + q24 dup key, with
    // source/lang riding through the projection (no corpus re-join)
    val base = TextAnalysis.filterVerdicts(
        d.withColumn("gk", md5(TextAnalysis.prefixTokens(col("text"), 8))),
        passThrough = Seq("source", "lang", "gk"))
      .select(col("source"), col("lang"), col("gk"),
        col("n_tokens").as("nt"), col("keep"))

    val per = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      sum(col("nt")).as("total_tokens"),
      countDistinct(col("gk")).as("n_uniq"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))

    // dominant language: max count, ties to the smallest lang code —
    // a min over (-count, lang) pairs, never a rank window
    val topLang = base.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(min(struct((-col("c")).as("negc"), col("lang"))).as("t"))
      .select(col("source"), col("t.lang").as("top_lang"),
        (-col("t.negc")).as("top_cnt"))

    // exact lower median of per-doc token counts: cumulative counts
    // over the (source, n_tokens) HISTOGRAM — the window's partition is
    // |distinct counts| rows, not |docs| (q33's bounded-axis guarantee)
    val hist = base.groupBy(col("source").as("hs"), col("nt"))
      .agg(count(lit(1)).as("c"))
    val ranks = hist.groupBy(col("hs")).agg(sum(col("c")).as("n"))
      .withColumn("k", expr("(n + 1) div 2"))
    val wb = Window.partitionBy(col("hs")).orderBy(col("nt"))
    val med = hist.withColumn("cum", sum(col("c")).over(wb))
      .join(broadcast(ranks.select(col("hs"), col("k"))), "hs")
      .filter(col("cum") >= col("k") && col("cum") - col("c") < col("k"))
      .select(col("hs").as("source"), col("nt").as("median_tokens"))

    per.join(topLang, "source").join(med, "source")
      .select(col("source"), col("n_docs"), col("n_langs"), col("top_lang"),
        round(col("top_cnt").cast("double") / col("n_docs").cast("double"), 12)
          .as("top_lang_share"),
        col("total_tokens"), col("median_tokens"),
        round(lit(1.0) - col("n_uniq").cast("double") / col("n_docs").cast("double"), 12)
          .as("dup_rate"),
        round(col("n_keep").cast("double") / col("n_docs").cast("double"), 12)
          .as("keep_rate"))
      .orderBy(col("source"))
  }
}
