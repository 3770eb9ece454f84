package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** SPEARMAN rank correlation between two per-document signals, per
  * source — the signal-redundancy audit: q21's rule-based quality
  * priority against raw token count answers "is the quality rule
  * secretly a length rule?" per source (ρ → 1 means the priority adds
  * nothing over length there; a source where ρ breaks from the pack
  * has a different quality/length relationship — template or spam
  * structure). Complements q131's per-key trend slope (Pearson on
  * time) with the tie-robust rank form.
  *
  * Tie handling is the textbook AVERAGE-RANK convention, made exact:
  * a value v with count c and cum_below docs strictly smaller has
  * average rank cum_below + (c+1)/2 — kept as the INTEGER
  * 2·rank = 2·cum_below + c + 1, so every rank is exact and Pearson's
  * moments stay integer (doubling both rank vectors leaves ρ
  * unchanged).
  *
  * Scale shape: TWO (source × value) count aggregates (priority has
  * ≤ 11 values, token count ≤ distinct lengths — both aggregated
  * frames); rank windows run over those frames only; docs re-attach
  * their ranks by value joins; the final per-source moment fold is
  * ≤ |sources| rows. Determinism: all moments DECIMAL(38,0) exact;
  * ρ is one fixed expression rounded 6; zero-variance sources (every
  * doc the same priority) read NULL, not a divide-by-zero. */
object Correlation {

  /** (source, n_docs, rho): Spearman of (q21 priority, token count). */
  def q201Spearman(s: SparkSession, dir: String): DataFrame =
    spearman(Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        Selection.priority().as("x"),
        TextAnalysis.tokenCount(col("text")).as("y")))

  /** Spearman over any (doc_id, source, x: long, y: long) frame. */
  def spearman(sig: DataFrame): DataFrame = {
    val pinned = sig.localCheckpoint() // two rank joins + the moment fold
    def ranks2(c: String): DataFrame = {
      val counts = pinned.groupBy(col("source"), col(c))
        .agg(count(lit(1)).as("cnt"))
      counts
        .withColumn("cum", coalesce(sum(col("cnt")).over(
          Window.partitionBy(col("source")).orderBy(col(c))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("source"), col(c),
          (lit(2L) * col("cum") + col("cnt") + lit(1L)).as(s"r2$c"))
    }
    val withRanks = pinned
      .join(ranks2("x"), Seq("source", "x"))
      .join(ranks2("y"), Seq("source", "y"))
    val mom = withRanks.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("r2x").cast("decimal(38,0)")).as("sx"),
        sum(col("r2y").cast("decimal(38,0)")).as("sy"),
        sum((col("r2x") * col("r2x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("r2y") * col("r2y")).cast("decimal(38,0)")).as("syy"),
        sum((col("r2x") * col("r2y")).cast("decimal(38,0)")).as("sxy"),
        // exact zero-variance detection: one distinct value — the
        // double forms of nΣxx − Σx² can ulp-miss exact zero
        (min(col("x")) === max(col("x"))).as("flat_x"),
        (min(col("y")) === max(col("y"))).as("flat_y"))
    val nD = col("n").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val dx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val dy = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    mom.select(col("source"), col("n").as("n_docs"),
        round(when(!col("flat_x") && !col("flat_y"),
          num / sqrt(dx * dy)), 6).as("rho"))
      .orderBy(col("source"))
  }
}
