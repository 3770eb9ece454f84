package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Robust location estimates per source — trimmed and winsorized means
  * of the token-count distribution (Tukey; the dashboard numbers that
  * survive the heavy tails q197's Hill index diagnoses, where the
  * plain mean follows one outlier document). 10% two-sided by default.
  *
  * EXACT without sorting rows: token counts live on a small integer
  * domain, so the (source, value) histogram + cumulative window over
  * the AGGREGATED frame (the q88/q167 recipe) gives every order
  * statistic in integer arithmetic. A value v with multiplicity c and
  * cumulative rank range [cum−c+1, cum] contributes
  * `overlap([cum−c+1, cum], [k+1, n−k])` retained copies to the
  * trimmed sum; the winsorized sum adds k copies of each clamp value
  * (the rank-(k+1) and rank-(n−k) order statistics). Sums are exact
  * decimals; the final divisions round 6.
  *
  * Shape at 100 TB: ONE map-combined histogram aggregate; every window
  * partitions by source over aggregated value rows — never raw docs. */
object RobustStats {

  /** q214: per-source n, mean, 10%-trimmed mean, 10%-winsorized mean
    * of whitespace token counts. */
  def q214RobustMeans(s: SparkSession, dir: String): DataFrame =
    robustMeans(Tables.documents(s, dir), num = 1L, den = 10L)

  /** The core over any (source, text) frame; trim fraction = num/den
    * per side, k = floor(n·num/den) in exact integer arithmetic. */
  def robustMeans(docs: DataFrame, num: Long, den: Long): DataFrame = {
    val hist = Par.widen(docs)
      .select(col("source"), TextAnalysis.tokenCount(col("text")).as("v"))
      .groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
    val totals = hist.groupBy(col("source"))
      .agg(sum(col("c")).as("n"),
        sum(col("v").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
          .as("sv"))
    val w = Window.partitionBy(col("source")).orderBy(col("v"))
    val cum = hist.withColumn("cum", sum(col("c")).over(w))
      .join(broadcast(totals), Seq("source"))
      .withColumn("k", expr(s"(n * $num) DIV $den"))
      .localCheckpoint() // clamps + retained sums both read it
    // clamp values: the rank-(k+1) and rank-(n−k) order statistics
    val clamps = cum.groupBy(col("source"))
      .agg(min(when(col("cum") >= col("k") + 1, col("v"))).as("v_lo"),
        min(when(col("cum") >= col("n") - col("k"), col("v"))).as("v_hi"))
    val retained = cum
      .withColumn("lo", greatest(col("cum") - col("c") + 1, col("k") + 1))
      .withColumn("hi", least(col("cum"), col("n") - col("k")))
      .withColumn("r", greatest(col("hi") - col("lo") + 1, lit(0L)))
      .groupBy(col("source"))
      .agg(sum(col("r").cast("decimal(19,0)") * col("v").cast("decimal(19,0)"))
        .as("sr"))
    totals.join(broadcast(clamps), Seq("source"))
      .join(broadcast(retained), Seq("source"))
      .withColumn("k", expr(s"(n * $num) DIV $den")) // same k as cum's
      .select(col("source"), col("n").as("n_docs"),
        round(col("sv").cast("double") / col("n").cast("double"), 6).as("mean"),
        round(col("sr").cast("double") /
          (col("n") - col("k") * 2).cast("double"), 6).as("trimmed_mean"),
        round((col("sr").cast("double") +
          col("k").cast("double") * col("v_lo").cast("double") +
          col("k").cast("double") * col("v_hi").cast("double")) /
          col("n").cast("double"), 6).as("winsorized_mean"))
      .orderBy(col("source"))
  }
}
