package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Cross-source QUANTILE NORMALIZATION — the calibration step before
  * any global threshold touches heterogeneous sources: a "keep the top
  * 40% by length/quality" rule is meaningless when one source's scores
  * run long and another's run short, so each document's score is
  * replaced by the POOLED distribution's value at the document's
  * WITHIN-SOURCE quantile (the microarray quantile-normalization
  * recipe — Bolstad et al. 2003 — applied per source).
  *
  * Exactness: everything is integer. The within-source quantile uses
  * the midpoint convention for ties, q = (2·below + cnt) / (2·n_s),
  * kept as a RATIONAL; the pooled target is the type-1 inverse CDF —
  * the smallest pooled value w with CumG(w)/N ≥ q — decided by the
  * integer cross-multiply 2·n_s·CumG(w) ≥ N·(2·below + cnt), so no
  * float ever enters a comparison (the q155 cross-multiply rule). The
  * reported q itself is one rounded double for humans.
  *
  * Shape at 100 TB: the corpus collapses FIRST to (source, value,
  * cnt) — map-side combined, bounded by |sources| × |distinct values|
  * (integer scores; bin continuous scores before calling). All
  * windows run over those aggregated tables (≤ thousands of rows),
  * never the corpus — the audited aggregated-frame window idiom. The
  * value mapping joins back to documents on (source, value) as a
  * broadcast. A corpus-scale `Window.partitionBy(source)` appears
  * nowhere: a giant source never funnels through one task.
  */
object QuantileNorm {

  /** q167: quantile-normalize each document's token count across
    * sources. */
  def q167QuantileNormalize(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    quantileNormalize(
      docs.select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("v")))
  }

  /** The reusable core over any (doc_id, source, v: long) frame. */
  def quantileNormalize(scored: DataFrame): DataFrame = {
    val d = Par.widen(scored)
    // the ONLY corpus-scale shuffle: collapse to (source, v, cnt)
    val sv = d.groupBy(col("source"), col("v")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // three consumers below
    // per-source cumulative-below and totals — windows over the
    // AGGREGATED frame (≤ |sources|·|values| rows)
    val bySrc = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val srcCum = sv
      .withColumn("below", sum(col("cnt")).over(bySrc) - col("cnt"))
    val srcTot = sv.groupBy(col("source")).agg(sum(col("cnt")).as("n_s"))
    // pooled cumulative CDF — one ≤|values|-row table
    val pooled = sv.groupBy(col("v")).agg(sum(col("cnt")).as("pcnt"))
    val pooledCum = PrefixSum.runningSum( // two-level: a 100 TB value
        pooled, col("v"), col("pcnt"), "cum_g") // histogram never funnels
      .select(col("v").as("w"), col("cum_g"))
      .localCheckpoint() // aggregated (≤ |values| rows); also caps the
                         // window lineage before the theta join below
    val nTotal = pooled.agg(sum(col("pcnt")).as("n_total"))
    // type-1 inverse by integer cross-multiply: smallest w with
    // 2·n_s·CumG(w) ≥ N·(2·below + cnt) — an aggregated×aggregated
    // theta join, then a min
    val mapping = srcCum
      .join(srcTot, Seq("source"))
      .crossJoin(broadcast(nTotal))
      .join(pooledCum,
        lit(2) * col("n_s") * col("cum_g") >=
          col("n_total") * (lit(2) * col("below") + col("cnt")))
      .groupBy(col("source"), col("v"), col("below"), col("cnt"),
        col("n_s"), col("n_total"))
      .agg(min(col("w")).as("norm_v"))
      .withColumn("q", round(
        (lit(2) * col("below") + col("cnt")).cast("double") /
          (lit(2) * col("n_s")).cast("double"), 12))
      .select(col("source"), col("v"), col("q"), col("norm_v"))
    d.join(broadcast(mapping), Seq("source", "v"))
      .select(col("doc_id"), col("source"), col("v"), col("q"),
        col("norm_v"))
      .orderBy(col("doc_id"))
  }
}
