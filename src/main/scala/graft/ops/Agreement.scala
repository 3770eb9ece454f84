package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Inter-labeler agreement — COHEN'S KAPPA (Cohen '60) between two
  * quality labelers, per source: raw agreement p₀ corrected by the
  * chance agreement p_e the labelers' marginal rates alone would
  * produce. The number a curation pipeline reads before trusting two
  * cheap heuristics as interchangeable filters (or before replacing a
  * rule with a distilled model): two rules can agree 90% of the time
  * purely because both pass almost everything — κ is what's left
  * after that. Companion to q208's ARI/NMI (chance-corrected
  * agreement for PARTITIONS; κ is the 2-rater binary case).
  *
  * The two labelers here are the repo's replayable length/shape
  * heuristics: A = token count ≥ 30, B = average token length ≤ 6
  * (exact integer counts into one IEEE divide each — both engines
  * evaluate identical trees).
  *
  * Shape at 100 TB: one narrow pass computes both verdicts in-row;
  * ONE map-combined (source × 2×2 cell) aggregate; κ arithmetic on
  * the 4-cell grid. Marginal products widen to decimal before the
  * divide (a1·b1 overflows LONG at ~10⁹ docs/source). */
object Agreement {

  /** q218: (source, n_docs, p_o, p_e, kappa) — kappa NULL when the
    * chance agreement is 1 (degenerate marginals, κ undefined). */
  def q218LabelerKappa(s: SparkSession, dir: String): DataFrame = {
    val nTok = TextAnalysis.tokenCount(col("text"))
    val nChr = TextAnalysis.charCountNoWs(col("text"))
    val verdicts = Par.widen(Tables.documents(s, dir))
      .select(col("source"),
        (nTok >= 30L).cast("long").as("a"),
        (nChr.cast("double") /
          greatest(nTok.cast("double"), lit(1.0)) <= 6.0).cast("long").as("b"))
    val grid = verdicts.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("a")).as("a1"),
        sum(col("b")).as("b1"),
        sum(col("a") * col("b")).as("n11"))
    def dec(c: Column): Column = c.cast("decimal(19,0)")
    grid
      .withColumn("po", round(
        (col("n11") * 2 + col("n") - col("a1") - col("b1")).cast("double") /
          col("n").cast("double"), 12))
      .withColumn("pe", round(
        (dec(col("a1")) * dec(col("b1")) +
          dec(col("n") - col("a1")) * dec(col("n") - col("b1")))
          .cast("double") /
          (col("n").cast("double") * col("n").cast("double")), 12))
      .select(col("source"), col("n").as("n_docs"),
        round(col("po"), 6).as("p_o"), round(col("pe"), 6).as("p_e"),
        when(col("pe") =!= 1.0,
          round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 6))
          .as("kappa"))
      .orderBy(col("source"))
  }
}
