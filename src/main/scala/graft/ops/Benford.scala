package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** BENFORD first-digit audit — the classic forensic data-quality
  * check (Benford 1938; Nigrini's fraud-audit use): naturally-grown
  * monetary amounts follow P(d) = log10(1 + 1/d), while fabricated,
  * truncated or default-filled values don't. Run per segment, a
  * divergent chi-square flags the segment whose amounts were
  * synthesized or clipped upstream — for a training-data warehouse,
  * the numeric cousin of q143's quality audit. Reference scope note:
  * the reference engine has no audit surface; this extends the
  * quality family.
  *
  * Scale shape: ONE corpus-collapsing hash aggregate to
  * (segment, digit) counts — the digit is in-row integer arithmetic —
  * and everything after is a ≤ |segments|×9 frame (the q144
  * per-bin + __total shape, grid-completed so absent digits score
  * their full expected mass).
  *
  * Determinism: the first digit derives from exact integer cents —
  * floor(price·100 + 0.5), identical IEEE arithmetic in both engines,
  * then the leading character of the Long's decimal string (no
  * cross-engine log10-of-double ambiguity at powers of ten); expected
  * shares and chi-square terms are fixed expression trees rounded 6
  * (the q41 rule); per-segment chi-square sums the ROUNDED terms
  * through DECIMAL(18,6) — order-independent, hash-safe. The 15.507
  * cut is chi-square(df=8) at α=0.05. */
object Benford {

  /** Per-(segment, first-digit) counts vs Benford expectation with a
    * `__total` row per segment carrying the chi-square and verdict.
    * `amounts` needs (segment: string, amount: double > 0). */
  def firstDigitAudit(amounts: DataFrame, chi2Crit: Double = 15.507): DataFrame = {
    val digit = substring(
      floor(col("amount") * lit(100.0) + lit(0.5)).cast("long").cast("string"),
      1, 1).cast("long")
    val counts = amounts.filter(col("amount") > 0.0)
      .select(col("segment"), digit.as("digit"))
      .groupBy(col("segment"), col("digit")).agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("segment")).agg(sum(col("n")).as("t"))
    // grid-complete: a segment missing digit d still owes (0−E)²/E
    val grid = totals.crossJoin(
        broadcast(spark_range9(amounts)))
      .join(counts, Seq("segment", "digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    // ln-ratio form on BOTH sides (oracle too): one libm log path, no
    // cross-engine log10 rounding ambiguity before the round-6
    val bp = round(log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
      log(lit(10.0)), 6)
    val expN = col("t").cast("double") * bp
    val terms = grid
      .withColumn("share", round(col("n").cast("double") / col("t").cast("double"), 6))
      .withColumn("benford_p", bp)
      .withColumn("chi2_term", round(
        (col("n").cast("double") - expN) * (col("n").cast("double") - expN) / expN, 6))
    val perDigit = terms.select(col("segment"),
      col("digit").cast("string").as("bin"), col("n"), col("share"),
      col("benford_p"), col("chi2_term"),
      lit(null).cast("string").as("verdict"))
    val summary = terms.groupBy(col("segment"))
      .agg(sum(col("n")).as("n"),
        sum(col("chi2_term").cast("decimal(18,6)")).cast("double").as("chi2"))
      .select(col("segment"), lit("__total").as("bin"), col("n"),
        lit(null).cast("double").as("share"),
        lit(null).cast("double").as("benford_p"),
        col("chi2").as("chi2_term"),
        when(col("chi2") > chi2Crit, "reject").otherwise("consistent")
          .as("verdict"))
    perDigit.unionByName(summary).orderBy(col("segment"), col("bin"))
  }

  /** The 9-digit dimension frame (1..9), built from the session. */
  private def spark_range9(any: DataFrame): DataFrame = {
    val s = any.sparkSession
    s.range(1, 10).select(col("id").as("digit"))
  }

  /** q192: the Benford audit of order totals per order priority. */
  def q192Benford(s: SparkSession, dir: String): DataFrame =
    firstDigitAudit(Tables.orders(s, dir)
      .select(col("o_orderpriority").as("segment"),
        col("o_totalprice").as("amount")))
}
