package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Split-conformal prediction intervals (Papadopoulos et al. '02;
  * Vovk's inductive conformal framework) for a corpus-level regressor
  * — the distribution-free uncertainty read a data pipeline wants
  * before trusting ANY learned score: calibrate a residual quantile on
  * a held-out split, and the interval ŷ ± q̂ covers ≥ 1−α of fresh
  * points with NO distributional assumption. Here the regressor is the
  * token-count-from-n_chars line (the cheapest nontrivial ŷ with exact
  * integer inputs); the deliverable is the per-source EVAL coverage
  * table — sources whose coverage craters under a marginally-valid q̂
  * are exactly the sources whose length distribution is exchange-
  * ability-breaking (template farms, truncation bugs), making this the
  * uncertainty-family companion of q186's KS drift.
  *
  * Splits are q32's pure-function-of-id md5 assignment (Splits.of):
  * train+val calibrate, test evaluates — stable across runs/engines.
  *
  * Scale shape: regression moments are ONE map-side-combined aggregate
  * over the calibration split (exact integer Σx/Σy/Σxx/Σxy as
  * DECIMAL(38,0)); the conformal quantile is an EXACT order statistic
  * computed the q167 way — residuals aggregate to (value, count) and
  * one cumulative window runs over the ≤ |distinct rounded values|
  * frame, never raw rows; eval coverage is one more conditional
  * aggregate with q̂/a/b attached by broadcast. Nothing sorts the
  * corpus.
  *
  * Determinism: a, b rounded 12 from exact moments; residuals
  * |y − (a + b·x)| rounded 6 (bounding the distinct-value frame);
  * q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest rounded residual (the
  * finite-sample-valid rank), an exact value; coverage compares
  * rounded-6 residuals to q̂ — no ulp at the boundary. */
object Conformal {

  /** Per-source eval coverage of the calibrated ±q̂ interval at
    * α = 0.1, plus an `__overall` row: (source, n_eval, n_covered,
    * coverage, q_hat, slope, intercept). `docs` needs
    * (doc_id, text, source, n_chars). */
  def lengthIntervalCoverage(docs: DataFrame, alpha: Double = 0.1): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"),
      col("n_chars").cast("long").as("x"),
      TextAnalysis.tokenCount(col("text")).as("y"),
      Splits.of(col("doc_id")).as("split"))
    val pinned = base.localCheckpoint() // moments + residuals + eval reads
    val cal = pinned.filter(col("split") =!= "test")
    val mom = cal.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
    val nD = col("n").cast("double")
    val b = round((nD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
      (nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")), 12)
    val fitted = mom.select(col("n").as("n_cal"), b.as("slope"),
      round((col("sy").cast("double") - b * col("sx").cast("double")) /
        nD, 12).as("intercept"))
    val withRes = cal.crossJoin(broadcast(fitted))
      .withColumn("r", round(abs(col("y").cast("double") -
        (col("intercept") + col("slope") * col("x").cast("double"))), 6))
    // exact order statistic over the (value, count) aggregate — the
    // q167 discipline: the window runs on ≤ |distinct rounded residuals|
    val k = ceil((col("n_cal").cast("double") + 1.0) * (1.0 - alpha))
    val byR = PrefixSum.runningSum(
      withRes.groupBy(col("n_cal"), col("slope"), col("intercept"),
        col("r")).agg(count(lit(1)).as("c")),
      col("r"), col("c"), "cum") // two-level prefix sum (PrefixSum note)
    val qhat = byR.filter(col("cum") >= least(k, col("n_cal")))
      .groupBy(col("n_cal"), col("slope"), col("intercept"))
      .agg(min(col("r")).as("q_hat"))
    val eval0 = pinned.filter(col("split") === "test")
      .crossJoin(broadcast(qhat))
      .withColumn("covered",
        (round(abs(col("y").cast("double") -
          (col("intercept") + col("slope") * col("x").cast("double"))), 6)
          <= col("q_hat")).cast("long"))
    val perSource = eval0.groupBy(col("source"))
      .agg(count(lit(1)).as("n_eval"), sum(col("covered")).as("n_covered"),
        max(col("q_hat")).as("q_hat"), max(col("slope")).as("slope"),
        max(col("intercept")).as("intercept"))
    val overall = eval0.groupBy()
      .agg(count(lit(1)).as("n_eval"), sum(col("covered")).as("n_covered"),
        max(col("q_hat")).as("q_hat"), max(col("slope")).as("slope"),
        max(col("intercept")).as("intercept"))
      .select(lit("__overall").as("source"), col("n_eval"), col("n_covered"),
        col("q_hat"), col("slope"), col("intercept"))
    perSource.unionByName(overall)
      .select(col("source"), col("n_eval"), col("n_covered"),
        round(col("n_covered").cast("double") / col("n_eval").cast("double"), 6)
          .as("coverage"),
        col("q_hat"), col("slope"), col("intercept"))
      .orderBy(col("source"))
  }

  /** q193: conformal length-interval coverage over documents. */
  def q193Conformal(s: SparkSession, dir: String): DataFrame =
    lengthIntervalCoverage(Tables.documents(s, dir))
}
