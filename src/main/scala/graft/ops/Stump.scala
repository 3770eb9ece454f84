package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact decision-stump training — the simplest real TRAINED model in
  * the quality family, and the canonical feature-triage question ("how
  * much does raw length alone predict the quality band?"): over every
  * candidate threshold t on a long feature, the information gain of
  * the split x ≤ t, computed EXACTLY from the value histogram.
  *
  * Scale shape: one map-side-combined aggregate to the
  * (value, count, positives) histogram; cumulative counts via the
  * two-level [[PrefixSum]] (never a single-partition window over the
  * distinct-value frame); totals ride a broadcast 1-row aggregate; the
  * top-k cut is a TakeOrdered. Candidate thresholds are the distinct
  * feature values minus the maximum (an empty right side is not a
  * split).
  *
  * Determinism: counts exact; entropies in nats from fixed
  * left-to-right double expressions with 0·ln0 guarded per term, each
  * entropy and the gain rounded 12; bits via the ln2 literal, rounded
  * 6; ties broken by ascending threshold. */
object Stump {

  private val ln2 = 0.6931471805599453

  /** Entropy (nats) of a (pos, n) side, each p·ln p term guarded. */
  private def entropyNats(pos: org.apache.spark.sql.Column,
                          n: org.apache.spark.sql.Column) = {
    val p1 = pos.cast("double") / n.cast("double")
    val p0 = (n - pos).cast("double") / n.cast("double")
    round(
      when(pos > 0 && pos < n, -(p1 * log(p1)) - (p0 * log(p0)))
        .otherwise(lit(0.0)), 12)
  }

  /** q252: best length threshold for the q21 quality band — feature =
    * raw char length, label = (token count ∈ [20, 200]). Emits the
    * top-5 candidate thresholds by (gain desc, threshold asc):
    * (threshold, n_left, pos_left, n_right, pos_right, gain_bits). */
  def q252DecisionStump(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val d = Tables.documents(s, dir).select(
      length(col("text")).cast("long").as("v"),
      (TextAnalysis.tokenCount(col("text")).between(20L, 200L))
        .cast("long").as("y"))
    stumpGains(d).orderBy(col("gain_bits").desc, col("threshold")).limit(k)
  }

  /** All candidate splits with exact gains over any (v: long,
    * y: 0/1 long) frame. */
  def stumpGains(d: DataFrame): DataFrame = {
    val hist = d.groupBy(col("v"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("pos"))
    val cum = PrefixSum.runningSum(
      PrefixSum.runningSum(hist, col("v"), col("c"), "n_left"),
      col("v"), col("pos"), "pos_left")
    val totals = hist.agg(sum(col("c")).as("n"), sum(col("pos")).as("p"),
        max(col("v")).as("vmax"))
    val sides = cum.crossJoin(broadcast(totals))
      .filter(col("v") < col("vmax")) // an empty right side is not a split
      .withColumn("n_right", col("n") - col("n_left"))
      .withColumn("pos_right", col("p") - col("pos_left"))
    val hRoot = entropyNats(col("p"), col("n"))
    val gainNats = round(
      hRoot -
        round((col("n_left").cast("double") / col("n").cast("double")) *
          entropyNats(col("pos_left"), col("n_left")), 12) -
        round((col("n_right").cast("double") / col("n").cast("double")) *
          entropyNats(col("pos_right"), col("n_right")), 12), 12)
    sides.select(col("v").as("threshold"),
        col("n_left"), col("pos_left"), col("n_right"), col("pos_right"),
        round(gainNats / lit(ln2), 6).as("gain_bits"))
  }
}
