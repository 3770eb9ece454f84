package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** q68: a LEARNED quality classifier — full-batch logistic regression
  * that distills the q39 rule verdicts into a linear scorer over cheap
  * per-doc signals (the standard pipeline move: distill an expensive
  * labeler — rules today, an LLM judge in production — into a model
  * applicable as one narrow projection at corpus scale).
  *
  * Training is DISTRIBUTED but deterministic, and — like q65's BPE
  * merges — fully REPLAYABLE by the oracle: a fixed number of
  * full-batch gradient steps, each ONE map-side-combined aggregate
  * whose five gradient sums travel as DECIMAL(28,12) of per-row terms
  * rounded to 12 digits. The sigmoid is rounded to 9 digits BEFORE it
  * enters the gradient (exp() differs across libms by an ulp; at 9
  * digits the round-boundary band is ~4e-7 per value, so both engines
  * see the same p), and the weight update `round(w - g/n, 12)` is
  * evaluated INSIDE Spark so both sides use their engine's own round
  * — the exact pairing every other float query already relies on.
  *
  * Scale shape: the feature frame is one narrow projection of the
  * corpus, cached once; each iteration's job aggregates it with
  * map-side partials and returns five decimals to the driver —
  * constant driver state, no per-row data ever collected. At 100 TB:
  * 15 passes over a cached 5-double projection (persist it to a
  * parquet scratch table first if memory-pressured); scoring is a
  * stateless narrow map, streamable like q39's verdicts.
  */
object QualityModel {

  val Iters = 15
  val LearningRate = 4.0

  def q68QualityModel(s: SparkSession, dir: String): DataFrame = {
    val feats = features(Tables.documents(s, dir))
    val w = trainLogistic(feats)
    score(feats, w).orderBy(col("doc_id"))
  }

  /** q97: the model-TRUST table next to the model — reliability
    * calibration of the q68 scorer: per predicted-probability decile,
    * how many docs land there, the mean predicted probability and the
    * empirical keep rate. A well-calibrated scorer has the two close in
    * every populated bin; a gap says "don't threshold here". Bins are
    * floor(score·10) with 1.0 folded into the top bin; the mean rides a
    * DECIMAL sum of the round-9 scores (accumulation-order-free), one
    * rounded divide at the end. One aggregate over the scored frame —
    * the training cost is q68's, the calibration itself is ~free. */
  def q97QualityCalibration(s: SparkSession, dir: String): DataFrame = {
    val feats = features(Tables.documents(s, dir))
    val w = trainLogistic(feats)
    feats.select(pOf(w).as("score"), col("y"))
      .withColumn("bin", least(floor(col("score") * 10), lit(9L)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("score").cast("decimal(20,9)")).cast("double") /
          count(lit(1)).cast("double"), 12).as("mean_score"),
        round(sum(when(col("y") === 1.0, 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 12).as("keep_rate"))
      .orderBy(col("bin"))
  }

  /** q170: ISOTONIC (PAV) calibration of the distilled quality model —
    * the nonparametric upgrade of q97's reliability table: fit the
    * best NONDECREASING keep-rate over the score bins (pool-adjacent-
    * violators), the standard probability-calibration step before a
    * model score gates real data (Zadrozny & Elkan 2002). PAV runs
    * driver-side over the ≤10-bin aggregate with EXACT Long sums —
    * violations decided by integer cross-multiply, never a float — so
    * the fit is bounded work and replayable: the oracle computes the
    * same fit through the minimax closed form
    * iso(i) = max_{j≤i} min_{k≥i} rate(j..k), whose interval rationals
    * it orders by a 10^12-scaled integer (exact while distinct bin
    * rationals differ by ≥ 1/n², i.e. any gate-scale corpus). Both
    * sides emit one IEEE division of exact longs, rounded to 12. */
  def q170IsotonicCalibration(s: SparkSession, dir: String): DataFrame = {
    val feats = features(Tables.documents(s, dir))
    val w = trainLogistic(feats)
    val binRows = feats.select(pOf(w).as("score"), col("y"))
      .withColumn("bin", least(floor(col("score") * 10), lit(9L)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("k"))
      .orderBy(col("bin"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fitted: Map[Long, Double] = pav(binRows.toSeq).flatMap(p =>
      p._1.map(_ -> (p._2.toDouble / p._3.toDouble))).toMap
    import s.implicits._
    binRows.map { case (b, n, k) =>
      (b, n,
        BigDecimal(k.toDouble / n.toDouble)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(fitted(b))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.toDF("bin", "n_docs", "raw_rate", "iso_rate")
      .orderBy(col("bin"))
  }

  /** Pool-adjacent-violators over ordered (bin, n, k) rows with EXACT
    * Long arithmetic: pool while the previous pool's rate exceeds the
    * next's (k1/n1 > k2/n2 ⇔ k1·n2 > k2·n1). Returns the pools in
    * order as (member bins, pooled k, pooled n). */
  private[ops] def pav(binRows: Seq[(Long, Long, Long)])
      : Vector[(Vector[Long], Long, Long)] =
    binRows.foldLeft(Vector.empty[(Vector[Long], Long, Long)]) {
      case (acc, (b, n, k)) =>
        var st = acc :+ ((Vector(b), k, n))
        while (st.length >= 2 && {
          val (_, k2, n2) = st(st.length - 2); val (_, k1, n1) = st.last
          k2 * n1 > k1 * n2
        }) {
          val (b2, k2, n2) = st(st.length - 2); val (b1, k1, n1) = st.last
          st = st.dropRight(2) :+ ((b2 ++ b1, k2 + k1, n2 + n1))
        }
        st
    }

  /** Per-doc features from the ONE verdict definition (q39's
    * `filterVerdicts`): x1 is the length margin nt/20 − 1 — centered at
    * the rule threshold so the boundary sits near x1=0 and full-batch
    * GD conditions well; x2..x4 are the remaining quality signals,
    * already O(1). y distills the composed keep verdict. */
  def features(docs: DataFrame, widen: Boolean = true): DataFrame =
    TextAnalysis.filterVerdicts(if (widen) Par.widen(docs) else docs)
      .select(col("doc_id"),
        (col("n_tokens").cast("double") / lit(20.0) - lit(1.0)).as("x1"),
        (col("avg_token_len") / lit(10.0)).as("x2"),
        col("punct_ratio").as("x3"),
        col("dup_frac").as("x4"),
        when(col("keep"), lit(1.0)).otherwise(lit(0.0)).as("y"))

  private def zOf(w: Array[Double]): Column =
    lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
      lit(w(3)) * col("x3") + lit(w(4)) * col("x4")

  private def pOf(w: Array[Double]): Column =
    round(lit(1.0) / (lit(1.0) + exp(-zOf(w))), 9)

  /** `iters` full-batch GD steps from zero weights. Each step is one
    * aggregate job over the cached features; the update arithmetic
    * (division, subtraction, 12-digit round) runs in a 1-row Spark
    * select so its float semantics match every other oracle-paired
    * query. */
  def trainLogistic(feats: DataFrame, iters: Int = Iters,
                    lr: Double = LearningRate): Array[Double] = {
    // cache released in finally: training is the only consumer, and a
    // long-lived session must not accumulate pinned feature frames
    // (the engine-wide cache-hygiene rule; Similarity/Retrieval/
    // Importance all release the same way)
    val f = feats.cache()
    try {
      val n = f.count().toDouble
      require(n > 0, "cannot train the quality model on an empty feature frame")
      var w = Array(0.0, 0.0, 0.0, 0.0, 0.0)
      val xs = Seq(lit(1.0), col("x1"), col("x2"), col("x3"), col("x4"))
      for (_ <- 1 to iters) {
        val p = pOf(w)
        val grads = xs.zipWithIndex.map { case (x, j) =>
          sum(round((p - col("y")) * x, 12).cast("decimal(28,12)")).as(s"g$j")
        }
        val updated = f.agg(grads.head, grads.tail: _*)
          .select((0 until 5).map(j =>
            round(lit(w(j)) - lit(lr) * (col(s"g$j").cast("double") / lit(n)), 12)
              .as(s"w$j")): _*)
          .collect()(0)
        w = Array.tabulate(5)(updated.getDouble)
      }
      w
    } finally f.unpersist(blocking = false)
  }

  /** Stateless scoring projection: score, thresholded prediction, the
    * rule label it distilled, and per-doc agreement. */
  def score(feats: DataFrame, w: Array[Double]): DataFrame =
    feats.select(col("doc_id"),
        pOf(w).as("score"),
        (pOf(w) >= lit(0.5)).as("predicted"),
        (col("y") === lit(1.0)).as("label"))
      .withColumn("correct", col("predicted") === col("label"))

  /** q202: HELD-OUT ranking quality of the distilled model — exact ROC
    * AUC on the q32 md5 test split, trained on train+val only. The
    * honest companion of q97/q170's calibration reads: calibration asks
    * "are the probabilities right?", AUC asks "does the score ORDER
    * kept docs above dropped ones on data it never saw?" — the one
    * number a distilled labeler ships with.
    *
    * AUC = Mann–Whitney (the q187 identity): with scores rounded 9
    * (pOf's own contract), 2U = Σ_v pos(v)·(2·cum_neg_below(v) +
    * neg(v)) over the (score-value) count grid — ties half-credited
    * exactly, all integers until one rounded divide. Per-source rows
    * plus `__overall`; a single-class slice (no pos or no neg in the
    * split) reads NULL, not a crash.
    *
    * Scale shape: training is q68's 15 cached-aggregate passes over
    * the train+val features; the eval is ONE (source × score) count
    * aggregate (scores are round-9 → the value grid is bounded) and
    * windows over THAT grid only. */
  def q202AucHoldout(s: SparkSession, dir: String): DataFrame = {
    val fv = TextAnalysis.filterVerdicts(
        Par.widen(Tables.documents(s, dir)), passThrough = Seq("source"))
      .select(col("doc_id"), col("source"),
        (col("n_tokens").cast("double") / lit(20.0) - lit(1.0)).as("x1"),
        (col("avg_token_len") / lit(10.0)).as("x2"),
        col("punct_ratio").as("x3"),
        col("dup_frac").as("x4"),
        when(col("keep"), lit(1.0)).otherwise(lit(0.0)).as("y"))
      .withColumn("split", Splits.of(col("doc_id")))
      .localCheckpoint() // read by training (×Iters) and the eval
    val w = trainLogistic(fv.filter(col("split") =!= "test"))
    val scored = fv.filter(col("split") === "test")
      .select(col("source"), pOf(w).as("score"), col("y"))
    val perSource = aucOver(scored, col("source"))
    val overall = aucOver(scored.withColumn("source", lit("__overall")),
      col("source"))
    perSource.unionByName(overall).orderBy(col("source"))
  }

  /** Exact tie-aware AUC per group over (group, score, y) rows. */
  private[ops] def aucOver(scored: DataFrame, group: Column): DataFrame = {
    val counts = scored.groupBy(group.as("source"), col("score"))
      .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("pos"),
        sum(when(col("y") =!= 1.0, 1L).otherwise(0L)).as("neg"))
    val withCum = counts.withColumn("cum_neg_below", coalesce(
      sum(col("neg")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("score"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
      lit(0L)))
    withCum.groupBy(col("source"))
      .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum((col("pos") * (lit(2L) * col("cum_neg_below") + col("neg")))
          .cast("decimal(38,0)")).as("u2"))
      .select(col("source"), col("n_pos"), col("n_neg"),
        round(when(col("n_pos") > 0L && col("n_neg") > 0L,
          col("u2").cast("double") /
            (lit(2.0) * col("n_pos").cast("double") *
              col("n_neg").cast("double"))), 6).as("auc"))
  }
}
