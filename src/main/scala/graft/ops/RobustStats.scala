package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** q222: TOKEN-WEIGHTED length quantiles per source — where the
    * median TOKEN lives, not the median DOCUMENT: each length value
    * weighs by v·c tokens, so w_p50 answers "half the training tokens
    * come from docs at least this long". On heavy-tailed corpora this
    * sits far above q88's doc-median (length-biased sampling — the
    * view that matters when budgets are counted in tokens, not rows).
    * Same exact machinery as q88: aggregated histogram, cumulative
    * TOKEN mass, lower-quantile cut via integer cross-multiplication
    * (cm·q_den ≥ m·q_num — no division anywhere). */
  def q222WeightedQuantiles(s: SparkSession, dir: String): DataFrame =
    weightedQuantiles(Tables.documents(s, dir))

  /** The core over any (source, text) frame. */
  def weightedQuantiles(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = Par.widen(docs)
      .select(col("source"), TextAnalysis.tokenCount(col("text")).as("v"))
      .groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
    val mass = col("v").cast("decimal(19,0)") * col("c").cast("decimal(19,0)")
    val totals = hist.groupBy(col("source"))
      .agg(sum(mass).cast("decimal(38,0)").as("m"))
    val w = Window.partitionBy(col("source")).orderBy(col("v"))
    hist.withColumn("cm", sum(mass).over(w).cast("decimal(38,0)"))
      .join(broadcast(totals), Seq("source"))
      .groupBy(col("source"), col("m"))
      .agg(
        min(when(col("cm") * 2 >= col("m"), col("v"))).as("w_p50"),
        min(when(col("cm") * 10 >= col("m") * 9, col("v"))).as("w_p90"),
        min(when(col("cm") * 100 >= col("m") * 99, col("v"))).as("w_p99"))
      .select(col("source"), col("m").cast("long").as("n_tokens"),
        col("w_p50"), col("w_p90"), col("w_p99"))
      .orderBy(col("source"))
  }

  /** q223: TOKEN CONCENTRATION per source — the exact share of a
    * source's tokens held by its top 1% / 10% LONGEST documents, the
    * doc-level Lorenz points complementing q198's gram-level Gini: a
    * source where 10% of docs hold half the tokens needs doc-level
    * caps before token-budget selection makes sense.
    *
    * Exact from the aggregated histogram, descending: the cut row
    * (first cumulative doc-rank ≥ k = ⌈n·pct⌉) contributes its value
    * for the k − rank_before docs that fall inside the cut —
    * `min(CASE WHEN rank ≥ k)` picks exactly that row because past the
    * cut the candidate expression is strictly increasing in the
    * descending scan ((v_r − v_{r+1})(c_r + R_prev − k) > 0 — the
    * house cum-cut argument, weighted form). */
  def q223TokenConcentration(s: SparkSession, dir: String): DataFrame =
    tokenConcentration(Tables.documents(s, dir))

  /** The core over any (source, text) frame. */
  def tokenConcentration(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = Par.widen(docs)
      .select(col("source"), TextAnalysis.tokenCount(col("text")).as("v"))
      .groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
    val mass = col("v").cast("decimal(19,0)") * col("c").cast("decimal(19,0)")
    val totals = hist.groupBy(col("source"))
      .agg(sum(col("c")).as("n"), sum(mass).cast("decimal(38,0)").as("m"))
    val w = Window.partitionBy(col("source")).orderBy(col("v").desc)
    val cu = hist
      .withColumn("cr", sum(col("c")).over(w))
      .withColumn("cm", sum(mass).over(w).cast("decimal(38,0)"))
      .join(broadcast(totals), Seq("source"))
      .withColumn("cr_prev", col("cr") - col("c"))
      .withColumn("cm_prev",
        (col("cm") - mass.cast("decimal(38,0)")).cast("decimal(38,0)"))
    def shareAt(kExpr: Column): Column = {
      val topMass = col("cm_prev") +
        (col("v").cast("decimal(19,0)") *
          (kExpr - col("cr_prev")).cast("decimal(19,0)")).cast("decimal(38,0)")
      round(min(when(col("cr") >= kExpr, topMass)).cast("double") /
        max(col("m")).cast("double"), 6)
    }
    cu.groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        max(col("m")).cast("long").as("n_tokens"),
        shareAt(expr("(n * 1 + 99) DIV 100")).as("top1pct_share"),
        shareAt(expr("(n * 1 + 9) DIV 10")).as("top10pct_share"))
      .orderBy(col("source"))
  }

  /** q228: MAD OUTLIER AUDIT per source — the robust-dispersion
    * companion of q214's robust locations: median absolute deviation
    * (the 50% breakdown-point scale estimate) and the count of docs
    * whose modified z-score 0.6745·|x−med|/MAD exceeds 3.5 (Iglewicz &
    * Hoaglin's rule). The flag the q39 filter pipeline can't express:
    * "unusually long FOR ITS SOURCE", robust to the very outliers it
    * hunts.
    *
    * Exact and integer until the final fraction: both medians are
    * lower-medians over VALUE-AGGREGATED histograms (the q88 recipe —
    * the deviation histogram derives from the value histogram by
    * remapping v → |v − med|, never rescanning docs), and the 3.5 cut
    * cross-multiplies to `1349·d > 7000·MAD` (6745/5000 = 1349/1000,
    * 3.5 = 7/2) so no float ever decides a flag. MAD = 0 (over half
    * the mass on one value) flags every d > 0 — the standard
    * degenerate-rule reading, identical on both engines. */
  def q228MadOutliers(s: SparkSession, dir: String): DataFrame =
    madOutliers(Tables.documents(s, dir))

  /** The core over any (source, text) frame. */
  def madOutliers(docs: DataFrame): DataFrame = {
    val hist = Par.widen(docs)
      .select(col("source"), TextAnalysis.tokenCount(col("text")).as("v"))
      .groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
    val totals = hist.groupBy(col("source").as("ts")).agg(sum(col("c")).as("n"))
    val w = Window.partitionBy(col("source")).orderBy(col("v"))
    val med = hist.withColumn("cum", sum(col("c")).over(w))
      .join(broadcast(totals), col("source") === col("ts"))
      .groupBy(col("source"), col("n"))
      .agg(min(when(col("cum") >= expr("(n + 1) DIV 2"), col("v"))).as("med"))
    val dev = hist.join(broadcast(med.select(col("source").as("ms"),
        col("n"), col("med"))), col("source") === col("ms"))
      .select(col("source"), col("n"), col("med"),
        abs(col("v") - col("med")).as("d"), col("c"))
    val dhist = dev.groupBy(col("source"), col("n"), col("med"), col("d"))
      .agg(sum(col("c")).as("c"))
    val wd = Window.partitionBy(col("source")).orderBy(col("d"))
    val mad = dhist.withColumn("cum", sum(col("c")).over(wd))
      .groupBy(col("source"), col("n"), col("med"))
      .agg(min(when(col("cum") >= expr("(n + 1) DIV 2"), col("d"))).as("mad"))
    dev.select(col("source"), col("d"), col("c"))
      .join(broadcast(mad), Seq("source"))
      .groupBy(col("source"), col("n").as("n_docs"), col("med"), col("mad"))
      .agg(sum(when(col("d") * 1349L > col("mad") * 7000L, col("c"))
        .otherwise(lit(0L))).as("n_outliers"),
        max(col("d")).as("max_d"))
      .withColumn("outlier_frac",
        round(col("n_outliers").cast("double") / col("n_docs").cast("double"), 6))
      // the worst modified z-score — keeps the gate discriminating on
      // corpora whose flag count is legitimately zero
      .withColumn("max_mz",
        when(col("mad") > 0, round(lit(0.6745) * col("max_d").cast("double") /
          col("mad").cast("double"), 6)))
      .drop("max_d")
      .orderBy(col("source"))
  }

  /** q257: MAHALANOBIS outliers over the (token count, distinct-token
    * count) plane — the MULTIVARIATE escalation of q228's per-axis MAD
    * fence: a doc can sit inside both marginal fences yet far off the
    * Heaps ridge (many tokens from a tiny vocabulary — the classic
    * repeated-template shape), and that is exactly what the
    * covariance-whitened distance catches.
    *
    * Exact ingredients: the five moments (Σx, Σy, Σx², Σy², Σxy) as
    * DECIMAL(38,0) integer sums off ONE corpus aggregate; population
    * means/covariances as fixed rounded-12 double expressions; the
    * 2×2 inverse in closed form through the determinant (NULL when
    * degenerate); per-doc d² = (c_yy·dx² − 2·c_xy·dx·dy + c_xx·dy²)/det
    * rounded 6; top-20 by (d² desc, doc_id) via TakeOrdered. */
  def q257MahalanobisOutliers(s: SparkSession, dir: String,
                              k: Int = 20): DataFrame =
    mahalanobisTopK(Par.widen(Tables.documents(s, dir)).select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("x"),
      size(array_distinct(TextAnalysis.tokens(col("text"))))
        .cast("long").as("y")), k)

  /** The distance core over any (doc_id, x: long, y: long) frame. */
  private[graft] def mahalanobisTopK(d0: DataFrame, k: Int): DataFrame = {
    // pinned: the moment pass AND the scoring pass both read it, and
    // the caller's lineage usually tokenizes (r14 soak lesson)
    val d = d0.localCheckpoint()
    val mom = d.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
      sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
    val nD = col("n").cast("double")
    val mx = round(col("sx").cast("double") / nD, 12)
    val my = round(col("sy").cast("double") / nD, 12)
    val cxx = round(col("sxx").cast("double") / nD - mx * mx, 12)
    val cyy = round(col("syy").cast("double") / nD - my * my, 12)
    val cxy = round(col("sxy").cast("double") / nD - mx * my, 12)
    val stats = mom.select(mx.as("mx"), my.as("my"), cxx.as("cxx"),
        cyy.as("cyy"), cxy.as("cxy"))
      .withColumn("det", round(col("cxx") * col("cyy") - col("cxy") * col("cxy"), 12))
    val dx = col("x").cast("double") - col("mx")
    val dy = col("y").cast("double") - col("my")
    d.crossJoin(broadcast(stats))
      .withColumn("d2", when(col("det") > 0.0,
        round((col("cyy") * dx * dx - lit(2.0) * col("cxy") * dx * dy +
          col("cxx") * dy * dy) / col("det"), 6)))
      .select(col("doc_id"), col("x").as("n_tokens"), col("y").as("n_types"),
        col("d2"))
      .orderBy(col("d2").desc, col("doc_id")).limit(k)
  }
}
