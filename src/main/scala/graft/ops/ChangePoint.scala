package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** CUSUM change-point detection (Page 1954) on per-type daily event
  * volume — the monitoring read that catches a SUSTAINED small shift
  * the day it accumulates past the decision interval, where q105's
  * per-hour z-score only fires on single large spikes and q144's PSI
  * needs a whole comparison window. Reference scope note: the
  * reference engine has no monitoring surface; this extends the drift
  * family (q144/q186/q187).
  *
  * Recursion without a recursive plan: the clamped CUSUM
  * S_t = max(0, S_{t−1} + x_t − μ − k) has the closed form
  * S_t = P_t − min_{j ≤ t} P_j over the prefix sums P of (x − μ − k)
  * — so two window passes (running sum, running min) over the
  * day grid replace the sequential recursion exactly.
  *
  * Scale shape: ONE corpus-collapsing (type, day) count aggregate;
  * the day spine is the aggregated distinct-day frame cross-joined to
  * the ≤ |types| dimension (zero-filled — a silent dead day IS
  * signal); every window partitions by type over ≤ |days| rows of
  * that grid, never raw events. Baseline μ/σ come from the grid's
  * first-half days (the q144 split convention) via exact integer
  * moments.
  *
  * Determinism: counts exact; μ, σ, k = σ/2, h = 4σ rounded 12; the
  * per-day deviation y = x − μ − k is a rounded-12 double cast to
  * DECIMAL(28,12), so prefix sums and running minima are EXACT and
  * order-free; the alarm compares decimals (no ulp at the decision
  * boundary); reported statistics round 6 (the q41 rule). */
object ChangePoint {

  /** Per-type one-sided (upward) CUSUM over daily counts:
    * (event_type, n_days, mu, sigma, h, max_s, alarm_day) where
    * alarm_day = first day S_t exceeds h (null if never). `events`
    * needs (`ts` epoch-nanos long, `event_type`). */
  def cusumDaily(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_type"),
      expr("ts DIV 86400000000000").as("day"))
    val counts = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("x"))
    val days = counts.select(col("day")).distinct()
    val types = counts.select(col("event_type")).distinct()
    val grid = types.crossJoin(days)
      .join(counts, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    val split = days.agg(expr("(min(day) + max(day) + 1) DIV 2").as("__split"))
    val base = grid.crossJoin(broadcast(split))
      .filter(col("day") < col("__split"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n0"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"))
      .select(col("event_type"), col("n0"),
        round(col("s1").cast("double") / col("n0").cast("double"), 12).as("mu"),
        round(sqrt(
          (col("s2").cast("double") - col("s1").cast("double") *
            col("s1").cast("double") / col("n0").cast("double")) /
          (col("n0").cast("double") - 1.0)), 12).as("sigma"))
      .withColumn("k", round(col("sigma") / 2.0, 12))
      .withColumn("h", round(col("sigma") * 4.0, 12))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val scored = grid.join(broadcast(base), Seq("event_type"))
      .withColumn("y", round(col("x").cast("double") - col("mu") - col("k"), 12)
        .cast("decimal(28,12)"))
      .withColumn("p", sum(col("y")).over(byDay))
      .withColumn("pmin", least(min(col("p")).over(byDay), lit(0L).cast("decimal(28,12)")))
      .withColumn("s", col("p") - col("pmin"))
    scored.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        max(col("mu")).as("mu"), max(col("sigma")).as("sigma"),
        max(col("h")).as("h"),
        max(col("s")).as("max_s_d"),
        min(when(col("s") > col("h").cast("decimal(28,12)"), col("day")))
          .as("alarm_day"))
      .select(col("event_type"), col("n_days"),
        round(col("mu"), 6).as("mu"), round(col("sigma"), 6).as("sigma"),
        round(col("h"), 6).as("h"),
        round(col("max_s_d").cast("double"), 6).as("max_s"),
        col("alarm_day"))
      .orderBy(col("event_type"))
  }

  /** q195: the CUSUM read over the events corpus. */
  def q195CusumDaily(s: SparkSession, dir: String): DataFrame =
    cusumDaily(Tables.events(s, dir))

  /** q234: WALD'S SPRT (Sequential Probability Ratio Test, Wald '45)
    * per event type — the DECISION layer the monitoring family lacked:
    * CUSUM (q195) scores a shift, bursts (q210) segment episodes,
    * Mann–Kendall (q215) tests trend; SPRT answers "can we already
    * STOP and call it" with guaranteed error rates (α = β = 0.05).
    * H₀: daily rate = μ (the type's own mean); H₁: rate = 2μ (the
    * q210 s = 2 convention). Poisson log-likelihood ratio per day
    * llr_d = k_d·ln 2 − μ, cumulative over days; accept H₁ at
    * cum ≥ ln 19, H₀ at cum ≤ −ln 19, else keep sampling.
    *
    * Determinism: each llr term is rounded 12 and decimal-summed (the
    * q210 cost recipe); the boundary is the shared rounded-12 ln 19
    * literal; the crossing day is min(day WHERE |cum| ≥ bound) with
    * the decision read from the SIGN AT THAT DAY (not the final cum).
    * Shape: the q195 zero-filled (type × day) spine; the cumulative is
    * a per-type window over calendar-bounded aggregated rows. */
  def q234SprtMonitor(s: SparkSession, dir: String): DataFrame =
    sprtDaily(Tables.events(s, dir))

  /** The SPRT core over any (ts epoch-nanos, event_type) frame. */
  def sprtDaily(events: DataFrame, s: Double = 2.0): DataFrame = {
    val ev = events.select(col("event_type"),
      expr("ts DIV 86400000000000").as("day"))
    val counts = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("x"))
    val days = counts.select(col("day")).distinct()
    val grid = counts.select(col("event_type")).distinct()
      .crossJoin(days)
      .join(counts, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    val base = grid.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nd"), sum(col("x")).as("tot"))
      .withColumn("mu", round(col("tot").cast("double") /
        col("nd").cast("double"), 12))
      .select(col("event_type"), col("nd"), col("mu"))
    val lnS = BigDecimal(math.log(s)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    val bound = BigDecimal(math.log(19.0))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val scored = grid.join(broadcast(base), Seq("event_type"))
      .withColumn("llr",
        round(col("x").cast("double") * lit(lnS) -
          lit(s - 1.0) * col("mu"), 12).cast("decimal(28,12)"))
      .withColumn("cum", sum(col("llr")).over(w))
    scored.groupBy(col("event_type"))
      .agg(max(col("nd")).as("n_days"),
        round(max(col("mu")), 6).as("mu"),
        round(max(col("cum")).cast("double"), 6).as("max_cum"),
        round(sum(col("llr")).cast("double"), 6).as("final_cum"),
        min(when(abs(col("cum")) >= lit(bound).cast("decimal(28,12)"),
          col("day"))).as("cross_day"),
        min(when(abs(col("cum")) >= lit(bound).cast("decimal(28,12)"),
          struct(col("day"), when(col("cum") > 0, lit("h1"))
            .otherwise(lit("h0")).as("dec")))).as("cross"))
      .select(col("event_type"), col("n_days"), col("mu"), col("max_cum"),
        col("final_cum"), col("cross_day"), col("cross.dec").as("decision"))
      .orderBy(col("event_type"))
  }

  /** q210: TWO-STATE BURST DETECTION (Kleinberg, KDD'02) on per-type
    * daily volume — the episodic companion to q195's CUSUM: CUSUM
    * flags a sustained LEVEL SHIFT once; the burst automaton segments
    * the whole timeline into base/burst EPISODES (state 1 emits at
    * rate s·λ, entering costs γ, staying is free), which is the read
    * an on-call or a crawl-scheduler wants ("which days WERE bursty"),
    * not just "did the mean move".
    *
    * Forward DP, exact: emissions are negative-log-Poisson costs
    * without the k! term (constant across states — cancels in every
    * comparison): e_s(k) = round12(λ_s − k·ln λ_s); entering burst
    * costs γ = round12(ln n_days). Each cost is a rounded-12 double
    * held as an EXACT decimal; the DP is adds and mins over those
    * decimals — no float accumulates, so the oracle's recursive CTE
    * lands on bit-identical costs. `burst_now` is the forward
    * (filtering) state: c1 < c0 strictly.
    *
    * Scale shape: ONE corpus-collapsing (type, day) count aggregate
    * (the q195 spine, zero-filled); the genuinely-sequential per-type
    * DP runs EXECUTOR-SIDE via `flatMapGroups` (one group per type,
    * |days| rows each — bounded by the calendar, never by events), so
    * nothing data-cardinality-shaped ever reaches the driver: at 100 TB
    * with high type cardinality × years of days the DP parallelizes
    * across types instead of serializing through one driver loop. */
  def q210BurstDetection(s: SparkSession, dir: String): DataFrame =
    burstDaily(Tables.events(s, dir))

  /** The DP core over any (`ts` epoch-nanos, `event_type`) frame. */
  def burstDaily(events: DataFrame, s: Double = 2.0): DataFrame = {
    val spark = events.sparkSession
    val ev = events.select(col("event_type"),
      expr("ts DIV 86400000000000").as("day"))
    val counts = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("x"))
    val days = counts.select(col("day")).distinct()
    import spark.implicits._
    val grid = counts.select(col("event_type")).distinct()
      .crossJoin(days)
      .join(counts, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
      .select(col("event_type"), col("day"), col("x"))
      .as[(String, Long, Long)]
    val rows = grid.groupByKey(_._1).flatMapGroups { (tpe, it) =>
      def r12(x: Double): Double =
        BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      def d(x: Double): BigDecimal = BigDecimal(x).setScale(12)
      // one group = one type's |days| rows (calendar-bounded): buffer +
      // sort locally; the DP itself is unchanged, same decimals
      val byDay = it.map(t => (t._2, t._3)).toArray.sortBy(_._1)
      val nd = byDay.length
      val lam0 = r12(byDay.map(_._2).sum.toDouble / nd.toDouble)
      if (lam0 <= 0.0) Iterator.empty
      else {
        val lam1 = r12(s * lam0)
        val gam = d(r12(math.log(nd.toDouble)))
        def e(lam: Double, k: Long): BigDecimal =
          d(r12(lam - k.toDouble * math.log(lam)))
        var c0 = e(lam0, byDay.head._2)
        var c1 = gam + e(lam1, byDay.head._2)
        val first = (tpe, byDay.head._1, byDay.head._2,
          c0.toDouble, c1.toDouble, c1 < c0)
        Iterator.single(first) ++ byDay.tail.iterator.map { case (day, k) =>
          val n0 = c0.min(c1) + e(lam0, k)
          val n1 = (c0 + gam).min(c1) + e(lam1, k)
          c0 = n0; c1 = n1
          (tpe, day, k, c0.toDouble, c1.toDouble, c1 < c0)
        }
      }
    }
    rows.toDF("event_type", "day", "x", "c0", "c1", "burst_now")
      .select(col("event_type"), col("day"), col("x"),
        round(col("c0"), 6).as("cost_base"),
        round(col("c1"), 6).as("cost_burst"),
        col("burst_now"))
      .orderBy(col("event_type"), col("day"))
  }

  /** q215: MANN–KENDALL TREND TEST (Mann '45, Kendall '75) on per-type
    * daily volume — the nonparametric "is this drifting monotonically"
    * read that completes the monitoring family: q195 CUSUM = sustained
    * level SHIFT, q210 bursts = EPISODES, Mann–Kendall = gradual
    * TREND no single day of which alarms anything. S = Σ_{i<j}
    * sign(x_j − x_i) over day pairs, tie-corrected normal variance,
    * continuity-corrected z.
    *
    * Shape: the q195 zero-filled (type × day) grid; the pair sum is a
    * self-join on day inequality over AGGREGATED day rows (≤ |days|²
    * pairs per type — bounded by the calendar, never by events); ties
    * correct via one value-multiplicity aggregate. Exact integers
    * until varS's /18 and the final z (round 6); the 1.96 two-sided
    * 5% cut is a shared literal. */
  def q215MannKendall(s: SparkSession, dir: String): DataFrame =
    mannKendallDaily(Tables.events(s, dir))

  def mannKendallDaily(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_type"),
      expr("ts DIV 86400000000000").as("day"))
    val counts = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("x"))
    val days = counts.select(col("day")).distinct()
    val grid = counts.select(col("event_type")).distinct()
      .crossJoin(days)
      .join(counts, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
      .localCheckpoint() // pair join reads both sides + the tie agg
    val sStat = grid.as("a").join(grid.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        signum(col("b.x") - col("a.x")).cast("long").as("sg"))
      .groupBy(col("event_type")).agg(sum(col("sg")).as("s_stat"))
    val nOf = grid.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val ties = grid.groupBy(col("event_type"), col("x"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("t").cast("decimal(12,0)") *
        (col("t") - 1).cast("decimal(12,0)") *
        (col("t") * 2 + 5).cast("decimal(13,0)")).cast("decimal(38,0)")
        .as("tie_term"))
    nOf.join(broadcast(sStat), Seq("event_type"))
      .join(broadcast(ties), Seq("event_type"))
      .withColumn("var_num",
        (col("n").cast("decimal(12,0)") * (col("n") - 1).cast("decimal(12,0)") *
          (col("n") * 2 + 5).cast("decimal(13,0)")).cast("decimal(38,0)")
          - col("tie_term"))
      .withColumn("var_s", round(col("var_num").cast("double") / 18.0, 12))
      .withColumn("z",
        when(col("var_s") <= 0.0, lit(null).cast("double"))
          .otherwise(round(
            when(col("s_stat") > 0, (col("s_stat") - 1).cast("double"))
              .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double"))
              .otherwise(lit(0.0)) / sqrt(col("var_s")), 6)))
      .select(col("event_type"), col("n").as("n_days"), col("s_stat"),
        round(col("var_s"), 6).as("var_s"), col("z"),
        when(col("z") > 1.96, lit("up"))
          .when(col("z") < -1.96, lit("down"))
          .otherwise(lit("none")).as("trend"))
      .orderBy(col("event_type"))
  }

  /** q219: THEIL–SEN SLOPE (Theil '50, Sen '68) per event type — the
    * robust trend MAGNITUDE completing q215's Mann–Kendall
    * significance: the median of all pairwise slopes
    * (x_j − x_i)/(day_j − day_i), immune to the outlier days that
    * drag a least-squares fit. Slopes are rounded 12 and AGGREGATED
    * BY VALUE; the median is the house exact-order-statistic cut
    * (cumulative window over the distinct-slope frame, lower median
    * at rank (n+1) DIV 2) — never a row sort. Pair volume is
    * ≤ |days|² per type over the AGGREGATED day grid, bounded by the
    * calendar. */
  def q219TheilSen(s: SparkSession, dir: String): DataFrame =
    theilSenDaily(Tables.events(s, dir))

  def theilSenDaily(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_type"),
      expr("ts DIV 86400000000000").as("day"))
    val counts = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("x"))
    val days = counts.select(col("day")).distinct()
    val grid = counts.select(col("event_type")).distinct()
      .crossJoin(days)
      .join(counts, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
      .localCheckpoint() // both sides of the pair join
    val slopes = grid.as("a").join(grid.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        round((col("b.x") - col("a.x")).cast("double") /
          (col("b.day") - col("a.day")).cast("double"), 12).as("sl"))
      .groupBy(col("event_type"), col("sl")).agg(count(lit(1)).as("c"))
    val totals = slopes.groupBy(col("event_type"))
      .agg(sum(col("c")).as("np"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("sl"))
    slopes.withColumn("cum", sum(col("c")).over(w))
      .join(broadcast(totals), Seq("event_type"))
      .groupBy(col("event_type"), col("np"))
      .agg(min(when(col("cum") >= expr("(np + 1) DIV 2"), col("sl")))
        .as("med"))
      .select(col("event_type"), col("np").as("n_pairs"),
        round(col("med"), 6).as("median_slope"))
      .orderBy(col("event_type"))
  }
}
