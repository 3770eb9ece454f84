package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A/B experiment analysis — the warehouse workload behind every
  * product launch: deterministic unit→variant assignment, per-metric
  * means and a Welch z-test between variants. Reference scope note:
  * the reference engine delegates ad-hoc analytics like this to its
  * query layer (the reference's cmd scripts only export); this
  * operator belongs to the engine's extension surface.
  *
  * Scale shape: assignment is a pure hash column (the Splits rule —
  * md5-prefix of the unit id, stable across runs/engines/retries, no
  * assignment table to join); the metric is per-user event counts, so
  * the corpus collapses through TWO map-side-combined hash aggregates
  * — (type, variant, user) counts, then (type, variant) moments — and
  * the final stats are in-row arithmetic on a ≤ |types| row frame with
  * the 2-row unit-universe totals attached by broadcast. Zero-active
  * users contribute 0 to Σc and Σc² by construction, so using the
  * variant's FULL unit count N in mean/variance is exact, not an
  * approximation.
  *
  * Double determinism: Σc/Σc²/N are exact longs; mean, Welch variance
  * and z are FIXED left-to-right expression trees shared with the
  * oracle, rounded to 6 (the q41 rule); the significance flag tests
  * the ROUNDED z so an ulp near the critical value cannot flip it
  * across engines. */
object Experiment {

  /** Deterministic variant id in [0, nVariants): md5-prefix uint32 of
    * the unit id, mod nVariants. */
  def variantOf(unit: Column, nVariants: Int): Column =
    pmod(conv(substring(md5(unit.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(nVariants.toLong))

  /** Per-event-type Welch z-test of variant 0 vs 1 on the
    * events-per-user metric: (event_type, n_a, n_b, mean_a, mean_b,
    * z, significant). */
  def abTest(events: DataFrame, zCrit: Double = 1.96): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"))
      .withColumn("variant", variantOf(col("user_id"), 2))
    val universe = ev.select(col("user_id"), col("variant")).distinct()
      .groupBy()
      .agg(sum(when(col("variant") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 1L, 1L).otherwise(0L)).as("n_b"))
    val perUser = ev.groupBy(col("event_type"), col("variant"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    val mom = perUser.groupBy(col("event_type"))
      .agg(
        sum(when(col("variant") === 0L, col("c")).otherwise(0L)).as("s1_a"),
        sum(when(col("variant") === 0L, col("c") * col("c")).otherwise(0L)).as("s2_a"),
        sum(when(col("variant") === 1L, col("c")).otherwise(0L)).as("s1_b"),
        sum(when(col("variant") === 1L, col("c") * col("c")).otherwise(0L)).as("s2_b"))
    val nA = col("n_a").cast("double"); val nB = col("n_b").cast("double")
    val meanA = col("s1_a").cast("double") / nA
    val meanB = col("s1_b").cast("double") / nB
    val varA = (col("s2_a").cast("double") -
      col("s1_a").cast("double") * col("s1_a").cast("double") / nA) / (nA - 1.0)
    val varB = (col("s2_b").cast("double") -
      col("s1_b").cast("double") * col("s1_b").cast("double") / nB) / (nB - 1.0)
    val se2 = varA / nA + varB / nB
    // degenerate-variant guard: a variant with < 2 users has an
    // undefined sample variance ((n-1) = 0 → Infinity here while
    // DuckDB's x/0 is NULL) — gate mean/variance/z to NULL on both
    // sides so a tiny or one-sided experiment reads as "no verdict",
    // not a crash/parity gap.
    val enough = col("n_a") >= 2L && col("n_b") >= 2L
    val z = round(when(enough && se2 > 0.0, (meanA - meanB) / sqrt(se2)), 6)
    mom.crossJoin(broadcast(universe))
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(when(enough, meanA), 6).as("mean_a"),
        round(when(enough, meanB), 6).as("mean_b"),
        z.as("z"), (abs(z) > zCrit).as("significant"))
  }

  /** q142: the per-event-type A/B read over the events corpus. */
  def q142AbTest(s: SparkSession, dir: String): DataFrame =
    abTest(Tables.events(s, dir)).orderBy(col("event_type"))

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM'13 —
    * Controlled-experiment Using Pre-Experiment Data): adjust each
    * unit's experiment metric Y by its pre-period covariate X,
    * Y' = Y − θ·(X − mean(X)), θ = cov(X,Y)/var(X) pooled over all
    * units — the industry-standard sensitivity boost that shrinks
    * metric variance by ρ² without biasing the treatment delta (θ is
    * shared across arms, so the adjustment cancels in A−B). The
    * companion read to q142's Welch z: same deterministic md5 arms,
    * same events-per-user metric, plus the covariate machinery.
    *
    * Timeline split: the covered day span's first half is the
    * pre-period (the q144 convention) — X = the user's pre-period
    * event count, Y = the experiment-period count. Every user in
    * either period is a unit; absent-period counts are exact zeros.
    *
    * Scale shape: ONE corpus-collapsing (user → x, y) hash aggregate
    * (map-side combined) with the 1-row split day attached by
    * broadcast; θ and mean(X) come from a 1-row pooled-moment
    * aggregate over the per-user frame (Σx, Σy, Σxx, Σxy as
    * DECIMAL(38,0) — exact at any corpus size); per-arm moments are a
    * ≤ 2-row aggregate. No driver round trip, no second corpus pass.
    *
    * Double determinism: all moments are exact integers; θ, means,
    * variances and the reduction are FIXED left-to-right expression
    * trees shared with the oracle — θ and mean(X) rounded 12 BEFORE
    * the per-arm adjustment (so both engines adjust with the same
    * constant), per-arm outputs rounded 6 (the q142 rule). Sample
    * variances guard n ≥ 2 exactly as q142. */
  def cuped(events: DataFrame): DataFrame = {
    // integer day arithmetic on epoch-nanos (the Tables rule: ns
    // magnitudes exceed double's mantissa, float division would drift)
    val ev = events.select(col("user_id"),
      expr("ts DIV 86400000000000").as("day"))
    val span = ev.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(expr("(__d0 + __d1 + 1) DIV 2").as("__split"))
    val perUser = ev.crossJoin(broadcast(span))
      .groupBy(col("user_id"))
      .agg(sum(when(col("day") < col("__split"), 1L).otherwise(0L)).as("x"),
        sum(when(col("day") >= col("__split"), 1L).otherwise(0L)).as("y"))
      .withColumn("variant", variantOf(col("user_id"), 2))
    val pu = perUser.localCheckpoint() // read by the pooled AND per-arm aggs
    val pooled = pu.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
    val nD = col("n").cast("double")
    val theta = round(
      (nD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
      (nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")), 12)
    val knobs = pooled.select(theta.as("theta"),
      round(col("sx").cast("double") / nD, 12).as("mx_all"))
    val arm = pu.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x").cast("decimal(38,0)")).as("ax"),
        sum(col("y").cast("decimal(38,0)")).as("ay"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("axx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("ayy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("axy"))
    val nU = col("n_users").cast("double")
    val meanX = col("ax").cast("double") / nU
    val meanY = col("ay").cast("double") / nU
    val varX = (col("axx").cast("double") -
      col("ax").cast("double") * col("ax").cast("double") / nU) / (nU - 1.0)
    val varY = (col("ayy").cast("double") -
      col("ay").cast("double") * col("ay").cast("double") / nU) / (nU - 1.0)
    val covXY = (col("axy").cast("double") -
      col("ax").cast("double") * col("ay").cast("double") / nU) / (nU - 1.0)
    val varC = varY + col("theta") * col("theta") * varX -
      lit(2.0) * col("theta") * covXY
    val enough = col("n_users") >= 2L
    arm.crossJoin(broadcast(knobs))
      .select(col("variant"), col("n_users"),
        round(when(enough, meanY), 6).as("mean_y"),
        round(when(enough,
          meanY - col("theta") * (meanX - col("mx_all"))), 6).as("mean_cuped"),
        round(when(enough, varY), 6).as("var_y"),
        round(when(enough, varC), 6).as("var_cuped"),
        col("theta"),
        round(when(enough && varY > 0.0, lit(1.0) - varC / varY), 6)
          .as("var_reduction"))
      .orderBy(col("variant"))
  }

  /** q191: the CUPED read over the events corpus. */
  def q191Cuped(s: SparkSession, dir: String): DataFrame =
    cuped(Tables.events(s, dir))
}
