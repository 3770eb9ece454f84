package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Absorbing-chain funnel analysis (Kemeny & Snell's fundamental-
  * matrix reading of q115's Markov model): treat `purchase` and
  * `error` as ABSORBING states and ask, per transient starting state,
  * (a) the probability the walk converts (absorbs in purchase before
  * error) and (b) the expected number of transient steps before
  * absorption — the two numbers a funnel owner actually wants from a
  * transition matrix, where q115 reports the raw edges and q130 the
  * observed paths. Reference scope note: the reference has no
  * analytics surface; this extends the events family.
  *
  * Exact solve, no iteration: with 3 transient states the fundamental
  * system (I − Q)h = r and (I − Q)t = 1 is solved in CLOSED FORM by
  * Cramer's rule — one 3×3 determinant and its column substitutions,
  * a fixed arithmetic expression both engines evaluate identically.
  * No power iteration (whose truncation would need a convergence
  * contract), no matrix library.
  *
  * Scale shape: transitions are the q115/q180 machinery — the
  * hot-key-safe per-user adjacent-pairs window (SkewWindows) and one
  * (cur, nxt) count aggregate; the matrix pivot is a conditional
  * 1-ROW aggregate over the ≤ |types|² count frame, and the solve is
  * in-row arithmetic on that single row. Nothing after the count
  * aggregate sees corpus-sized data.
  *
  * Determinism: transition probabilities rounded 12 from exact
  * counts; determinant/substitution expressions are FIXED
  * left-to-right trees shared with the oracle; outputs rounded 6.
  * Precondition (asserted by the spec, documented here): the chain
  * restricted to {click, signup, view} must be absorbable — det ≠ 0 —
  * which holds whenever every transient state can reach an absorbing
  * one. */
object Absorbing {

  private val Transient = Seq("click", "signup", "view")

  /** (state, kind, p_purchase, expected_steps) for the 5 canonical
    * event types — transient rows carry the Cramer solve, absorbing
    * rows the boundary values (purchase → 1/0, error → 0/0). */
  def conversionFunnel(events: DataFrame): DataFrame = {
    val pairs = SkewWindows.adjacentPairs(events,
      "user_id", "ts", "event_id", "event_type")
    val cnt = pairs.groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col("cur")).agg(sum(col("n")).as("t"))
    val p = cnt.join(tot, Seq("cur"))
      .select(col("cur"), col("nxt"),
        round(col("n").cast("double") / col("t").cast("double"), 12).as("p"))
    def at(c: String, x: String): Column =
      max(when(col("cur") === c && col("nxt") === x, col("p"))
        .otherwise(lit(0.0)))
    val m = p.agg(
      at("click", "click").as("q11"), at("click", "signup").as("q12"),
      at("click", "view").as("q13"),
      at("signup", "click").as("q21"), at("signup", "signup").as("q22"),
      at("signup", "view").as("q23"),
      at("view", "click").as("q31"), at("view", "signup").as("q32"),
      at("view", "view").as("q33"),
      at("click", "purchase").as("r1"), at("signup", "purchase").as("r2"),
      at("view", "purchase").as("r3"))
    val a = m.select(
      (lit(1.0) - col("q11")).as("a11"), (-col("q12")).as("a12"),
      (-col("q13")).as("a13"),
      (-col("q21")).as("a21"), (lit(1.0) - col("q22")).as("a22"),
      (-col("q23")).as("a23"),
      (-col("q31")).as("a31"), (-col("q32")).as("a32"),
      (lit(1.0) - col("q33")).as("a33"),
      col("r1"), col("r2"), col("r3"))
    def det3(a11: Column, a12: Column, a13: Column,
             a21: Column, a22: Column, a23: Column,
             a31: Column, a32: Column, a33: Column): Column =
      a11 * (a22 * a33 - a23 * a32) - a12 * (a21 * a33 - a23 * a31) +
        a13 * (a21 * a32 - a22 * a31)
    val c = (s: String) => col(s)
    val withDet = a.withColumn("det", det3(c("a11"), c("a12"), c("a13"),
      c("a21"), c("a22"), c("a23"), c("a31"), c("a32"), c("a33")))
    def solve(b1: Column, b2: Column, b3: Column): (Column, Column, Column) = (
      det3(b1, c("a12"), c("a13"), b2, c("a22"), c("a23"),
        b3, c("a32"), c("a33")) / c("det"),
      det3(c("a11"), b1, c("a13"), c("a21"), b2, c("a23"),
        c("a31"), b3, c("a33")) / c("det"),
      det3(c("a11"), c("a12"), b1, c("a21"), c("a22"), b2,
        c("a31"), c("a32"), b3) / c("det"))
    val (h1, h2, h3) = solve(c("r1"), c("r2"), c("r3"))
    val (t1, t2, t3) = solve(lit(1.0), lit(1.0), lit(1.0))
    val solved = withDet.select(
      round(h1, 6).as("h1"), round(h2, 6).as("h2"), round(h3, 6).as("h3"),
      round(t1, 6).as("t1"), round(t2, 6).as("t2"), round(t3, 6).as("t3"))
    val rows = solved.select(explode(array(
      struct(lit(Transient(0)).as("state"), lit("transient").as("kind"),
        col("h1").as("p_purchase"), col("t1").as("expected_steps")),
      struct(lit(Transient(1)).as("state"), lit("transient").as("kind"),
        col("h2").as("p_purchase"), col("t2").as("expected_steps")),
      struct(lit(Transient(2)).as("state"), lit("transient").as("kind"),
        col("h3").as("p_purchase"), col("t3").as("expected_steps")),
      struct(lit("purchase").as("state"), lit("absorbing").as("kind"),
        lit(1.0).as("p_purchase"), lit(0.0).as("expected_steps")),
      struct(lit("error").as("state"), lit("absorbing").as("kind"),
        lit(0.0).as("p_purchase"), lit(0.0).as("expected_steps")))).as("s"))
      .select(col("s.state"), col("s.kind"), col("s.p_purchase"),
        col("s.expected_steps"))
    rows.orderBy(col("state"))
  }

  /** q200: the conversion-funnel solve over the events corpus. */
  def q200AbsorbingFunnel(s: SparkSession, dir: String): DataFrame =
    conversionFunnel(Tables.events(s, dir))
}
