package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral specs for the wave-13 operators: the constraint audit's
  * verdict logic (a suite where every check passes would not test the
  * fail path) and PSI's ordering on planted drift. */
class Wave13Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("quality audit: key checks pass, the non-key uniqueness check fails, metrics are exact ratios") {
    val rows = QualityAudit.q143QualityAudit(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(3))).toMap
    assert(rows.size == 7)
    // o_orderkey IS the key; o_custkey provably is not (150 customers,
    // 1500 orders at sf0.001) — the audit must say both, not just the
    // happy one
    assert(rows("uniqueness_o_orderkey") == (1.0, true))
    val (custUniq, custPassed) = rows("uniqueness_o_custkey")
    assert(!custPassed && custUniq < 0.5,
      s"non-key uniqueness should fail: $custUniq")
    Seq("completeness_o_custkey", "domain_o_orderstatus",
      "range_o_totalprice", "pattern_o_orderpriority",
      "ri_o_custkey_customer").foreach { c =>
      assert(rows(c) == (1.0, true), s"$c should pass at 1.0: ${rows(c)}")
    }
  }

  test("quality audit: planted violations move exactly the declared metrics") {
    import spark.implicits._
    val df = Seq(
      (1L, Option(10L), "O"), (2L, Option(11L), "O"),
      (3L, None, "X"), (4L, Option(10L), "F"))
      .toDF("k", "fk", "st")
    val out = QualityAudit.audit(df, Seq(
      QualityAudit.Constraint("comp_fk",
        QualityAudit.completeness(col("fk")), 1.0),
      QualityAudit.Constraint("uniq_k",
        QualityAudit.uniqueness(col("k")), 1.0),
      QualityAudit.Constraint("dom_st",
        QualityAudit.fractionWhere(col("st").isin("O", "F", "P")), 0.7)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(3)))
      .toMap
    assert(out("comp_fk") == (0.75, false))   // 1 null of 4
    assert(out("uniq_k") == (1.0, true))
    assert(out("dom_st") == (0.75, true))     // 3 of 4 ≥ threshold 0.7
  }

  test("psi drift: identical halves read stable, a swapped-majority half reads shifted") {
    import spark.implicits._
    // day 0-9 = base, day 10-19 = cur (split = (0+19+1)/2 = 10); ts in
    // epoch nanos at midday to dodge day-boundary ambiguity
    def ev(day: Int, typ: String, n: Int): Seq[(Long, String)] =
      (0 until n).map(i => (day * 86400000000000L + 43200000000000L + i, typ))
    val stable = ((0 until 20).flatMap(d => ev(d, "view", 30) ++ ev(d, "click", 10)))
      .toDF("ts", "event_type")
    val sOut = Drift.psiOverEvents(stable)
      .filter(col("bin") === "__total" && col("feature") === "event_type")
      .head()
    assert(sOut.getString(7) == "stable", s"identical halves: $sOut")
    assert(math.abs(sOut.getDouble(6)) < 0.01)
    // current period inverts the 3:1 mix AND introduces a new type —
    // a textbook population shift
    val shifted = ((0 until 10).flatMap(d => ev(d, "view", 30) ++ ev(d, "click", 10)) ++
      (10 until 20).flatMap(d => ev(d, "click", 30) ++ ev(d, "error", 10)))
      .toDF("ts", "event_type")
    val hOut = Drift.psiOverEvents(shifted)
      .filter(col("bin") === "__total" && col("feature") === "event_type")
      .head()
    assert(hOut.getString(7) == "shifted", s"swapped mix: $hOut")
    assert(hOut.getDouble(6) > 0.25)
  }

  test("psi drift: smoothing keeps PSI finite when a bin is empty on one side") {
    import spark.implicits._
    val df = ((0 until 10).map(d =>
      (d * 86400000000000L + 1L, "only_base")) ++
      (10 until 20).map(d => (d * 86400000000000L + 1L, "only_cur")))
      .toDF("ts", "event_type")
    val rows = Drift.psiOverEvents(df)
      .filter(col("feature") === "event_type").collect()
    assert(rows.forall(r => !r.isNullAt(6) &&
      !r.getDouble(6).isNaN && !r.getDouble(6).isInfinite),
      "empty-side bins must smooth, not blow up")
  }
}
