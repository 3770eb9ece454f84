package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 21: split-conformal coverage (q193), Fellegi–Sunter linkage
  * (q194), CUSUM change-point (q195), LSH band sweep (q196) — planted
  * fixtures where detection is the contract, structural axioms on the
  * shipped corpus elsewhere. */
class Wave21Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q193: splits partition the eval universe; q_hat is a calibration residual") {
    val out = Conformal.q193Conformal(spark, dir).collect()
    val overall = out.find(_.getString(0) == "__overall").get
    val perSource = out.filter(_.getString(0) != "__overall")
    assert(perSource.map(_.getLong(1)).sum == overall.getLong(1))
    assert(perSource.map(_.getLong(2)).sum == overall.getLong(2))
    val testDocs = graft.Tables.documents(spark, dir)
      .filter(Splits.of(col("doc_id")) === "test").count()
    assert(overall.getLong(1) == testDocs)
    // finite-sample conformal: the marginal guarantee is >= 1 - alpha in
    // expectation over splits; this one split must at least be in the
    // right regime and never exceed 1
    val cov = overall.getDouble(3)
    assert(cov >= 0.75 && cov <= 1.0, s"coverage $cov")
    assert(overall.getDouble(4) > 0.0) // q_hat
    out.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("q194: FS scoring — full agreement outranks partial, known true pairs surface") {
    val out = Linkage.q194RecordLinkage(spark, dir).collect()
    assert(out.nonEmpty)
    val byPattern = out.groupBy(_.getString(2))
      .map { case (p, rs) => p -> rs.map(_.getDouble(3)).distinct }
    // u's are global constants, so score is a pure function of pattern
    byPattern.foreach { case (p, scores) =>
      assert(scores.length == 1, s"pattern $p has ${scores.length} scores")
    }
    // monotone in agreement: flipping any 0 to 1 raises the score
    def s(p: String): Option[Double] = byPattern.get(p).map(_.head)
    for (full <- s("111"); partial <- Seq(s("101"), s("110"), s("011")).flatten)
      assert(full > partial)
    // a customer whose key survives %7 and whose segment (%5) and
    // balance (%4) are unperturbed must pair with its derived twin
    val ids = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = graft.Tables.customer(spark, dir)
      .filter(col("c_custkey") % 7 =!= 0 && col("c_custkey") % 5 =!= 0 &&
        col("c_custkey") % 4 =!= 0)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    assert(expected.nonEmpty)
    expected.foreach(k => assert(ids.contains((k, k + 1000000000L)),
      s"true pair for $k missing"))
  }

  test("q194: on a chance-dominated comparison space, full agreement clears the match cut") {
    import spark.implicits._
    // 400 synthetic customers across 2 nations x 2 segments with unique
    // names and spread balances: blocks hold ~100 records each, so the
    // comparison space is overwhelmingly random pairs (u << m) — the
    // regime the FS weights are calibrated for (see fsLinkage scaladoc).
    val cust = (1L to 400L).map { k =>
      (k, s"Cst#$k", (k % 2).toInt, (k % 97).toDouble * 51.0, s"SEG${k % 2}")
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val out = Linkage.fsLinkage(cust).collect()
    val full = out.filter(_.getString(2) == "111")
    assert(full.nonEmpty)
    full.foreach(r => assert(r.getBoolean(4), s"unmatched full agreement: $r"))
    // and every full-agreement pair is a true derived twin
    full.foreach(r => assert(r.getLong(1) - r.getLong(0) == 1000000000L))
  }

  test("q195: a planted level shift alarms after the shift day; clean series stays quiet") {
    import spark.implicits._
    val day0 = 20000L
    def mk(tp: String, counts: Seq[Int]): Seq[(Long, String)] =
      counts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)(((day0 + d) * 86400000000000L, tp))
      }
    // baseline 10/day for 10 days; "shifted" jumps to 16/day (=mu+6,
    // sigma=sd of {9,10,11} pattern) from day 10 on — S accumulates
    // ~ (6 - k) per day and must cross h = 4*sigma within a few days.
    val basePat = Seq(9, 10, 11, 9, 10, 11, 9, 10, 11, 10)
    val ev = (mk("clean", basePat ++ basePat) ++
      mk("shifted", basePat ++ Seq.fill(10)(16)))
      .zipWithIndex.map { case ((ts, tp), i) => (i.toLong, ts, 1L, tp) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = ChangePoint.cusumDaily(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("clean").isNullAt(6), s"clean series alarmed: ${out("clean")}")
    val alarm = out("shifted").getLong(6)
    assert(alarm >= day0 + 10 && alarm <= day0 + 13,
      s"alarm at ${alarm - day0}, expected 10..13")
    // closed form on the shifted series: S_t = P_t - min(0, min P)
    val mu = basePat.sum / 10.0
    val sd = math.sqrt(basePat.map(x => (x - mu) * (x - mu)).sum / 9.0)
    assert(math.abs(out("shifted").getDouble(2) - mu) < 1e-6)
    assert(math.abs(out("shifted").getDouble(3) - sd) < 1e-6)
  }

  test("q196: sweep structure — recall rises with band count, hits bounded") {
    val out = LshTuning.q196LshTuning(spark, dir).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getLong(0) * r.getLong(1) == 8L)
      assert(r.getLong(4) <= r.getLong(2) && r.getLong(4) <= r.getLong(3))
    }
    val byB = out.map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(byB(1L) <= byB(2L) + 1e-9 && byB(2L) <= byB(8L) + 1e-9)
    assert(byB(4L) <= byB(8L) + 1e-9)
    // the production config (4,2) must hold high recall on the planted
    // near-dups — the reason q26 ships it
    assert(byB(4L) >= 0.9, s"(4,2) recall ${byB(4L)}")
  }
}
