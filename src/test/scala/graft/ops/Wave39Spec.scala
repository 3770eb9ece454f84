package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 39: lang-ID eval (q250), source JSD (q251), decision stump
  * (q252), ECE reliability (q253), OOV drift (q254), heavy-hitter
  * churn (q255). */
class Wave39Spec extends SparkSpec {

  test("q250: macro row averages per-class F1 with undefined-as-0") {
    val out = Evaluation.q250LangIdEval(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r).toMap
    // zh is a label the 4-way heuristic can never predict: recall 0,
    // precision NULL (never predicted), f1 NULL
    assert(out.contains("zh") && out("zh").isNullAt(4) &&
      out("zh").getDouble(5) == 0.0 && out("zh").isNullAt(6), out("zh").toString)
    val macroF1 = out("__macro").getDouble(6)
    val perClass = out.view.filterKeys(_ != "__macro").values
      .map(r => if (r.isNullAt(6)) 0.0 else r.getDouble(6)).toSeq
    assert(math.abs(macroF1 - perClass.sum / perClass.size) < 1e-9)
    // macro support = corpus size
    assert(out("__macro").getLong(1) ==
      graft.Tables.documents(spark, "/root/testdata/sf0.001").count())
  }

  test("q251: identical sources have JSD 0; disjoint vocabularies hit 1 bit") {
    import spark.implicits._
    val same = Seq(("a", "x y z x"), ("b", "x y z x")).toDF("source", "text")
    val sameOut = Mixing.sourceJsd(same).collect()
    assert(sameOut.forall(_.getDouble(3) == 0.0), sameOut.mkString(";"))
    val disjoint = Seq(("a", "x x y"), ("b", "p q p")).toDF("source", "text")
    val dOut = Mixing.sourceJsd(disjoint).collect()
    assert(dOut.forall(r => math.abs(r.getDouble(3) - 1.0) < 1e-9),
      dOut.mkString(";"))
    // single source: no rest -> NULL
    val solo = Seq(("a", "x y")).toDF("source", "text")
    assert(Mixing.sourceJsd(solo).collect().head.isNullAt(3))
  }

  test("q252: a perfectly separating threshold earns the full root entropy") {
    import spark.implicits._
    // v <= 5 all label 1, v > 5 all label 0 -> gain at t=5 = H(1/2) = 1 bit
    val d = ((1L to 10L).map(v => (v, if (v <= 5) 1L else 0L)))
      .toDF("v", "y")
    val top = Stump.stumpGains(d)
      .orderBy(col("gain_bits").desc, col("threshold")).collect()
    assert(top.head.getLong(0) == 5L, top.head.toString)
    assert(math.abs(top.head.getDouble(5) - 1.0) < 1e-6, top.head.toString)
    // threshold = vmax excluded (no empty right split)
    assert(!top.map(_.getLong(0)).contains(10L))
  }

  test("q253: total row's ECE equals the weighted per-bin gap sum") {
    val rows = Evaluation.q253EceReliability(spark, "/root/testdata/sf0.001")
      .collect()
    val bins = rows.filter(_.getString(0) != "__total")
    val tot = rows.find(_.getString(0) == "__total").get
    val n = bins.map(_.getLong(1)).sum
    assert(tot.getLong(1) == n)
    val ece = bins.map(r => r.getLong(1) * r.getDouble(5)).sum / n
    assert(math.abs(tot.getDouble(5) - ece) < 1e-6, s"$ece vs $tot")
  }

  test("q254: every snapshot token is in-vocab; unseen slices report OOV") {
    val out = Vocabulary.q254OovDrift(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) >= r.getLong(3))) // n_tokens >= n_oov
    assert(out.forall(r => Set(1L, 2L).contains(r.getLong(0))))
    // rate consistent with the counts
    out.foreach { r =>
      val rate = math.rint(1e6 * r.getLong(3).toDouble / r.getLong(2)) / 1e6
      assert(math.abs(r.getDouble(5) - rate) < 1e-9, r.toString)
    }
  }

  test("q255: statuses partition the union of both top lists") {
    val out = HeavyHitters.q255HeavyHitterChurn(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty && out.length <= 40)
    out.foreach { r =>
      val (ra, rb, st) = (r.isNullAt(1), r.isNullAt(3), r.getString(5))
      assert((st == "stayed" && !ra && !rb) || (st == "left" && !ra && rb) ||
        (st == "entered" && ra && !rb), r.toString)
    }
    val stayedRanks = out.filter(_.getString(5) == "stayed").map(_.getLong(1))
    assert(stayedRanks.forall(r => r >= 1 && r <= 20))
  }
}
