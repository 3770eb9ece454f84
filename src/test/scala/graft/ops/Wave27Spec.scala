package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 27: table profile (q216), vocabulary richness (q217), labeler
  * kappa (q218), Theil–Sen slope (q219). */
class Wave27Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q216: nulls, distincts, and modal ties pin on a hand table") {
    import spark.implicits._
    val t = Seq(
      (Some(1L), "x"), (Some(1L), "y"), (Some(2L), "y"),
      (None, "z"), (None, "y"))
      .toDF("k", "s")
    val got = Profile.profile(t, Seq("k", "s")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5)))
      .toMap
    // k: 5 rows, 2 nulls, 2 distinct, mode "1" ×2
    assert(got("k") == ((5L, 2L, 2L, "1", 2L)), s"${got("k")}")
    // s: mode "y" ×3; no nulls; 3 distinct
    assert(got("s") == ((5L, 0L, 3L, "y", 3L)), s"${got("s")}")
    // modal TIE breaks to the smaller string: two values ×1 each
    val tie = Seq(("b"), ("a")).toDF("s")
    val m = Profile.profile(tie, Seq("s")).collect()(0)
    assert(m.getString(4) == "a" && m.getLong(5) == 1L)
  }

  test("q217 math: 'a a b' gives P0 = 1/3 and Chao1 = 2.5") {
    import spark.implicits._
    val docs = Seq(("s", "a a b")).toDF("source", "text")
    val r = Vocabulary.richness(docs).collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L) // V, N
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L) // N1, N2
    assert(r.getDouble(5) == 0.333333, s"p0 ${r.getDouble(5)}")
    assert(r.getDouble(6) == 2.5, s"chao1 ${r.getDouble(6)}")
    // N2 = 0 → chao1 NULL
    val r2 = Vocabulary.richness(
      Seq(("s", "a b c")).toDF("source", "text")).collect()(0)
    assert(r2.isNullAt(6))
    // corpus invariants
    Vocabulary.q217VocabRichness(spark, dir).collect().foreach { row =>
      assert(row.getLong(3) <= row.getLong(1))           // hapax ≤ V
      assert(row.getDouble(5) >= 0.0 && row.getDouble(5) <= 1.0)
      if (!row.isNullAt(6)) assert(row.getDouble(6) >= row.getLong(1).toDouble)
    }
  }

  test("q218: identical labelers score kappa = 1; corpus kappa bounded") {
    import spark.implicits._
    // both rules agree on every doc: 2 docs pass both (40 short tokens),
    // 2 docs fail both (5 long tokens)
    val yes = ("w " * 40).trim                       // 40 tokens, avg 1 ≤ 6
    val no = (("wwwwwwwwwwww ") * 5).trim           // 5 tokens, avg 12 > 6
    val docs = Seq(("s", yes), ("s", yes), ("s", no), ("s", no))
      .toDF("source", "text")
    // route the fixture through the same expressions via a temp source
    val nTok = TextAnalysis.tokenCount(col("text"))
    val nChr = TextAnalysis.charCountNoWs(col("text"))
    val v = docs.select(
      (nTok >= 30L).cast("long").as("a"),
      (nChr.cast("double") / greatest(nTok.cast("double"), lit(1.0)) <= 6.0)
        .cast("long").as("b")).collect()
    assert(v.forall(r => r.getLong(0) == r.getLong(1)), "fixture must agree")
    val corpus = Agreement.q218LabelerKappa(spark, dir).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0) // p_o
      if (!r.isNullAt(4))
        assert(r.getDouble(4) >= -1.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("q219 math: constant slope recovers exactly; one spiked day cannot move the median") {
    import spark.implicits._
    val day = 86400000000000L
    // "lin": x_d = d+1 (slope 1 everywhere); "spike": same but day 7
    // gets +300 events — pairwise slopes through day 7 are wild, the
    // MEDIAN stays 1 (the Theil–Sen point)
    val lin = for (d <- 0 until 20; k <- 0 to d) yield ("lin", d.toLong * day + k)
    val spike = (for (d <- 0 until 20; k <- 0 to d)
      yield ("spike", d.toLong * day + k)) ++
      (for (k <- 100 until 400) yield ("spike", 7L * day + k))
    val ev = (lin ++ spike).zipWithIndex
      .map { case ((t, ts), i) => (i.toLong, ts, t) }
      .toDF("event_id", "ts", "event_type")
    val got = ChangePoint.theilSenDaily(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("lin") == ((190L, 1.0)), s"${got("lin")}")
    assert(got("spike")._2 == 1.0, s"${got("spike")}")
  }
}
