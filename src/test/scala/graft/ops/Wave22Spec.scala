package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 22: Hill tail index (q197), Gini concentration (q198),
  * block jackknife (q199), absorbing-funnel solve (q200) — scale/
  * duplication invariances and closed forms the statistics must obey. */
class Wave22Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q197: Hill is frequency-scale invariant — duplicating the corpus changes nothing") {
    val docs = graft.Tables.documents(spark, dir)
    val base = TailStats.hillTail(docs, 3, 10).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(base.nonEmpty)
    assert(base.values.exists(_._1 > 0.0), "degenerate fixture: every head flat")
    base.values.foreach { case (xi, alpha) =>
      assert(xi >= 0.0)
      alpha.foreach(a => assert(math.abs(a - 1.0 / xi) < 1e-3))
      if (xi == 0.0) assert(alpha.isEmpty) // flat head -> alpha NULL
    }
    // every doc twice (new ids): every gram frequency doubles, the ln
    // ratios f_(i)/f_(k+1) are untouched
    val doubled = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + lit(1000000L)))
    val dup = TailStats.hillTail(doubled, 3, 10).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    base.foreach { case (src, (xi, _)) =>
      assert(math.abs(dup(src) - xi) < 1e-9, s"$src: $xi -> ${dup(src)}")
    }
  }

  test("q198: Gini is 0 on uniform use, scale-invariant, in [0, 1)") {
    import spark.implicits._
    // one doc of all-distinct words: every 3-gram appears exactly once
    val uniform = Seq((1L, (1 to 40).map(i => s"w$i").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val g0 = TailStats.gini(uniform, 3).head()
    assert(g0.getDouble(3) == 0.0, s"uniform gini ${g0.getDouble(3)}")
    val docs = graft.Tables.documents(spark, dir)
    val base = TailStats.gini(docs, 3).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    base.values.foreach(g => assert(g >= 0.0 && g < 1.0))
    val doubled = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + lit(1000000L)))
    TailStats.gini(doubled, 3).collect().foreach { r =>
      assert(math.abs(r.getDouble(3) - base(r.getString(0))) < 1e-9)
    }
  }

  test("q199: jackknife closed form on a hand-built fixture; corpus counts reconcile") {
    import spark.implicits._
    // 6 docs, token counts 2/4/6/8/10/12 — blocks from the op's own
    // md5 assignment; expected SE from the same block sums
    val docs = (1L to 6L).map(i =>
      (i, (1L to 2 * i).map(_ => "w").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val out = Jackknife.meanTokensSe(docs).head()
    val blkOf = docs.select(col("doc_id"),
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(Jackknife.Blocks.toLong)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ys = (1L to 6L).map(i => blkOf(i) -> 2L * i)
    val byBlk = ys.groupBy(_._1).map { case (b, vs) =>
      (b, vs.length, vs.map(_._2).sum) }.toSeq
    val (nAll, sAll) = (6L, ys.map(_._2).sum)
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ths = byBlk.map { case (_, ng, sg) =>
      r12((sAll - sg).toDouble / (nAll - ng).toDouble) }
    val g = ths.length
    val thbar = r12(ths.map(BigDecimal(_)).sum.toDouble / g)
    val ss = ths.map(t => r12((t - thbar) * (t - thbar)))
      .map(BigDecimal(_)).sum.toDouble
    val se = math.sqrt((g - 1.0) / g * ss)
    assert(out.getLong(1) == 6L && out.getLong(2) == g.toLong)
    assert(math.abs(out.getDouble(3) -
      BigDecimal(thbar).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(out.getDouble(4) -
      BigDecimal(se).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6)
    // corpus: doc counts reconcile
    val corpus = Jackknife.q199Jackknife(spark, dir).collect()
    assert(corpus.map(_.getLong(1)).sum ==
      graft.Tables.documents(spark, dir).count())
    corpus.foreach(r => assert(r.getDouble(4) >= 0.0))
  }

  test("q200: deterministic walk solves to the hand-computed absorption probabilities") {
    import spark.implicits._
    // every user walks click -> view -> purchase; one walks
    // click -> view -> error. From 'view': p = P(view->purchase) = 3/4.
    // From 'click': h = p(view)*1 = 3/4 via the single view hop.
    val paths = Seq(
      Seq("click", "view", "purchase"), Seq("click", "view", "purchase"),
      Seq("click", "view", "purchase"), Seq("click", "view", "error"))
    val ev = paths.zipWithIndex.flatMap { case (p, u) =>
      p.zipWithIndex.map { case (t, i) =>
        ((u * 10 + i).toLong, (i + 1).toLong * 1000000000L, u.toLong, t) }
    }.toDF("event_id", "ts", "user_id", "event_type")
    val out = Absorbing.conversionFunnel(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("view").getDouble(2) == 0.75)
    assert(out("click").getDouble(2) == 0.75)
    assert(out("view").getDouble(3) == 1.0)    // one step to absorption
    assert(out("click").getDouble(3) == 2.0)   // click -> view -> absorb
    assert(out("purchase").getDouble(2) == 1.0 && out("error").getDouble(2) == 0.0)
    // corpus: probabilities and steps in range
    val corpus = Absorbing.q200AbsorbingFunnel(spark, dir).collect()
    assert(corpus.length == 5)
    corpus.filter(_.getString(1) == "transient").foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= 1.0)
    }
  }
}
