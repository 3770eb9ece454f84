package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 26: dedup growth (q211), leading PC (q212), HT estimation
  * (q213), robust means (q214), Mann–Kendall (q215) — closed-form
  * fixtures plus corpus invariants. */
class Wave26Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q211: planted later copies count, first occurrences don't") {
    val got = Dedup.q211DedupGrowth(spark, dir).collect()
    assert(got.nonEmpty)
    // batch 0 can only duplicate within itself: its n_dup < n_docs
    val b0 = got.head
    assert(b0.getLong(0) == 0L && b0.getLong(2) <= b0.getLong(1))
    // cumulative rate is a weighted average of per-batch rates: bounded
    val last = got.last
    assert(last.getDouble(4) >= 0.0 && last.getDouble(4) <= 1.0)
    // reconcile the total against a direct count of later-copy docs
    val docs = graft.Tables.documents(spark, dir)
    val direct = docs.select(col("doc_id"), md5(col("text")).as("m"))
      .withColumn("f", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("m"))))
      .filter(col("doc_id") > col("f")).count()
    assert(got.map(_.getLong(2)).sum == direct)
  }

  test("q212 math: a planted 1-D line recovers its direction with explained ≈ 1") {
    import spark.implicits._
    // x_i = t_i · u with u = (3/5, 4/5, 0, 0): leading PC = ±u exactly,
    // all variance on one axis
    val u = Seq(0.6f, 0.8f, 0.0f, 0.0f)
    val fixture = (1 to 40).map { i =>
      (i.toLong, u.map(c => c * i.toFloat))
    }.toDF("vec_id", "embedding")
    val pc = PowerIteration.leadingPc(fixture).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(2)).toMap
    val ex = PowerIteration.leadingPc(fixture).collect()(0).getDouble(4)
    // unit, aligned with u (power iteration from a positive start → +u)
    val dot = pc(1) * 0.6 + pc(2) * 0.8
    assert(math.abs(dot - 1.0) < 1e-4, s"alignment $dot")
    assert(math.abs(pc(3)) < 1e-6 && math.abs(pc(4)) < 1e-6)
    assert(ex > 0.999, s"explained $ex")
    // corpus: loadings are unit-norm, explained in (0, 1]
    val corpus = PowerIteration.q212LeadingPc(spark, dir).collect()
    val nrm = corpus.map(r => r.getDouble(2) * r.getDouble(2)).sum
    assert(math.abs(nrm - 1.0) < 1e-4, s"norm2 $nrm")
    val exc = corpus(0).getDouble(4)
    assert(exc > 0.0 && exc <= 1.0, s"explained $exc")
  }

  test("q213: whole-stratum sources estimate exactly; sampled strata stay positive") {
    val got = Estimation.q213HtEstimate(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (nTrue, tokTrue, nSamp, rate) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (htDocs, htTok, err) = (r.getLong(5), r.getLong(6), r.getDouble(7))
      if (rate == 1L) {
        assert(nSamp == nTrue && htDocs == nTrue && htTok == tokTrue && err == 0.0)
      } else {
        assert(nSamp >= 1L && htTok > 0L && err >= 0.0)
      }
    }
  }

  test("q214 math: hand histogram pins trimmed and winsorized means") {
    import spark.implicits._
    // token counts 0..8 and 1000: n=10, k=1 → trim keeps ranks 2..9
    // (values 1..8): trimmed = 36/8 = 4.5; winsorize clamps 0→1,
    // 1000→8: (36+1+8)/10 = 4.5; plain mean = 1036/10 = 103.6
    val docs = (0 to 8).map(k => ("s", ("w " * k).trim)) :+
      (("s", ("w " * 1000).trim))
    val got = RobustStats.robustMeans(
        docs.toDF("source", "text"), 1L, 10L).collect()(0)
    assert(got.getLong(1) == 10L)
    assert(got.getDouble(2) == 103.6, s"mean ${got.getDouble(2)}")
    assert(got.getDouble(3) == 4.5, s"trimmed ${got.getDouble(3)}")
    assert(got.getDouble(4) == 4.5, s"winsorized ${got.getDouble(4)}")
  }

  test("q215 math: a strictly increasing series trends up; a flat one doesn't") {
    import spark.implicits._
    val day = 86400000000000L
    // type "up": day d gets d+1 events (strictly increasing, 20 days);
    // type "flat": 3 events every day (all ties → S = 0)
    val up = for (d <- 0 until 20; k <- 0 to d) yield ("up", d.toLong * day + k)
    val flat = for (d <- 0 until 20; k <- 0 until 3) yield ("flat", d.toLong * day + k)
    val ev = (up ++ flat).zipWithIndex
      .map { case ((t, ts), i) => (i.toLong, ts, t) }
      .toDF("event_id", "ts", "event_type")
    val got = ChangePoint.mannKendallDaily(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getString(5))).toMap
    // S for a strictly increasing 20-day series = C(20,2) = 190
    assert(got("up") == ((190L, "up")), s"${got("up")}")
    assert(got("flat")._1 == 0L && got("flat")._2 == "none", s"${got("flat")}")
  }
}
