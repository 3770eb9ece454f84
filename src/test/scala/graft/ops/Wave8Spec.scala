package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral specs for the wave-8 operators: bounded-lookback EWMA
  * halo chunking (bit-parity with the plain window under pathological
  * chunk sizes), majority-vote determinism, normalization recovery,
  * split-balance reconciliation, decimal-exact standardization under
  * repartitioning, and in-row hashed feature counting. */
class Wave8Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("trailingEwma: halo-chunked heavy path is bit-identical to the plain window") {
    import spark.implicits._
    // one hot key (900 rows) + background keys; chunkTarget 16 forces
    // ~56 chunks, most SMALLER than the 7-row lookback → the halo must
    // assemble predecessors across MULTIPLE preceding chunk summaries
    val rows = ((1 to 900).map(i => (1L, i.toLong * 10, i.toLong, math.sin(i) * 100)) ++
      (1 to 50).map(i => (2L + i % 5, i.toLong * 7, 1000L + i, i * 1.5))).toDF(
      "k", "t", "tie", "v")
    val plain = SkewWindows.trailingEwma(rows, "k", "t", "tie", "v",
      alpha = 0.5, lookback = 8, hotAt = Long.MaxValue)
    val routed = SkewWindows.trailingEwma(rows, "k", "t", "tie", "v",
      alpha = 0.5, lookback = 8, hotAt = 800L, chunkTarget = 16L)
    val p = plain.orderBy("k", "t").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val h = routed.orderBy("k", "t").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(p.length === 950 && p.sameElements(h))
    // and the heavy plan's per-row windows are (key, chunk)-partitioned
    val planStr = routed.queryExecution.executedPlan.toString
    assert(planStr.contains("__chunk"), planStr.take(2000))
  }

  test("trailingEwma: burst timestamps (all rows in few chunks) still exact") {
    import spark.implicits._
    // 200 rows across only 3 distinct timestamps per chunk-width — ties
    // broken by tie; chunk assignment is time-based so bursts pile into
    // single chunks and other chunks are EMPTY (summary rows absent)
    val rows = (1 to 200).map(i => (9L, (i / 70).toLong * 1000, i.toLong, i * 1.0))
      .toDF("k", "t", "tie", "v")
    val plain = SkewWindows.trailingEwma(rows, "k", "t", "tie", "v",
      alpha = 0.5, lookback = 8, hotAt = Long.MaxValue)
    val routed = SkewWindows.trailingEwma(rows, "k", "t", "tie", "v",
      alpha = 0.5, lookback = 8, hotAt = 100L, chunkTarget = 10L)
    assert(plain.orderBy("t", "tie").collect().map(_.getDouble(3))
      .sameElements(routed.orderBy("t", "tie").collect().map(_.getDouble(3))))
  }

  test("majorityVote: argmax is deterministic — most votes, ties to smallest label") {
    import spark.implicits._
    val votes = Seq(
      (1L, "a", "good"), (1L, "b", "good"), (1L, "c", "bad"),   // clear majority
      (2L, "a", "ok"), (2L, "b", "bad"),                        // 1-1 tie → 'bad' < 'ok'
      (3L, "a", "ok"), (3L, "b", "ok"), (3L, "c", "ok")         // unanimous
    ).toDF("item", "ann", "label")
    val out = Labeling.majorityVote(votes, "item", "label")
      .orderBy("item").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getBoolean(4))).toSeq === Seq(
      (1L, 3L, "good", 2L, false),
      (2L, 2L, "bad", 1L, false),
      (3L, 3L, "ok", 3L, true)))
  }

  test("q123 preference pairs: no Window operator — ranking rides the bounded top_k aggregate") {
    val q = Labeling.q123PreferencePairs(spark, dir)
    val planStr = q.queryExecution.optimizedPlan.toString
    assert(!planStr.contains("Window"), planStr.take(2000))
    val rows = q.collect()
    // rank-paired: each (source, rank) appears at most once, ranks 1..8
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getLong(1)))
    assert(keys.distinct.length === keys.length)
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 8))
    // margin reconciles with the two token counts
    assert(rows.forall(r => r.getLong(6) === r.getLong(4) - r.getLong(5)))
  }

  test("normalization recovers dirty-rendered duplicate groups the raw key splits") {
    val docs = graft.Tables.documents(spark, dir)
    val rendered = docs.withColumn("rendered",
      when(pmod(col("doc_id"), lit(3)) === 0, col("text"))
        .when(pmod(col("doc_id"), lit(3)) === 1, upper(col("text")))
        .otherwise(regexp_replace(col("text"), " ", ", ")))
    // ground truth: q24's key on the CLEAN text
    val clean = docs
      .groupBy(md5(TextAnalysis.prefixTokens(col("text"), 8)).as("k"))
      .agg(sort_array(collect_list(col("doc_id"))).as("m"))
      .filter(size(col("m")) >= 2)
      .select(col("m")).collect().map(_.getSeq[Long](0)).toSet
    val normGroups = Normalization
      .normalizedDupGroups(rendered, "rendered", "doc_id")
      .select(col("members")).collect()
      .map(_.getString(0).split(",").map(_.toLong).toSeq).toSet
    assert(normGroups === clean)
    // the raw (un-normalized) key on the dirty renderings loses groups
    val rawGroups = rendered
      .groupBy(md5(TextAnalysis.prefixTokens(col("rendered"), 8)).as("k"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2).count()
    assert(clean.isEmpty || rawGroups < clean.size,
      s"raw=$rawGroups clean=${clean.size}")
  }

  test("balanceAudit: split counts reconcile and a uniform stratum is unflagged") {
    import spark.implicits._
    val rows = (1L to 4000L).map(i => (s"s${i % 4}", i)).toDF("src", "id")
    val out = Splits.balanceAudit(rows, "src", "id").collect()
    assert(out.length === 4)
    // per-stratum counts sum to the stratum size
    assert(out.forall(r => r.getLong(1) + r.getLong(2) + r.getLong(3) === 1000L))
    // md5 splits are uniform across these strata — nothing should flag
    assert(out.forall(!_.getBoolean(5)), out.mkString(";"))
    // a single-stratum corpus defines the shares → chi2 exactly 0
    val one = Splits.balanceAudit((1L to 500L).map(i => ("only", i)).toDF("src", "id"),
      "src", "id").head()
    assert(one.getDouble(4) === 0.0)
  }

  test("dimStats: decimal moment sums are repartition-invariant; constant dim → sigma 0") {
    import spark.implicits._
    val vecs = (1 to 300).map { i =>
      (i.toLong, Array(5.0f, i.toFloat / 7f, (i % 13).toFloat, math.sin(i).toFloat))
    }.toDF("vec_id", "embedding")
    val a = Standardize.dimStats(vecs, "embedding").orderBy("dim")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    val b = Standardize.dimStats(vecs.repartition(17), "embedding").orderBy("dim")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    assert(a.sameElements(b)) // bit-identical, not approximately equal
    assert(a(0)._2 === 5.0 && a(0)._3 === 0.0) // constant dim
    // outlier summary: the constant dim contributes z=0 by convention
    val s = Standardize.outlierSummary(vecs, "embedding", "vec_id")
    assert(s.count() === 300)
    assert(s.agg(max("n_dims")).head().getLong(0) === 4L)
  }

  test("hashedCounts: codegen and in-row formulations agree; in-row has no shuffle; primary partial-aggregates") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq("alpha", "beta", "alpha", "gamma", "beta", "alpha")),
      (2L, Seq("delta")),
      (3L, Seq.empty[String])
    ).toDF("id", "toks")
    val primary = FeatureHash.hashedCounts(rows, "id", "toks", 8)
    val inRow = FeatureHash.hashedCountsInRow(rows, "id", "toks", 8)
    assert(primary.orderBy("id", "bucket").collect().toSeq ===
      inRow.orderBy("id", "bucket").collect().toSeq)
    // totals reconcile with token counts; the empty doc emits nothing
    assert(primary.groupBy("id").agg(sum("n")).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 6L), (2L, 1L)))
    // in-row: the histogram never leaves its row — no Exchange at all
    val inRowPlan = inRow.queryExecution.executedPlan.toString
    assert(!inRowPlan.contains("Exchange"), inRowPlan.take(2000))
    // primary: map-side combine before the one exchange (the ≤ D/doc
    // shuffle-volume bound), and the bucketing stays inside codegen
    // (codegen span rendering needs the AQE final plan — the structural
    // partial-aggregate is the assertable bound here)
    val pPlan = primary.queryExecution.executedPlan.toString
    assert(pPlan.contains("partial_count"), pPlan.take(2000))
  }
}
