package graft.queries

import graft.SparkSpec

/** Plan-regression guard: the physical-plan properties that make the
  * flagship queries scale are asserted, not just observed once — a
  * refactor that silently drops a pushdown or adds a shuffle fails here
  * long before it shows up in a benchmark. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
  }

  test("q01: filter pushed to parquet scan, whole-stage codegen, single exchange") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.linesIterator.count(_.trim.startsWith("+- Exchange")) <= 2) // partial agg + order
    // AQE finalizes the plan only on execution; codegen stage markers
    // ("*(n)") are visible in the final adaptive plan
    val df = graft.SparkEntry.queries("q01_pricing_summary")(spark, dir)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"))
    assert(finalPlan.contains("*(1)"), s"no WholeStageCodegen stage in:\n$finalPlan")
  }

  test("q01: scan reads only the referenced columns") {
    val p = plan("q01_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"column pruning lost: $readSchema")
    assert(readSchema.contains("l_quantity"))
  }

  test("q02: top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("q02_top_revenue")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q03: all dimension joins are broadcast") {
    val p = plan("q03_nation_revenue")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q04/q05: semi and anti joins plan as such") {
    assert(plan("q04_semi_join").contains("LeftSemi"))
    assert(plan("q05_anti_join").contains("LeftAnti"))
  }

  test("q16: as-of join aggregates with a partial (map-side) stage") {
    val p = plan("q16_asof_join")
    assert(p.contains("partial_max"), "expected map-side partial aggregation for the argmax")
  }

  test("q25: stop-shingle cap is a broadcast ANTI join, no cartesian pairs") {
    val p = plan("q25_ngram_jaccard")
    // the broadcast side must be the tiny STOP set (anti join) — a
    // broadcast of the rare set is O(corpus) and dies at scale
    assert(p.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("LeftAnti")),
      s"cap is not a broadcast anti join:\n$p")
    assert(!p.contains("CartesianProduct"), "all-pairs fallback crept in")
  }

  test("q29: probe fan-out rides the broadcast side; corpus scanned once") {
    val p = plan("q29_ann_lsh")
    assert(p.contains("BroadcastHashJoin"), "bucket probe should be a broadcast join")
    // one corpus pass feeds both the signatures and the candidates — the
    // embeddings table must not be scanned more than twice (sig + probe)
    assert(p.linesIterator.count(l => l.contains("Scan parquet") && l.contains("embeddings")) <= 2,
      s"embeddings scanned repeatedly:\n$p")
  }

  test("q33: no window sorts raw rows — every window runs over aggregated input") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // sparkPlan (pre-AQE) — the adaptive wrapper hides children from collect
    val physical = graft.SparkEntry.queries("q33_median_disc")(spark, dir)
      .queryExecution.sparkPlan
    val windows = physical.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected the two-phase selection's windows in the plan")
    windows.foreach { w =>
      val aggBelow = w.child.collectFirst { case a: BaseAggregateExec => a }
      assert(aggBelow.nonEmpty,
        s"window over raw (unaggregated) rows — single-task group sort at scale:\n$w")
    }
  }
}
