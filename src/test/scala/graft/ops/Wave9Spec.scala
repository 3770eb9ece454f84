package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral specs for the wave-9 operators: exact OLS trend
  * recovery and repartition invariance, session-path extraction with
  * the bounded buffer cap, and negative-edge sampling soundness. */
class Wave9Spec extends SparkSpec {

  test("trendSlope: recovers a planted line exactly; repartition-invariant; degenerate key → NULL") {
    import spark.implicits._
    // key 1: y = 3x + 7 exactly; key 2: all x equal (no slope)
    val rows = ((0L to 99L).map(x => (1L, x, 3.0 * x + 7.0)) ++
      Seq((2L, 5L, 1.0), (2L, 5L, 9.0))).toDF("k", "x", "y")
    val out = TimeSeries.trendSlope(rows, "k", "x", "y").orderBy("k").collect()
    assert(out(0).getDouble(2) === 3.0 && out(0).getDouble(3) === 7.0)
    assert(out(1).isNullAt(2) && out(1).isNullAt(3))
    val re = TimeSeries.trendSlope(rows.repartition(13), "k", "x", "y")
      .orderBy("k").collect()
    assert(out.map(_.toString).sameElements(re.map(_.toString)))
  }

  test("session paths: gap rule splits sessions, 12-event cap bounds the path") {
    import spark.implicits._
    // one user: 15 events 1s apart (one capped session), then a 31-min
    // gap, then 2 events (a second session) — epoch-nanos timestamps
    val g = 1_000_000_000L
    val evs = (0 until 15).map(i =>
      (7L, i * g, i.toLong, s"e${i % 3}")) ++
      Seq((7L, 15 * g + 1860L * g, 100L, "buy"), (7L, 16 * g + 1860L * g, 101L, "buy"))
    val df = evs.toDF("user_id", "ts", "event_id", "event_type")
    // replicate the q130 dataflow on the frame (q130 itself binds the table)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sid = df
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__start",
        (col("__prev").isNull || col("ts") - col("__prev") > 1800000000000L).cast("long"))
      .withColumn("__sid", sum(col("__start")).over(run))
      .withColumn("__rnu", row_number().over(w))
      .withColumn("__srn", max(when(col("__start") === 1L, col("__rnu"))).over(run))
      .withColumn("__idx", col("__rnu") - col("__srn") + 1)
    val sessions = sid.groupBy(col("user_id"), col("__sid"))
      .agg(array_join(transform(
        array_sort(collect_list(when(col("__idx") <= 12,
          struct(col("ts"), col("event_id"), col("event_type"))))),
        e => e("event_type")), ">").as("path"),
        count(lit(1)).as("len"))
      .orderBy("__sid").collect()
    assert(sessions.length === 2)
    // first session: 15 events but the path carries only the first 12
    assert(sessions(0).getLong(3) === 15L)
    assert(sessions(0).getString(2).split(">").length === 12)
    assert(sessions(0).getString(2).startsWith("e0>e1>e2>e0"))
    assert(sessions(1).getString(2) === "buy>buy")
  }

  test("negativeEdges: never a true edge, valid nodes, ranks dense, deterministic") {
    import spark.implicits._
    val nodes = (0L until 200L).map(Tuple1(_)).toDF("id")
    val edges = Graph.communityLinks(nodes)
    val neg = Graph.negativeEdges(nodes, edges, k = 3, attempts = 8)
    val rows = neg.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.forall { case (_, rank, _) => rank >= 1 && rank <= 3 })
    // sampled partners are real nodes and never self
    assert(rows.forall { case (s, _, d) => d >= 0 && d < 200 && d != s })
    // no sampled pair is a true edge (either orientation)
    val edgeSet = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.forall { case (s, _, d) =>
      !edgeSet.contains((math.min(s, d), math.max(s, d))) })
    // pure id arithmetic → identical output on a second evaluation
    val again = Graph.negativeEdges(nodes, edges, k = 3, attempts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sortBy(x => (x._1, x._2)).sameElements(again.sortBy(x => (x._1, x._2))))
  }
}
