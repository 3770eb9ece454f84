package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral specs for the wave-7 operators: two-sided interval
  * overlap join (q111) — bucketed ≡ nested-loop, exactly-once pair
  * emission (the ownership rule), and an equi-join physical plan. */
class Wave7Spec extends SparkSpec {

  test("interval overlap: bucketed join equals nested loop, one row per pair, no BNLJ") {
    import spark.implicits._
    // spans 0–340s vs bucketWidth 100: intervals cover 1–5 buckets, so
    // the multi-bucket-co-occurrence dedup path is exercised hard
    val a = (1 to 400).map { i =>
      val s = (i * 37L) % 3000
      (i.toLong, s"k${i % 3}", s, s + 20 + (i % 17) * 20)
    }.toDF("aid", "key", "s", "e")
    val b = (1 to 400).map { i =>
      val s = (i * 53L) % 3000
      (i.toLong, s"k${i % 3}", s, s + 20 + (i % 13) * 20)
    }.toDF("bid", "key", "s", "e")

    val bucketed = RangeJoin.intervalOverlap(a, b, Seq("key"), "s", "e", 100L)
      .select("a_aid", "b_bid")
    val pairs = bucketed.collect().map(r => (r.getLong(0), r.getLong(1)))
    val naivePairs = a.as("l").join(b.as("r"),
        col("l.key") === col("r.key") &&
          col("l.s") <= col("r.e") && col("r.s") <= col("l.e"))
      .select(col("l.aid"), col("r.bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === naivePairs.toSet)
    assert(naivePairs.nonEmpty)
    // ownership rule: exactly once per overlapping pair, no distinct needed
    assert(pairs.length === pairs.toSet.size,
      s"duplicate pairs: ${pairs.length} rows vs ${pairs.toSet.size} distinct")
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("interval overlap: touching endpoints overlap (closed intervals), disjoint don't pair") {
    import spark.implicits._
    val a = Seq((1L, "k", 0L, 100L), (2L, "k", 500L, 600L)).toDF("aid", "key", "s", "e")
    val b = Seq((10L, "k", 100L, 150L), (11L, "k", 300L, 499L)).toDF("bid", "key", "s", "e")
    val got = RangeJoin.intervalOverlap(a, b, Seq("key"), "s", "e", 50L)
      .select("a_aid", "b_bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
  }
}
