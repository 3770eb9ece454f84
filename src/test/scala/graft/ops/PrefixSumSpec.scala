package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** [[PrefixSum.runningSum]] must equal the single-partition window it
  * replaces, bit-for-bit, on every shape the ECDF family feeds it. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("cum", sum(col("c")).over(Window.orderBy(col("v"))))
    .select(col("v").cast("double"), col("cum")).collect()
    .map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1).toSeq

  private def twoLevel(df: org.apache.spark.sql.DataFrame) =
    PrefixSum.runningSum(df, col("v"), col("c"), "cum")
      .select(col("v").cast("double"), col("cum")).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1).toSeq

  test("long histogram: equals the naive global window") {
    // deliberately clumped + sparse values (range bucketing's worst case)
    val vs = (Seq(0L, 1L, 2L, 3L, 1000000L, 1000001L) ++
      (50L to 120L) ++ Seq(-17L, -3L, 999999999L)).distinct
    val df = vs.map(v => (v, v % 7 + 1)).toDF("v", "c")
    assert(twoLevel(df) == naive(df))
  }

  test("double order column: equals the naive global window") {
    val vs = Seq(-2.5, -0.125, 0.0, 0.25, 0.250001, 3.75, 1e6, 1e6 + 0.5)
    val df = vs.zipWithIndex.map { case (v, i) => (v, i + 1L) }.toDF("v", "c")
    assert(twoLevel(df) == naive(df))
  }

  test("single-row and two-equal-range frames") {
    val one = Seq((42L, 7L)).toDF("v", "c")
    assert(twoLevel(one) == naive(one))
    val two = Seq((5L, 1L), (6L, 2L)).toDF("v", "c")
    assert(twoLevel(two) == naive(two))
  }

  test("plan has no unpartitioned window over the input frame") {
    val df = (0L to 500L).map(v => (v, 1L)).toDF("v", "c")
    val plan = PrefixSum.runningSum(df, col("v"), col("c"), "cum")
      .queryExecution.executedPlan.toString
    // the only global window allowed is the ≤ P-row bucket-offset scan;
    // it windows over __pst (the subtotal), never the raw counts
    val globalWindows = plan.linesIterator
      .filter(_.contains("Window"))
      .filterNot(_.contains("__psb")) // partitioned per-bucket window
      .toSeq
    assert(globalWindows.forall(_.contains("__pst")),
      s"unexpected global window:\n$plan")
  }
}
