package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: `points.value ∈ [intervals.lo, intervals.hi]`.
  *
  * Spark plans a pure inequality join as BroadcastNestedLoopJoin —
  * O(|points| × |intervals|) and only viable when one side broadcasts.
  * Binning turns it into an equi-join: each interval is exploded to the
  * buckets it covers, each point hashes to one bucket, the join key is
  * the bucket id, and the exact predicate filters the within-bucket
  * candidates. Cost becomes O(|points| + Σ interval_span/bucketWidth +
  * candidates) with a plain shuffled hash join — the standard interval/
  * spatial-join technique, scale-ready on both sides.
  *
  * `bucketWidth` trades replication (wide intervals explode into more
  * buckets) against candidate precision; pick ≈ the median interval span.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val p = points.withColumn("__b", bucketOf(col(pointCol)))
    val iv = intervals
      .withColumn("__b", explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    p.join(iv, Seq("__b"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }
}
