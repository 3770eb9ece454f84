package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Interval × interval overlap join — the two-sided sibling of
    * [[pointInInterval]]: pairs `(a, b)` with `a.s <= b.e && b.s <= a.e`,
    * optionally further keyed by equality columns.
    *
    * Both sides explode into the buckets they cover and equi-join on
    * `(keys..., bucket)`. A pair of overlapping intervals co-occurs in
    * EVERY bucket their spans share, so the join would emit it once per
    * shared bucket; the ownership rule keeps exactly one copy — the pair
    * is owned by the bucket containing the later of the two starts
    * (`greatest(floor(a.s/w), floor(b.s/w))`), which both sides are
    * guaranteed to cover when they overlap. Dedup is thus a cheap
    * in-row predicate, not a shuffling `distinct`.
    *
    * Cost: O(Σ span/w replication + per-bucket candidate pairs). `w`
    * near the median span keeps replication ≈ 2 rows/interval while
    * candidate volume stays local to each bucket — the exact knob
    * documented on [[pointInInterval]], applied twice.
    */
  def intervalOverlap(a: DataFrame, b: DataFrame, keys: Seq[String],
                      sCol: String, eCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def bucketOf(c: Column): Column =
      floor(c.cast("double") / lit(bucketWidth.toDouble)).cast("long")
    def sideOf(df: DataFrame, p: String): DataFrame = {
      val renamed = df.columns.foldLeft(df) { case (d, c) =>
        if (keys.contains(c)) d else d.withColumnRenamed(c, s"$p$c")
      }
      renamed
        .withColumn(s"${p}__sb", bucketOf(col(s"$p$sCol")))
        .withColumn("__b",
          explode(sequence(col(s"${p}__sb"), bucketOf(col(s"$p$eCol")))))
    }
    val l = sideOf(a, "a_")
    val r = sideOf(b, "b_")
    l.join(r, keys :+ "__b")
      .filter(col("__b") === greatest(col("a___sb"), col("b___sb")) &&
        col(s"a_$sCol") <= col(s"b_$eCol") && col(s"b_$sCol") <= col(s"a_$eCol"))
      .drop("__b", "a___sb", "b___sb")
  }

  /** q111: overlapping event-activity windows across the even/odd halves
    * of the events table. Each event opens a deterministic window
    * `[t, t + 60 + event_id % 240]` seconds; within an event_type, report
    * every (even-id, odd-id) pair whose windows overlap and the overlap
    * length. Exercises the two-sided bucketed join end-to-end with an
    * inequality-join oracle. */
  def q111IntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val iv = graft.Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        expr("ts DIV 1000000000").as("s"))
      .withColumn("e", col("s") + lit(60L) + col("event_id") % 240L)
    val a = iv.filter(col("event_id") % 2 === 0)
    val b = iv.filter(col("event_id") % 2 === 1)
    intervalOverlap(a, b, Seq("event_type"), "s", "e", bucketWidth = 300L)
      .select(col("a_event_id").as("a_id"), col("b_event_id").as("b_id"),
        col("event_type"),
        (least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s"))).as("overlap_s"))
      .orderBy(col("a_id"), col("b_id"))
  }
}
