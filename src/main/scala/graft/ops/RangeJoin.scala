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

  /** `keys` adds equality columns to the bucket join — the SCD2/versioned-
    * dimension shape, where intervals are per-entity validity ranges. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double, keys: Seq[String] = Nil): DataFrame = {
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val p = points.withColumn("__b", bucketOf(col(pointCol)))
    val iv = intervals
      .withColumn("__b", explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    p.join(iv, keys :+ "__b")
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

  /** SCD2 / versioned-dimension temporal lookup: each fact row joins the
    * dimension version whose `[lo, hi]` validity range covers its time,
    * per entity key — LEFT semantics, so facts falling in a validity GAP
    * (a deleted/retired version) survive with NULL attributes instead of
    * silently vanishing (the classic SCD2 footgun). Built on the keyed
    * [[pointInInterval]] equi-bucket join; the gap rows come from one
    * anti-join against the matched ids — no second interval pass. */
  def scd2Lookup(facts: DataFrame, factIdCol: String, pointCol: String,
                 dim: DataFrame, loCol: String, hiCol: String,
                 bucketWidth: Double, keys: Seq[String]): DataFrame = {
    val matched = pointInInterval(facts, pointCol, dim, loCol, hiCol,
      bucketWidth, keys)
    val dimCols = dim.columns.filterNot(c => keys.contains(c))
    val unmatched = facts
      .join(matched.select(col(factIdCol)), Seq(factIdCol), "left_anti")
    val withNulls = dimCols.foldLeft(unmatched) { (d, c) =>
      d.withColumn(c, lit(null).cast(matched.schema(c).dataType))
    }
    matched.unionByName(withNulls.select(matched.columns.map(col).toIndexedSeq: _*))
  }

  /** q117: events joined to a synthesized 3-version user dimension with
    * a validity gap on relative days [10, 11] — tier(u, k) = (u+k) % 3
    * valid over [0,9] / [12,19] / [20,29]; events in the gap keep NULL
    * tier. Aggregated to (tier, event_type) counts. */
  def q117Scd2Join(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(s, dir)
    val dmin = ev.agg(min(expr("ts DIV 86400000000000")).as("dmin"))
    val facts = ev.crossJoin(broadcast(dmin))
      .select(col("event_id"), col("user_id"), col("event_type"),
        (expr("ts DIV 86400000000000") - col("dmin")).as("rd"))
    val dim = ev.select(col("user_id")).distinct()
      .withColumn("k", explode(lit(Array(0L, 1L, 2L))))
      .select(col("user_id"),
        element_at(lit(Array(0L, 12L, 20L)), (col("k") + 1).cast("int")).as("lo"),
        element_at(lit(Array(9L, 19L, 29L)), (col("k") + 1).cast("int")).as("hi"),
        ((col("user_id") + col("k")) % 3).as("tier"))
    scd2Lookup(facts, "event_id", "rd", dim, "lo", "hi",
      bucketWidth = 10.0, keys = Seq("user_id"))
      .groupBy(col("tier"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("tier").asc_nulls_first, col("event_type"))
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
