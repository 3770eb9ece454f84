package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Segment compaction for the APPEND-ONLY aggregate sidecars (the
  * posting index's `_df`/`_totals`, the minhash index's `_sh_df`):
  * every append lands a new segment — one more row per key and one
  * more small file per bucket — and probes sum segments at read time.
  * Correctness never degrades, but read amplification grows with
  * append count; compaction collapses the store back to ONE row per
  * key (restoring the term-sorted row-group skipping of a fresh
  * write), summing exactly what the probes sum.
  *
  * Crash-safety follows `etl.Compaction`'s contract and NAMING, so
  * `Compaction.recover(root)` restores any intermediate state of this
  * op too: write tmp → validate → rename root→backup → rename
  * tmp→root → validate → drop backup. Validation here is
  * SUM-preservation (the quantity probes consume), not row count —
  * collapsing rows is the point. */
object SegmentCompaction {

  /** Compact `root` to one row per (`keys`), summing `sums`.
    * `bucketCol` keeps the partition layout (None → a single unsplit
    * store, for tiny sidecars like `_totals`). Returns (rows before,
    * rows after). */
  def compactSegments(spark: SparkSession, root: String, keys: Seq[String],
                      sums: Seq[String],
                      bucketCol: Option[String] = Some("bucket")): (Long, Long) = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df = spark.read.parquet(root)

    def totalsOf(d: org.apache.spark.sql.DataFrame): Seq[Any] = {
      val aggs = count(lit(1)).as("n") +: sums.map(c => sum(col(c)).as(c))
      d.agg(aggs.head, aggs.tail: _*).collect()(0).toSeq
    }
    val before = totalsOf(df)

    val groupCols = (bucketCol.toSeq ++ keys).map(col)
    val sumAggs = sums.map(c => sum(col(c)).as(c))
    val agg0 =
      if (groupCols.isEmpty) df.agg(sumAggs.head, sumAggs.tail: _*)
      else df.groupBy(groupCols: _*).agg(sumAggs.head, sumAggs.tail: _*)

    val tmp = new Path(rootPath.getParent, rootPath.getName + ".compact-tmp")
    val writer = bucketCol match {
      case Some(b) =>
        agg0.repartition(col(b)).sortWithinPartitions(keys.map(col): _*)
          .write.mode(SaveMode.Overwrite).option("compression", "snappy")
          .partitionBy(b)
      case None =>
        agg0.coalesce(1).write.mode(SaveMode.Overwrite)
    }
    writer.parquet(tmp.toString)

    // the quantity probes consume must be identical BEFORE the swap
    val tmpTotals = totalsOf(spark.read.parquet(tmp.toString))
    require(tmpTotals.drop(1) == before.drop(1),
      s"compaction aborted: sums drifted $before -> $tmpTotals — original untouched")

    val backup = new Path(rootPath.getParent, rootPath.getName + ".pre-compact")
    fs.rename(rootPath, backup)
    fs.rename(tmp, rootPath)
    val after = totalsOf(spark.read.parquet(root))
    require(after.drop(1) == before.drop(1),
      s"compaction: swapped root sums drifted $before -> $after — backup retained at $backup")
    fs.delete(backup, true)
    (before.head.asInstanceOf[Long], after.head.asInstanceOf[Long])
  }
}
