package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for MULTI-dimensional data skipping —
  * the write-time layout decision behind "query by user AND by time on
  * the same table". A time-sorted layout (the natural ingest order,
  * and what `ExportJob`'s single-dim row-group clustering gives) prunes
  * time predicates perfectly but scatters every user across ALL files,
  * so a per-user scan reads the whole table. Sorting by the interleaved
  * bits of BOTH dimensions clusters files into 2-d tiles: a predicate
  * on either dimension — or a box on both — overlaps only the tiles
  * that actually contain it, and parquet file/row-group min-max stats
  * prune the rest. This is the standard lakehouse Z-ORDER feature,
  * built here from plain column expressions (shift/mask interleave, a
  * range repartition on the z-value, a within-partition sort) — no
  * custom writer, and the pruning mechanism exercised is exactly
  * Spark's own stats-based skipping.
  *
  * Scale shape: one pass — a broadcast 1-row min/max aggregate to
  * scale each dimension into 16 bits, a narrow codegen'd interleave,
  * `repartitionByRange(zvalue)` (one shuffle, contiguous z-ranges per
  * file = tight per-file boxes) and a spilling within-partition sort.
  * The trade is explicit and measured (ZOrderSpec): the 2-d layout
  * prunes single-user scans ~an-order-of-magnitude harder than the
  * time-linear layout while time-window scans stay pruned — the
  * balanced choice when both access paths matter.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even positions (classic magic
    * masks — 5 shift/mask ops, fully codegen'd). */
  def spread16(x: Column): Column = {
    val v0 = x.bitwiseAND(lit(0xFFFFL))
    val v1 = (v0.bitwiseOR(shiftleft(v0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(lit(0x33333333L))
    (v3.bitwiseOR(shiftleft(v3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two 16-bit values: a in even bits, b in odd. */
  def morton16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Scale a long column into [0, 65535] given its data min/max. A
    * degenerate dimension (min == max) maps to 0. */
  def scale16(x: Column, mn: Column, mx: Column): Column =
    when(mx === mn, 0L).otherwise(
      ((x - mn) * 65535L / (mx - mn)).cast("long"))

  /** Write `df` z-ordered on (dimA, dimB) into `nFiles` files: scale
    * both dims from their broadcast min/max, range-repartition on the
    * z-value (contiguous ranges → tight per-file stat boxes), sort
    * within partitions for row-group-level clustering too. */
  def writeZOrdered(df: DataFrame, dst: String, dimA: String, dimB: String,
                    nFiles: Int): Unit = {
    val bounds = df.agg(
      min(col(dimA)).as("amn"), max(col(dimA)).as("amx"),
      min(col(dimB)).as("bmn"), max(col(dimB)).as("bmx"))
    df.crossJoin(broadcast(bounds))
      .withColumn("zval", morton16(
        scale16(col(dimA), col("amn"), col("amx")),
        scale16(col(dimB), col("bmn"), col("bmx"))))
      .drop("amn", "amx", "bmn", "bmx")
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("compression", "snappy").parquet(dst)
  }

  /** Files whose parquet footer min/max stats for (`dimA`, `dimB`)
    * intersect the query box — the exact skipping decision Spark's
    * scan makes, read directly from the footers so the spec measures
    * pruning, not timing noise. Returns (touched, total). */
  def filesTouched(s: SparkSession, dst: String, dimA: String,
                   boxA: (Long, Long), dimB: String,
                   boxB: (Long, Long)): (Int, Int) = {
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dst).getFileSystem(conf)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dst))
      .filter(_.getPath.getName.endsWith(".parquet"))
    var touched = 0
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(f.getPath, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        // per-file box = union over row groups (file-level stats)
        var amn = Long.MaxValue; var amx = Long.MinValue
        var bmn = Long.MaxValue; var bmx = Long.MinValue
        reader.getFooter.getBlocks.asScala.foreach { blk =>
          blk.getColumns.asScala.foreach { c =>
            val name = c.getPath.toDotString
            val st = c.getStatistics
            if (st != null && !st.isEmpty) {
              def lo = st.genericGetMin.asInstanceOf[java.lang.Long].longValue
              def hi = st.genericGetMax.asInstanceOf[java.lang.Long].longValue
              if (name == dimA) { amn = math.min(amn, lo); amx = math.max(amx, hi) }
              if (name == dimB) { bmn = math.min(bmn, lo); bmx = math.max(bmx, hi) }
            }
          }
        }
        val hit = amx >= boxA._1 && amn <= boxA._2 &&
                  bmx >= boxB._1 && bmn <= boxB._2
        if (hit) touched += 1
      } finally reader.close()
    }
    (touched, files.length)
  }
}
