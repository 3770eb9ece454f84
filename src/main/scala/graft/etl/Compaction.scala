package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for the partitioned log layout — the operational
  * companion of the hourly export: a year of hourly runs leaves one file
  * per (partition-combo, hour-run); reading a month then touches tens of
  * thousands of small files (S3 LIST + per-file open dominate). Compaction
  * rewrites a partition subtree into ~`targetBytes` files while keeping
  * the Hive layout and the row-group clustering contract intact.
  */
object Compaction {

  /** Rewrite `root` (or one partition subtree of it) with files sized
    * toward `targetBytes`. Returns (filesBefore, filesAfter). Output is
    * written alongside then swapped in, so a crash mid-compaction leaves
    * the original data untouched. */
  def compact(spark: SparkSession, root: String,
              targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def dataFiles(p: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) buf += st
      }
      buf.toSeq
    }

    val before = dataFiles(rootPath)
    val totalBytes = before.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(root)
    val tmp = new Path(rootPath.getParent, rootPath.getName + ".compact-tmp")
    df.repartition(nFiles, LogSchema.partitionCols.map(col): _*)
      .sortWithinPartitions(LogSchema.rowGroupCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .partitionBy(LogSchema.partitionCols: _*)
      .parquet(tmp.toString)

    val backup = new Path(rootPath.getParent, rootPath.getName + ".pre-compact")
    fs.rename(rootPath, backup)
    fs.rename(tmp, rootPath)
    fs.delete(backup, true)
    (before.size.toLong, dataFiles(rootPath).size.toLong)
  }
}
