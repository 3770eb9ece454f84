package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's batch pipeline (cmd/export.py:204-397), Spark-first:
  * one narrow scan→parse→enrich chain, one wide boundary (the shuffle
  * before the partitioned write). No driver-side materialization — the
  * reference's whole-hour pandas gather (cmd/export.py:134) is exactly
  * the ceiling this design removes at 100 TB.
  */
object ExportJob {

  /** Hour-glob text scan (reference create_files_index, cmd/export.py:31-56).
    * The `$hour*` glob is pushed into the file listing, so only that hour's
    * objects are enumerated — the reference's only scan predicate. Applied
    * uniformly to local and object-store paths (the reference skips the
    * filter on its local branch — a deliberate divergence, SURVEY.md §2.1).
    * Returns None when no files match (reference exits 0,
    * cmd/export.py:339-341). */
  def readHour(spark: SparkSession, src: String, hour: String): Option[DataFrame] = {
    val pattern = new Path(s"${src.stripSuffix("/")}/$hour*")
    val fs = pattern.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(pattern)).getOrElse(Array.empty)
    if (matches.isEmpty) None
    else Some(spark.read.text(matches.map(_.getPath.toString): _*))
  }

  /** Filename-time extraction (reference parse_time, cmd/export.py:27-28):
    * first 19 chars of the object basename are `YYYY-MM-DD-HH-MM-SS`. */
  def fileTime(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    to_timestamp(substring(regexp_extract(c, "[^/]+$", 0), 1, 19), "yyyy-MM-dd-HH-mm-ss")

  /** Partitioned, clustered, Snappy parquet sink (reference
    * s3access/parquet.py:31-112):
    *   - `repartition(partitionCols)` gives the reference's
    *     one-file-per-partition-combo layout (each combo hashes to one
    *     task — at 100 TB swap for `repartition(n, cols)` or drop it and
    *     accept multiple files per partition);
    *   - `sortWithinPartitions(rowGroupCols)` clusters rows so Parquet
    *     row-group min/max stats are tight on the common predicates —
    *     the Spark equivalent of the reference's per-key-combo
    *     `write_table` loop (parquet.py:20-21);
    *   - Hive `col=value/` dirs + partition-column dropping are built into
    *     `partitionBy`. File names are Spark's `part-*` (documented
    *     divergence, SURVEY.md §7.4#1).
    */
  def write(df: DataFrame, dst: String, tasksPerHour: Int = 0): Unit = {
    import LogSchema._
    // tasksPerHour = 0 reproduces the reference's one-file-per-partition-
    // combo layout (each combo hashes to one task). At 100 TB an hour's
    // hot (bucket, operation) can exceed one task: pass an explicit task
    // count and the same combo spreads over many tasks/files while the
    // directory layout and row-group clustering are unchanged.
    val partitioned =
      if (tasksPerHour > 0) df.repartition(tasksPerHour, partitionCols.map(col): _*)
      else df.repartition(partitionCols.map(col): _*)
    partitioned
      .sortWithinPartitions(rowGroupCols.map(col): _*)
      .write
      .mode(SaveMode.Append)
      .option("compression", "snappy")
      .partitionBy(partitionCols: _*)
      .parquet(dst)
  }

  /** Idempotency markers (reference cmd/export.py:158-168, 319-324):
    * presence of `{trackingDst}/{hour}` means the hour is already done. */
  object Tracking {
    def done(spark: SparkSession, trackingDst: String, hour: String): Boolean = {
      val p = new Path(s"${trackingDst.stripSuffix("/")}/$hour")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    def mark(spark: SparkSession, trackingDst: String, hour: String, detail: String): Unit = {
      val p = new Path(s"${trackingDst.stripSuffix("/")}/$hour")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      try out.write(detail.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Post-commit rename to the reference's deterministic file naming
    * (s3access/parquet.py:89-92): each partition dir's single data file
    * becomes `{bucket}-{operation}-{year}-{month}-{day}-{hour}.parquet`.
    * Valid because `write` routes each partition combo to one task
    * (repartition on the partition cols) → exactly one file per dir.
    * Closes SURVEY §7.4#1; a FileCommitProtocol would do this atomically
    * inside the commit — the rename pass is the simpler equivalent and
    * touches only filesystem metadata. */
  def renameToReferenceLayout(spark: SparkSession, dst: String,
                              hour: Option[String] = None): Int = {
    val root = new Path(dst)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Scoping the glob to one hour keeps the rename pass O(this hour's
    // partition combos): the unscoped glob walks every partition dir ever
    // written — a year of appends is ~8,760 hours of dirs listed to
    // rename a handful of new files. Partition dir values are unpadded
    // ints (year=2021/month=7/...), so strip the HOUR string's zero pads.
    val hourGlob = hour match {
      case Some(h) =>
        val Array(y, mo, d, hh) = h.split("-").map(_.toInt)
        s"/bucket_name=*/operation=*/year=$y/month=$mo/day=$d/hour=$hh/part-*.parquet"
      case None =>
        "/bucket_name=*/operation=*/year=*/month=*/day=*/hour=*/part-*.parquet"
    }
    val parts = Option(fs.globStatus(new Path(dst + hourGlob))).getOrElse(Array.empty)
    parts.map { st =>
      val dir = st.getPath.getParent
      // dir chain: .../bucket_name=B/operation=O/year=Y/month=M/day=D/hour=H
      val values = Iterator.iterate(dir)(_.getParent).take(6).toSeq.reverse
        .map(_.getName.split("=", 2)(1))
      val target = new Path(dir, values.mkString("-") + ".parquet")
      if (st.getPath == target) 1
      else {
        // Crash-and-rerun idempotency: the rename runs BEFORE the hour's
        // tracking marker, so a rerun re-exports the complete hour — the
        // fresh part-* file supersedes any previously-renamed target.
        // Without the delete, HDFS-semantics rename returns false on an
        // existing target and both files would survive in the dir
        // (duplicate rows on read).
        if (fs.exists(target)) fs.delete(target, false)
        if (!fs.rename(st.getPath, target)) throw new java.io.IOException(
          s"renameToReferenceLayout: rename ${st.getPath} -> $target failed")
        1
      }
    }.sum
  }

  /** Preflight smoke checks (reference cmd/export.py:346-376): read the
    * FIRST matched input file end-to-end counting its lines (the
    * reference's smoke_read counts len(readlines()) — a full-object read,
    * catching truncated/permission-broken objects that a first-byte probe
    * would pass); write/read/delete a probe file under dst. Fails fast
    * before any cluster work is scheduled. */
  def preflight(spark: SparkSession, src: String, dst: String, hour: String): Boolean = {
    val pattern = new Path(s"${src.stripSuffix("/")}/$hour*")
    val srcFs = pattern.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val first = Option(srcFs.globStatus(pattern)).getOrElse(Array.empty).headOption
    val ok = first.forall { st =>
      // the read IS the check: an unreadable/truncated object throws out
      // of the count; any line count (including zero) means readable —
      // there is deliberately no predicate on the value
      spark.read.text(st.getPath.toString).count()
      true
    }
    val probe = new Path(s"${dst.stripSuffix("/")}/.graft-preflight-${java.util.UUID.randomUUID()}")
    val fs = probe.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val out = fs.create(probe, true)
      try out.write("probe".getBytes("UTF-8")) finally out.close()
      val in = fs.open(probe)
      val buf = new Array[Byte](5)
      try in.readFully(buf) finally in.close()
      ok && new String(buf, "UTF-8") == "probe"
    } finally fs.delete(probe, false)
  }

  /** One hour's export: read → parse → enrich → write → mark.
    * Returns number of rows written, or -1 if skipped (marker present or
    * no input files). */
  def runHour(spark: SparkSession, src: String, dst: String,
              trackingDst: String, hour: String): Long = {
    if (Tracking.done(spark, trackingDst, hour)) return -1L
    readHour(spark, src, hour) match {
      case None => -1L
      case Some(lines) =>
        val parsed = Enrich.parseLines(lines)
        // SPARK_GRAFT_EXPORT_TASKS>0 spreads hot partition combos over
        // that many write tasks (multiple files per partition dir) —
        // default 0 keeps reference one-file-per-combo parity
        val tasks = sys.env.getOrElse("SPARK_GRAFT_EXPORT_TASKS", "0").toInt
        // observe() counts the rows that flow through THIS write — no
        // post-write re-scan of dst (which accumulates across hours under
        // SaveMode.Append: a year in, that scan reads ~8,760 hours to
        // produce one marker line, and its count is cumulative, not
        // per-hour). The metric is only published once the write commits,
        // so the marker still reflects committed rows.
        val obs = org.apache.spark.sql.Observation(s"graft-export-$hour")
        write(parsed.observe(obs, count(lit(1)).as("rows")), dst, tasks)
        val n = obs.get("rows").asInstanceOf[Long]
        // Reference file-name parity (s3access/parquet.py:89-92) is the
        // DEFAULT: each partition dir's single file becomes
        // {bucket}-{op}-{y}-{m}-{d}-{h}.parquet. Only valid in
        // one-file-per-combo mode (tasks=0); multi-task exports keep
        // Spark's part-* names (several files would collide on one
        // target). SPARK_GRAFT_REFERENCE_NAMES=0 opts out. Runs before
        // the marker so a crash mid-rename leaves the hour unmarked.
        if (tasks == 0 &&
            sys.env.getOrElse("SPARK_GRAFT_REFERENCE_NAMES", "1") != "0")
          renameToReferenceLayout(spark, dst, Some(hour))
        Tracking.mark(spark, trackingDst, hour, s"exported hour=$hour rows=$n")
        n
    }
  }

  /** Job-level watchdog — the analogue of the reference's `TIMEOUT` env
    * (cmd/export.py:259). Documented divergence: the reference passes it
    * to a condition-variable wait inside a re-check loop (s3access/
    * wg.py:29-32), so it never actually aborts anything; here the env var
    * gets teeth as a hard deadline — a wedged S3 read must not silently
    * eat the cron slot (and the next hour's run) forever. `TIMEOUT=0`
    * (the default) disables the deadline. Exit code 124, `timeout`(1)
    * convention. */
  private[etl] def startWatchdog(spark: SparkSession, timeoutSec: Int): Option[Thread] =
    if (timeoutSec <= 0) None
    else {
      val t = new Thread(() => {
        val finishedInTime =
          try { Thread.sleep(timeoutSec * 1000L); false }
          catch { case _: InterruptedException => true }
        if (!finishedInTime) {
          System.err.println(s"""{"error":"export timed out","timeout_sec":$timeoutSec}""")
          spark.sparkContext.cancelAllJobs()
          Runtime.getRuntime.halt(124)
        }
      }, "graft-export-watchdog")
      t.setDaemon(true)
      t.start()
      Some(t)
    }

  /** Env contract of the reference (cmd/export.py:234-259): SRC, DST,
    * TRACKING_DST, HOUR (default = previous hour UTC, cmd/export.py:238-241),
    * TIMEOUT (seconds; see `startWatchdog`). */
  def main(args: Array[String]): Unit = {
    val src = sys.env("SRC")
    val dst = sys.env("DST")
    val tracking = sys.env.getOrElse("TRACKING_DST", dst + "_tracking")
    val hour = sys.env.getOrElse("HOUR", {
      val prev = java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC).minusHours(1)
      prev.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd-HH"))
    })
    val spark = graft.GraftSession.create()
    val watchdog = startWatchdog(spark, sys.env.getOrElse("TIMEOUT", "0").toInt)
    try {
      val t0 = System.nanoTime()
      val n = runHour(spark, src, dst, tracking, hour)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"hour":"$hour","rows":$n,"job_sec":$secs%.2f}""")
    } finally {
      watchdog.foreach(_.interrupt())
      spark.stop()
    }
  }
}
