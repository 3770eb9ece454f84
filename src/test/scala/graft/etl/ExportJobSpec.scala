package graft.etl

import java.nio.file.Files
import org.apache.spark.sql.functions.input_file_name
import graft.{Fixtures, SparkSpec}

/** Golden end-to-end (SURVEY.md §5.2): fixture hour of raw lines →
  * ExportJob.runHour → assert partition layout, values, pruning, and
  * idempotency. */
class ExportJobSpec extends SparkSpec {

  test("export hour end-to-end: layout, rows, pruning, idempotency") {
    val base = Files.createTempDirectory("graft-e2e").toFile.getAbsolutePath
    val src = s"$base/in"; val dst = s"$base/out"; val tracking = s"$base/track"
    new java.io.File(src).mkdirs()

    // FIXTURES.md §2: two files in hour 05, one in hour 06 (must be excluded)
    Files.write(java.nio.file.Paths.get(s"$src/2021-07-18-05-00-12-ABCDEF0123456789"),
      (Fixtures.happyLine + "\n" + Fixtures.dashLine).getBytes)
    Files.write(java.nio.file.Paths.get(s"$src/2021-07-18-05-30-44-FEDCBA9876543210"),
      Fixtures.happyLine.getBytes)
    Files.write(java.nio.file.Paths.get(s"$src/2021-07-18-06-00-01-0123456789ABCDEF"),
      Fixtures.roleLine.getBytes)

    assert(ExportJob.preflight(spark, src, dst, "2021-07-18-05"))

    val n = ExportJob.runHour(spark, src, dst, tracking, "2021-07-18-05")
    assert(n == 3) // hour-06 file excluded by the glob

    // Hive partition layout (FIXTURES.md §3)
    assert(new java.io.File(
      s"$dst/bucket_name=awsexamplebucket1/operation=REST.GET.OBJECT/year=2021/month=7/day=18/hour=5").isDirectory)
    assert(new java.io.File(
      s"$dst/bucket_name=awsexamplebucket1/operation=REST.GET.LOGGING_STATUS/year=2021/month=7/day=18/hour=5").isDirectory)

    // reference-parity file names (s3access/parquet.py:89-92) come out of
    // runHour itself — SPARK_GRAFT_REFERENCE_NAMES defaults on
    assert(new java.io.File(
      s"$dst/bucket_name=awsexamplebucket1/operation=REST.GET.OBJECT/year=2021/month=7/day=18/hour=5/" +
        "awsexamplebucket1-REST.GET.OBJECT-2021-7-18-5.parquet").isFile)

    val out = spark.read.parquet(dst)
    assert(out.count() == 3)
    assert(out.columns.toSet == LogSchema.schema.fieldNames.toSet)

    // partition-pruned read: only the GET.OBJECT dir should be scanned
    val pruned = out.where("operation = 'REST.GET.OBJECT' and hour = 5")
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 2)
    assert(planStr.contains("PartitionFilters"))

    // idempotency: marker written, re-run is a no-op
    assert(ExportJob.Tracking.done(spark, tracking, "2021-07-18-05"))
    assert(ExportJob.runHour(spark, src, dst, tracking, "2021-07-18-05") == -1L)
    assert(spark.read.parquet(dst).count() == 3)

    // empty hour: no files → skip, no marker
    assert(ExportJob.runHour(spark, src, dst, tracking, "2021-07-18-07") == -1L)
    assert(!ExportJob.Tracking.done(spark, tracking, "2021-07-18-07"))

    // marker rows are PER-HOUR, not cumulative: hour 06 appends 1 row to a
    // dst that already holds 3, and both its return and marker must say 1
    // (the count comes from observe() on the written frame, not a re-scan
    // of the accumulated dataset)
    assert(ExportJob.runHour(spark, src, dst, tracking, "2021-07-18-06") == 1L)
    assert(spark.read.parquet(dst).count() == 4)
    val markerPath = java.nio.file.Paths.get(s"$tracking/2021-07-18-06")
    val marker = new String(Files.readAllBytes(markerPath), "UTF-8")
    assert(marker == "exported hour=2021-07-18-06 rows=1")

    // TIMEOUT watchdog: 0 disables; an interrupted watchdog dies without
    // firing (the halt path is exercised in packaging tests, not in-JVM)
    assert(ExportJob.startWatchdog(spark, 0).isEmpty)
    val wd = ExportJob.startWatchdog(spark, 3600).get
    wd.interrupt(); wd.join(5000)
    assert(!wd.isAlive)

    // filename-time extraction (reference parse_time): first 19 chars
    val ft = spark.read.text(s"$src/2021-07-18-05-00-12-ABCDEF0123456789")
      .select(ExportJob.fileTime(input_file_name()).cast("string"))
      .collect()(0).getString(0)
    assert(ft == "2021-07-18 05:00:12")
  }
}
