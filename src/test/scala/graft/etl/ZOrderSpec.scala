package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Measured data-skipping for the z-order layout vs the time-linear
  * layout, read straight from parquet footer stats — pruning facts,
  * not timing noise. */
class ZOrderSpec extends SparkSpec {

  test("z-order: per-user scans prune hard where the time-linear layout reads everything; time windows stay pruned") {
    val dir = "/root/testdata/sf0.01"
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), expr("ts DIV 3600000000000").as("hour"))
    val bounds = ev.agg(min("user_id"), max("user_id"), min("hour"), max("hour")).head()
    val (umn, umx, hmn, hmx) =
      (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2), bounds.getLong(3))

    val root = java.nio.file.Files.createTempDirectory("graft-zorder")
    val linear = root.resolve("linear").toString
    val zed = root.resolve("zorder").toString
    // the natural ingest layout: range-partitioned + sorted by time
    ev.repartitionByRange(32, col("hour")).sortWithinPartitions(col("hour"))
      .write.option("compression", "snappy").parquet(linear)
    ZOrder.writeZOrdered(ev, zed, "user_id", "hour", 32)

    def frac(t: (Int, Int)) = t._1.toDouble / t._2
    val user = (42L, 42L); val day = (hmn, hmn + 23); val all = (hmn, hmx)
    val linUser = ZOrder.filesTouched(spark, linear, "user_id", user, "hour", all)
    val zUser   = ZOrder.filesTouched(spark, zed, "user_id", user, "hour", all)
    val linBox  = ZOrder.filesTouched(spark, linear, "user_id", user, "hour", day)
    val zBox    = ZOrder.filesTouched(spark, zed, "user_id", user, "hour", day)
    val linDay  = ZOrder.filesTouched(spark, linear, "user_id", (umn, umx), "hour", day)
    val zDay    = ZOrder.filesTouched(spark, zed, "user_id", (umn, umx), "hour", day)
    info(s"user-only: linear $linUser z $zUser; box: linear $linBox z $zBox; " +
      s"day-only: linear $linDay z $zDay")

    // time-linear: every file spans all users -> a per-user scan reads
    // the whole table; z-order confines it to the user's tile stripe
    assert(frac(linUser) == 1.0)
    assert(frac(zUser) <= 0.5, s"z user-only pruned too little: $zUser")
    assert(zUser._1 < linUser._1)
    // the 2-d box prunes at least as hard as either single-dim query
    assert(zBox._1 <= zUser._1 && zBox._1 <= zDay._1)
    // time windows keep pruning on the z layout too (the trade is
    // balance, not giving up time locality entirely)
    assert(frac(zDay) < 1.0)
    // and results are identical on both layouts
    val a = spark.read.parquet(linear)
      .filter(col("user_id") === 42 && col("hour") <= hmn + 23)
      .count()
    val b = spark.read.parquet(zed)
      .filter(col("user_id") === 42 && col("hour") <= hmn + 23)
      .count()
    assert(a == b && a > 0)
  }
}
