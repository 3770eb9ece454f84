package graft.etl

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{Fixtures, SparkSpec}

class CompactionSpec extends SparkSpec {

  test("compaction shrinks file count, preserves layout and data") {
    val base = Files.createTempDirectory("graft-compact").toFile.getAbsolutePath
    val src = s"$base/in"; val dst = s"$base/out"
    new java.io.File(src).mkdirs()
    // three "hourly runs" into the same partitions → small-file buildup.
    // Built via the raw write path (part-* names, like a multi-task
    // export): runHour's default reference naming now delete-and-replaces
    // one deterministic file per partition combo, so it can no longer
    // produce the multi-file dirs compaction exists to fix.
    (1 to 3).foreach { i =>
      Files.write(java.nio.file.Paths.get(s"$src/2021-07-18-05-0$i-00-RUN$i"),
        (Fixtures.happyLine + "\n" + Fixtures.dashLine).getBytes)
      val lines = ExportJob.readHour(spark, src, "2021-07-18-05").get
      ExportJob.write(Enrich.parseLines(lines), dst)
    }
    val before = spark.read.parquet(dst)
    val beforeRows = before.count()
    val beforeData = before.orderBy("requestid", "ts").collect().toSeq

    val (nBefore, nAfter) = Compaction.compact(spark, dst)
    assert(nBefore > nAfter, s"expected fewer files, got $nBefore -> $nAfter")

    val after = spark.read.parquet(dst)
    assert(after.count() == beforeRows)
    assert(after.orderBy("requestid", "ts").collect().toSeq == beforeData)
    // layout intact: partition dirs still present and pruned reads work
    assert(after.where("operation = 'REST.GET.OBJECT' and hour = 5").count() == beforeRows / 2)
  }

  test("crash between the swap renames is recoverable — data never lost") {
    val base = Files.createTempDirectory("graft-compact-crash").toFile.getAbsolutePath
    val src = s"$base/in"; val dst = s"$base/out"
    new java.io.File(src).mkdirs()
    Files.write(java.nio.file.Paths.get(s"$src/2021-07-18-05-00-12-AAAA"),
      (Fixtures.happyLine + "\n" + Fixtures.dashLine).getBytes)
    ExportJob.runHour(spark, src, dst, s"$base/track", "2021-07-18-05")
    val beforeData = spark.read.parquet(dst).orderBy("requestid").collect().toSeq

    // simulate the worst crash point: root renamed away, tmp not yet
    // renamed in (the state after compact's step 3)
    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(dst),
      new org.apache.hadoop.fs.Path(s"$dst.pre-compact"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dst)))

    assert(Compaction.recover(spark, dst))
    assert(spark.read.parquet(dst).orderBy("requestid").collect().toSeq == beforeData)

    // recover on a healthy tree is a no-op that reports success
    assert(Compaction.recover(spark, dst))
    assert(spark.read.parquet(dst).count() == beforeData.size)
  }

  test("deterministic stratified sample is stable and stratum-scoped") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val fractions = Map("en" -> 0.5, "de" -> 0.1)
    val s1 = graft.queries.Relational.stratifiedSample(docs, "doc_id", "lang", fractions)
    val s2 = graft.queries.Relational.stratifiedSample(docs, "doc_id", "lang", fractions)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == s2.select("doc_id").collect().map(_.getLong(0)).toSet) // stable
    // only declared strata are sampled
    assert(s1.select("lang").distinct().collect().map(_.getString(0)).toSet.subsetOf(Set("en", "de")))
    // rough rate: en near 50%
    val enTotal = docs.where("lang = 'en'").count().toDouble
    val enSampled = s1.where("lang = 'en'").count().toDouble
    assert(math.abs(enSampled / enTotal - 0.5) < 0.2)
  }
}
