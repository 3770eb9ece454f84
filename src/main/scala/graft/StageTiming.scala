package graft

import org.apache.spark.sql.functions._

/** Stage-level cost attribution for the composite maintenance gates —
  * `Probe` shows plans, `Bench` shows whole-query medians; this prints
  * where a gate's seconds actually go (bulk write vs streamed appends
  * vs probe), so gate-pricing decisions are measured, not guessed.
  *
  * Run: `sbt "runMain graft.StageTiming /root/testdata/sf0.1"`. */
object StageTiming {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    // job/stage/task counters: a phase whose wall-time dwarfs its data
    // volume is usually paying per-job scheduling, and this shows it
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(st.stageInfo.numTasks)
      }
    })
    def t(label: String)(f: => Any): Unit = {
      val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
      val t0 = System.nanoTime()
      f
      Thread.sleep(300) // let the listener bus drain before reading counters
      println(f"$label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  " +
        f"jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d tasks=${tasks.get - k0}%5d")
    }

    // q169's anatomy: bulk layout write, one direct append, the same
    // append through a 1-batch stream, the probe
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val rootStr = graft.Sidecars.path("graft_stage_timing")
    val fs = new org.apache.hadoop.fs.Path(rootStr)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(rootStr), true)
    val dst = s"$rootStr/idx"
    t("bulk write 3/5")(graft.ops.NearDupIndex.writeMinhashLayout(
      docs.filter(pmod(col("doc_id"), lit(5)).isin(1, 2, 3)), dst,
      nBuckets = 16, maxDocFreq = 10000L))
    t("direct append 1/10")(graft.ops.NearDupIndex.appendToMinhashLayout(
      docs.filter(pmod(col("doc_id"), lit(10)) === 4), dst))
    t("streamed append 1/10") {
      val stream = graft.ops.StreamingGates.stagedFileStream(rootStr,
        Seq(docs.filter(pmod(col("doc_id"), lit(10)) === 9)))
      graft.streaming.Streaming.minhashAppendStream(stream, dst)
        .awaitTermination()
    }
    t("probe 1/5")(graft.ops.NearDupIndex.probeNearDup(spark, dst,
      docs.filter(pmod(col("doc_id"), lit(5)) === 0)).count())

    // append sub-steps, warm (approximated through the public pieces)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 4)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    t("  shingle batch")(
      graft.ops.Dedup.shingles(graft.ops.Par.widen(batch), 3).count())
    t("  sidecar read+sum")(spark.read.parquet(dst + "_sh_df")
      .groupBy(col("g")).agg(sum(col("df"))).count())
    t("  direct append again")(
      graft.ops.NearDupIndex.appendToMinhashLayout(batch, dst))
    val batch2 = docs.filter(pmod(col("doc_id"), lit(10)) === 4)
      .withColumn("doc_id", col("doc_id") + lit(2000000L))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("  append, AQE off")(
      graft.ops.NearDupIndex.appendToMinhashLayout(batch2, dst))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
