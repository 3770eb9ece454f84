package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Scratch probe: pin Spark's real late-row semantics (drop vs
  * re-emit) for windowed aggregation under AvailableNow with
  * maxFilesPerTrigger=1. Not part of the driver contract. */
object ProbeLate {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = graft.Sidecars.path("probe_late")
    val H = 3600L * 1000000000L // one hour in ns
    // batch0: hours 0..9 (one row each). batch1: hours 10..19 PLUS a
    // 1-batch-late row at hour 2. batch2: hours 20..29 PLUS a
    // 2-batch-late row at hour 3 and a 1-batch-late row at hour 12.
    val b0 = (0L to 9L).map(h => (h, h * H + 5L))
    val b1 = (10L to 19L).map(h => (h, h * H + 5L)) :+ (100L, 2L * H + 7L)
    val b2 = (20L to 29L).map(h => (h, h * H + 5L)) :+ (200L, 3L * H + 7L) :+ (201L, 12L * H + 7L)
    val sent = Seq((999L, 400L * H))
    val slices = Seq(b0, b1, b2, sent).map(_.toDF("event_id", "ts"))
    graft.ops.StreamingGates.stageSlices(root, slices)
    val q = spark.readStream.schema(slices.head.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      .withColumn("t", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("t", "2 hours")
      .groupBy(window(col("t"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws"), col("n"))
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", s"$root/cp")
      .trigger(Trigger.AvailableNow())
      .format("parquet").start(s"$root/win")
    q.awaitTermination()
    val sq = spark.streams.active.headOption
    // progress history: dropped-by-watermark per batch
    spark.read.json(s"$root/cp/offsets").collect() // noop touch
    val prog = q.recentProgress
    prog.foreach { p =>
      val dropped = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
      println(s"[probe] batch=${p.batchId} input=${p.numInputRows} droppedByWm=$dropped wm=${p.eventTime.get("watermark")}")
    }
    println("[probe] sink:")
    spark.read.parquet(s"$root/win").orderBy(col("ws"), col("n"))
      .collect().foreach(r => println(s"[probe]   ws_h=${r.getLong(0) / 3600000000L} n=${r.getLong(1)}"))
    spark.stop()
  }
}
