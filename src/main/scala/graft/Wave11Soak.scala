package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Focused 100× soak for the wave-10/11 operators (the Wave7Soak
  * recipe: salted doc replicas, unsalted user timelines, repartition
  * charged outside the timed window).
  *
  * What each op must prove at 100×:
  *  - pmi: the in-row capped pair explode (≤ 48·47/2 rows/doc) feeds a
  *    map-side-combined aggregate — time tracks corpus tokens, and the
  *    pair-count aggregate's output stays near the sf0.1 vocabulary
  *    (replica salt tokens sort after the cap window).
  *  - horizon_dedup: the (band, time-bucket) key bounds join fan-out —
  *    replicas salt shingles, so true pair structure scales ×mult and
  *    a quadratic would show as wall-time.
  *  - containment: q25's capped index scored both ways — the delta
  *    over jaccard_capped in Soak.scala is the both-directions cost.
  *  - kmv_sketch / kmv_overlap: one linear pass to |keys| sketch rows;
  *    the pair stage reads ONLY the sketch frame (corpus-independent).
  *  - trailing_distinct / growth_accounting: inputs collapse to the
  *    calendar-bounded distinct (user, hour/day) grain first — time
  *    must track RAW event volume only through that first aggregate.
  */
object Wave11Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = if (args.length > 1) args(1).toInt else 100
    val only = if (args.length > 2) Some(args(2)) else None
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(df: => DataFrame): Unit =
      if (only.forall(_ == label)) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val rows = df.count()
        println(f"""{"op":"$label","sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$rows}""")
      }

    val docs0 = Tables.documents(spark, sfDir)
    val docs = spark.range(mult).crossJoin(docs0).select(
      (col("doc_id") * mult + col("id")).as("doc_id"),
      col("lang"), col("source"),
      regexp_replace(col("text"), lit("\\s+"),
        concat(lit(" z"), col("id"), lit(" "))).as("text"))
      .repartition(128).localCheckpoint()

    val ev0 = Tables.events(spark, sfDir)
    val ev = spark.range(mult).crossJoin(ev0).select(
      (col("event_id") * mult + col("id")).as("event_id"),
      (col("ts") + col("id")).as("ts"),
      col("user_id"), col("value"))

    timed("pmi")(graft.ops.Collocations.pmiPairs(
      docs, "text", "doc_id", 48, 5L))
    timed("horizon_dedup")(graft.ops.Dedup.horizonNearDupPairs(
      docs, horizonDays = 7L))
    timed("containment")(graft.ops.Dedup.containmentPairs(
      docs, threshold = 0.6))
    val toks = docs.select(col("source"),
      explode(graft.ops.TextAnalysis.tokens(col("text"))).as("t"))
    timed("kmv_sketch")(graft.ops.KmvSketch.sketch(toks, "source", "t", 128))
    timed("kmv_overlap")(graft.ops.KmvSketch.overlapMatrix(
      graft.ops.KmvSketch.sketch(toks, "source", "t", 128), 128))
    timed("kappa")(graft.ops.Labeling.annotatorKappa(docs))
    timed("trailing_distinct")(graft.ops.KmvSketch.trailingDistinct(
      ev, windowHours = 24, k = 128))
    timed("growth_accounting")(graft.ops.TimeSeries.growthAccounting(ev))
    timed("ab_test")(graft.ops.Experiment.abTest(ev
      .withColumn("event_type",
        element_at(array(lit("a"), lit("b"), lit("c"), lit("d"), lit("e")),
          (pmod(col("event_id"), lit(5L)) + 1L).cast("int")))))
    // the sketch-store cycle: 3 appends + weekly serve at 100× raw volume
    if (only.forall(_ == "sketch_store")) {
      val dst = java.nio.file.Files.createTempDirectory("graft-soak-kmv")
        .toFile.getAbsolutePath + "/store"
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val h = expr("ts DIV 3600000000000")
      val minH = ev.agg(min(h)).head().getLong(0)
      graft.ops.KmvSketch.appendDailySketches(
        ev.filter(h < minH + 243L), dst, 128)
      graft.ops.KmvSketch.appendDailySketches(
        ev.filter(h >= minH + 243L && h < minH + 486L), dst, 128)
      graft.ops.KmvSketch.appendDailySketches(
        ev.filter(h >= minH + 486L), dst, 128)
      val rows = graft.ops.KmvSketch.serveRangeDistinct(spark, dst, 128,
        expr("CAST(day AS BIGINT) DIV 7")).count()
      println(f"""{"op":"sketch_store","sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$rows}""")
    }

    spark.stop()
  }
}
