package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Focused soak for the wave-7 operators only — the full Soak main is
  * ~25 min at 100×, so shape regressions in a NEW operator get
  * diagnosed here first (full output, one op at a time), then the
  * numbers land in the full run. Same corpus replication recipe as
  * [[Soak]]. */
object Wave7Soak {
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
    val ev0 = Tables.events(spark, sfDir)
    val ev = spark.range(mult).crossJoin(ev0).select(
      (col("event_id") * mult + col("id")).as("event_id"),
      col("ts"), col("user_id"), col("value"),
      col("event_type"), col("id").as("__replica"))

    val iv = ev.select(col("event_id"),
        concat(col("event_type"), lit("#"), col("__replica")).as("event_type"),
        expr("ts DIV 1000000000").as("s"))
      .withColumn("e", col("s") + lit(60L) + col("event_id") % 240L)
    timed("interval_overlap")(graft.ops.RangeJoin.intervalOverlap(
      iv.filter(expr(s"(event_id DIV $mult) % 2") === 0),
          iv.filter(expr(s"(event_id DIV $mult) % 2") === 1),
      Seq("event_type"), "s", "e", bucketWidth = 300L))

    val evSalted = ev.select(
      (col("user_id") * mult + col("__replica")).as("user_id"),
      col("ts"), col("event_id"), col("event_type"))
    timed("markov_transitions") {
      graft.ops.SkewWindows.adjacentPairs(
        evSalted, "user_id", "ts", "event_id", "event_type")
        .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 0L)
    }

    timed("exact_jaccard")(graft.ops.SetSimilarity.prefixFilterJoin(
      Dedup.shingles(docs, 3).groupBy(col("doc_id"))
        .agg(collect_set(col("g")).as("toks"))
        .select(col("doc_id"), col("toks")), 0.9))

    val nodes = docs.select(col("doc_id").as("id"))
    timed("triangle_count")(graft.ops.Graph.triangleCounts(
      nodes, graft.ops.Graph.communityLinks(nodes))
      .filter(col("n_triangles") >= 0L))

    spark.stop()
  }
}
