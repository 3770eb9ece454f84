package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Focused 100× soak for the wave-8 operators (the Wave7Soak recipe):
  * the bounded-lookback EWMA on plain vs halo-routed paths (same rows,
  * so the routing overhead is read directly), the in-row hashed
  * featurization over ~74M tokens, the preference-pair mining and the
  * embedding standardization at 100× vectors. */
object Wave8Soak {
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

    // repartition after replication: the single-file sf corpus scans as
    // ONE partition, and a NARROW op inherits that — one task would do
    // all the work (measured: the first soak run pinned one core for
    // 26+ min in hashed_inrow). A real 100 TB corpus is thousands of
    // files; 128 partitions mirrors that, and the shuffle is charged
    // once here, outside every timed window
    val docs0 = Tables.documents(spark, sfDir)
    val docs = spark.range(mult).crossJoin(docs0).select(
      (col("doc_id") * mult + col("id")).as("doc_id"),
      col("lang"), col("source"),
      regexp_replace(col("text"), lit("\\s+"),
        concat(lit(" z"), col("id"), lit(" "))).as("text"))
      .repartition(128).localCheckpoint()

    // events replicated WITHOUT salting user_id: every user's timeline
    // grows 100× (top users ≈ mult × their sf0.1 volume), so a low
    // hotAt exercises the halo routing on genuinely hot keys while the
    // plain run funnels those same keys through single-task windows
    val ev0 = Tables.events(spark, sfDir)
    val ev = spark.range(mult).crossJoin(ev0).select(
      (col("event_id") * mult + col("id")).as("event_id"),
      (col("ts") + col("id")).as("ts"), // keep (ts, tie) unique-ish per replica
      col("user_id"), col("value"))

    timed("ewma_plain")(graft.ops.SkewWindows.trailingEwma(
      ev, "user_id", "ts", "event_id", "value",
      alpha = 0.5, lookback = 8, hotAt = Long.MaxValue))
    timed("ewma_routed")(graft.ops.SkewWindows.trailingEwma(
      ev, "user_id", "ts", "event_id", "value",
      alpha = 0.5, lookback = 8, hotAt = 20000L))

    val toked = docs.withColumn("__toks",
      graft.ops.TextAnalysis.tokens(col("text")))
    timed("hashed_explode")(graft.ops.FeatureHash.hashedCounts(
      toked, "doc_id", "__toks", dims = 64))
    timed("hashed_inrow")(graft.ops.FeatureHash.hashedCountsInRow(
      toked, "doc_id", "__toks", dims = 64))

    timed("preference_pairs")(graft.ops.Labeling.preferencePairs(docs))

    val emb0 = Tables.embeddings(spark, sfDir)
    val emb = spark.range(mult).crossJoin(emb0).select(
      (col("vec_id") * mult + col("id")).as("vec_id"), col("embedding"))
      .repartition(128).localCheckpoint() // same single-file-scan fix
    timed("embedding_standardize")(graft.ops.Standardize.outlierSummary(
      emb, "embedding", "vec_id"))

    spark.stop()
  }
}
