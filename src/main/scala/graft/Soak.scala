package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Scale soak for the extension operators: replicate the fixture corpus
  * `mult`× and time the declared 100 TB paths. Small-SF oracles prove
  * CORRECTNESS; this proves the SHAPE — work must grow ~linearly in the
  * corpus, not quadratically, and nothing may broadcast O(corpus) state.
  *
  * Documents are re-keyed and token-salted per replica (every whitespace
  * gap gains a replica-unique token), so no shingle matches across
  * replicas and true pair structure scales ×mult — a quadratic blowup in
  * an operator then shows as wall-time, not output rows. Embeddings are
  * re-keyed exact replicas: near-dup buckets get mult× denser, the
  * stress the banded join must absorb.
  *
  * Run: `sbt "runMain graft.Soak /root/testdata/sf0.1 20"`.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = if (args.length > 1) args(1).toInt else 20
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(df: => DataFrame): (String, Double, Long) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = df.count()
      (label, (System.nanoTime() - t0) / 1e9, rows)
    }

    val docs0 = Tables.documents(spark, sfDir)
    val nDocs = docs0.count()
    val docs = spark.range(mult).crossJoin(docs0).select(
      (col("doc_id") * mult + col("id")).as("doc_id"),
      col("lang"),
      regexp_replace(col("text"), lit("\\s+"),
        concat(lit(" z"), col("id"), lit(" "))).as("text"))

    val emb0 = Tables.embeddings(spark, sfDir)
    val nEmb = emb0.count()
    val emb = spark.range(mult).crossJoin(emb0)
      .select((col("vec_id") * mult + col("id")).as("vec_id"), col("embedding"))

    // candidate volume: the LSH diagnostic — how many same-bucket pairs
    // the banded join generates before any similarity filter, and how
    // big the hottest bucket is (its pair count is quadratic and lands
    // in one task unless the join is chunk-split)
    val sigs = emb.withColumn("sig",
      Similarity.lshSignature(col("embedding"), 64, 4))
    val bucketStats = sigs.groupBy(col("sig")).count()
      .agg(max(col("count")).as("hottest"),
        sum(col("count") * (col("count") - 1) / 2).as("candidates"))
      .collect()(0)

    val results = Seq(
      timed("shingles")(Dedup.shingles(docs, 3)),
      timed("jaccard_capped")(Dedup.jaccardPairs(docs, 3, 0.5, maxDocFreq = 50L)),
      timed("minhash_lsh")(Dedup.minhashLshPairs(docs)),
      timed("neardup_lsh")(Similarity.nearDupPairs(emb, 0.45)))

    val body = results.map { case (l, s, r) =>
      f""""$l":{"sec":$s%.2f,"rows":$r}"""
    }.mkString(",")
    println(s"""{"mult":$mult,"docs":${nDocs * mult},"embeddings":${nEmb * mult},""" +
      s""""lsh_hottest_bucket":${bucketStats.getLong(0)},""" +
      s""""lsh_candidates":${bucketStats.getAs[Any](1)},$body}""")
    spark.stop()
  }
}
