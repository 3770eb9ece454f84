package graft

import org.apache.spark.sql.functions._
import graft.ops.{Boilerplate, Par, TextAnalysis}

/** Temporary profiling main — not part of the contract; deleted after use. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    val mult = 10
    val docs0 = Tables.documents(spark, "/root/testdata/sf0.1")
    val docs = spark.range(mult).crossJoin(docs0).select(
      (col("doc_id") * mult + col("id")).as("doc_id"),
      col("lang"), col("source"),
      regexp_replace(col("text"), lit("\\s+"),
        concat(lit(" z"), col("id"), lit(" "))).as("text"))

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val n = 3
    val toks = Par.widen(docs)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("l"))
    def gramArr(l: org.apache.spark.sql.Column) =
      transform(
        when(size(l) >= n, sequence(lit(1), size(l) - (n - 1)))
          .otherwise(array().cast("array<int>")),
        i => array_join(slice(l, i, lit(n)), " "))

    val nDocs = toks.agg(count(lit(1)).as("n_docs"))
    val freq = toks
      .select(explode(array_distinct(gramArr(col("l")))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * 100 >= lit(1L) * col("n_docs"))
      .select(col("g"))
    t("freq")(freq.count())
    val grams = toks
      .select(col("doc_id"), posexplode(gramArr(col("l"))))
      .select(col("doc_id"), (col("pos") + 1).as("i"), col("col").as("g"))
    val starts = grams.join(broadcast(freq), "g")
      .groupBy(col("doc_id"))
      .agg(sort_array(array_distinct(collect_list(col("i")))).as("starts"))
    t("starts")(starts.count())
    val covered = array_sort(array_distinct(flatten(
      transform(col("starts"), st => sequence(st, st + (n - 1))))))
    val joined = toks.join(starts, Seq("doc_id"), "left")
      .withColumn("starts", coalesce(col("starts"), array().cast("array<int>")))
      .withColumn("cov", covered)
    t("join_cov")(joined.filter(size(col("cov")) >= 0).count())
    val kept = joined.withColumn("kept",
      filter(col("l"), (x, j) => !array_contains(col("cov"), j + 1)))
    t("kept")(kept.filter(size(col("kept")) >= 0).count())
    t("full")(Boilerplate.removeFrequentGrams(docs, 3, 1)
      .filter(length(col("clean_md5")) === 32).count())
    spark.stop()
  }
}
