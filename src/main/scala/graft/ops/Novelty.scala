package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Per-document NOVELTY — the curation metric dual to boilerplate
  * removal: the fraction of a document's distinct word-3-grams that
  * appear in NO other document (corpus df = 1). High-novelty documents
  * carry information nothing else in the corpus has (keep, upweight);
  * near-zero novelty marks template/mirror content the dedup tier may
  * have missed. Served FROM THE STANDING GRAM-DF STORE (the
  * q158/q159 `Boilerplate` store — one more consumer of the same
  * incremental sidecar, not a second df pipeline): maintenance stays
  * O(batch), and because df partials over disjoint batches sum
  * exactly, the served df equals a from-scratch scan's — the oracle
  * proves it by replaying df from raw text and matching the hash.
  *
  * Shape at 100 TB: doc-gram rows join the aggregated df table on the
  * gram — one corpus-scale shuffle join against an aggregated build
  * (one row per gram, so no build-side hot key; AQE splits probe-side
  * skew), then a map-side-combinable per-doc count. No windows, no
  * driver state.
  */
object Novelty {

  /** q166's own store root (same layout as [[Boilerplate.GramDfStorePath]]). */
  val StorePath = graft.Sidecars.path("graft_novelty_gramdf")

  /** q166: build the gram-df store in three appends (the q158
    * maintenance path), then serve every document's novelty from it. */
  def q166DocNovelty(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val p = new org.apache.hadoop.fs.Path(StorePath)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    (0 until 3).foreach { i =>
      Boilerplate.appendGramDf(docs.filter(pmod(col("doc_id"), lit(3)) === i),
        StorePath, 3)
    }
    noveltyFromStore(s, docs, StorePath)
  }

  /** Serve per-doc novelty from a gram-df store: distinct doc grams
    * join the summed df table; novelty = df-1 grams / distinct grams.
    * Gramless docs emit zeros (the q51 convention). */
  def noveltyFromStore(s: SparkSession, docs: DataFrame,
                       store: String): DataFrame = {
    val dfTab = s.read.parquet(s"$store/df")
      .groupBy(col("g")).agg(sum(col("df")).as("df"))
    val sh = Par.widen(docs)
      .select(col("doc_id"), explode(array_distinct(
        Boilerplate.gramArrCol(TextAnalysis.tokens(col("text")), 3))).as("g"))
    val per = sh.join(dfTab, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_grams").cast("double"), 12))
    docs.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        coalesce(col("novelty"), lit(0.0)).as("novelty"))
      .orderBy(col("doc_id"))
  }
}
