package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A STANDING IVF vector index maintained from a stream — the vector
  * half of the q89/q96/q100 posting-store story: embeddings arrive in
  * micro-batches, each batch is assigned to its nearest coarse
  * centroid (the IVF cell) and appended into a store PARTITIONED BY
  * CELL, so an ANN probe later reads only its probed cells' directories
  * (the `writeCellBucketed` pruning argument from q36/q64). Ingest is
  * O(batch) — one narrow assignment pass, no shuffle of the standing
  * data, no index rebuild.
  *
  * The gate (q162) proves the maintenance path end to end: centroids
  * are trained once and PERSISTED (the q81 centroids-are-data pattern),
  * the embeddings table is staged as three disjoint micro-batches
  * through real Structured Streaming (`foreachBatch` append), and the
  * serve is a plain read-back of the streamed store — which the DuckDB
  * oracle must match by replaying the integer assignment from the
  * persisted centroid table over the raw embeddings. Equality proves
  * stream-ingested cells ≡ direct assignment, row for row.
  *
  * Replay rule: assignment rows are per-vector facts, so re-processing
  * a batch DUPLICATES rows (not idempotent — the counting-store rule,
  * not the KMV rule); production runs pass a checkpoint, the gate
  * stages each file exactly once under `Trigger.AvailableNow()`.
  *
  * Determinism: integer squared L2 on the fixed-point grid
  * ([[Clustering.Grid]]), argmin ties to the smaller cell id, NULL or
  * empty embeddings land in cell 0 at distance 0 — all inherited from
  * [[Clustering.assign]], which both the batch and streamed path call.
  */
object VectorStore {

  /** Where q162 persists its coarse centroids (fixed-point ints). */
  val StreamCentroidsPath = "/tmp/graft_ivf_stream_centroids.parquet"

  /** The streamed store root (cell-partitioned parquet under /store). */
  val StreamStoreRoot = "/tmp/graft_ivf_stream"

  /** One micro-batch into the store: assign against the broadcast
    * centroid array, append partitioned by cell. O(batch). */
  def appendAssignments(batch: DataFrame, centroids: Array[Array[Long]],
                        dst: String): Unit =
    Clustering.assign(batch, centroids)
      .write.mode("append").partitionBy("cluster").parquet(dst)

  /** q162: train + persist the coarse quantizer, ingest the embeddings
    * table as three disjoint micro-batches through Structured
    * Streaming, then serve the full assignment FROM THE STORE. */
  def q162StreamedIvfStore(s: SparkSession, dir: String,
                           k: Int = 8): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val centroids = Clustering.trainCentroids(emb, k)
    Clustering.persistCentroids(s, centroids, StreamCentroidsPath)

    val root = new org.apache.hadoop.fs.Path(StreamStoreRoot)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    val watched = s"$StreamStoreRoot/in"
    fs.mkdirs(new org.apache.hadoop.fs.Path(watched))
    (0 until 3).foreach { i =>
      val tmpd = s"$StreamStoreRoot/stage_$i"
      emb.filter(pmod(col("vec_id"), lit(3)) === i).coalesce(1)
        .write.parquet(tmpd)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmpd))
        .map(_.getPath).find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part written under $tmpd"))
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$watched/b$i.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(tmpd), true)
    }
    val stream = s.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(watched)
    val store = s"$StreamStoreRoot/store"
    graft.streaming.Streaming.ivfAssignStream(stream, store, centroids)
      .awaitTermination()
    serveAssignments(s, store)
  }

  /** Read the standing store back — the serve path an ANN probe would
    * cell-prune; the gate reads every cell so the oracle can replay the
    * whole assignment. */
  def serveAssignments(s: SparkSession, store: String): DataFrame =
    s.read.parquet(store)
      .select(col("vec_id"), col("cluster").cast("int").as("cluster"),
        col("sq_dist"))
      .orderBy(col("vec_id"))
}
