package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The trainer-facing end of the pipeline: materialize a training set as
  * SHARD FILES a shard-sequential data loader streams — the step that
  * turns the engine's verdicts and permutations into bytes on disk.
  *
  *  - `writeShards`: given documents and a (doc_id, shard_id,
  *    pos_in_shard) assignment (q56's epoch shuffle), write
  *    `shard_id=N/` parquet with rows IN POSITION ORDER inside each
  *    shard — the trainer reads shards sequentially and never sorts.
  *  - `materializeTrainingSet`: the full composition — q57's verdict
  *    cascade picks the documents, q56's epoch shuffle orders them,
  *    `writeShards` lays them out.
  *
  * Scale shape: one hash shuffle on shard_id co-locates each shard's
  * rows in one task (a task may own several shards; `partitionBy`
  * splits them into one file per shard), and the in-shard order comes
  * from `sortWithinPartitions` — a spillable per-task external sort of
  * that task's shards only, never a global sort. Shard size is the
  * knob: docsPerShard bounds rows per file, so file count tracks corpus
  * size and no task's sort exceeds its shards' rows. This is the same
  * write-side discipline as the ETL layout (ExportJob's partitioned
  * sink + row-group clustering), applied to training shards.
  */
object Sharding {

  /** Write `docs` (must carry doc_id) into `dst/shard_id=N/` files,
    * position-ordered within each shard. `assignment` is q56-shaped:
    * (doc_id, shard_id, pos_in_shard). */
  def writeShards(docs: DataFrame, assignment: DataFrame, dst: String): Unit = {
    docs
      .join(assignment.select(col("doc_id"), col("shard_id"), col("pos_in_shard")),
        "doc_id")
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("pos_in_shard"))
      .write.mode("overwrite")
      .option("compression", "snappy")
      .partitionBy("shard_id")
      .parquet(dst)
  }

  /** The end-to-end materialization: run the q57 decision cascade over
    * the corpus, epoch-shuffle the keepers, write them as shards.
    * Returns the verdict frame (what a run would log/audit). */
  def materializeTrainingSet(s: SparkSession, dir: String, dst: String,
                             budget: Long = 8000L, epoch: Int = 1,
                             docsPerShard: Long = 64L): DataFrame = {
    val verdicts = Pipeline.q57PipelineDecision(s, dir, budget)
      .localCheckpoint() // consumed twice (keep join + returned audit)
    // kept feeds THREE consumers (the shuffle's bucket totals action,
    // the assignment lineage inside the write, and the write's docs
    // side) — pin it, or each re-runs the documents ⋈ verdicts join
    // (the q57 lineage-re-evaluation lesson)
    val kept = Tables.documents(s, dir)
      .join(verdicts.filter(col("selected")).select("doc_id"), "doc_id")
      .localCheckpoint()
    val assignment = Selection.epochShuffle(kept.select(col("doc_id")),
      epoch, docsPerShard)
    writeShards(kept, assignment, dst)
    verdicts
  }
}
