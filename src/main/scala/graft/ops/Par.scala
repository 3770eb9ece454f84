package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.internal.SQLConf

/** Parallelism widening for small scans, shared by the dedup/similarity
  * operators: their pipelines are fully narrow, so a single-split corpus
  * (one small parquet file — the shape of every local fixture) would run
  * all per-row signature/shingle work on one core. Widening repartitions
  * such inputs to the cluster's parallelism; at 100 TB a scan arrives in
  * thousands of splits and this is a no-op.
  */
private[graft] object Par {

  /** Repartition `df` to `defaultParallelism` iff its scan resolves to
    * fewer splits than that.
    *
    * The split count is ESTIMATED from the analyzed/optimized logical
    * plan — file count and the optimizer's size estimate over
    * `spark.sql.files.maxPartitionBytes` — NOT from `df.rdd
    * .getNumPartitions`, which forces a full physical-planning pass (and
    * RDD DAG construction) per call: a fixed planning tax on every query
    * routed through here, paid before the real plan is even built. The
    * estimate errs toward widening (an unsplit large file repartitions
    * once, harmlessly); it can only under-widen if a scan's files are
    * both fewer than the parallelism and individually split-schedulable,
    * in which case the scan was already parallel enough to not matter. */
  def widen(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val files = df.inputFiles.length
    if (files >= p) df
    else {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val perSplit = math.max(1L, SQLConf.get.filesMaxPartitionBytes)
      if (bytes >= BigInt(perSplit) * p) df else df.repartition(p)
    }
  }
}
