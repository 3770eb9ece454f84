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

  /** Run independent Spark ACTIONS concurrently from one session — the
    * lifecycle-store pattern: an index build/append/purge issues 3–6
    * small write jobs whose wall time is mostly driver-side planning +
    * commit latency, not executor CPU; issued sequentially they pay
    * that latency N times, issued concurrently the scheduler overlaps
    * it (r14 profile: q100's sync stages were 60% of the gate and
    * almost entirely this). Callers MUST pass tasks that are mutually
    * independent AND read only PINNED inputs (localCheckpoint) or
    * inputs whose recomputation is acceptably cheap — two concurrent
    * actions over an unpinned shared lineage compute it once EACH
    * (never wrong, just duplicated work; StreamingGates.stageSlices'
    * unpinned slice filters are the sanctioned example: each slice was
    * already evaluated independently when the writes were serial).
    * Any read-after-write ordering must stay sequential (e.g. purge
    * corrections after store rewrites). Threads, not a shared pool:
    * tasks block on Spark jobs, so pool starvation ≡ deadlock; the
    * thread count is the call's task count (≤ 6). */
  def inParallel(tasks: (() => Unit)*): Unit = {
    if (tasks.size <= 1) { tasks.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futs = tasks.map(t => pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = t()
      }))
      var firstErr: Throwable = null
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstErr == null) firstErr = e.getCause
        }
      }
      if (firstErr != null) throw firstErr
    } finally pool.shutdown()
  }
}
