package graft

/** Per-run root for every sidecar the engine persists for oracle replay
  * (centroid tables, posting-index stores, streamed-store roots, BPE
  * merges, …). Previously these were fixed world-readable `/tmp` names,
  * which meant (a) two concurrent runs of the same query retrained each
  * other's sidecars mid-read and (b) a stale or foreign parquet left at
  * the path silently poisoned the oracle replay. Now each JVM run gets
  * its own unique owner-only directory (`Files.createTempDirectory`,
  * mode 700), so the oracle SQL dumped by [[Verify]] — which
  * interpolates these paths at dump time, in the same JVM that wrote
  * the sidecars — always reads exactly the files its own run produced.
  *
  * `GRAFT_SIDECAR_DIR` overrides the root for callers that need the
  * sidecars at a known location (e.g. replaying a dumped oracle_sql.json
  * against a previous run's sidecars). */
object Sidecars {

  /** When set, the shutdown hook leaves this run's root on disk.
    * [[graft.Verify]] sets it: the oracle SQL it dumps interpolates
    * this run's sidecar paths, and the DuckDB compare reads them AFTER
    * the JVM exits — reaping at exit would break the whole
    * persisted-model-is-data oracle family (r14 lesson: q249's first
    * gate run failed exactly this way). Everything else (bench, soak,
    * tests) reaps. */
  @volatile private var keepOnExitFlag = false
  def keepOnExit(): Unit = keepOnExitFlag = true

  lazy val root: String = sys.env.get("GRAFT_SIDECAR_DIR") match {
    case Some(d) =>
      val p = java.nio.file.Paths.get(d)
      java.nio.file.Files.createDirectories(p)
      p.toAbsolutePath.toString
    case None =>
      val p = java.nio.file.Files.createTempDirectory("graft_run_")
      // Owner-only per-run roots accumulate across test/soak/profile
      // runs with nothing to reap them (the old fixed paths at least
      // self-overwrote) — delete the whole root at JVM exit. Only for
      // roots THIS run created: a GRAFT_SIDECAR_DIR caller asked for
      // the sidecars at a durable location and keeps them.
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        if (!keepOnExitFlag) deleteRecursively(p)))
      p.toAbsolutePath.toString
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file._
    try {
      if (Files.exists(p)) {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(q => try Files.deleteIfExists(q) catch { case _: Exception => () })
      }
    } catch { case _: Exception => () } // best-effort: never fail an exiting JVM
  }

  /** Absolute path for a named sidecar under this run's root. */
  def path(name: String): String = s"$root/$name"
}
