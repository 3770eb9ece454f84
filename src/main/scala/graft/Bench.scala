package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Median of timed runs: robust to one-off JIT/GC/sandbox spikes, unlike
    * min (over-optimistic) or mean (one 9x ghost skews the total). r1 vs r2
    * ran identical code and differed 30% under best-of-2 — the harness, not
    * the engine. */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One untimed warmup pass (codegen compile, classloading, page-cache
    // warm), then N timed PASSES — each pass sweeps every query once, and
    // a query's time is its median across passes. Interleaving matters:
    // timing one query's N runs back-to-back lets a single multi-second
    // host-contention spike poison all of them (and the median with it);
    // spread across passes, the spike lands in one pass and the median
    // discards it.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "4").toInt
    // Sorted by name: Map iteration order reshuffles whenever a query is
    // added, which silently re-attributes shared costs across rounds.
    // SPARK_GRAFT_BENCH_ONLY=q25,q26 restricts to a comma-separated subset
    // (prefix match) — the iteration loop while tuning one query's plan.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => return println(
        s"""{"metric":"total","value":-1,"unit":"sec","error":"$name failed"}""") }
    }
    val times = Array.fill(queries.size)(Vector.newBuilder[Double])
    (1 to runs).foreach { _ =>
      queries.zipWithIndex.foreach { case ((_, fn), i) =>
        // clear BETWEEN queries, not just between passes: CacheManager
        // matches cached plans across queries (q25/q26 share a cached
        // shingle front end), so whichever ran first paid the
        // materialization and the per-query attribution lied. Each query
        // now pays its own full cost. (It also stops caches accruing for
        // the whole bench — each invocation builds fresh DataFrames, so
        // the previous query's entries are already unreachable.)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        times(i) += (System.nanoTime() - t0) / 1e9
      }
    }
    val results = queries.zipWithIndex.map { case ((name, _), i) =>
      name -> median(times(i).result())
    }
    // The driver captures only the LAST 2000 chars of output
    // (BENCH_r07.json's tail field). At 64 queries trimming precision
    // kept ONE line inside the window; at 174+ queries no all-query
    // line can fit, and BENCH_r10 came back `parsed: null` (the line's
    // FRONT — metric/value — fell outside the tail). Self-sufficiency
    // now has three layers:
    //   1. the full all-query line is written to tools/bench_latest
    //      _full.json (overwritten per run — a file read whole can't
    //      be tail-truncated);
    //   2. the full line is still printed, for humans and for runs
    //      small enough to fit;
    //   3. the LAST stdout line is a compact JSON guaranteed < ~1500
    //      chars: the total, query count, the slowest queries that fit
    //      a 1200-char map, and the pointer to the full file — so a
    //      bounded tail capture ALWAYS contains a parseable metric
    //      line whatever the query count grows to.
    // Printing after a silenced spark.stop() keeps everything but
    // sbt's one [success] line out of the tail window.
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def item(k: String, v: Double) = "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v)
    val qs = results.map { case (k, v) => item(k, v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "tools/bench_latest_full.json")
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter(fullPath, "UTF-8")
      try w.println(fullLine) finally w.close()
    } catch { case _: java.io.IOException => () } // read-only cwd: stdout still has it
    // slowest-first so the compact map carries the queries that matter
    // for plan-audit triage; the full per-query map is in the file
    val compactQs = {
      val sb = new StringBuilder
      results.sortBy(-_._2).foreach { case (k, v) =>
        val it = item(k, v)
        if (sb.length + it.length < 1200) {
          if (sb.nonEmpty) sb.append(','); sb.append(it)
        }
      }
      sb.insert(0, '{').append('}').toString
    }
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(fullLine)
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"queries":$compactQs,"full":"$fullPath","sf":"$sfDir"}""")
  }
}
