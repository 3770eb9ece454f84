package graft.tools

import java.io.{File, PrintWriter}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Dump `.explain("formatted")` for named declared queries to
  * `plans/<round>/<query>_<suffix>.txt` — the before/after plan evidence
  * the optimization rounds commit. Not part of the driver contract.
  *
  * Usage:
  *   sbt "runMain graft.tools.PlanDump q26,q71 /root/testdata/sf0.1 plans/r14 before"
  *
  * Queries whose DECLARED form materializes driver-side (bounded
  * collect-and-reparallelize, e.g. q71) or returns a frame read back
  * from a store they just wrote (the lifecycle gates) would dump a
  * LocalTableScan/parquet-scan plan that hides the real dataflow; for
  * those the LAZY core is dumped instead (the same frame PlanSpec
  * audits), marked by a header line in the file. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 2) args(2) else "plans/r14"
    val suffix = if (args.length > 3) args(3) else "after"
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    new File(outDir).mkdirs()

    // Lazy cores for declared queries whose returned frame hides the
    // dataflow behind a bounded collect (see scaladoc).
    def lazyCore(name: String): Option[(String, DataFrame)] = {
      if (name.startsWith("q71")) {
        val docs = graft.Tables.documents(spark, dir)
        val (out, _) = graft.ops.Retrieval.hardNegativesLazy(
          docs, col("doc_id") % 100 === 0, 10, 0L)
        Some(("lazy core: Retrieval.hardNegativesLazy (the declared q71 " +
          "collects this bounded frame and re-parallelizes it)", out))
      } else None
    }

    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    names.foreach { prefix =>
      qs.filter(_._1.startsWith(prefix)).foreach { case (name, fn) =>
        val (header, df) = lazyCore(name)
          .getOrElse(("declared query frame", fn(spark, dir)))
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        val f = new File(outDir, s"${name}_$suffix.txt")
        val w = new PrintWriter(f, "UTF-8")
        try { w.println(s"# $name [$header] sf=$dir"); w.println(txt) }
        finally w.close()
        println(s"[plandump] wrote ${f.getPath} (${txt.length} chars)")
      }
    }
    spark.stop()
  }
}
