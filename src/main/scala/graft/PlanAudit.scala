package graft

/** One-shot physical-plan audit over a query-name prefix list: prints
  * each query's executedPlan and flags the scale smells the build
  * discipline bans (nested-loop/cartesian joins, single-partition
  * corpus windows). Diagnostic main, not part of the driver contract.
  * Run: `sbt "runMain graft.PlanAudit q111,q112" [sfDir]`.
  *
  * Flags are LEADS, not verdicts — the benign idioms trip them too
  * (wave-7/8 audit, all adjudicated benign): a `crossJoin(broadcast(…))`
  * attaching a 1-ROW aggregate plans as BroadcastNestedLoopJoin +
  * SinglePartition (q112's bloom, q117's dmin, q121's extrema — the
  * repo's standing scalar-attach idiom); `Window [` also matches keyed
  * windows (q115 per-user) and tiny aggregated-input windows (q121's
  * ≤1024 bucket-prefix rows, documented). The real kills are a BNLJ
  * between two CORPUS-scale sides or an empty-partition window over
  * raw rows — confirm against the source before acting. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val prefixes = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q11", "q12"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val smells = Seq(
          "BroadcastNestedLoopJoin", "CartesianProduct",
          // a corpus-ordered window with an empty partition spec
          "Window [", "SinglePartition")
          .filter(plan.contains)
        println(s"=== $name smells=${smells.mkString("|")}")
        if (sys.env.get("PLAN_AUDIT_FULL").contains("1")) println(plan)
      }
    spark.stop()
  }
}
