package graft.tools

import graft.{GraftSession, SparkEntry}

/** Per-query scheduling/GC attribution for the optimization rounds:
  * runs each named declared query once (after one untimed warmup of the
  * first name, for classloading/codegen) and prints wall seconds plus
  * job/stage/task counts and summed task executorRunTime / jvmGcTime —
  * the numbers that separate "paying per-job scheduling overhead" from
  * "paying executor compute" (guide §1/§7).
  *
  * Run: `sbt "runMain graft.tools.ProfileQueries /root/testdata/sf0.1 q163,q167"`
  * (cores from SPARK_GRAFT_CPUS, the Bench contract). */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1)
      args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    else Seq("q163", "q167")
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val cpuMs = new java.util.concurrent.atomic.AtomicLong
    // SPARK_GRAFT_PROFILE_STAGES=N prints the N heaviest stages per
    // query (by summed task run time) with their call sites — the
    // inside-the-operator attribution the whole-query numbers can't give
    val topStages = sys.env.getOrElse("SPARK_GRAFT_PROFILE_STAGES", "0").toInt
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(st.stageInfo.numTasks)
        val m = st.stageInfo.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          cpuMs.addAndGet(m.executorCpuTime / 1000000L)
          if (topStages > 0)
            stageRows.add((m.executorRunTime, st.stageInfo.numTasks,
              st.stageInfo.name.take(180)))
        }
      }
    })

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.exists(n.startsWith) }
    require(qs.nonEmpty, s"no queries match $names")

    // warmup: first query once, untimed (codegen/classloader)
    qs.head._2(spark, dir).count()

    // SPARK_GRAFT_PROFILE_EXPLAIN=1 additionally prints the EXECUTED
    // (post-AQE) plan of the count action — the only way to see final
    // AQEShuffleRead coalescing, which pre-execution explain() hides
    // behind isFinalPlan=false. Captured via a QueryExecutionListener
    // because the count builds its own QueryExecution over the frame.
    val explainAfter = sys.env.get("SPARK_GRAFT_PROFILE_EXPLAIN").contains("1")
    val lastPlan = new java.util.concurrent.atomic.AtomicReference[String]("")
    if (explainAfter)
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit =
          lastPlan.set(qe.executedPlan.toString)
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      })

    qs.foreach { case (name, fn) =>
      spark.catalog.clearCache()
      stageRows.clear()
      val (j0, s0, k0, r0, g0, c0) =
        (jobs.get, stages.get, tasks.get, runMs.get, gcMs.get, cpuMs.get)
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      if (explainAfter) {
        Thread.sleep(500) // listener delivery is async
        println(s"========== $name executed plan ==========")
        println(lastPlan.get.take(40000))
      }
      if (topStages > 0) {
        Thread.sleep(500)
        import scala.jdk.CollectionConverters._
        stageRows.asScala.toSeq.sortBy(-_._1).take(topStages).foreach {
          case (ms, n, nm) =>
            println(f"    stage ${ms / 1000.0}%8.1f s tasks=$n%5d  $nm")
        }
      }
      Thread.sleep(500) // listener bus drain
      println(f"$name%-30s wall=$wall%7.2f s  jobs=${jobs.get - j0}%4d " +
        f"stages=${stages.get - s0}%4d tasks=${tasks.get - k0}%6d  " +
        f"taskRun=${(runMs.get - r0) / 1000.0}%8.1f s " +
        f"taskCpu=${(cpuMs.get - c0) / 1000.0}%8.1f s " +
        f"gc=${(gcMs.get - g0) / 1000.0}%6.1f s")
    }
    spark.stop()
  }
}
