package graft
import graft.ops.AnnTuner

/** ANN knob tuner main: prints the sample-estimated recall/IO grid for
  * the LSH and IVF schemes over the given sf dir plus the knobs the
  * tuner picks for a target recall — regenerates the COVERAGE.md design
  * grid from the tuner itself instead of a hand-run scratch sim.
  *
  * Usage: runMain graft.AnnTune [sfDir] [targetRecall]
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val target = if (args.length > 1) args(1).toDouble else 0.7
    val spark = GraftSession.create("local[8]")
    spark.sparkContext.setLogLevel("WARN")
    val sample = AnnTuner.sampleUnit(Tables.embeddings(spark, dir))
    println(s"sample=${sample.length} dir=$dir targetRecall=$target")
    println("| scheme | config | est recall | est corpus fraction probed |")
    println("|---|---|---|---|")
    AnnTuner.lshGrid(sample).foreach { g =>
      println(f"| hyperplane sig | planes=${g.planes} radius=${g.radius} | ${g.estRecall}%.2f | ${g.estIoFrac}%.2f |")
    }
    AnnTuner.ivfGrid(sample).foreach { g =>
      println(f"| IVF spherical k-means | nlist=${g.nlist} nprobe=${g.nprobe} | ${g.estRecall}%.2f | ${g.estIoFrac}%.2f |")
    }
    println("chosen LSH: " + AnnTuner.tuneLsh(sample, target))
    println("chosen IVF: " + AnnTuner.tuneIvf(sample, target))
    spark.stop()
  }
}
