package graft.ops

import org.apache.hadoop.fs.Path
import graft.SparkSpec

/** Staged (resumable) pipeline execution: parity with the in-session
  * cascade, resume byte-stability, crash recovery, and parameter-change
  * invalidation. */
class PipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (relative path → (len, mtime)) for every file under root. */
  private def snapshot(root: String): Map[String, (Long, Long)] = {
    val rp = new Path(root)
    val f = fs(root)
    val it = f.listFiles(rp, true)
    val buf = scala.collection.mutable.Map.empty[String, (Long, Long)]
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toString.stripPrefix(rp.toString)
      buf(rel) = (st.getLen, st.getModificationTime)
    }
    buf.toMap
  }

  private def verdicts(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Boolean)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq

  test("staged run ≡ in-session cascade, and a re-run is a byte-stable no-op") {
    val dst = "/tmp/graft_pipeline_spec/parity"
    fs(dst).delete(new Path(dst), true)
    val staged = verdicts(Pipeline.runStaged(spark, dir, dst, budget = 5000L))
    val direct = verdicts(Pipeline.q57PipelineDecision(spark, dir, budget = 5000L))
    assert(staged == direct, "staged verdicts must equal the in-session cascade's")

    // all five stages committed with markers
    (1 to 5).foreach { n =>
      assert(fs(dst).exists(new Path(dst, s"_markers/stage$n.done")), s"stage $n marker missing")
    }

    // a full re-run recomputes NOTHING: every stage file byte-stable
    val before = snapshot(dst)
    val again = verdicts(Pipeline.runStaged(spark, dir, dst, budget = 5000L))
    assert(again == direct)
    assert(snapshot(dst) == before, "no-op re-run must not touch any stage file")
  }

  test("resume recomputes only from the first incomplete stage") {
    val dst = "/tmp/graft_pipeline_spec/resume"
    fs(dst).delete(new Path(dst), true)
    val full = verdicts(Pipeline.runStaged(spark, dir, dst, budget = 5000L))

    // simulate a run killed after stage 3: stages 4-5 never committed
    fs(dst).delete(new Path(dst, "_markers/stage4.done"), false)
    fs(dst).delete(new Path(dst, "_markers/stage5.done"), false)
    fs(dst).delete(new Path(dst, "stage5_budget"), true)
    val before = snapshot(dst)

    val resumed = verdicts(Pipeline.runStaged(spark, dir, dst, budget = 5000L))
    assert(resumed == full, "resume must reproduce the original verdicts")
    val after = snapshot(dst)
    // stages 1-3 untouched (byte-for-byte), 4-5 rebuilt
    before.filter(_._1.contains("stage1_")).foreach { case (k, v) =>
      assert(after(k) == v, s"stage1 file $k was rewritten on resume")
    }
    before.filter(_._1.contains("stage2_")).foreach { case (k, v) =>
      assert(after(k) == v, s"stage2 file $k was rewritten on resume")
    }
    before.filter(_._1.contains("stage3_")).foreach { case (k, v) =>
      assert(after(k) == v, s"stage3 file $k was rewritten on resume")
    }
    assert(fs(dst).exists(new Path(dst, "_markers/stage4.done")))
    assert(fs(dst).exists(new Path(dst, "_markers/stage5.done")))
  }

  test("crash mid-write (stage dir without marker) is deleted and recomputed") {
    val dst = "/tmp/graft_pipeline_spec/crash"
    fs(dst).delete(new Path(dst), true)
    val full = verdicts(Pipeline.runStaged(spark, dir, dst, budget = 5000L))

    // crash state: stage 3's marker never landed AND its dir is partial
    // (drop one data file) — the next run must not trust the remains
    fs(dst).delete(new Path(dst, "_markers/stage3.done"), false)
    val st3 = new Path(dst, "stage3_neardup")
    val firstData = {
      val it = fs(dst).listFiles(st3, true)
      var found: Path = null
      while (it.hasNext && found == null) {
        val p = it.next().getPath
        if (p.getName.endsWith(".parquet")) found = p
      }
      found
    }
    if (firstData != null) fs(dst).delete(firstData, false)

    val recovered = verdicts(Pipeline.runStaged(spark, dir, dst, budget = 5000L))
    assert(recovered == full, "recovery from a partial stage must reproduce the verdicts")
  }

  test("changed parameters invalidate that stage and cascade forward") {
    val dst = "/tmp/graft_pipeline_spec/params"
    fs(dst).delete(new Path(dst), true)
    val b5000 = verdicts(Pipeline.runStaged(spark, dir, dst, budget = 5000L))
    val st4Before = snapshot(dst).filter(_._1.contains("stage4_"))

    // a different budget must NOT serve the stale stage-5 cut — and must
    // leave stages 1-4 untouched (only stage 5 depends on the budget)
    val b800 = verdicts(Pipeline.runStaged(spark, dir, dst, budget = 800L))
    val direct800 = verdicts(Pipeline.q57PipelineDecision(spark, dir, budget = 800L))
    assert(b800 == direct800, "re-run with new budget must match the direct cascade")
    assert(b800 != b5000, "a tighter budget must change the over_budget cut")
    val st4After = snapshot(dst).filter(_._1.contains("stage4_"))
    assert(st4After == st4Before, "stage 4 does not depend on the budget — must not rebuild")
  }
}
