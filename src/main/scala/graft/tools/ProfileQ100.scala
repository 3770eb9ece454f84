package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for q100 (round-13: the r12 verdict flagged
  * q100 as the single most expensive gate, "worth a q169-style
  * stage-timing cut"; round-14 re-attribution: run the WHOLE stage
  * sequence twice in one JVM — iteration 2 is the warm number the
  * bench's median sees, iteration 1 is classload/codegen noise).
  * Not part of the driver contract; run with
  * `sbt "runMain graft.tools.ProfileQ100 /root/testdata/sf0.1"`. */
object ProfileQ100 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](it: Int, label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] it$it $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.ops.Retrieval
    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    docs.count() // warm classload/codegen

    (1 to 2).foreach { it =>
      val root = new org.apache.hadoop.fs.Path(graft.Sidecars.path(s"graft_profile_q100_$it"))
      root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
      val dst = graft.Sidecars.path(s"graft_profile_q100_$it/idx")

      time(it, "writePostingsBucketed") {
        Retrieval.writePostingsBucketed(docs, dst, nBuckets = 16)
      }
      val shift = time(it, "shift agg") {
        docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      }
      val v2 = docs.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 1,
            concat(col("text"), lit(" spark spark window"))).otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") % 7 === 2)
          .select((col("doc_id") + shift).as("doc_id"),
            concat(col("text"), lit(" merge vector")).as("text")))
      // syncPostings replicated inline for the sub-stage split
      locally {
        import graft.ops.SnapshotDiff
        val d = time(it, "  sync: SnapshotDiff.diff") {
          val x = SnapshotDiff.diff(docs, v2)
            .filter(col("status") =!= "unchanged")
            .select(col("doc_id"), col("status"))
            .localCheckpoint()
          x.count(); x
        }
        val changed = d.filter(col("status") === "changed").select("doc_id")
        val removed = d.filter(col("status") === "removed").select("doc_id")
        val toAddIds = d.filter(col("status") =!= "removed").select("doc_id")
        time(it, "  sync: tombstone changed") { Retrieval.tombstonePostings(changed, dst) }
        time(it, "  sync: purge") { Retrieval.purgePostingTombstones(spark, dst) }
        time(it, "  sync: tombstone removed") { Retrieval.tombstonePostings(removed, dst) }
        val toAdd = v2.join(toAddIds, Seq("doc_id"))
        time(it, "  sync: append") { Retrieval.appendToPostings(toAdd, dst) }
      }
      time(it, "probe bucketedBm25TopK") {
        Retrieval.bucketedBm25TopK(spark, dst,
          Seq("spark", "vector", "merge", "window"), 20).count()
      }
      time(it, "q100 end-to-end (declared)") {
        Retrieval.q100IndexSyncProbe(spark, dir).count()
      }
    }
    spark.stop()
  }
}
