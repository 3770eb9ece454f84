package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for q98/q71 (round-10 bench attribution).
  * Not part of the driver contract; run with
  * `sbt "runMain graft.tools.ProfileQ98 /root/testdata/sf0.1"`. */
object ProfileQ98 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // warm: classload+codegen
    docs.count()

    time("minhashLshPairs (1st)") {
      graft.ops.Dedup.minhashLshPairs(docs, pin = "checkpoint").count()
    }
    time("minhashLshPairs (2nd)") {
      graft.ops.Dedup.minhashLshPairs(docs, pin = "checkpoint").count()
    }
    val anchors = time("anchors") {
      val sym = graft.ops.Dedup.minhashLshPairs(docs, pin = "checkpoint")
        .select(explode(array(
          struct(col("d1").as("a"), col("d2").as("p")),
          struct(col("d2").as("a"), col("d1").as("p")))).as("e"))
        .select(col("e.a").as("doc_id"), col("e.p").as("pos_id"))
      val partners = sym.groupBy(col("doc_id")).agg(min(col("pos_id")).as("pos_id"))
      val a = partners
        .withColumn("skey", md5(concat(lit("contrastive:"), col("doc_id"))))
        .orderBy(col("skey"), col("doc_id")).limit(64)
        .select(col("doc_id"), col("pos_id"))
        .localCheckpoint()
      a.count(); a
    }
    time("hardNegativesFor") {
      graft.ops.Retrieval.hardNegativesFor(docs, anchors.select(col("doc_id")), 4).count()
    }
    // sub-stage breakdown of the champion-list dataflow
    locally {
      import graft.ops.{Dedup, TextAnalysis, TopKPerGroup}
      val d = docs.select(col("doc_id"),
          TextAnalysis.tokens(col("text")).as("l"))
        .select(col("doc_id"), size(col("l")).cast("long").as("dl"), col("l"))
      val qterms = docs.join(anchors.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(TextAnalysis.tokens(col("text")))).as("term"))
        .cache()
      time("  qterms") { println("    n=" + qterms.count()) }
      val qset = qterms.select(col("term")).distinct()
      val tf = d.select(col("doc_id"), col("dl"), explode(col("l")).as("term"))
        .join(broadcast(qset), "term")
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .cache()
      time("  tf") { println("    n=" + tf.count()) }
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val inform = qterms.join(broadcast(dfreq), "term")
        .select(col("term"), col("query_id"))
      val champs = tf.groupBy(col("term"))
        .agg(TopKPerGroup.topKColumn(col("tf"), col("doc_id"), graft.ops.Retrieval.ChampionCap).as("top"))
        .select(col("term"), explode(col("top")).as("e"))
        .select(col("term"), col("e.id").as("doc_id"))
      time("  champs") { println("    n=" + champs.count()) }
      val cand = champs.join(broadcast(inform), Seq("term"))
        .filter(col("doc_id") =!= col("query_id"))
        .select(col("query_id"), col("doc_id")).distinct()
        .cache()
      time("  cand") { println("    n=" + cand.count()) }
      val candDocs = cand.select(col("doc_id")).distinct()
      val parts = tf
        .join(candDocs, Seq("doc_id"), "left_semi")
        .join(broadcast(dfreq), "term")
        .crossJoin(broadcast(d.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_total"))))
        .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"), col("n_docs"), col("n_total"))
      time("  parts") { println("    n=" + parts.count()) }
      val scored = parts
        .join(cand, Seq("doc_id"))
        .join(broadcast(inform), Seq("query_id", "term"), "left_semi")
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("sc"))
      time("  scored") { println("    n=" + scored.count()) }
      time("  excl (minhash)") {
        Dedup.minhashLshPairs(docs, pin = "checkpoint").count()
      }
      qterms.unpersist(); tf.unpersist(); cand.unpersist()
    }
    locally {
      val li = graft.Tables.lineitem(spark, dir)
      li.count()
      time("q31 sketch") {
        graft.ops.KmvSketch.sketch(
          li.select(col("l_returnflag").as("rf"),
            col("l_partkey").cast("string").as("v")), "rf", "v", 256).count()
      }
      time("q31 filter only") {
        val h = substring(md5(concat(col("l_orderkey").cast("string"), lit("_"),
          col("l_linenumber").cast("string"))), 1, 8)
        li.filter(h < "40000000").count()
      }
      time("q31 median") {
        val h = substring(md5(concat(col("l_orderkey").cast("string"), lit("_"),
          col("l_linenumber").cast("string"))), 1, 8)
        graft.queries.Relational.discreteMedianPrice(li.filter(h < "40000000")).count()
      }
      time("q31 n") {
        li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")).count()
      }
      time("q31 full") {
        graft.queries.Relational.q31ApproxAggs(spark, dir).count()
      }
    }
    time("q98 full") {
      graft.ops.Sharding.q98ContrastiveSet(spark, dir).count()
    }
    time("q71 full") {
      graft.ops.Retrieval.q71HardNegatives(spark, dir).count()
    }
    // q100 stage breakdown (index write → v2 derive → sync → probe)
    locally {
      import graft.ops.Retrieval
      val docs = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      val root = new org.apache.hadoop.fs.Path(graft.Sidecars.path("graft_profile_sync"))
      root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
      val dst = graft.Sidecars.path("graft_profile_sync/idx")
      time("q100 writePostings") { Retrieval.writePostingsBucketed(docs, dst) }
      val shift = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      val v2 = docs.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 1,
            concat(col("text"), lit(" spark spark window"))).otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") % 7 === 2)
          .select((col("doc_id") + shift).as("doc_id"),
            concat(col("text"), lit(" merge vector")).as("text")))
      locally {
        import graft.ops.SnapshotDiff
        val d = time("q100 sync:diff") {
          val d0 = SnapshotDiff.diff(docs, v2)
            .filter(col("status") =!= "unchanged")
            .select(col("doc_id"), col("status"))
            .localCheckpoint()
          d0.count(); d0
        }
        val changed = d.filter(col("status") === "changed").select("doc_id")
        val removed = d.filter(col("status") === "removed").select("doc_id")
        val toAddIds = d.filter(col("status") =!= "removed").select("doc_id")
        time("q100 sync:tomb(changed)") { Retrieval.tombstonePostings(changed, dst) }
        time("q100 sync:purge") { Retrieval.purgePostingTombstones(spark, dst) }
        time("q100 sync:tomb(removed)") { Retrieval.tombstonePostings(removed, dst) }
        val toAdd = v2.join(toAddIds, Seq("doc_id"))
        time("q100 sync:append") { Retrieval.appendToPostings(toAdd, dst) }
      }
      time("q100 probe") {
        Retrieval.bucketedBm25TopK(spark, dst,
          Seq("spark", "vector", "merge", "window"), 20).count()
      }
      time("q100 full") { graft.ops.Retrieval.q100IndexSyncProbe(spark, dir).count() }
    }
    spark.stop()
  }
}
