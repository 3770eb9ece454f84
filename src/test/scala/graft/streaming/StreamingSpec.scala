package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{Fixtures, SparkSpec}

class StreamingSpec extends SparkSpec {

  test("streaming export: file source → parse → partitioned sink, exactly-once") {
    val base = Files.createTempDirectory("graft-stream").toFile.getAbsolutePath
    val src = s"$base/in"; val dst = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(src).mkdirs()
    Files.write(java.nio.file.Paths.get(s"$src/2021-07-18-05-00-12-AAAA"),
      (Fixtures.happyLine + "\n" + Fixtures.dashLine).getBytes)

    Streaming.streamingExport(spark, src, dst, ckpt).awaitTermination()
    assert(spark.read.parquet(dst).count() == 2)

    // a late-arriving file is picked up by the next trigger; the first
    // file is NOT reprocessed (checkpoint = exactly-once file progress)
    Files.write(java.nio.file.Paths.get(s"$src/2021-07-18-06-00-01-BBBB"),
      Fixtures.roleLine.getBytes)
    Streaming.streamingExport(spark, src, dst, ckpt).awaitTermination()
    val out = spark.read.parquet(dst)
    assert(out.count() == 3)
    assert(out.where("operation = 'REST.PUT.OBJECT' and hour = 6").count() == 1)
  }

  test("streaming/batch parity: streamingExport and runHour produce identical datasets") {
    val base = Files.createTempDirectory("graft-parity").toFile.getAbsolutePath
    val src = s"$base/in"
    new java.io.File(src).mkdirs()
    Files.write(java.nio.file.Paths.get(s"$src/2021-07-18-05-00-12-AAAA"),
      (Fixtures.happyLine + "\n" + Fixtures.dashLine).getBytes)
    Files.write(java.nio.file.Paths.get(s"$src/2021-07-18-05-30-44-BBBB"),
      Fixtures.roleLine.getBytes)

    val dstS = s"$base/out_stream"
    Streaming.streamingExport(spark, src, dstS, s"$base/ckpt").awaitTermination()
    val dstB = s"$base/out_batch"
    graft.etl.ExportJob.runHour(spark, src, dstB, s"$base/track", "2021-07-18-05")

    // both pipelines share Enrich.parseLines and the partition layout —
    // the ONLY allowed differences are file naming and file count (the
    // batch path repartitions per combo and renames; the streaming sink
    // writes per micro-batch task). Same schema, same partition dirs,
    // same full row set.
    val s = spark.read.parquet(dstS)
    val b = spark.read.parquet(dstB)
    assert(s.columns.sorted.toSeq == b.columns.sorted.toSeq)
    val cols = s.columns.sorted.map(col).toSeq
    assert(s.select(cols: _*).exceptAll(b.select(cols: _*)).isEmpty &&
           b.select(cols: _*).exceptAll(s.select(cols: _*)).isEmpty,
      "streaming and batch exports diverge")
    assert(s.count() == 3 && b.count() == 3)
    def partDirs(root: String): Set[String] = {
      val base = java.nio.file.Paths.get(root)
      val out = scala.collection.mutable.Set[String]()
      java.nio.file.Files.walk(base).forEach { p =>
        val f = p.toFile
        if (f.isFile && f.getName.endsWith(".parquet"))
          out += base.relativize(p.getParent).toString
      }
      out.toSet
    }
    assert(partDirs(dstS) == partDirs(dstB), "partition dir layouts diverge")
  }

  test("watermarked hourly windowed aggregation over the parsed stream") {
    val base = Files.createTempDirectory("graft-stream2").toFile.getAbsolutePath
    val src = s"$base/in"
    new java.io.File(src).mkdirs()
    Files.write(java.nio.file.Paths.get(s"$src/2021-07-18-05-00-12-AAAA"),
      (Fixtures.happyLine + "\n" + Fixtures.dashLine + "\n" + Fixtures.roleLine).getBytes)

    val lines = spark.readStream.text(src)
    val agg = Streaming.hourlyOperationCounts(graft.etl.Enrich.parseLines(lines))
    val q = agg.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("hourly_counts").start()
    q.processAllAvailable(); q.stop()

    val res = spark.table("hourly_counts")
      .select(col("window.start").cast("string").as("ws"), col("operation"), col("n"), col("bytes_sent"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(res == Set(
      ("2021-07-18 05:00:00", "REST.GET.OBJECT", 1L, 2662992L),
      ("2021-07-18 05:00:00", "REST.GET.LOGGING_STATUS", 1L, 242L),
      ("2021-07-18 06:00:00", "REST.PUT.OBJECT", 1L, 0L)))
  }

  test("streaming dedup drops duplicate request ids within the watermark") {
    val base = Files.createTempDirectory("graft-dedup").toFile.getAbsolutePath
    val src = s"$base/in"
    new java.io.File(src).mkdirs()
    // the same requestid three ways: verbatim duplicate, AND a retry 10
    // minutes later (same id, different event_time — the normal duplicate
    // shape); plus one genuinely distinct line. Only id-keyed state
    // (dropDuplicatesWithinWatermark) drops the retry.
    Files.write(java.nio.file.Paths.get(s"$src/2021-07-18-05-00-12-AAAA"),
      (Fixtures.happyLine + "\n" + Fixtures.happyLine + "\n" +
        Fixtures.happyRetryLine + "\n" + Fixtures.dashLine).getBytes)
    val lines = spark.readStream.text(src)
    val deduped = Streaming.dedupStream(graft.etl.Enrich.parseLines(lines))
    val q = deduped.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_sink").start()
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_sink").select("requestid").collect().map(_.getString(0))
    assert(ids.sorted.toSeq == Seq("3E57427F3EXAMPLE", "891CE47D2EXAMPLE"))
  }

  test("stateful sessionization matches the batch lag+cumsum operator") {
    import spark.implicits._
    val hour = 3600000L
    val events = Seq(
      Streaming.Event(1L, 0L, 1.0),            // session 1
      Streaming.Event(1L, 60000L, 1.0),        // +1 min → same session
      Streaming.Event(1L, hour, 1.0),          // +59 min gap → session 2
      Streaming.Event(2L, 0L, 1.0)).toDS()     // separate user
    // mapGroupsWithState runs in batch mode too (single-batch state)
    val result = Streaming.sessionize(events)
    val rows = result.collect().map(u => (u.user_id, u.n_sessions, u.n_events)).toSet
    assert(rows == Set((1L, 2L, 3L), (2L, 1L, 1L)))
  }

  test("streaming sessionize ≡ batch q14 over the real events fixture") {
    import spark.implicits._
    // q14's scaladoc points bot-heavy corpora at Streaming.sessionize as
    // the skew-safe alternative — this proves the two operators agree on
    // the actual events table, not just a toy sequence
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), expr("ts DIV 1000000").as("ts_ms"), col("value"))
      .as[Streaming.Event]
    val streamed = Streaming.sessionize(ev).collect()
      .map(u => (u.user_id, u.n_sessions, u.n_events)).toSet
    val batch = graft.queries.Relational.q14Sessionize(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_sessions"),
        r.getAs[Long]("n_events"))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming quality filter ≡ batch q39 over the documents fixture") {
    val dir = "/root/testdata/sf0.001"
    val schema = graft.Tables.documents(spark, dir).schema
    // a file stream source watches a DIRECTORY; stage the fixture file
    val watched = java.nio.file.Files.createTempDirectory("graft-docs-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      watched.resolve("documents.parquet"))
    val stream = spark.readStream.schema(schema).parquet(watched.toString)
    val q = Streaming.qualityFilterStream(stream)
      .writeStream.format("memory").queryName("quality_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.sql("SELECT doc_id, reason, keep FROM quality_sink")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    val batch = graft.ops.TextAnalysis.q39FilterPipeline(spark, dir)
      .select("doc_id", "reason", "keep")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(streamed.nonEmpty && streamed == batch)
    // both verdicts occur on the fixture — the filter actually filters
    assert(streamed.exists(_._3) && streamed.exists(!_._3))
  }

  test("streaming learned-quality scoring ≡ batch q68 with offline-trained weights") {
    val dir = "/root/testdata/sf0.001"
    // train offline (batch), score the stream with the frozen weights
    val w = graft.ops.QualityModel.trainLogistic(
      graft.ops.QualityModel.features(graft.Tables.documents(spark, dir)))
    val schema = graft.Tables.documents(spark, dir).schema
    val watched = java.nio.file.Files.createTempDirectory("graft-score-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      watched.resolve("documents.parquet"))
    val stream = spark.readStream.schema(schema).parquet(watched.toString)
    val q = Streaming.qualityScoreStream(stream, w)
      .writeStream.format("memory").queryName("score_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.sql("SELECT doc_id, score, predicted FROM score_sink")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    val batch = graft.ops.QualityModel.q68QualityModel(spark, dir)
      .select("doc_id", "score", "predicted")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(streamed.nonEmpty && streamed == batch)
    assert(streamed.exists(_._3) && streamed.exists(!_._3))
  }

  test("streaming ingest dedup: corpus-first, min-id within batch, keepers extend the index") {
    import spark.implicits._
    import graft.ops.NearDupIndex
    def mk(rows: (Long, Seq[String])*) =
      rows.map { case (id, ws) => (id, ws.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val w1 = (1 to 12).map(i => s"alpha$i")
    val w2 = (1 to 12).map(i => s"beta$i")
    val n1 = (1 to 12).map(i => s"gamma$i")
    val n2 = (1 to 12).map(i => s"delta$i")
    val root = java.nio.file.Files.createTempDirectory("graft-ingest")
    val idx = root.resolve("idx").toString
    NearDupIndex.writeMinhashLayout(mk(1L -> w1, 2L -> w2), idx)
    val watched = java.nio.file.Files.createDirectory(root.resolve("in"))
    def stage(name: String, df: org.apache.spark.sql.DataFrame, mtime: Long): Unit = {
      val tmpd = root.resolve(name + "_tmp").toString
      df.coalesce(1).write.parquet(tmpd)
      val part = new java.io.File(tmpd).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = watched.resolve(name).toFile
      java.nio.file.Files.move(part.toPath, target.toPath)
      assert(target.setLastModified(mtime))
    }
    // batch 1: 101 dups the corpus, 102 is novel, 103 dups 102 in-batch;
    // batch 2 (later mtime): 201 dups the APPENDED 102, 202 is novel
    val t0 = System.currentTimeMillis()
    stage("b1.parquet", mk(101L -> w1, 102L -> n1, 103L -> n1), t0 - 120000)
    stage("b2.parquet", mk(201L -> n1, 202L -> n2), t0 - 60000)
    val stream = spark.readStream.schema(mk(1L -> w1).schema)
      .option("maxFilesPerTrigger", 1).parquet(watched.toString)
    val verdicts = root.resolve("verdicts").toString
    val q = Streaming.nearDupIngestStream(stream, idx, verdicts)
    q.awaitTermination()
    val v = spark.read.parquet(verdicts).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(v == Map(101L -> true, 102L -> false, 103L -> true,
      201L -> true, 202L -> false), s"verdicts drifted: $v")
    // the index now answers for a keeper appended mid-stream
    val hits = NearDupIndex.probeNearDup(spark, idx, mk(301L -> n2)).collect()
    assert(hits.exists(r => r.getLong(0) == 202L && r.getLong(1) == 301L),
      s"appended keeper 202 not indexed: ${hits.mkString(",")}")
  }

  test("streaming rollup maintenance ≡ batch: partials from micro-batches serve identically") {
    import graft.ops.Rollup
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "value").localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("graft-rollup-stream")
    val watched = java.nio.file.Files.createDirectory(root.resolve("in"))
    def stage(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmpd = root.resolve(name + "_tmp").toString
      df.coalesce(1).write.parquet(tmpd)
      val part = new java.io.File(tmpd).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, watched.resolve(name))
    }
    stage("b1.parquet", ev.filter(col("event_id") % 2 === 0))
    stage("b2.parquet", ev.filter(col("event_id") % 2 === 1))
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(watched.toString)
    val partials = root.resolve("partials").toString
    Streaming.rollupStream(stream, partials).awaitTermination()
    // the store holds at least two segments per covered hour-set, and
    // the merged serve equals the batch direct aggregate
    val got = Rollup.mergedDaily(spark, partials).drop("approx_users")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    val direct = ev.withColumn("day", expr("ts DIV 86400000000000"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sv"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(got == direct, "streamed partials drifted from the batch aggregate")

    // the histogram partials stream the same way: micro-batch bins serve
    // the exact percentiles a one-pass batch store serves
    val stream2 = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(watched.toString)
    val hist = root.resolve("vhist").toString
    Streaming.histogramStream(stream2, hist).awaitTermination()
    val oneShot = root.resolve("vhist_batch").toString
    Rollup.appendHistograms(ev, oneShot)
    def served(d: String) = Rollup.servedQuantiles(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val sq = served(hist)
    assert(sq == served(oneShot) && sq.nonEmpty,
      "streamed histogram partials drifted from the batch store")

    // the per-user-hour store streams the same way: gap fill and
    // anomaly scoring served from streamed partials must equal the
    // direct raw-history computation (wave 6's standing-store claim)
    import graft.ops.TimeSeries
    val stream3 = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(watched.toString)
    val uh = root.resolve("user_hourly").toString
    Streaming.userHourlyStream(stream3, uh).awaitTermination()
    val servedFill = TimeSeries.gapFillFromHourly(
        TimeSeries.mergedUserHourly(spark, uh))
      .collect().map(_.toSeq).toSet
    val directFill = TimeSeries.hourlyGapFill(ev).collect().map(_.toSeq).toSet
    assert(servedFill == directFill && servedFill.nonEmpty,
      "gap fill served from streamed partials drifted from raw history")
    val servedZ = TimeSeries.anomaliesFromHourly(
        TimeSeries.mergedUserHourly(spark, uh).drop("n_events"))
      .collect().map(_.toSeq).toSet
    val directZ = TimeSeries.hourlyAnomalies(ev).collect().map(_.toSeq).toSet
    assert(servedZ == directZ, "anomalies served from streamed partials drifted")
  }

  test("streaming KMV sketch maintenance ≡ batch, and replay is idempotent") {
    import graft.ops.KmvSketch
    val k = 128
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id").localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("graft-kmv-stream")
    val watched = java.nio.file.Files.createDirectory(root.resolve("in"))
    def stage(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmpd = root.resolve(name + "_tmp").toString
      df.coalesce(1).write.parquet(tmpd)
      val part = new java.io.File(tmpd).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, watched.resolve(name))
    }
    // user-sliced batches: every day's users are split across both
    // micro-batches, so the serve must merge multiple partials per day
    stage("b1.parquet", ev.filter(col("user_id") % 2 === 0))
    stage("b2.parquet", ev.filter(col("user_id") % 2 === 1))
    def mkStream() = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(watched.toString)
    val store = root.resolve("kmv").toString
    Streaming.kmvDailyStream(mkStream(), store, k).awaitTermination()
    def weekly(d: String) = KmvSketch.serveRangeDistinct(spark, d, k,
        expr("CAST(day AS BIGINT) DIV 7"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = weekly(store)
    val batch = root.resolve("kmv_batch").toString
    KmvSketch.appendDailySketches(ev, batch, k)
    assert(streamed == weekly(batch) && streamed.nonEmpty,
      "streamed sketch partials drifted from the one-shot batch store")
    // the claimed idempotence: replaying the whole source into the same
    // store (a checkpoint-less restart) must not move any estimate —
    // min-k is a set-union order statistic, not a sum
    Streaming.kmvDailyStream(mkStream(), store, k).awaitTermination()
    assert(weekly(store) == streamed,
      "replayed append changed a served estimate — idempotence broken")
  }

  test("streaming source quota: the admission counter survives micro-batch boundaries") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-quota")
    val watched = java.nio.file.Files.createDirectory(root.resolve("in"))
    def stage(name: String, rows: Seq[(Long, String)], mtime: Long): Unit = {
      val tmpd = root.resolve(name + "_tmp").toString
      rows.toDF("doc_id", "source").coalesce(1).write.parquet(tmpd)
      val part = new java.io.File(tmpd).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = watched.resolve(name).toFile
      java.nio.file.Files.move(part.toPath, target.toPath)
      assert(target.setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis()
    // batch 1: a fills its quota of 2 (doc 12 arrives "before" 11 by id
    // order? no — admission is doc_id-ordered within the batch); batch 2:
    // a is already full, b still has room
    stage("b1.parquet", Seq((12L, "a"), (11L, "a"), (13L, "a"), (21L, "b")),
      t0 - 120000)
    stage("b2.parquet", Seq((14L, "a"), (22L, "b")), t0 - 60000)
    val stream = spark.readStream
      .schema(Seq((1L, "x")).toDF("doc_id", "source").schema)
      .option("maxFilesPerTrigger", 1).parquet(watched.toString)
      .as[Streaming.DocIn]
    val out = root.resolve("out").toString
    val q = Streaming.sourceQuotaStream(stream, quota = 2L)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val v = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(2), r.getLong(3))).toMap
    assert(v == Map(
      11L -> (true, 1L), 12L -> (true, 2L), 13L -> (false, -1L),
      21L -> (true, 1L),
      14L -> (false, -1L),   // source a was filled in batch 1
      22L -> (true, 2L)), s"verdicts drifted: $v")
  }

  test("streaming PII scrub ≡ batch q60 over the synthesized log lines") {
    val dir = "/root/testdata/sf0.001"
    // stage the synthesized raw lines as a text file the stream watches
    val lines = graft.Tables.events(spark, dir)
      .select(graft.queries.LogParsing.syntheticLogLine.as("value"))
    val watched = java.nio.file.Files.createTempDirectory("graft-pii-stream")
    lines.coalesce(1).write.mode("overwrite").text(watched.toString)
    val stream = spark.readStream.text(watched.toString)
    val q = Streaming.piiScrubStream(stream)
      .select(org.apache.spark.sql.functions.col("redacted_md5"),
        org.apache.spark.sql.functions.col("n_ips"))
      .writeStream.format("memory").queryName("pii_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.sql("SELECT redacted_md5, n_ips FROM pii_sink")
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val batch = graft.ops.Privacy.q60PiiRedact(spark, dir)
      .select("redacted_md5", "n_ips")
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch,
      "streamed scrub diverged from the batch operator")
  }

  test("streaming chunking ≡ batch q59 over the documents fixture") {
    val dir = "/root/testdata/sf0.001"
    val schema = graft.Tables.documents(spark, dir).schema
    val watched = java.nio.file.Files.createTempDirectory("graft-chunk-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      watched.resolve("documents.parquet"))
    val stream = spark.readStream.schema(schema).parquet(watched.toString)
    val q = Streaming.chunkStream(stream)
      .writeStream.format("memory").queryName("chunk_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.sql(
      "SELECT doc_id, chunk_id, chunk_md5 FROM chunk_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val batch = graft.ops.Chunking.q59Chunking(spark, dir)
      .select("doc_id", "chunk_id", "chunk_md5")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed.nonEmpty && streamed == batch,
      "streamed chunks diverged from the batch operator")
  }

  test("streaming gram-df maintenance ≡ batch q158 store: served frequent set identical") {
    import graft.ops.Boilerplate
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir).localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("graft-gramdf-stream")
    val watched = java.nio.file.Files.createDirectory(root.resolve("in"))
    def stage(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmpd = root.resolve(name + "_tmp").toString
      df.coalesce(1).write.parquet(tmpd)
      val part = new java.io.File(tmpd).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, watched.resolve(name))
    }
    // doc-sliced batches: frequent grams' dfs split across partials
    stage("b1.parquet", docs.filter(col("doc_id") % 2 === 0))
    stage("b2.parquet", docs.filter(col("doc_id") % 2 === 1))
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(watched.toString)
    val store = root.resolve("gramdf").toString
    Streaming.gramDfStream(stream, store, 3).awaitTermination()
    val streamed = Boilerplate.frequentFromStore(spark, store, 1)
      .collect().map(_.getString(0)).toSet
    val batchStore = root.resolve("gramdf_batch").toString
    Boilerplate.appendGramDf(docs, batchStore, 3)
    val batch = Boilerplate.frequentFromStore(spark, batchStore, 1)
      .collect().map(_.getString(0)).toSet
    assert(streamed.nonEmpty && streamed == batch,
      "streamed gram-df partials drifted from the one-shot batch store")
  }

  test("streaming tokenization ≡ batch q91 under the same frozen rules") {
    val dir = "/root/testdata/sf0.001"
    // batch run trains + persists the rules and is the parity target
    // q91 now emits the gate-safe joined string (q35 rule); the stream
    // still carries the raw id array — join it for the comparison
    val batch = graft.ops.Bpe.q91TokenIds(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // the stream applies the PERSISTED tables — frozen rules, the
    // operator's contract (a mid-stream retrain would invalidate every
    // previously emitted sequence)
    val merges = graft.ops.Bpe.readMerges(spark, graft.ops.Bpe.MergesPath)
    val vocab = spark.read.parquet(graft.ops.Bpe.VocabPath)
      .orderBy(org.apache.spark.sql.functions.col("id"))
      .collect().map(_.getString(1))
    val schema = graft.Tables.documents(spark, dir).schema
    val watched = java.nio.file.Files.createTempDirectory("graft-tok-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      watched.resolve("documents.parquet"))
    val stream = spark.readStream.schema(schema).parquet(watched.toString)
    val q = Streaming.tokenizeStream(stream, merges, vocab)
      .select("doc_id", "token_ids")
      .writeStream.format("memory").queryName("tok_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.sql("SELECT doc_id, token_ids FROM tok_sink")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).mkString(","))).toMap
    assert(streamed.nonEmpty && streamed == batch,
      "streamed token ids diverged from the batch encoding")
  }

  test("stream-stream interval join ≡ batch join; cross-user and out-of-window never match") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    def ts(offsetMin: Int) =
      new java.sql.Timestamp(t0.getTime + offsetMin * 60000L)
    val ordersRows = Seq(
      (1L, 500L, ts(0)),    // user 1 orders at 10:00
      (1L, 501L, ts(60)),   // and again at 11:00
      (2L, 502L, ts(0)))
    val eventRows = Seq(
      (1L, 9000L, ts(10)),  // matches order 500 (within 30m)
      (1L, 9001L, ts(50)),  // matches nothing (40m after 500, before 501)
      (1L, 9002L, ts(75)),  // matches order 501
      (2L, 9003L, ts(29)),  // matches order 502 at the boundary
      (3L, 9004L, ts(5)))   // no orders for user 3
    val root = java.nio.file.Files.createTempDirectory("graft-ssjoin")
    ordersRows.toDF("o_user", "order_id", "order_time")
      .write.parquet(root.resolve("orders").toString)
    eventRows.toDF("user_id", "event_id", "event_time")
      .write.parquet(root.resolve("events").toString)
    val oStream = spark.readStream
      .schema(ordersRows.toDF("o_user", "order_id", "order_time").schema)
      .parquet(root.resolve("orders").toString)
    val eStream = spark.readStream
      .schema(eventRows.toDF("user_id", "event_id", "event_time").schema)
      .parquet(root.resolve("events").toString)
    val q = Streaming.attributionJoinStream(oStream, eStream)
      .writeStream.format("memory").queryName("attr_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.sql("SELECT event_id, order_id FROM attr_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === Set((9000L, 500L), (9002L, 501L), (9003L, 502L)))
    // batch parity: identical frames through the same operator code path
    val batch = Streaming.attributionJoinStream(
      spark.read.parquet(root.resolve("orders").toString),
      spark.read.parquet(root.resolve("events").toString))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(batch === streamed)
  }

  test("q147 streamed session windows ≡ batch sessionizer counts; q148 is rerun-stable") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val sessions = graft.ops.StreamingGates.q147StreamedSessions(spark, dir)
      .localCheckpoint()
    // invariants: sentinel excluded, every session ≥ 1 event, end = last+gap
    assert(sessions.filter(col("user_id") === -1L).isEmpty)
    assert(sessions.filter(col("n_events") < 1L).isEmpty)
    assert(sessions.filter(
      col("session_end_us") - col("session_start_us") < 1800000000L).isEmpty)
    // cross-operator lock: per-user session COUNT matches the batch
    // hot-key-safe sessionizer. (Boundary conventions differ — batch
    // opens on gap > 30 min, session_window on gap ≥ 30 min — but the
    // micros-resolution fixture has no exact-30:00.000000 gap, so the
    // counts must agree; a divergence here means real semantics drift.)
    val streamed = sessions.groupBy(col("user_id"))
      .agg(count(lit(1)).as("ns"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = graft.Tables.events(spark, dir)
    val batch = graft.ops.SkewWindows.sessionCounts(
        ev.select(col("user_id"), expr("ts DIV 1000000").as("tms"), col("event_id")),
        "user_id", col("tms"), col("event_id"), gapMs = 1800000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch,
      s"streamed-only: ${streamed.toSet.diff(batch.toSet)}; batch-only: ${batch.toSet.diff(streamed.toSet)}")
    // q148 rerun determinism: identical frames run-to-run (the staging
    // and state iteration are pinned, not accidental)
    val a = graft.ops.StreamingGates.q148StreamedDedup(spark, dir)
      .collect().map(_.toSeq).toSeq
    val b = graft.ops.StreamingGates.q148StreamedDedup(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("q146 streamed attribution ≡ batch interval join over the real events fixture") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.ops.Attribution.q146StreamedAttribution(spark, dir)
      .collect().map(_.toSeq).toSet
    // the batch truth, straight from the table with integer-µs math
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), expr("ts DIV 1000").as("us"),
        col("user_id"), col("event_type"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("us").as("click_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("us").as("purchase_us"))
    val batch = p.join(c, "user_id")
      .filter(col("purchase_us") >= col("click_us") &&
        col("purchase_us") <= col("click_us") + lit(14400000000L))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_us"), col("purchase_us"))
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty, "fixture yields no attribution pairs — test is vacuous")
    assert(streamed === batch,
      s"streamed-only: ${streamed.diff(batch)}; batch-only: ${batch.diff(streamed)}")
  }
}
