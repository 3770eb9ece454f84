package graft.sources

import java.nio.file.Files
import graft.{Fixtures, SparkSpec}
import graft.etl.Enrich

class SourcesSpec extends SparkSpec {

  test("log round-trip through every supported format preserves schema and values") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-src").toFile.getAbsolutePath
    val parsed = Enrich.parseLines(
      Seq(Fixtures.happyLine, Fixtures.dashLine, Fixtures.roleLine).toDF("value"))
    val expected = parsed.orderBy("requestid").collect().toSeq

    Seq("parquet", "csv", "json", "orc").foreach { fmt =>
      Sources.writeLogs(parsed, s"$base/$fmt", fmt)
      val back = Sources.readLogs(spark, s"$base/$fmt", fmt)
      assert(back.schema == parsed.schema, s"$fmt schema drift")
      val rows = back.orderBy("requestid").collect().toSeq
      // csv writes empty strings as null — compare on a null-tolerant key set
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getAs[String]("requestid"), r.getAs[Long]("ts"), r.getAs[Long]("bytessent"),
          r.getAs[Long]("remoteip_int"), r.getAs[Boolean]("is_user"))
      assert(rows.map(key) == expected.map(key), s"$fmt value drift")
    }

    intercept[IllegalArgumentException] {
      Sources.readLogs(spark, base, "avro-nope")
    }
  }

  test("session_window aggregation merges gap-adjacent events") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:10:00", 2.0),   // <30m gap → same session
      (1L, "2024-01-01 01:00:00", 3.0),   // 50m gap → new session
      (2L, "2024-01-01 00:00:00", 4.0))
      .toDF("user_id", "t", "value")
      .withColumn("event_time", col("t").cast("timestamp"))
    val out = graft.streaming.Streaming.sessionWindowAgg(events)
      .orderBy("user_id", "session_start")
      .select("user_id", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0)))
  }
}
