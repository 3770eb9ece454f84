package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session defaults so Verify / Bench / tests / jobs
  * all run with identical semantics. */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession.Builder = {
    val b = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS) — unreadable as Spark's µs
      // TimestampType; surface it as epoch-nanos LongType (Tables scaladoc).
      .config(Tables.NanosAsLongKey, "true")
    // spark-submit --master (or spark.master in a cluster deploy) wins;
    // the local[] default only applies when launched standalone (sbt/tests)
    if (sys.props.contains("spark.master")) b else b.master(master)
  }

  def create(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"): SparkSession = {
    val s = builder(master).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
