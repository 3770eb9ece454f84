package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The Athena-replacement query surface (SURVEY.md §0 "query half"): the
  * reference only *lays out* parquet for an external engine to query;
  * here the engine answers queries itself. Registers the exported
  * partitioned log table (partition pruning + parquet min/max skipping
  * come from the layout ExportJob wrote) and the custom SQL functions,
  * then any ANSI SQL runs against it.
  */
object QuerySession {

  /** Register the exported access-log dataset as `tableName` and install
    * the engine's SQL functions. Partition discovery picks up the Hive
    * `col=value` layout, so WHERE clauses on bucket_name / operation /
    * year / month / day / hour prune directories before any IO. */
  def open(spark: SparkSession, logsPath: String, tableName: String = "s3_access_logs"): Unit = {
    GraftExtensions.register(spark)
    spark.read.parquet(logsPath).createOrReplaceTempView(tableName)
  }

  /** Register the star-schema test tables (TESTDATA.md) for SQL use. */
  def openTestTables(spark: SparkSession, sfDir: String): Unit = {
    GraftExtensions.register(spark)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
  }

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
