package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.etl.LogSchema

/** Source/sink format registry beyond the primary text→parquet path.
  * The reference's `deserialize` dispatches on a format tag and errors on
  * anything unknown (s3access/serializer.py:13-27, csv only); here the
  * DataFrameReader IS that registry — these helpers pin the engine's
  * supported formats and schema handling in one place.
  */
object Sources {

  /** Read parsed access-log events from any supported format, enforcing
    * the engine schema (no inference drift between formats). */
  def readLogs(spark: SparkSession, path: String, format: String): DataFrame = format match {
    case "parquet" => spark.read.schema(LogSchema.schema).parquet(path)
    case "csv"     => spark.read.schema(LogSchema.schema)
      .option("header", "true").csv(path)
    case "json"    => spark.read.schema(LogSchema.schema).json(path)
    case "orc"     => spark.read.schema(LogSchema.schema).orc(path)
    case other     => throw new IllegalArgumentException(
      s"unsupported log format: $other (parquet|csv|json|orc)") // mirrors serializer.py:26
  }

  def writeLogs(df: DataFrame, path: String, format: String): Unit = format match {
    case "parquet" => df.write.mode(SaveMode.Overwrite).parquet(path)
    case "csv"     => df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    case "json"    => df.write.mode(SaveMode.Overwrite).json(path)
    case "orc"     => df.write.mode(SaveMode.Overwrite).orc(path)
    case other     => throw new IllegalArgumentException(
      s"unsupported log format: $other (parquet|csv|json|orc)")
  }

  /** Schema-enforced generic reader for arbitrary tables. */
  def read(spark: SparkSession, path: String, format: String, schema: StructType): DataFrame =
    spark.read.schema(schema).format(format).load(path)
}
