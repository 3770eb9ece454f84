package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish star schema
  * (see TESTDATA.md). One parquet file per table under `sfDir`.
  *
  * Small dimension tables (region/nation/supplier/part/customer) are
  * broadcast-join candidates at every scale factor — at 100 TB the fact
  * tables (lineitem/orders/events/documents) grow but the dims stay
  * broadcastable, so queries below mark them with `broadcast()`.
  */
object Tables {
  /** Parquet TIMESTAMP(NANOS) (events.ts) is unreadable by Spark's native
    * TimestampType (µs); sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which surfaces `ts` as
    * epoch-nanos LongType. All event-time math is integer arithmetic on
    * epoch units — ns magnitudes (~1.7e18) exceed double's 2^53 mantissa,
    * so float division would silently lose sub-second precision. */
  val NanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  def region(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame      = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/lineitem.parquet")
  def events(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/events.parquet")
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")
}
