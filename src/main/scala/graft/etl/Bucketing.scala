package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: the co-located-join path for repeated fact-fact
  * joins at scale. Writing both sides bucketed (and sorted) by the join
  * key means every subsequent join on that key is Exchange-free — the
  * shuffle is paid once at write time instead of per query. At 100 TB
  * this converts the dominant recurring cost (lineitem ⋈ orders on every
  * report) into a one-time layout decision, exactly like the reference
  * "bakes" its query predicates into the partition layout (SURVEY.md §0).
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("compression", "snappy")
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With matching bucket
    * counts Catalyst plans a SortMergeJoin with NO Exchange on either
    * side (asserted in ScaleOpsSpec). The merge hint stops the planner
    * broadcasting a small side — a broadcast would ignore the bucketing
    * (and at the scales bucketing targets, neither side is small). */
  def colocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right).hint("merge"), key)
}
