package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Table PROFILER — the per-column summary a warehouse emits before
  * anyone writes a query against a new table: row count, null count,
  * exact distinct count, and the modal value with its support. One
  * row per profiled column, computed in ONE corpus pass: the columns
  * melt into (col_name, value) rows in-row (an array-of-structs
  * explode — no per-column scan), a single map-combined count
  * aggregate collapses the corpus, and every statistic derives from
  * that aggregated (col_name, value, c) grid. Profiled columns are
  * exact-typed (strings/integers) so the string casts agree across
  * engines bit-for-bit; modal ties break to the SMALLER value string
  * (the q94 min-struct rule).
  *
  * Shape at 100 TB: the melt multiplies rows ×|columns| BEFORE the
  * map-side combine — the standard expand cost every multi-distinct
  * aggregate pays — and nothing after the first aggregate sees more
  * than the distinct-value grid. */
object Profile {

  private val Columns = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_returnflag", "l_linestatus")

  /** q216: profile of the lineitem table's exact-typed columns. */
  def q216TableProfile(s: SparkSession, dir: String): DataFrame =
    profile(Tables.lineitem(s, dir), Columns)

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val melted = Par.widen(df).select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
      .as("m"))
      .select(col("m.col_name").as("col_name"), col("m.v").as("v"))
    val grid = melted.groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("c"))
    grid.groupBy(col("col_name"))
      .agg(sum(col("c")).as("n_rows"),
        coalesce(sum(when(col("v").isNull, col("c"))), lit(0L)).as("n_null"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
        min(when(col("v").isNotNull,
          struct((-col("c")).as("negc"), col("v").as("tv")))).as("m"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"),
        col("m.tv").as("top_value"), (-col("m.negc")).as("top_count"))
      .orderBy(col("col_name"))
  }
}
