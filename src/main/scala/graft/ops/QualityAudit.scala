package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declarative data-quality constraint audit — the Deequ-style
  * "unit tests for data" workload (Schelter et al., VLDB 2018) every
  * warehouse runs before publishing a table: declare constraints
  * (completeness, uniqueness, domain membership, range bounds, pattern
  * conformance, referential integrity), compute every metric, and emit
  * one pass/fail row per constraint with the measured metric.
  * Reference scope note: the reference engine validates its export
  * only structurally (row counts, `cmd/export.py`); a constraint suite
  * is extension surface.
  *
  * Scale shape — the whole point of the Deequ design is that the
  * constraint COUNT does not multiply the scan COUNT: every row-level
  * predicate metric is a conditional aggregate in ONE map-side-combined
  * pass over the audited table (10 constraints = 10 columns in one
  * agg, not 10 scans). Uniqueness needs distinct counts, which Spark
  * plans as an expand over the same single scan (one shuffle of key
  * partials, map-side combined — never a second table read).
  * Referential integrity rides the SAME pass: the parent key set is a
  * broadcast left join attached before the aggregate (parent dims are
  * broadcastable at every scale; a fact-fact RI check would swap in a
  * shuffle join, same one-pass shape). The result frame is
  * |constraints| rows — driver-safe by construction.
  *
  * Determinism: every metric is a ratio of exact longs, rounded to 6
  * (the q41 rule); `passed` compares the ROUNDED metric against the
  * threshold so an ulp at the boundary cannot flip the verdict across
  * engines. */
object QualityAudit {

  /** One declared constraint: `metric` must be an aggregate expression
    * producing a double in [0,1] over the audited frame. */
  final case class Constraint(name: String, metric: Column, threshold: Double)

  /** Fraction of rows satisfying `pred` (NULL counts as violation —
    * the audit semantics, not SQL three-valued logic). */
  def fractionWhere(pred: Column): Column =
    sum(when(coalesce(pred, lit(false)), 1L).otherwise(0L)).cast("double") /
      count(lit(1)).cast("double")

  /** Fraction of non-null rows: the completeness metric. */
  def completeness(c: Column): Column = fractionWhere(c.isNotNull)

  /** Distinct values per row: 1.0 iff the column is a key. */
  def uniqueness(c: Column): Column =
    countDistinct(c).cast("double") / count(lit(1)).cast("double")

  /** Run the audit: ONE aggregate pass computing every metric, then an
    * in-row pivot to (constraint, metric, threshold, passed) rows.
    * Output is |constraints| rows ordered by constraint name. */
  def audit(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "empty constraint suite")
    val aggs = constraints.map(c => round(c.metric, 6).as(c.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    // stack the single metrics row into one row per constraint; the
    // threshold rides in-row so `passed` is decided where the metric is
    val pairs = constraints.map { c =>
      struct(lit(c.name).as("check_name"), col(c.name).as("metric"),
        lit(c.threshold).as("threshold"))
    }
    one.select(explode(array(pairs: _*)).as("r"))
      .select(col("r.check_name"), col("r.metric"), col("r.threshold"),
        (col("r.metric") >= col("r.threshold")).as("passed"))
      .orderBy(col("check_name"))
  }

  /** q143: the audit suite over `orders` (with `customer` as the RI
    * parent). Six constraints covering every metric family; the
    * uniqueness-of-o_custkey check is EXPECTED to fail (customers place
    * many orders) — a suite where every row passes would not exercise
    * the verdict logic. The RI flag is attached by broadcast left join
    * BEFORE the single aggregate pass, so the whole audit is one scan
    * of orders + one broadcast of the customer key set. */
  def q143QualityAudit(s: SparkSession, dir: String): DataFrame = {
    val custKeys = Tables.customer(s, dir)
      .select(col("c_custkey")).distinct()
      .withColumn("__ri_hit", lit(true))
    val flagged = Tables.orders(s, dir)
      .join(broadcast(custKeys), col("o_custkey") === col("c_custkey"), "left")
    audit(flagged, Seq(
      Constraint("completeness_o_custkey", completeness(col("o_custkey")), 1.0),
      Constraint("uniqueness_o_orderkey", uniqueness(col("o_orderkey")), 1.0),
      Constraint("uniqueness_o_custkey", uniqueness(col("o_custkey")), 1.0),
      Constraint("domain_o_orderstatus",
        fractionWhere(col("o_orderstatus").isin("O", "F", "P")), 1.0),
      Constraint("range_o_totalprice",
        fractionWhere(col("o_totalprice") > 0.0), 1.0),
      Constraint("pattern_o_orderpriority",
        fractionWhere(col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$")), 1.0),
      Constraint("ri_o_custkey_customer",
        fractionWhere(col("__ri_hit")), 1.0)))
  }
}
