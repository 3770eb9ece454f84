package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational query surface — the "query half" the reference delegates to
  * Athena (SURVEY.md §0, §2.3): filters, joins (broadcast/semi/anti/as-of),
  * aggregations (incl. rollup / distinct / conditional pivot), window
  * functions, set ops, top-k, sessionization.
  *
  * Determinism contract with the DuckDB oracle:
  *   - every floating-point SUM goes through an exact DECIMAL intermediate
  *     (`dsum`) so the result is independent of partial-aggregation order —
  *     a double sum over a shuffled 100 TB dataset is otherwise
  *     non-deterministic in the last ulps and would hash-mismatch;
  *   - every output is deterministically ordered by a key column;
  *   - timestamps are surfaced as epoch millis / dates, never raw
  *     TIMESTAMP columns (Spark µs vs DuckDB ns precision).
  *
  * Scale notes: dims are broadcast; fact-fact joins shuffle on their join
  * keys only after filtering; window functions partition on high-cardinality
  * keys (customer/user), so no single-partition windows.
  */
object Relational {

  /** Order-independent sum of a double expression: exact decimal
    * accumulation, surfaced back as double. DECIMAL(28,6) holds 22 integer
    * digits — enough for 100 TB-scale row counts times 1e12-scale values. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(28,6)")).cast("double")

  /** TPC-H Q1 style pricing summary: scan + filter + hash aggregate.
    * Catalyst plans a partial (map-side) agg before the shuffle, so the
    * shuffle carries one row per (flag, status) per task, not per input row. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3 style: fact-fact join (lineitem ⋈ orders shuffles on orderkey)
    * plus broadcast customer filter; top-10 by revenue with key tie-break. */
  def q02TopRevenueOrders(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, dir)
    val li   = Tables.lineitem(s, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      // dates surface as strings: Spark's date32 and DuckDB's DATE reach
      // pandas as different physical types and may hash differently
      .groupBy(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 style: revenue per nation through the full dim chain —
    * all three dims broadcast, single shuffle for the final aggregate. */
  def q03NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val n  = Tables.nation(s, dir)
    val r  = Tables.region(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Left-semi join (SQL EXISTS): customers having at least one order over
    * the threshold. Semi-join keeps only left columns and stops probing a
    * key after the first match — cheaper than join+distinct at scale. */
  def q04SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_totalprice") > 100000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (SQL NOT EXISTS): customers with no order since 2000 —
    * the filter lands on the build side before the join, so the anti-join
    * probes a reduced set. */
  def q05AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Top-k per group: 3 most expensive orders per customer, via the
    * bounded `top_k` TypedImperativeAggregate (map-side k-row heaps,
    * ≤ k entries per key on the shuffle) instead of a row_number
    * window — a window's partition sort buffers a hot key's ENTIRE
    * order history in one task, the aggregate never holds more than k
    * rows per key anywhere. Ties broken by o_orderkey (the aggregate's
    * (score desc, id asc) order — ScaleOpsSpec asserts it equals the
    * window formulation row-for-row). */
  def q06TopOrdersPerCustomer(s: SparkSession, dir: String): DataFrame =
    graft.ops.TopKPerGroup.topKPerKey(
        Tables.orders(s, dir), "o_custkey", "o_totalprice", "o_orderkey", 3)
      .select(col("key").as("o_custkey"), col("id").as("o_orderkey"),
        col("score").as("o_totalprice"), col("rank").as("rnk"))
      .orderBy(col("o_custkey"), col("rnk"))

  /** events.ts surfaces as epoch-nanos LongType (Tables.NanosAsLongKey);
    * integer DIV to millis keeps full precision (see Tables scaladoc). */
  private def tsMs: Column = expr("ts DIV 1000000")

  /** Running (cumulative) sum per user over the event stream, hot-key
    * routed like q14/q16 (`SkewWindows.runningSum`): light users take
    * the one-window cumsum, a bot user's stream splits into time chunks
    * recombined through a bounded chunk-prefix. The accumulator is an
    * exact DECIMAL, so every prefix sum is order-of-association
    * independent — the routed plan is bit-identical to the plain one
    * (oracle hash unchanged, ScaleOpsSpec asserts equality on a bot). */
  def q07RunningSum(s: SparkSession, dir: String): DataFrame =
    graft.ops.SkewWindows.runningSum(
        Tables.events(s, dir), "user_id", "ts", "event_id", "value")
      .select(col("user_id"), col("event_id"),
        col("running").cast("double").as("running_value"))
      .orderBy(col("user_id"), col("event_id"))

  /** ROLLUP aggregation: acctbal totals by region → nation → grand total. */
  def q08Rollup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(col("c_acctbal")).as("total_acctbal"), count(lit(1)).as("n_cust"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** Exact + distinct aggregation: per return flag, distinct suppliers and
    * parts. Exact COUNT(DISTINCT) expands to a two-phase aggregate in
    * Catalyst; see Extensions for the approx_count_distinct scale path. */
  def q09DistinctCounts(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** Set operations: customers active in 1995 vs 1996 (order date year):
    * intersect = both years, except = 1995 only. Output one tagged union. */
  def q10SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val y1995 = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey")).distinct()
    val y1996 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")).distinct()
    val both  = y1995.intersect(y1996).withColumn("tag", lit("both"))
    val only95 = y1995.except(y1996).withColumn("tag", lit("only_1995"))
    both.unionByName(only95)
      .select(col("tag"), col("o_custkey"))
      .orderBy(col("tag"), col("o_custkey"))
  }

  /** Top-k with a broadcast dim join: parts by shipped quantity. */
  def q11TopParts(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p  = Tables.part(s, dir)
    li.groupBy(col("l_partkey"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .join(broadcast(p), col("l_partkey") === p("p_partkey"))
      .select(col("l_partkey"), col("p_name"), col("p_brand"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("l_partkey"))
      .limit(5)
  }

  /** Scalar string/math function surface (SURVEY §2.3 row "string/date/math"):
    * upper/substring/length/concat/contains/CASE + exact decimal math. */
  def q12ScalarFunctions(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        col("p_name").contains("green").as("has_green"),
        when(col("p_size") < 10, "small").when(col("p_size") < 30, "medium")
          .otherwise("large").as("size_class"),
        (col("p_retailprice").cast("decimal(18,2)") * lit(BigDecimal("1.100")))
          .cast("double").as("price_with_tax"))
      .orderBy(col("p_partkey"))
  }

  /** Pivot via conditional aggregation: per-user event-type counts plus
    * decimal-exact purchase total. Map-side partial aggregation keeps the
    * shuffle at one row per user per task. */
  def q13PivotEventCounts(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") === "click", 1)).as("n_click"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
        count(when(col("event_type") === "signup", 1)).as("n_signup"),
        count(when(col("event_type") === "error", 1)).as("n_error"),
        sum(when(col("event_type") === "purchase", col("value").cast("decimal(28,6)"))
          .otherwise(lit(null))).cast("double").as("purchase_value"))
      .orderBy(col("user_id"))
  }

  /** Sessionization: a new session starts after a >30 min gap. Light
    * keys take the classic lag + session-start-marker window (one
    * shuffle on user_id, no driver state); hot keys — a bot whose
    * billion-event history would otherwise sort through ONE task's
    * window buffer — are diagnosed by a map-side-combined stats
    * aggregate and routed through `SkewWindows.sessionCounts`'s
    * time-chunked sub-window path (the q42 three-piece prefix per hot
    * key). Results are invariant to the routing cut; ScaleOpsSpec
    * asserts chunked ≡ plain on a planted bot. Gap math in epoch millis
    * so Spark (µs) and DuckDB (ns) agree. */
  def q14Sessionize(s: SparkSession, dir: String): DataFrame =
    graft.ops.SkewWindows.sessionCounts(
        Tables.events(s, dir), "user_id", tsMs, col("event_id"), 1800000L)
      .orderBy(col("user_id"))

  /** Semi-structured extraction: pull integer k out of the JSON props
    * column with a regexp (codegen'd, no UDF) and aggregate. */
  def q15JsonExtract(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** As-of join: for each event, the customer's most recent order with
    * o_orderdate <= event ts (ties on date broken by max orderkey).
    *
    * Formulated as a MERGED-STREAM WINDOW, not a join: orders and events
    * are union'd into one per-user timeline, sorted by (time, kind, key),
    * and each event picks up `last(order) ignore nulls` — the most recent
    * order at or before it. Cost is linear in (events + orders) per user
    * and NO join ever pairs events with orders — the only joins in the
    * plan are hot-key ROUTING (broadcast, against the bounded hot-key
    * stats set) and the heavy path's (user, chunk)-keyed summary join.
    *
    * Why not equality-join-then-argmax: a join on `user_id` equality plus
    * a date inequality makes Spark enumerate every (event, order) pair of
    * each user before filtering — quadratic compute per key, so a bot
    * user with 1e6 events and 1e5 orders means 1e11 pair evaluations in
    * one task. The merged stream is the classic scale-safe as-of plan.
    *
    * Sort-order correctness: kind 0 (order) sorts before kind 1 (event)
    * at equal timestamps, so an order dated exactly at the event time is
    * visible (`<=` semantics); among same-date orders the largest
    * orderkey sorts last and therefore wins the carry-forward — the
    * required tie-break. */
  def q16AsOfJoin(s: SparkSession, dir: String): DataFrame =
    asOfOrders(Tables.events(s, dir), Tables.orders(s, dir))

  /** Core of q16, parameterized for spec-level stress with synthetic hot
    * users. `events` needs (event_id, user_id, ts ns-long); `orders` needs
    * (o_orderkey, o_custkey, o_orderdate).
    *
    * Hot keys (timeline length ≥ `hotAt`) no longer sort their whole
    * merged timeline through one task: `SkewWindows.asOfCarry` routes
    * them through a time-chunked sub-window path — local (user, chunk)
    * carry-forward, per-chunk last-order summaries, a bounded window
    * over the summaries to stitch chunk boundaries. Light keys keep the
    * plain one-window merged-stream plan, whose partitions are < hotAt
    * rows by construction. Results are invariant to the cut
    * (ScaleOpsSpec asserts routed ≡ brute-force on a planted bot). */
  def asOfOrders(events: DataFrame, orders: DataFrame,
                 hotAt: Long = 1000000L, chunkTarget: Long = 65536L): DataFrame = {
    // Compare in epoch millis: orders carry ms precision, so flooring the
    // event's ns timestamp to ms preserves the <= relation exactly.
    val dateType = orders.schema("o_orderdate").dataType
    val ordRows = orders.select(
      col("o_custkey").as("user_id"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("t_ms"),
      lit(0).as("kind"),
      col("o_orderkey").as("sort_key"),
      col("o_orderdate").as("ord_date"),
      col("o_orderkey").as("ord_key"),
      lit(null).cast("long").as("event_id"))
    val evtRows = events.select(
      col("user_id"),
      tsMs.as("t_ms"),
      lit(1).as("kind"),
      col("event_id").as("sort_key"),
      lit(null).cast(dateType).as("ord_date"),
      lit(null).cast("long").as("ord_key"),
      col("event_id"))
    // ROWS-frame ignore-nulls carry-forward (light keys) / chunked
    // sub-windows (hot keys) — asOfCarry owns both and the routing;
    // ord_date/ord_key are null on exactly the same rows, so the two
    // carries always resolve to the same (latest) order row.
    graft.ops.SkewWindows.asOfCarry(
        ordRows.unionByName(evtRows), "user_id", hotAt, chunkTarget)
      .select(col("event_id"), col("user_id"),
        coalesce(col("asof_key"), lit(-1L)).as("asof_orderkey"),
        coalesce(date_format(col("asof_date"), "yyyy-MM-dd"), lit("1970-01-01"))
          .as("asof_orderdate"))
      .orderBy(col("event_id"))
  }

  /** Time-bucketed aggregation over the event stream: hourly tumbling
    * windows as epoch-hour buckets (batch analogue of the streaming
    * windowed agg in graft.streaming). */
  def q17HourlyEventAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("hour_bucket", expr("ts DIV 3600000000000"))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("hour_bucket"), col("event_type"))
  }

  /** CUBE aggregation (all 4 grouping combinations of segment × region). */
  def q19Cube(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .cube(col("c_mktsegment"), col("r_name"))
      .agg(dsum(col("c_acctbal")).as("total_acctbal"), count(lit(1)).as("n_cust"))
      .orderBy(col("c_mktsegment").asc_nulls_first, col("r_name").asc_nulls_first)
  }

  /** Approximate aggregates — the 100 TB path for distinct counts and
    * quantiles (HLL++ / GK sketches, constant memory per group, one
    * shuffle of sketch buffers instead of raw values). Sketch internals
    * are engine-specific → rows-only driver check, with exact bounds
    * asserted in the spec instead. */
  def q31ApproxAggs(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val k = 256
    // distinct-part estimate: the KMV order statistic (q135's family) —
    // same O(k)-state mergeable-sketch shape as approx_count_distinct's
    // HLL++, but its content is a pure function of the md5 hash, so the
    // DuckDB oracle replays the estimate as an EQUALITY (HLL++ internals
    // are engine-specific — this query sat rows-only for four rounds)
    val sk = graft.ops.KmvSketch.sketch(
      li.select(col("l_returnflag").as("rf"),
        col("l_partkey").cast("string").as("v")), "rf", "v", k)
    val parts = sk.select(col("key").as("l_returnflag"),
      round(graft.ops.KmvSketch.estimate(col("minK"), k), 6).as("approx_parts"))
    // approximate median: exact discrete median of a deterministic 25%
    // hash-sample of rows (md5 of the (orderkey, linenumber) primary
    // key < 0x40000000 — the Splits rule, so membership is stable
    // across runs/engines/partitionings, unlike percentile_approx's
    // merge-order-dependent quantile sketch). Sampling-based quantile
    // estimation with the q33 bounded two-phase selection underneath.
    val h = substring(md5(concat(col("l_orderkey").cast("string"), lit("_"),
      col("l_linenumber").cast("string"))), 1, 8)
    // the two-phase selection scans its input twice (coarse histogram,
    // then the target bucket's slice) — materialize the md5-sampled
    // frame ONCE so the per-row hash isn't paid on both passes. The
    // checkpoint holds only the sample's two live columns (25% × 2 cols
    // of lineitem), cheaper than a second full-corpus md5 scan at any SF
    val sample = li.filter(h < "40000000")
      .select(col("l_returnflag"), col("l_extendedprice"))
      .localCheckpoint()
    val med = discreteMedianPrice(sample)
      .select(col("l_returnflag"), col("median_price").as("approx_median_price"))
    val n = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    parts.join(med, Seq("l_returnflag")).join(n, Seq("l_returnflag"))
      .orderBy(col("l_returnflag"))
  }

  /** Deterministic train/val/test split assignment by content hash — the
    * standard leakage-safe split for a training pipeline: membership is a
    * pure function of the id, stable across runs, engines and rescans. */
  def q32SplitAssign(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        graft.ops.Splits.of(col("doc_id")).as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("split"))
  }

  /** Deterministic stratified sampling: within each stratum, membership
    * is `md5(id) < threshold(stratum)` — a pure function of the row, so
    * the sample is identical across runs, engines, partitionings and
    * retries (rand()-based sampleBy is none of those). Thresholds are
    * fraction × 2^32 rendered in hex-space. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double]): DataFrame = {
    val h = substring(md5(col(idCol).cast("string")), 1, 8) // 32 bits of hash
    val threshold = fractions.foldLeft(lit(null).cast("string")) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f"${(f * 0xffffffffL).toLong}%08x")).otherwise(acc)
    }
    df.filter(h < threshold)
  }

  /** Exact discrete median (type-agnostic order statistic): the
    * ceil(n/2)-th smallest value per group — interpolating percentile
    * functions differ across engines, the order statistic cannot.
    *
    * Two-phase selection, NOT a per-row window: a `row_number()` over a
    * 3-value partition key sorts each group's entire data through one
    * task — a third of the corpus per task at 100 TB. Instead:
    *   1. distinct-value histogram (one shuffle, map-side partial agg);
    *   2. coarse value-buckets → cumulative counts over the bucket axis
    *      (window over ~100 aggregated rows per group, not raw rows)
    *      locate the bucket holding rank k and the residual rank inside it;
    *   3. only that bucket's distinct values (a ~1024-wide price slice)
    *      sort through a window — bounded work regardless of data size.
    * Every window in the plan runs over aggregated, bounded-cardinality
    * input (asserted in PlanSpec). */
  def q33MedianDisc(s: SparkSession, dir: String): DataFrame =
    discreteMedianPrice(Tables.lineitem(s, dir))

  /** The reusable two-phase core of q33 over any lineitem-shaped frame
    * (q31 runs it over a deterministic sample): (l_returnflag,
    * median_price, n) where median_price is the ceil(n/2)-th smallest
    * l_extendedprice counting duplicates. */
  private[graft] def discreteMedianPrice(li: DataFrame): DataFrame = {
    val bucket = (c: Column) => floor(c / lit(1024.0))
    // coarse histogram straight off the scan: map-side combine collapses
    // each task's rows to <=#buckets partials, so the shuffle carries
    // ~hundreds of rows — no per-distinct-value shuffle anywhere
    val buckets = li.groupBy(col("l_returnflag").as("bf"),
        bucket(col("l_extendedprice")).as("b"))
      .agg(count(lit(1)).as("bc"))
    val counts = buckets.groupBy(col("bf").as("cf")).agg(sum(col("bc")).as("n"))
      .withColumn("k", ceil(col("n") / lit(2.0)).cast("long"))
    val wb = Window.partitionBy(col("bf")).orderBy(col("b"))
    val target = buckets.withColumn("cumb", sum(col("bc")).over(wb))
      .join(broadcast(counts), col("bf") === col("cf"))
      .filter(col("cumb") >= col("k") && col("cumb") - col("bc") < col("k"))
      .select(col("bf"), col("b").as("tb"),
        (col("k") - (col("cumb") - col("bc"))).as("kk"), col("n"))
    // second scan touches only the target bucket's rows (broadcast
    // semi-filter before any shuffle): the per-value histogram and its
    // window are over a ~1024-wide price slice per group, bounded
    // regardless of data size
    val wv = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    li.join(broadcast(target), col("l_returnflag") === col("bf") &&
        bucket(col("l_extendedprice")) === col("tb"))
      .groupBy(col("l_returnflag"), col("l_extendedprice"), col("kk"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cumv", sum(col("cnt")).over(wv))
      .filter(col("cumv") >= col("kk") && col("cumv") - col("cnt") < col("kk"))
      .select(col("l_returnflag"), col("l_extendedprice").as("median_price"), col("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Statistical aggregates (corr / stddev) from exact decimal moment
    * sums — built-in corr()/stddev() use incremental float updates whose
    * order varies by engine and partitioning; the moment formula over
    * exact sums is deterministic everywhere. */
  def q34MomentStats(s: SparkSession, dir: String): DataFrame = {
    val d = (c: Column) => c.cast("decimal(28,6)")
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(d(col("l_quantity"))).cast("double").as("sx"),
        sum(d(col("l_extendedprice"))).cast("double").as("sy"),
        sum(d(col("l_quantity") * col("l_quantity"))).cast("double").as("sxx"),
        sum(d(col("l_extendedprice") * col("l_extendedprice"))).cast("double").as("syy"),
        sum(d(col("l_quantity") * col("l_extendedprice"))).cast("double").as("sxy"))
      // round(…, 12): compilers may fuse a*b-c*d into FMA differently per
      // engine — the inputs are identical doubles, so divergence is ≤1e-17
      // and a 12-digit round restores bit equality
      .select(col("l_returnflag"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
           sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 12).as("corr_qty_price"),
        round(sqrt((col("n") * col("sxx") - col("sx") * col("sx"))) /
          col("n"), 12).as("stddev_pop_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** Ordered collection aggregate (nested-type surface): the 5 smallest
    * order keys per priority, surfaced as a joined string so the physical
    * representation is engine-neutral.
    *
    * Two-level min-k selection, not a flat collect: 1024 sub-buckets each
    * keep a sorted min-5 (agg buffer ≤ group/1024), the merge level sees
    * ≤ 5×1024 survivors — min-k is decomposable, so the result is
    * identical and no aggregation state ever holds a whole group. */
  def q35ArrayAgg(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val sub = o.groupBy(col("o_orderpriority"), pmod(col("o_orderkey"), lit(1024L)).as("sb"))
      .agg(slice(array_sort(collect_list(col("o_orderkey"))), 1, 5).as("m"),
        count(lit(1)).as("c"))
    // group size folds into the merge agg: each sub-bucket's count is
    // taken once (explode position 0) — no separate sizes join
    sub.select(col("o_orderpriority"), col("c"), posexplode(col("m")).as(Seq("pos", "k")))
      .groupBy(col("o_orderpriority"))
      .agg(
        array_join(transform(slice(array_sort(collect_list(col("k"))), 1, 5),
          x => x.cast("string")), ",").as("first5_orderkeys"),
        sum(when(col("pos") === 0, col("c")).otherwise(0L)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** q54: sliding event-time window — 3-hour moving average of event
    * volume and value per event type, the standard monitoring/trend
    * query over a time-bucketed fact stream.
    *
    * Scale shape: the raw stream collapses to (hour, type) partials
    * FIRST (q17's aggregate — map-side combine, one keyed shuffle); the
    * sliding window then runs over the aggregated frame, partitioned by
    * event_type with one row per hour — years of data is ~10⁵ rows per
    * partition, never raw events. Window sums stay on exact types (long
    * counts, DECIMAL(28,6) values): a double sliding sum would expose
    * each engine's window-accumulation order in the last ulps. */
  def q54SlidingHourly(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .withColumn("hour_bucket", expr("ts DIV 3600000000000"))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).as("dv"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_bucket"))
      .rowsBetween(-2, 0)
    hourly
      .withColumn("n_3h", sum(col("n")).over(w))
      .withColumn("w_rows", count(lit(1)).over(w))
      .withColumn("avg_n_3h",
        col("n_3h").cast("double") / col("w_rows").cast("double"))
      .withColumn("avg_value_3h",
        sum(col("dv")).over(w).cast("double") / col("w_rows").cast("double"))
      .select(col("hour_bucket"), col("event_type"), col("n"),
        col("dv").cast("double").as("total_value"),
        col("n_3h"), col("avg_n_3h"), col("avg_value_3h"))
      .orderBy(col("hour_bucket"), col("event_type"))
  }

  /** q55: winsorized statistics — the robust aggregate a metrics pipeline
    * runs when a few bot rows would otherwise own the mean: per group,
    * the exact p05/p95 order statistics and the mean with values clamped
    * to them, plus how many rows each side clamped.
    *
    * Scale shape: q33's two-phase selection generalized to a RANK SET —
    * one coarse-histogram pass (map-side combined; the shuffle carries
    * per-bucket partials), the crossing bucket per requested rank found
    * on the aggregated histogram, and a second scan that builds per-value
    * histograms ONLY inside the (≤1024-wide) target buckets. No
    * per-distinct-value shuffle, no full sort; ranks use pure integer
    * arithmetic (ceil(n/20) = (n+19) DIV 20) so both engines agree
    * exactly, and the clamped mean goes through the dsum decimal rule. */
  def q55WinsorizedStats(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val bucket = (c: Column) => floor(c / lit(1024.0))
    val buckets = li.groupBy(col("l_returnflag").as("bf"),
        bucket(col("l_extendedprice")).as("b"))
      .agg(count(lit(1)).as("bc"))
    // the requested rank set: k05 = ceil(n/20), k95 = ceil(19n/20)
    val counts = buckets.groupBy(col("bf").as("cf")).agg(sum(col("bc")).as("n"))
    val ranks = counts.select(col("cf"), col("n"),
        explode(array(
          struct(lit("p05").as("tag"), expr("(n + 19) DIV 20").as("kk")),
          struct(lit("p95").as("tag"), expr("(19 * n + 19) DIV 20").as("kk")))).as("r"))
      .select(col("cf"), col("n"), col("r.tag").as("tag"), col("r.kk").as("kk"))
    val wb = Window.partitionBy(col("bf")).orderBy(col("b"))
    val cum = buckets.withColumn("cumb", sum(col("bc")).over(wb))
    // crossing bucket per (group, rank)
    val target = cum.join(broadcast(ranks), col("bf") === col("cf"))
      .filter(col("cumb") >= col("kk") && col("cumb") - col("bc") < col("kk"))
      .select(col("bf"), col("tag"), col("b").as("tb"),
        (col("kk") - (col("cumb") - col("bc"))).as("local_k"))
    // per-value histogram inside each target bucket only
    val wv = Window.partitionBy(col("l_returnflag"), col("tag"))
      .orderBy(col("l_extendedprice"))
    val cuts = li.join(broadcast(target), col("l_returnflag") === col("bf") &&
        bucket(col("l_extendedprice")) === col("tb"))
      .groupBy(col("l_returnflag"), col("tag"), col("l_extendedprice"), col("local_k"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cumv", sum(col("cnt")).over(wv))
      .filter(col("cumv") >= col("local_k") && col("cumv") - col("cnt") < col("local_k"))
      .groupBy(col("l_returnflag").as("gf"))
      .agg(
        min(when(col("tag") === "p05", col("l_extendedprice"))).as("p05"),
        min(when(col("tag") === "p95", col("l_extendedprice"))).as("p95"))
    // final pass: clamp to the bounds and aggregate exactly
    li.join(broadcast(cuts), col("l_returnflag") === col("gf"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        min(col("p05")).as("p05"),
        min(col("p95")).as("p95"),
        (dsum(least(greatest(col("l_extendedprice"), col("p05")), col("p95"))) /
          count(lit(1)).cast("double")).as("winsorized_mean"),
        sum(when(col("l_extendedprice") < col("p05"), 1L).otherwise(0L)).as("n_clamped_low"),
        sum(when(col("l_extendedprice") > col("p95"), 1L).otherwise(0L)).as("n_clamped_high"))
      .orderBy(col("l_returnflag"))
  }

  /** Correlated-aggregate pattern (decorrelated by Catalyst into a join):
    * orders above their customer's average order value. */
  def q18AboveAvgOrders(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val custAvg = o.groupBy(col("o_custkey").as("ca_custkey"))
      .agg((sum(col("o_totalprice").cast("decimal(28,6)")).cast("double") /
        count(lit(1))).as("avg_price"))
    o.join(custAvg, o("o_custkey") === custAvg("ca_custkey"))
      .filter(col("o_totalprice") > col("avg_price"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** q85: ordered-funnel analysis — per user, the earliest completion
    * time of each stage of the sequence view → click → purchase, where
    * stage k only counts events STRICTLY AFTER the user's stage-(k−1)
    * time (the product-analytics conversion funnel; a click before the
    * first view is not a conversion click).
    *
    * Shape at 100 TB: K chained conditional-min aggregates, every one
    * keyed on user_id — never an ordered window, so a scanner bot's
    * timeline is a combiner tree, not a single-task sort (the q14/q16
    * hot-key lesson applied by construction). Each stage joins the
    * previous stage's ONE ROW PER USER back to that stage's filtered
    * events: same join key as the aggregation, so the shuffles align,
    * and the per-stage frames shrink monotonically (stage k's users ⊆
    * stage k−1's). K is the funnel definition's length (3), a constant.
    *
    * Determinism: epoch-nanos integer mins, stage count cast to long —
    * nothing floats. */
  def q85EventFunnel(s: SparkSession, dir: String): DataFrame =
    eventFunnel(Tables.events(s, dir), Seq("view", "click", "purchase"))

  /** q86: cohort retention — the companion analytics to q85's funnel:
    * users are cohorted by their FIRST active day, and each
    * (cohort_day, day_offset) cell counts how many of that cohort were
    * active offset days later, next to the cohort's size (the consumer
    * divides; the engine ships exact longs, no float crosses the
    * oracle boundary).
    *
    * Shape at 100 TB: the user-day grain is ONE distinct (the only
    * corpus-scale shuffle); cohorts and cells are keyed aggregates on
    * top of it, and because the grain is already distinct the cell
    * count is a plain `count`, not a `count(DISTINCT)` — no two-phase
    * expansion. A bot user contributes one row per active day whatever
    * its event volume. */
  def q86RetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), expr("ts DIV 86400000000000").as("day"))
      .distinct()
    val cohort = ud.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val sizes = cohort.groupBy(col("cohort_day")).agg(count(lit(1)).as("n_cohort"))
    ud.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("n_cohort"), col("n_active"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** q103: explicit GROUPING SETS over the documents corpus — the
    * fourth member of the multi-grain aggregation family (q08 rollup,
    * q19 cube): per-source, per-lang, per-(source,lang) and the grand
    * total in ONE pass. Catalyst expands the sets into a single Expand
    * + hash aggregate — one scan, one shuffle keyed on the expanded
    * grouping id, exactly the plan a UNION ALL of four GROUP BYs would
    * need four scans for. `gid` (Spark's `grouping_id()` ≡ DuckDB's
    * `GROUPING(source, lang)`) disambiguates a real NULL group value
    * from a rolled-up one — the standard consumer contract. */
  def q103GroupingSets(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    docs
      .groupingSets(
        Seq(Seq(col("source")), Seq(col("lang")),
            Seq(col("source"), col("lang")), Seq()),
        col("source"), col("lang"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("gid"), asc_nulls_first("source"), asc_nulls_first("lang"))
  }

  /** q233's pinned pivot axis (explicit values = deterministic output
    * columns AND a one-pass plan — Spark's two-pass value-discovery
    * pivot is both nondeterministic in column order and an extra scan). */
  val PivotLangs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** q233: PIVOT — the wide per-source language report
    * (`RelationalGroupedDataset.pivot`, the one §2.3 relational surface
    * not yet gated): token counts spread over the pinned language
    * axis plus the row total. One map-side-combined aggregate; pivot
    * with an explicit value list compiles to conditional aggregates
    * inside a single hash aggregate — no extra shuffle vs the long
    * form. */
  def q233LangPivot(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("source"), col("lang"),
        graft.ops.TextAnalysis.tokenCount(col("text")).as("nt"))
    val wide = docs.groupBy(col("source"))
      .pivot("lang", PivotLangs)
      .agg(sum(col("nt")))
    val cols = PivotLangs.map(l => coalesce(col(l), lit(0L)).as(s"tok_$l"))
    wide.select((col("source") +: cols): _*)
      .withColumn("tok_total",
        PivotLangs.map(l => col(s"tok_$l")).reduce(_ + _))
      .orderBy(col("source"))
  }

  /** q239: UNPIVOT — `Dataset.unpivot` (the melt dual of q233's pivot,
    * the other half of the wide↔long relational surface): per-doc
    * metrics to (doc_id, metric, value) long form. A pure narrow map
    * (unpivot compiles to Expand — k output rows per input row, no
    * shuffle). */
  def q239MetricsUnpivot(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        graft.ops.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .unpivot(Array(col("doc_id")),
        Array(col("n_chars"), col("n_tokens")), "metric", "value")
      .orderBy(col("doc_id"), col("metric"))
  }

  /** The reusable core over any (user_id, event_type, ts) frame. */
  def eventFunnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val e = events.select(col("user_id"), col("event_type"), col("ts"))
    val stageTimes = stages.zipWithIndex.foldLeft(List.empty[(String, DataFrame)]) {
      case (acc, (st, i)) =>
        val tCol = s"t_$st"
        val mine = e.filter(col("event_type") === st)
        val cur =
          if (i == 0)
            mine.groupBy(col("user_id")).agg(min(col("ts")).as(tCol))
          else {
            val (prevCol, prev) = acc.head
            mine.join(prev.select(col("user_id"), col(prevCol)), Seq("user_id"))
              .filter(col("ts") > col(prevCol))
              .groupBy(col("user_id")).agg(min(col("ts")).as(tCol))
          }
        (tCol, cur) :: acc
    }.reverse
    val users = e.select(col("user_id")).distinct()
    val joined = stageTimes.foldLeft(users) { case (acc, (tCol, df)) =>
      acc.join(df.select(col("user_id"), col(tCol)), Seq("user_id"), "left")
    }
    // deepest non-null stage wins: ascending fold leaves the LAST
    // stage's `when` outermost
    val stageCol = stageTimes.map(_._1).zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (tCol, i)) => when(col(tCol).isNotNull, lit(i + 1L)).otherwise(acc)
    }
    joined
      .withColumn("stage", stageCol)
      .orderBy(col("user_id"))
  }
}
