package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Incremental rollup maintenance: merged-from-partials ≡ direct, the
  * append path touches no existing file, and the HLL distinct-user
  * estimate is bounded and merge-lossless. */
class RollupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-rollup").toString + "/partials"

  private def fileList(root: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(root)).map(f => f.getPath -> f.length()).toMap
  }

  test("merged-from-partials equals the direct aggregate; appends add files only") {
    val ev = graft.Tables.events(spark, dir)
    val withDay = ev.withColumn("day", expr("ts DIV 86400000000000"))
    val cut = withDay.agg(min(col("day"))).head().getLong(0) + 10L
    val dst = tmp()

    Rollup.appendPartials(withDay.filter(col("day") < cut).drop("day"), dst)
    val before = fileList(dst)
    Rollup.appendPartials(withDay.filter(col("day") >= cut).drop("day"), dst)
    // the append created new files without touching the backfill's
    val after = fileList(dst)
    assert(before.forall { case (p, len) => after.get(p).contains(len) },
      "append rewrote or removed a backfill file")
    assert(after.size > before.size, "append added no files")

    val got = Rollup.mergedDaily(spark, dst).drop("approx_users")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    val direct = withDay.groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(got == direct, "materialized rollup drifted from the direct aggregate")
  }

  test("quantile partials: sliced appends serve the same exact percentiles as one pass") {
    val ev = graft.Tables.events(spark, dir)
    val withDay = ev.withColumn("day", expr("ts DIV 86400000000000"))
    val cut = withDay.agg(min(col("day"))).head().getLong(0) + 10L

    // one-pass store vs a three-slice appended store
    val one = tmp(); val sliced = tmp()
    Rollup.appendHistograms(ev, one)
    Rollup.appendHistograms(withDay.filter(col("day") < cut).drop("day"), sliced)
    Rollup.appendHistograms(withDay.filter(col("day") >= cut && col("day") < cut + 10L)
      .drop("day"), sliced)
    Rollup.appendHistograms(withDay.filter(col("day") >= cut + 10L).drop("day"), sliced)
    def served(dst: String) = Rollup.servedQuantiles(spark, dst)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val a = served(one); val b = served(sliced)
    assert(a == b && a.nonEmpty, "sliced appends drifted from the one-pass store")

    // the served bins ARE the exact order statistics of the binned values
    // (k = ceil(q·n), 1-indexed — recomputed driver-side from raw events)
    val exact = withDay
      .withColumn("bin", floor(col("value") * 100).cast("long"))
      .select(col("day"), col("bin"))
      .collect().groupBy(_.getLong(0)).map { case (day, rows) =>
        val bins = rows.map(_.getLong(1)).sorted
        val n = bins.length
        (day, n.toLong,
          bins(((n + 1) / 2 - 1).toInt),
          bins((((19L * n + 19) / 20) - 1).toInt))
      }.toSet
    assert(a == exact, "served quantiles are not the exact binned order statistics")
  }

  test("a day-ranged serve prunes the partials scan to the asked-for day dirs") {
    val ev = graft.Tables.events(spark, dir)
    val dst = tmp()
    Rollup.appendPartials(ev, dst)
    val days = new java.io.File(dst).listFiles()
      .filter(_.getName.startsWith("day=")).map(_.getName).sorted
    assert(days.length > 3, s"degenerate fixture: ${days.length} day dirs")
    val want = days.take(2).map(_.stripPrefix("day=").toInt)
    val pruned = spark.read.parquet(dst)
      .filter(col("day").isin(want.map(Int.box): _*))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("day")),
      s"day range is not a partition filter:\n$plan")
    val read = pruned.select(regexp_extract(input_file_name(), "day=\\d+", 0))
      .distinct().collect().map(_.getString(0)).toSet
    assert(read == want.map(d => s"day=$d").toSet,
      s"serve read outside its day range: $read")
  }

  test("HLL user estimate: union of partials is merge-lossless and near exact") {
    val ev = graft.Tables.events(spark, dir)
    val dst = tmp()
    // three slices, including a split WITHIN one day (several partial
    // rows per (day, hour) must merge losslessly)
    Rollup.appendPartials(ev.filter(col("event_id") % 3 === 0), dst)
    Rollup.appendPartials(ev.filter(col("event_id") % 3 === 1), dst)
    Rollup.appendPartials(ev.filter(col("event_id") % 3 === 2), dst)

    val approx = Rollup.mergedDaily(spark, dst)
      .select(col("day"), col("approx_users")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = ev.withColumn("day", expr("ts DIV 86400000000000"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (day, u) =>
      val a = approx(day)
      assert(math.abs(a - u) <= math.max(2L, (u * 0.1).toLong),
        s"day $day: HLL estimate $a vs exact $u")
    }
    // merge-losslessness: the union over sliced partials estimates the
    // same as one sketch built over the whole table in one pass
    val oneShot = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id")))).head().getLong(0)
    val unioned = spark.read.parquet(dst)
      .agg(hll_sketch_estimate(hll_union_agg(col("users_hll")))).head().getLong(0)
    assert(unioned == oneShot,
      s"sliced-partial union ($unioned) != one-pass sketch ($oneShot)")
  }
}
