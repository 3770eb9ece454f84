package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral specs for the wave-12 operators: the standing sketch
  * store's append/merge contract and the A/B test's planted effects. */
class Wave12Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sketch store: mid-day cuts leave multi-partial days; serve ≡ from-scratch; appends are add-only") {
    val k = 128
    val out = KmvSketch.q141SketchStoreServe(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // the store (as built by q141) holds >1 partial for at least one
    // day — the serve provably exercised the merge, not a pass-through
    val store = spark.read.parquet(KmvSketch.DailySketchPath)
    val maxPartials = store.groupBy(col("day")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxPartials >= 2L, s"no split day in the store (max $maxPartials)")
    // serve ≡ from-scratch weekly sketch of raw events
    val ev = graft.Tables.events(spark, dir)
    val direct = KmvSketch.sketch(
      ev.select(expr("(ts DIV 86400000000000) DIV 7").as("w"),
        col("user_id").cast("string").as("v")), "w", "v", k)
      .select(col("key").as("week"), size(col("minK")).cast("long").as("n_kept"),
        round(KmvSketch.estimate(col("minK"), k), 6).as("kmv_est"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    direct.foreach { case (w, v) => assert(out(w) === v, s"week $w") }
    // total row: estimate for all distinct users, exact below k
    val nUsers = ev.select(col("user_id")).distinct().count()
    if (nUsers < k) assert(out(-1L)._2 === nUsers.toDouble)
    else assert(math.abs(out(-1L)._2 - nUsers) / nUsers.toDouble < 0.35)
    // append-only: re-appending one more batch adds files, never
    // rewrites — file listing of the existing store is a subset after
    def files(): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(KmvSketch.DailySketchPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      val b = Set.newBuilder[String]
      while (it.hasNext) { val f = it.next().getPath.toString
        if (f.endsWith(".parquet")) b += f }
      b.result()
    }
    val before = files()
    KmvSketch.appendDailySketches(ev.limit(50), KmvSketch.DailySketchPath, k)
    val after = files()
    assert(before.subsetOf(after) && after.size > before.size)
  }

  test("abTest: planted uplift flags significant; zero-variance metric yields null z, not a crash") {
    import spark.implicits._
    // split 4000 users by the REAL assignment hash, then plant:
    //  - 'buy': variant 0 gets 3+parity events/user, variant 1 gets
    //    1+parity (means 3.5 vs 1.5, within-group variance 0.25) → huge z
    //  - 'view': every user exactly 2 → zero variance → z undefined
    val users = (0L until 4000L).toDF("user_id")
      .withColumn("variant", Experiment.variantOf(col("user_id"), 2))
    val buyCnt = when(col("variant") === 0L, lit(3)).otherwise(lit(1)) +
      pmod(col("user_id"), lit(2L)).cast("int")
    val buys = users
      .select(col("user_id"), explode(sequence(lit(1), buyCnt)).as("i"))
      .select(col("user_id"), lit("buy").as("event_type"))
    val views = users.select(col("user_id"),
        explode(array(lit(1), lit(2))).as("i"))
      .select(col("user_id"), lit("view").as("event_type"))
    val out = Experiment.abTest(buys.unionByName(views)).collect()
      .map(r => r.getString(0) -> r).toMap
    val b = out("buy")
    assert(b.getLong(1) + b.getLong(2) === 4000L)
    // means exact up to the parity mix within each hash split
    assert(b.getDouble(3) > 3.0 && b.getDouble(3) < 4.0)
    assert(b.getDouble(4) > 1.0 && b.getDouble(4) < 2.0)
    assert(b.getDouble(3) - b.getDouble(4) > 1.8)
    assert(b.getDouble(5) > 10.0 && b.getBoolean(6), b.toString)
    val v = out("view")
    assert(v.getDouble(3) === 2.0 && v.getDouble(4) === 2.0)
    assert(v.isNullAt(5) && v.isNullAt(6), v.toString)
  }
}
