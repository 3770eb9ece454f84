package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import graft.SparkSpec

/** HyperLogLog: estimate accuracy at the declared error, exact union
  * (partials-store pattern), precision-mismatch refusal, SQL surface. */
class HyperLogLogSpec extends SparkSpec {

  private def sketchCol(c: org.apache.spark.sql.Column, p: Int = 12) =
    Bridge.column(HllAgg(Bridge.expression(c), p).toAggregateExpression())
  private def unionCol(c: org.apache.spark.sql.Column) =
    Bridge.column(HllUnionAgg(Bridge.expression(c)).toAggregateExpression())

  test("estimates land within 3 standard errors across magnitudes") {
    import spark.implicits._
    for (n <- Seq(100, 5000, 200000)) {
      val df = spark.range(n).select(concat(lit("user"), col("id")).as("k"))
        .repartition(16)
      val sk = df.agg(sketchCol(col("k")).as("s")).head().getAs[Array[Byte]](0)
      assert(sk.length === (1 << 12) + 1)
      val est = HllFormat.estimate(sk).toDouble
      val se = 1.04 / math.sqrt(1 << 12) // ~1.6%
      assert(math.abs(est - n) <= 3 * se * n + 3,
        s"n=$n est=$est outside 3 standard errors")
    }
  }

  test("union of stored partials equals the sketch of the union — the partials-store pattern") {
    import spark.implicits._
    // 30 daily partials over overlapping user populations
    val days = (1 to 30).map { d =>
      (d, (1 to 3000).map(i => s"u${(i * d) % 20000}"))
    }
    val perDay = days.flatMap { case (d, us) => us.map(u => (d, u)) }
      .toDF("day", "u").repartition(8)
    val partials = perDay.groupBy(col("day")).agg(sketchCol(col("u")).as("s"))
    val unioned = partials.agg(unionCol(col("s")).as("s"))
      .head().getAs[Array[Byte]](0)
    val direct = perDay.agg(sketchCol(col("u")).as("s"))
      .head().getAs[Array[Byte]](0)
    // register-exact, not merely close: union must lose NOTHING
    assert(unioned.toSeq === direct.toSeq)
    // and the estimate tracks the true distinct-union cardinality
    val truth = days.flatMap(_._2).distinct.size
    assert(math.abs(HllFormat.estimate(unioned).toDouble - truth) <=
      3 * 1.04 / 64 * truth + 3)
  }

  test("precision mismatch refuses; small-range correction keeps tiny counts exact-ish") {
    import spark.implicits._
    val a = Seq("x").toDF("k").agg(sketchCol(col("k"), 10).as("s")).head().getAs[Array[Byte]](0)
    val b = Seq("y").toDF("k").agg(sketchCol(col("k"), 12).as("s")).head().getAs[Array[Byte]](0)
    val err = intercept[Exception] {
      Seq(a, b).toDF("s").agg(unionCol(col("s"))).collect()
    }
    assert(err.getMessage != null)
    // 3 distinct values estimate EXACTLY 3 under linear counting
    val tiny = Seq("a", "b", "c", "a").toDF("k")
      .agg(sketchCol(col("k")).as("s")).head().getAs[Array[Byte]](0)
    assert(HllFormat.estimate(tiny) === 3L)
  }

  test("hll functions callable from SQL, per group") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    (1 to 1000).map(i => (s"t${i % 2}", s"u${i % 97}"))
      .toDF("t", "u").createOrReplaceTempView("hll_rows")
    val got = spark.sql(
      """SELECT t, hll_estimate(hll_sketch(u)) AS nd
        |FROM hll_rows GROUP BY t ORDER BY t""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // 97 distinct users split as 49/48 across the two types... both
    // types actually see interleaved ids: u0..u96 appear in both
    assert(got.forall { case (_, nd) => math.abs(nd - 97) <= 5 })
    // the stored-partials SQL chain: group sketches → union → estimate
    val total = spark.sql(
      """SELECT hll_estimate(hll_union(s)) FROM
        |  (SELECT t, hll_sketch(u) AS s FROM hll_rows GROUP BY t)""".stripMargin)
      .head().getLong(0)
    assert(math.abs(total - 97) <= 5)
  }
}
