package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Count-Min Sketch: one-sided error bound, partial-merge correctness
  * (the TypedImperativeAggregate contract), and SQL callability. */
class CountMinSketchSpec extends SparkSpec {

  test("cms estimates never underestimate and respect the eps*N bound") {
    import spark.implicits._
    // skewed distribution over many partitions so partial buffers merge
    val rows = (1 to 10000).map(i => s"k${i % 100}") ++ Seq.fill(5000)("hot")
    val df = spark.createDataset(rows).toDF("k").repartition(16)
    val sketch = df.agg(exprs.cms_sketch(col("k")).as("s"))
      .collect()(0).getAs[Array[Byte]]("s")
    val n = rows.size
    val eps = math.E / 2048 // default width
    val trueCounts = rows.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    trueCounts.foreach { case (k, t) =>
      val est = CountMinSketchFormat.estimate(
        sketch, org.apache.spark.unsafe.types.UTF8String.fromString(k))
      assert(est >= t, s"$k: estimate $est underestimates true $t")
      assert(est <= t + (eps * n).ceil.toLong * 5, // δ-slack: generous, still tight vs n
        s"$k: estimate $est way above true $t (n=$n)")
    }
  }

  test("sketch of a union equals elementwise merge of per-part sketches") {
    import spark.implicits._
    val a = spark.createDataset(Seq.fill(300)("x") ++ Seq.fill(100)("y")).toDF("k")
    val b = spark.createDataset(Seq.fill(200)("x") ++ Seq.fill(400)("z")).toDF("k")
    def sk(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(exprs.cms_sketch(col("k"), 3, 64).as("s")).collect()(0).getAs[Array[Byte]]("s")
    val (d, w, merged) = CountMinSketchFormat.deserialize(sk(a.union(b)))
    val (_, _, ca) = CountMinSketchFormat.deserialize(sk(a))
    val (_, _, cb) = CountMinSketchFormat.deserialize(sk(b))
    assert((d, w) == (3, 64))
    assert(merged.toSeq == ca.zip(cb).map { case (x, y) => x + y }.toSeq)
  }

  test("cms_join_size never underestimates and stays near the inner-product bound") {
    import spark.implicits._
    // A: keys k1..k1000 once each; B: k1..k200 three times each
    // true equi-join size = 200 * 1 * 3 = 600
    val a = spark.createDataset((1 to 1000).map(i => s"k$i")).toDF("k").repartition(8)
    val b = spark.createDataset(
      (1 to 200).flatMap(i => Seq.fill(3)(s"k$i"))).toDF("k").repartition(8)
    def sk(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(exprs.cms_sketch(col("k")).as("s")).collect()(0).getAs[Array[Byte]]("s")
    val est = CountMinSketchFormat.joinSize(sk(a), sk(b))
    // one-sided: never below truth; expected overshoot N_A*N_B/width ≈ 293
    assert(est >= 600L, s"join-size estimate $est underestimates true 600")
    assert(est <= 600L + 3L * 1000L * 600L / 2048L,
      s"join-size estimate $est far above true 600")
    // mismatched shapes refuse instead of returning garbage
    val small = a.agg(exprs.cms_sketch(col("k"), 3, 64).as("s"))
      .collect()(0).getAs[Array[Byte]]("s")
    intercept[IllegalArgumentException] {
      CountMinSketchFormat.joinSize(sk(a), small)
    }
    // SQL surface
    graft.GraftExtensions.register(spark)
    a.createOrReplaceTempView("cms_join_a"); b.createOrReplaceTempView("cms_join_b")
    val viaSql = spark.sql(
      """SELECT cms_join_size((SELECT cms_sketch(k) FROM cms_join_a),
        |                     (SELECT cms_sketch(k) FROM cms_join_b)) AS est""".stripMargin)
      .head().getLong(0)
    assert(viaSql === est)
  }

  test("cms_sketch and cms_estimate are callable from SQL, per group") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("a", "en"), ("a", "en"), ("b", "en"), ("a", "de"))
      .toDF("tok", "lang").createOrReplaceTempView("cms_toks")
    val rows = spark.sql(
      """SELECT lang, cms_estimate(cms_sketch(tok, 5, 256), 'a') AS est_a
        |FROM cms_toks GROUP BY lang ORDER BY lang""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("de", 1L), ("en", 2L)))
  }
}
