package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 29: the DecDot codegen kernel — bit parity with BOTH HOF
  * recipes it replaced (the scale-18 raw-product chain and the
  * scale-12 pre-rounded chain), null/mismatch contracts, and the
  * affected queries' stability. */
class Wave29Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dec_dot(·,·,18) is bit-identical to the raw-product HOF chain") {
    val emb = graft.Tables.embeddings(spark, dir)
      .filter(size(col("embedding")) > 0).limit(200)
    val pairs = emb.as("a").crossJoin(
      emb.selectExpr("vec_id AS v2", "embedding AS e2").as("b"))
      .filter(col("vec_id") < col("v2")).limit(2000)
    val hof = aggregate(
      zip_with(col("embedding"), col("e2"),
        (p, q) => (p.cast("double") * q.cast("double")).cast("decimal(28,18)")),
      lit(java.math.BigDecimal.ZERO).cast("decimal(28,18)"),
      (acc, e) => (acc + e).cast("decimal(28,18)"))
    val both = pairs.select(
      hof.as("h"),
      graft.functions.exprs.dec_dot(col("embedding"), col("e2"), 18).as("k"))
    assert(both.filter(col("h") =!= col("k") ||
      col("h").isNull =!= col("k").isNull).count() == 0L)
    assert(both.count() > 0L)
  }

  test("dec_dot(·,·,12) is bit-identical to the pre-rounded HOF chain (double literal side)") {
    import spark.implicits._
    val v = Array.tabulate(64)(d =>
      BigDecimal(1.0 / math.sqrt(64.0) + d * 1e-3)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val vLit = typedlit(v.toSeq)
    val emb = graft.Tables.embeddings(spark, dir)
      .filter(size(col("embedding")) === 64)
    val hof = aggregate(
      zip_with(col("embedding"), vLit,
        (x, vd) => round(x.cast("double") * vd, 12).cast("decimal(28,12)")),
      lit(java.math.BigDecimal.ZERO).cast("decimal(28,12)"),
      (acc, e) => (acc + e).cast("decimal(28,12)"))
    val both = emb.select(hof.as("h"),
      graft.functions.exprs.dec_dot(col("embedding"), vLit, 12).as("k"))
    assert(both.filter(col("h") =!= col("k")).count() == 0L)
    assert(both.count() > 0L)
  }

  test("int_sqdist is bit-identical to the coalesced HOF chain incl. padding/null rules") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1L, 2L, 3L), Seq(1L, 5L, 1L)),   // 0+9+4 = 13
      (2L, Seq(1L, 2L), Seq(1L, 2L, 9L)),       // padding → 0 beyond min
      (3L, Seq[Long](), Seq(7L)))               // all padding → 0
      .toDF("id", "x", "y")
    val hof = coalesce(aggregate(
      zip_with(col("x"), col("y"),
        (a, b) => coalesce((a - b) * (a - b), lit(0L))),
      lit(0L), (acc, e) => acc + e), lit(0L))
    val both = df.select(col("id"), hof.as("h"),
        coalesce(graft.functions.exprs.int_sqdist(col("x"), col("y")), lit(0L))
          .as("k"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    both.foreach { case (h, k) => assert(h == k, s"$h vs $k") }
    // and on the real snapped grid: assignment is unchanged end-to-end
    val emb = graft.Tables.embeddings(spark, dir)
    val centroids = Clustering.trainCentroids(emb, 4, iters = 4)
    val viaKernel = Clustering.assign(emb, centroids)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val snapped = emb.select(col("vec_id"), Clustering.snapped(col("embedding")).as("qx"))
    val viaHof = snapped.select(col("vec_id"),
        array_min(array(centroids.zipWithIndex.map { case (qc, cid) =>
          struct(coalesce(aggregate(
            zip_with(col("qx"), typedlit(qc.toSeq),
              (a, b) => coalesce((a - b) * (a - b), lit(0L))),
            lit(0L), (acc, e) => acc + e), lit(0L)).as("d"),
            lit(cid).as("cluster"))
        }: _*)).as("best"))
      .select(col("vec_id"), col("best.cluster"), col("best.d"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaKernel == viaHof)
  }

  test("dec_dot null contract: mismatched lengths and null elements → null (the zip_with contract)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),       // 1*3+2*4 = 11
      (2L, Seq(1.0f, 2.0f), Seq(3.0f)),             // length mismatch
      (3L, Seq[Float](), Seq[Float]()))             // empty → exact 0
      .toDF("id", "x", "y")
    val got = df.select(col("id"),
        graft.functions.exprs.dec_dot(col("x"), col("y"), 18).as("d"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDecimal(1))).toMap
    assert(got(1L) != null && got(1L).doubleValue() == 11.0)
    assert(got(2L) == null)
    assert(got(3L) != null && got(3L).doubleValue() == 0.0)
  }
}
