package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 33: centroid dendrogram (q232), language pivot (q233). */
class Wave33Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q232: single-linkage merge sequence on a planted 1-D fixture") {
    // two tight pairs far apart: (0,1) at d=1, (10,11) at d=1, cross 81
    val cents = Array(Array(0L), Array(1L), Array(10L), Array(11L))
    val steps = Clustering.singleLinkageMerges(cents)
    assert(steps == Seq(
      (1L, 0L, 1L, 1L, 3L),   // tie at d=1 broken toward the smaller rep
      (2L, 2L, 3L, 1L, 2L),
      (3L, 0L, 2L, 81L, 1L)), steps.toString)
  }

  test("q232: corpus run — k-1 steps, non-decreasing cluster count, reps are mins") {
    val out = Clustering.q232CentroidDendrogram(spark, dir).collect()
    assert(out.length == 7)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i + 1 && r.getLong(4) == 7L - i)
      assert(r.getLong(1) < r.getLong(2)) // rep_a = least by construction
    }
  }

  test("q233: pivot columns reconcile with the long-form counts") {
    val wide = Relationalq233(spark).collect()
      .map(r => r.getString(0) -> r).toMap
    val docs = graft.Tables.documents(spark, dir)
      .select(col("source"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("nt"))
    val long = docs.groupBy(col("source"), col("lang"))
      .agg(sum(col("nt")).as("t")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = docs.groupBy(col("source")).agg(sum(col("nt"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val langs = graft.queries.Relational.PivotLangs
    wide.foreach { case (src, r) =>
      langs.zipWithIndex.foreach { case (l, i) =>
        assert(r.getLong(i + 1) == long.getOrElse((src, l), 0L), s"$src/$l")
      }
      assert(r.getLong(langs.size + 1) == totals(src), s"$src total")
    }
  }

  private def Relationalq233(s: org.apache.spark.sql.SparkSession) =
    graft.queries.Relational.q233LangPivot(s, dir)
}
