package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 17: distinctive terms (q175), IR metrics (q176), mutual k-NN
  * (q177), label propagation (q178), truncation recall (q179) —
  * hand-computed fixtures for the metric math, invariants + recompute
  * parity for the graph/vector ops. */
class Wave17Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q175: ranks are 1..5 per source, z-ordered, and counts reconcile") {
    val out = Distinctive.q175DistinctiveTerms(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4), r.getLong(5)))
    val bySource = out.groupBy(_._1)
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to 5L),
        s"$src ranks ${rows.map(_._2).mkString(",")}")
      val zs = rows.sortBy(_._2).map(_._4)
      assert(zs.zip(zs.tail).forall { case (a, b) => a >= b },
        s"$src z not descending: ${zs.mkString(",")}")
    }
    // a kept term's y_source + y_rest must equal its corpus total —
    // recomputed independently from the raw tokens
    val totals = graft.Tables.documents(spark, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("y"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (_, _, term, _, ys, yr) =>
      assert(ys + yr == totals(term), s"$term: $ys + $yr != ${totals(term)}")
    }
  }

  test("q176 metric math on a hand-computed fixture") {
    import spark.implicits._
    // 6 docs, query {a, b} (m = 2). Gains: d1=2, d2=2, d3=1, d4=1,
    // d5=1, d6=0 (no hit — excluded everywhere).
    val docs = Seq(
      (1L, "a b x x"),   // full match
      (2L, "a a b y"),   // full match, higher tf on a
      (3L, "a z z z"),
      (4L, "b z z z"),
      (5L, "a q q q"),
      (6L, "q w e r")).toDF("doc_id", "text")
    val got = IrMetrics.metricsFor(docs, 7, Seq("a", "b"), 3).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_rel") == 2L)
    // top-3 by BM25: both full matches rank above single-hit docs
    // (two matched terms' idf parts vs one), so MRR = 1/1 = 1.0 and
    // P@3 = 2/3
    assert(math.abs(r.getAs[Double]("mrr") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("p_at_3") - 0.666666666667) < 1e-9)
    // nDCG@3: gains of the ideal top-3 are (2,2,1); the ranking's
    // top-3 gains are (2,2,1) in some order — DCG equals IDCG iff the
    // ranking puts the two full matches first, which BM25 does here
    assert(math.abs(r.getAs[Double]("ndcg_at_3") - 1.0) < 1e-12)
  }

  test("q177: mutual edges are exactly the reciprocal top-k pairs (window recompute)") {
    val got = KnnGraph.q177MutualKnn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent recompute: decimal-free float ranking would drift —
    // use the same rounded-decimal cosine via a window formulation
    val emb = graft.Tables.embeddings(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    def decDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) =>
          (p.cast("double") * q.cast("double")).cast("decimal(28,18)")),
        lit(java.math.BigDecimal.ZERO).cast("decimal(28,18)"),
        (acc, e) => (acc + e).cast("decimal(28,18)"))
    val scored = emb.as("a").join(emb.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        round(decDot(col("a.embedding"), col("b.embedding")).cast("double") /
          (sqrt(decDot(col("a.embedding"), col("a.embedding")).cast("double")) *
           sqrt(decDot(col("b.embedding"), col("b.embedding")).cast("double"))), 12)
          .as("cos"))
      .filter(!isnan(col("cos")))
    val top = scored.withColumn("r", row_number().over(w)).filter(col("r") <= 5)
      .select(col("src"), col("dst"))
    val expected = top.as("f").join(top.as("r"),
        col("f.src") === col("r.dst") && col("f.dst") === col("r.src") &&
          col("f.src") < col("f.dst"))
      .select(col("f.src"), col("f.dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
    assert(got.nonEmpty, "degenerate fixture: no mutual neighbors at k=5")
  }

  test("q178: labels stay in-block; hand-built two-community graph resolves") {
    import spark.implicits._
    val out = Graph.q178LabelPropagation(spark, dir).collect()
    out.foreach { r =>
      assert(r.getLong(0) / 25 == r.getLong(1) / 25,
        s"doc ${r.getLong(0)} labeled outside its block: ${r.getLong(1)}")
    }
    // two 4-cliques joined by one bridge edge: propagation must give
    // each clique one label and not merge them in 3 rounds (the bridge
    // carries one vote, the cliques three)
    val nodes = (1L to 8L).toDF("id")
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L),
      (4L, 5L)).toDF("src", "dst")
    val labels = Graph.labelPropagation(nodes, edges, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val c1 = (1L to 4L).map(labels)
    val c2 = (5L to 8L).map(labels)
    assert(c1.toSet.size == 1 && c2.toSet.size == 1,
      s"cliques did not converge: $labels")
    assert(c1.head != c2.head, s"bridge merged the cliques: $labels")
  }

  test("q179: no-op truncation (dims=64) has perfect recall; real truncation is in [0,1]") {
    val noop = KnnGraph.q179TruncationRecall(spark, dir, dims = 64).collect()
    assert(noop.length == 8)
    noop.foreach(r => assert(r.getDouble(2) == 1.0,
      s"full-width 'truncation' lost recall: $r"))
    val real = KnnGraph.q179TruncationRecall(spark, dir).collect()
    assert(real.length == 8)
    real.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 10 &&
        r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0, s"out of range: $r")
    }
  }
}
