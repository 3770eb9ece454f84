package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 23: Spearman rank correlation (q201) and held-out AUC of the
  * distilled quality model (q202) — closed forms on synthetic rankers,
  * reconciliation on the corpus. */
class Wave23Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q201: monotone pairs give rho=1, reversed give -1, flat signals give NULL") {
    import spark.implicits._
    def sig(rows: Seq[(Long, Long)]): org.apache.spark.sql.DataFrame =
      rows.zipWithIndex.map { case ((x, y), i) => (i.toLong, "s", x, y) }
        .toDF("doc_id", "source", "x", "y")
    val mono = Correlation.spearman(sig(Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))))
    assert(mono.head().getDouble(2) == 1.0)
    val anti = Correlation.spearman(sig(Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L))))
    assert(anti.head().getDouble(2) == -1.0)
    val flat = Correlation.spearman(sig(Seq((5L, 10L), (5L, 20L), (5L, 30L))))
    assert(flat.head().isNullAt(2))
    // ties: x = (1,1,2), y = (1,2,3) — average-rank formula by hand:
    // rank_x = (1.5, 1.5, 3), rank_y = (1, 2, 3) => rho = 0.866025...
    val tied = Correlation.spearman(sig(Seq((1L, 1L), (1L, 2L), (2L, 3L))))
    assert(math.abs(tied.head().getDouble(2) - 0.866025) < 1e-6)
  }

  test("q204: Kendall tau-b closed forms — monotone 1, reversed -1, hand-computed ties") {
    import spark.implicits._
    def sig(rows: Seq[(Long, Long)]): org.apache.spark.sql.DataFrame =
      rows.zipWithIndex.map { case ((x, y), i) => (i.toLong, "s", x, y) }
        .toDF("doc_id", "source", "x", "y")
    assert(Correlation.kendallTau(
      sig(Seq((1L, 10L), (2L, 20L), (3L, 30L)))).head().getDouble(2) == 1.0)
    assert(Correlation.kendallTau(
      sig(Seq((1L, 30L), (2L, 20L), (3L, 10L)))).head().getDouble(2) == -1.0)
    // x=(1,1,2), y=(1,2,3): C=2, D=0, n0=3, n1=1, n2=0
    // => tau = 2/sqrt(2*3) = 0.816497
    val tied = Correlation.kendallTau(sig(Seq((1L, 1L), (1L, 2L), (2L, 3L))))
    assert(math.abs(tied.head().getDouble(2) - 0.816497) < 1e-6)
    // flat x still emits its row, NULL
    val flat = Correlation.kendallTau(sig(Seq((5L, 1L), (5L, 2L))))
    assert(flat.count() == 1 && flat.head().isNullAt(2))
    // corpus: same 20 sources as q201, tau bounded and sign-consistent
    // with Spearman where both are defined (they measure the same
    // monotone association)
    val tau = Correlation.q204KendallTau(spark, dir).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val rho = Correlation.q201Spearman(spark, dir).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(tau.size == 20)
    tau.foreach { case (src, t) =>
      t.foreach(v => assert(math.abs(v) <= 1.0 + 1e-9))
      (t, rho(src)) match {
        case (Some(tv), Some(rv)) if math.abs(tv) > 0.05 && math.abs(rv) > 0.05 =>
          assert(tv.sign == rv.sign, s"$src: tau $tv vs rho $rv")
        case _ => ()
      }
    }
  }

  test("q201 on the corpus: 20 sources, rho defined and bounded") {
    val out = Correlation.q201Spearman(spark, dir).collect()
    assert(out.length == 20)
    out.foreach { r =>
      if (!r.isNullAt(2)) assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
  }

  test("q202: the AUC kernel scores a perfect ranker 1, inverted 0, ties 0.5") {
    import spark.implicits._
    def auc(rows: Seq[(Double, Double)]): java.lang.Double = {
      val df = rows.zipWithIndex
        .map { case ((s, y), i) => ("g", s, y) }.toDF("source", "score", "y")
      val r = QualityModel.aucOver(df, col("source")).head()
      if (r.isNullAt(3)) null else Double.box(r.getDouble(3))
    }
    assert(auc(Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0))) == 1.0)
    assert(auc(Seq((0.1, 1.0), (0.2, 1.0), (0.8, 0.0), (0.9, 0.0))) == 0.0)
    assert(auc(Seq((0.5, 1.0), (0.5, 0.0))) == 0.5) // pure tie: half credit
    assert(auc(Seq((0.5, 1.0), (0.5, 1.0))) == null) // single class: NULL
  }

  test("q203: MMR demotes the near-duplicate a pure relevance order would keep") {
    import spark.implicits._
    // three docs hit the query; docs 1 and 2 are identical (identical
    // embeddings, cos = 1), doc 3 is relevant but orthogonal. Pure
    // relevance order: 1, 2, 3. MMR at lambda=0.7 must pick 1 then 3:
    // at step 2 doc 2's penalty is 0.3*1.0 while doc 3 pays ~0.
    val docs = Seq(
      (1L, "spark vector merge window spark vector merge window extra one"),
      (2L, "spark vector merge window spark vector merge window extra two"),
      (3L, "spark vector merge window filler filler filler filler filler filler filler"))
      .toDF("doc_id", "text")
    val e1 = Array.fill(8)(0.5f)
    val e3 = Array.tabulate(8)(i => if (i % 2 == 0) 0.5f else -0.5f)
    val emb = Seq((1L, e1.toSeq), (2L, e1.toSeq), (3L, e3.toSeq))
      .toDF("vec_id", "embedding")
    val out = Mmr.mmrRerank(docs, emb, Seq("spark", "vector", "merge", "window"),
      3, 2, 0.7).collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 1L, s"first pick ${out(0)}")
    assert(out(1).getLong(1) == 3L, s"diversity pick ${out(1)}")
    // ranks sequential; first pick's mmr = 0.7 * rel exactly
    assert(out(0).getLong(0) == 1L && out(1).getLong(0) == 2L)
    assert(math.abs(out(0).getDouble(3) - 0.7 * out(0).getDouble(2)) < 1e-6)
  }

  test("q203 on the corpus: 10 distinct candidates, rank-1 is the BM25 leader") {
    val out = Mmr.q203MmrRerank(spark, dir).collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(1)).distinct.length == 10)
    assert(out(0).getDouble(2) == 1.0) // max-normalized rel of the leader
    out.foreach(r => assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0))
  }

  test("q202 on the corpus: overall row reconciles the per-source eval universe") {
    val out = QualityModel.q202AucHoldout(spark, dir).collect()
    val overall = out.find(_.getString(0) == "__overall").get
    val perSource = out.filter(_.getString(0) != "__overall")
    assert(perSource.map(_.getLong(1)).sum == overall.getLong(1))
    assert(perSource.map(_.getLong(2)).sum == overall.getLong(2))
    val testDocs = graft.Tables.documents(spark, dir)
      .filter(Splits.of(col("doc_id")) === "test").count()
    assert(overall.getLong(1) + overall.getLong(2) == testDocs)
    // the distilled model must rank keeps above drops on held-out data
    // far better than chance — the point of shipping it
    assert(!overall.isNullAt(3) && overall.getDouble(3) > 0.7,
      s"held-out AUC ${overall.getDouble(3)}")
  }
}
