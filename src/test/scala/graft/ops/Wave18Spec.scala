package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 18: path surprisal (q180), hubness (q181), cluster entropy
  * (q182), temperature mix (q183), mutual-kNN clusters (q184), release
  * card (q185) — hand-computed fixtures where the math is closed-form,
  * structural invariants + reconciliation elsewhere. */
class Wave18Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q180 surprisal math on a hand-built two-user fixture") {
    import spark.implicits._
    // corpus transitions: a→b ×3, a→c ×1  ⇒ p(b|a)=0.75, p(c|a)=0.25.
    // u1 walks a,b,a,b,a,b (transitions a→b, b→a, a→b, b→a, a→b);
    // u2 walks a,c (one a→c). b→a occurs twice ⇒ p(a|b)=1.
    val ev = Seq(
      (1L, 10L, 1L, "a"), (2L, 20L, 1L, "b"), (3L, 30L, 1L, "a"),
      (4L, 40L, 1L, "b"), (5L, 50L, 1L, "a"), (6L, 60L, 1L, "b"),
      (7L, 10L, 2L, "a"), (8L, 20L, 2L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val pairs = SkewWindows.adjacentPairs(ev, "user_id", "ts", "event_id", "event_type")
      .localCheckpoint()
    // replicate q180's scoring over the fixture through the same ops
    val counts = pairs.groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("cur")).agg(sum(col("n")).as("tot"))
    val model = counts.join(broadcast(totals), Seq("cur"))
      .select(col("cur"), col("nxt"),
        round(-log(col("n").cast("double") / col("tot").cast("double")), 12)
          .cast("decimal(28,12)").as("surprisal"))
    val got = pairs.join(broadcast(model), Seq("cur", "nxt"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("nt"), sum(col("surprisal")).as("ss"))
      .select(col("user_id"), col("nt"),
        round(col("ss").cast("double") / col("nt").cast("double"), 12).as("avg"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sAB = r12(-math.log(3.0 / 4.0)); val sBA = r12(-math.log(1.0))
    val sAC = r12(-math.log(1.0 / 4.0))
    assert(got(1L)._1 == 5L)
    assert(math.abs(got(1L)._2 - r12((3 * sAB + 2 * sBA) / 5.0)) < 1e-11,
      s"u1 surprisal ${got(1L)._2}")
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2 - sAC) < 1e-11,
      s"u2 ${got(2L)} != $sAC")
  }

  test("q181: in-degrees sum to the directed edge count (k per valid vector)") {
    val out = KnnGraph.q181KnnHubness(spark, dir).collect()
    val n = out.length
    assert(n == graft.Tables.embeddings(spark, dir).count())
    val sumIn = out.map(_.getLong(1)).sum
    // every non-degenerate vector emits exactly k=5 out-edges
    assert(sumIn == 5L * n, s"in-degree mass $sumIn != ${5L * n}")
    out.foreach(r => assert(r.getBoolean(2) == (r.getLong(1) >= 10L)))
  }

  test("q182: entropies bounded by ln k, normalized by 1; doc counts reconcile") {
    val out = Clustering.q182SourceClusterEntropy(spark, dir).collect()
    assert(out.nonEmpty)
    val lnK = math.log(8.0)
    out.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= lnK + 1e-9, s"$r")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0 + 1e-9, s"$r")
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 8L)
    }
    // every embedding with a matching doc row is counted exactly once
    val matched = graft.Tables.embeddings(spark, dir).select(col("vec_id"))
      .join(graft.Tables.documents(spark, dir)
        .select(col("doc_id").as("vec_id")), Seq("vec_id")).count()
    assert(out.map(_.getLong(1)).sum == matched)
  }

  test("q183: weights normalize per alpha; alpha=1 is natural sampling; tail boosts") {
    val out = Mixing.q183TemperatureMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    out.groupBy(_._2).foreach { case (alpha, rows) =>
      val qSum = rows.map(_._4).sum
      assert(math.abs(qSum - 1.0) < 1e-9, s"alpha=$alpha weights sum to $qSum")
    }
    out.filter(_._2 == 1.0).foreach { case (src, _, p, q, boost) =>
      assert(math.abs(q - p) < 1e-9, s"$src: alpha=1 weight $q != share $p")
      assert(math.abs(boost - 1.0) < 1e-9)
    }
    // at alpha=0.5 the SMALLEST source must be boosted above natural
    val half = out.filter(_._2 == 0.5)
    val smallest = half.minBy(_._3)
    assert(smallest._5 > 1.0, s"tail source not upsampled: $smallest")
  }

  test("q184: components are consistent with the mutual edge set") {
    val comp = KnnGraph.q184MutualKnnClusters(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    comp.foreach { case (id, (c, size, canon)) =>
      assert(canon == (id == c))
      assert(size >= 1L)
    }
    // every qualifying mutual edge joins its endpoints' components
    val edges = KnnGraph.q177MutualKnn(spark, dir)
      .filter(col("cos") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty, "degenerate fixture: no edges above the cut")
    edges.foreach { case (a, b) =>
      assert(comp(a)._1 == comp(b)._1, s"edge ($a,$b) spans components")
    }
    // cluster sizes count their members
    val bySize = comp.values.groupBy(_._1).map { case (c, ms) => c -> ms.size }
    comp.foreach { case (_, (c, size, _)) => assert(bySize(c) == size) }
  }

  test("q186 KS math on a planted two-source fixture") {
    import spark.implicits._
    // A = {1,1,2}, B(=A's rest) = {2,3,3,3}:
    //   F_A:  1→2/3, 2→1,    3→1
    //   F_B:  1→0,   2→1/4,  3→1
    // gaps 2/3, 3/4, 0 ⇒ D = 0.75 at v = 2. B vs rest(=A) is symmetric.
    val vals = Seq(("a", 1L), ("a", 1L), ("a", 2L),
        ("b", 2L), ("b", 3L), ("b", 3L), ("b", 3L))
      .toDF("source", "v")
    val got = Drift.ksDrift(vals).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got("a") == ((3L, 4L, 0.75, 2L)), s"a: ${got("a")}")
    assert(got("b") == ((4L, 3L, 0.75, 2L)), s"b: ${got("b")}")
    // real corpus: D bounded in [0, 1]
    Drift.q186KsDrift(spark, dir).collect().foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"$r")
    }
  }

  test("q187 rank-sum AUC on the planted fixture; complements sum to 1") {
    import spark.implicits._
    // A = {1,1,2} vs rest B = {2,3,3,3}: wins 0, one tie (2 vs 2) ⇒
    // U_A = 0.5, AUC_A = 0.5/12 = 1/24; B is the exact complement.
    val vals = Seq(("a", 1L), ("a", 1L), ("a", 2L),
        ("b", 2L), ("b", 3L), ("b", 3L), ("b", 3L))
      .toDF("source", "v")
    val got = Drift.rankSumEffect(vals).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("a")._1 == 3L && got("a")._2 == 4L)
    assert(math.abs(got("a")._3 - r12(1.0 / 24)) < 1e-12, s"${got("a")}")
    assert(math.abs(got("b")._3 - r12(23.0 / 24)) < 1e-12, s"${got("b")}")
    assert(math.abs(got("a")._4 - r12(2 * r12(1.0 / 24) - 1)) < 1e-12)
    // two-source corpora: AUCs are exact complements
    assert(math.abs(got("a")._3 + got("b")._3 - 1.0) < 1e-12)
    // real corpus: AUC bounded in [0, 1]
    Drift.q187RankSumEffect(spark, dir).collect().foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"$r")
    }
  }

  test("q185: release card reconciles with the corpus and the derivation rates") {
    val out = SnapshotDiff.q185ReleaseCard(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val docs = graft.Tables.documents(spark, dir)
    val nDocs = docs.count()
    val corpusTokens = docs
      .agg(sum(TextAnalysis.tokenCount(col("text")))).head().getLong(0)
    // old-side mass: every original doc appears in exactly one status row
    val oldDocs = out.filter(_._2 != "added").map(_._3).sum
    assert(oldDocs == nDocs, s"old-side docs $oldDocs != $nDocs")
    assert(out.filter(_._2 != "added").map(_._4).sum == corpusTokens)
    // derivation rates: removed = every 11th, added = every 13th
    assert(out.filter(_._2 == "removed").map(_._3).sum ==
      docs.filter(pmod(col("doc_id"), lit(11)) === 0).count())
    assert(out.filter(_._2 == "added").map(_._3).sum ==
      docs.filter(pmod(col("doc_id"), lit(13)) === 0).count())
    // added rows carry no old tokens; removed rows no new tokens
    out.filter(_._2 == "added").foreach(r => assert(r._4 == 0L))
    out.filter(_._2 == "removed").foreach(r => assert(r._5 == 0L))
  }
}
