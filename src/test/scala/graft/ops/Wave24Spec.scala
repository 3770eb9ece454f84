package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 24: the oracle-gated 100 TB forms — mutual k-NN in IVF cells
  * (q205) and SemDeDup-in-cells over the grid quantizer (q206). The
  * gates prove hash-exact semantics; these specs prove the RELATION
  * between the approximate forms and their exact counterparts:
  *
  *  - q205 containment: an exact-mutual edge whose endpoints share a
  *    cell MUST survive in-cells — cell restriction only shrinks each
  *    src's candidate set, so every candidate's rank can only improve,
  *    and an edge in both endpoints' global top-k stays in both in-cell
  *    top-k. (Cross-cell edges are the accepted IVF miss; promotions —
  *    in-cell edges that aren't global — are the accepted fill-in.)
  *  - q206 subsetting: a within-cell similar pair is globally similar
  *    by the same integer test, so the in-cells decision can only be a
  *    weakening of q47's — every dropped vec_id is dropped by q47, with
  *    n_better ≤ q47's count and keeper_id ≥ q47's global-min keeper.
  */
class Wave24Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q205: in-cell edges are cell-co-resident and contain every co-resident exact edge") {
    val emb = graft.Tables.embeddings(spark, dir)
    // replay the assignment exactly as topKEdges builds it (same seed,
    // same iters, same integer argmin)
    val centroids = Clustering.trainCentroids(Par.widen(emb), 4, iters = 4)
    val cell = Clustering.assignByJoin(emb, centroids)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val inCells = KnnGraph.mutualKnnInCells(emb, k = 5, nCells = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = KnnGraph.q177MutualKnn(spark, dir, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inCells.nonEmpty)
    // 1) no cross-cell edge can exist
    inCells.foreach { case (a, b) =>
      assert(cell(a) == cell(b), s"edge ($a,$b) spans cells")
    }
    // 2) the containment invariant
    val coResident = exact.filter { case (a, b) => cell(a) == cell(b) }
    assert(coResident.nonEmpty, "degenerate fixture: no co-resident exact edges")
    assert(coResident.subsetOf(inCells),
      s"lost co-resident exact edges: ${(coResident -- inCells).take(5)}")
  }

  test("q205 declared query: shape, determinism, and the gate-pinned knobs") {
    val a = graft.ops.KnnGraph.q205MutualKnnCells(spark, dir, nCells = 4).collect()
    val b = graft.ops.KnnGraph.q205MutualKnnCells(spark, dir, nCells = 4).collect()
    assert(a.nonEmpty && a.sameElements(b), "q205 must be run-to-run deterministic")
    a.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 5L)
      assert(r.getLong(4) >= 1L && r.getLong(4) <= 5L)
      assert(r.getDouble(2) >= -1.0 - 1e-9 && r.getDouble(2) <= 1.0 + 1e-9)
    }
  }

  test("q207: planted long runs surface as exact spans; multibyte positions are code points") {
    import spark.implicits._
    val run = "the quick brown fox jumps over the lazy dog near the riverbank today" // 69 chars
    // boundaries differ IMMEDIATELY on both sides (no shared spaces), so
    // the maximal duplicated substring is exactly `run`
    val docs = Seq(
      (1L, s"AAA$run-BBB"),
      (2L, s"CCCCC$run+DDD"),
      // self-repeat inside one doc: both occurrences are duplicated windows
      (3L, s"$run..!..$run"),
      // no duplicate anywhere (same length, unique content)
      (4L, "entirely unique content that appears exactly once in this corpus and nowhere else at all ok"),
      // multibyte: é is 2 UTF-8 bytes but ONE code point — shared run with doc 6
      (5L, s"héllo wörld prefix $run"),
      (6L, s"zz héllo wörld prefix $run"))
      .toDF("doc_id", "text")
    val spans = ExactSubstring.exactSubstringSpans(docs, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val byDoc = spans.groupBy(_._1)
    // doc 4 has no duplicated window
    assert(!byDoc.contains(4L))
    // docs 1/2: exactly one span each, covering exactly the shared run
    assert(byDoc(1L).size == 1 && byDoc(2L).size == 1)
    // doc 1: run starts at pos 4 (1-indexed, after "AAA")
    val (_, s1, l1) = byDoc(1L).head
    assert(s1 == 4L && l1 == run.length.toLong, s"doc1 span ($s1, $l1)")
    // doc 3: both occurrences are duplicated; the gap between the last
    // duplicated start of the first run and the first of the second
    // exceeds 50, so they stay two SEPARATE spans, each exactly the run
    val secondStart = (run.length + 5 + 1).toLong // run + "..!.." + 1-indexed
    assert(byDoc(3L).map(t => (t._2, t._3)).toSet ==
      Set((1L, run.length.toLong), (secondStart, run.length.toLong)),
      s"doc3 spans ${byDoc(3L)}")
    // docs 5/6 share "héllo wörld prefix <run>" — doc 5's span starts at
    // pos 1 and covers the whole doc IN CODE POINTS (length() counts
    // code points; byte positions would overshoot by the 4 two-byte chars)
    val (_, s5, l5) = byDoc(5L).head
    assert(s5 == 1L && l5 == ("héllo wörld prefix " + run).length.toLong,
      s"doc5 span ($s5, $l5)")
  }

  test("substr_window_hashes kernel: window count, equal-content equality, short/null inputs") {
    import spark.implicits._
    val df = Seq(
      (1L, "abcdefghij"),          // 10 cps → 10-4+1 = 7 windows at L=4
      (2L, "XXabcdYY"),            // shares "abcd" with doc 1
      (3L, "abc"),                 // shorter than L → empty
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        graft.functions.exprs.substr_window_hashes(col("text"), 4).as("h"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(out(1L).size == 7)
    assert(out(3L).isEmpty)
    assert(out(4L) == null) // null in → null out (UnaryExpression default)
    // the "abcd" window hashes equal across docs: doc1 index 0, doc2 index 2
    assert(out(1L).head == out(2L)(2))
    // and rolling == direct: every window hash matches a fresh L-prefix hash
    val direct = df.filter(col("doc_id") === 1L)
      .select(posexplode(graft.functions.exprs.substr_window_hashes(
        expr("substring(text, 3, 4)"), 4)))
      .collect()
    assert(direct.length == 1 && direct(0).getLong(1) == out(1L)(2))
  }

  test("q206: the in-cells decision is a strict weakening of the exact q47 decision") {
    val exact = Quantize.q47SemanticDedup(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val inCells = Quantize.q206SemanticDedupCells(spark, dir, nCells = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(inCells.nonEmpty, "degenerate fixture: no in-cell drops")
    inCells.foreach { case (v, keeper, nBetter) =>
      assert(exact.contains(v), s"$v dropped in-cells but not by exact q47")
      val (gKeeper, gBetter) = exact(v)
      assert(nBetter <= gBetter, s"$v: in-cell n_better $nBetter > global $gBetter")
      assert(keeper >= gKeeper, s"$v: in-cell keeper $keeper < global min $gKeeper")
    }
  }
}
