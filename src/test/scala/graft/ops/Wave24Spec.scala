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
