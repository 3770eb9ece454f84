package graft.ops

import graft.SparkSpec

/** Wave 42: rendezvous shard rebalance (q262). */
class Wave42Spec extends SparkSpec {

  test("q262: minimal disruption — every moved doc lands on the NEW shard") {
    val out = Sharding.q262RendezvousRebalance(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val total = out.map(_.getLong(2)).sum
    val moved = out.filter(_.getBoolean(3))
    // the rendezvous guarantee: old-shard weights are unchanged, so a
    // move can only be won by the newly added shard
    moved.foreach(r => assert(r.getLong(1) == 16L, r.toString))
    val frac = moved.map(_.getLong(2)).sum.toDouble / total
    assert(frac > 0.0 && frac < 0.15, s"moved frac $frac") // ≈ 1/17
    // stayers occupy the diagonal
    out.filterNot(_.getBoolean(3))
      .foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }
}
