package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral specs for the wave-3 training-data operators (q77–q80):
  * planted fixtures with hand-computable expectations, plus the
  * partition-invariance checks that guard the distributed formulations. */
class Wave3Spec extends SparkSpec {

  test("DSIR: target-like raw docs outrank dissimilar ones; invariant to partitioning") {
    import spark.implicits._
    // target slice speaks "alpha beta"; rawLike mimics it, rawUnlike doesn't
    val target = (1L to 8L).map(i => (i, "alpha beta alpha beta alpha", "tgt"))
    val rawLike = (101L to 104L).map(i => (i, "alpha beta alpha beta gamma", "raw"))
    val rawUnlike = (201L to 204L).map(i => (i, "zeta eta theta iota kappa", "raw"))
    val docs = (target ++ rawLike ++ rawUnlike).toDF("doc_id", "text", "source")
    val out = Importance.dsirTopK(spark, docs, col("source") === "tgt", 8).collect()
    assert(out.length === 8)
    val rank = out.map(_.getLong(0)).toList
    // every target-like doc scores above every dissimilar doc
    assert(rank.take(4).toSet === Set(101L, 102L, 103L, 104L))
    assert(out.take(4).map(_.getDouble(3)).forall(w =>
      w > out.drop(4).map(_.getDouble(3)).max))
    // identical docs share one weight; ties broken by doc_id ascending
    assert(out.take(4).map(_.getDouble(3)).distinct.length === 1)
    assert(rank.take(4) === List(101L, 102L, 103L, 104L))
    // n_feats = unigrams + bigrams = 5 + 4
    assert(out.head.getLong(2) === 9L)
    // distributed formulation: result independent of input partitioning
    val re = Importance.dsirTopK(spark, docs.repartition(7), col("source") === "tgt", 8)
      .collect()
    assert(re.map(r => (r.getLong(0), r.getDouble(3))).toList ===
      out.map(r => (r.getLong(0), r.getDouble(3))).toList)
  }

  test("DSIR: weights move with the model — a doc gains weight when the target adopts its terms") {
    import spark.implicits._
    val probe = Seq((500L, "nu xi omicron", "raw"))
    val base = Seq((1L, "alpha beta gamma", "tgt"), (2L, "delta epsilon", "raw"))
    val before = Importance.dsirTopK(spark, (base ++ probe).toDF("doc_id", "text", "source"),
        col("source") === "tgt", 10)
      .filter(col("doc_id") === 500L).head().getDouble(3)
    val adopted = Seq((1L, "nu xi omicron nu xi", "tgt"), (2L, "delta epsilon", "raw"))
    val after = Importance.dsirTopK(spark, (adopted ++ probe).toDF("doc_id", "text", "source"),
        col("source") === "tgt", 10)
      .filter(col("doc_id") === 500L).head().getDouble(3)
    assert(after > before)
  }

  test("temporal drift: a pool-identical day scores zero KL, a skewed day scores positive") {
    import spark.implicits._
    val day0 = 86400000000000L
    // day 1 and day 2: identical 2:1 click/view mix -> pool equals both -> KL 0
    // day 3: all "purchase" (a type the pool barely has) -> large KL
    val ev =
      (Seq.fill(20)("click") ++ Seq.fill(10)("view")).map(t => (1L * day0 + 1L, t)) ++
      (Seq.fill(20)("click") ++ Seq.fill(10)("view")).map(t => (2L * day0 + 1L, t)) ++
      Seq.fill(30)("purchase").map(t => (3L * day0 + 1L, t))
    val out = Mixing.temporalDrift(ev.toDF("ts", "event_type")).collect()
    assert(out.map(_.getLong(0)).toList === List(1L, 2L, 3L))
    val kl = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // days 1/2 diverge from the pool only because day 3's purchases
    // dilute it: KL = ln(3/2) exactly. Day 3 puts all mass on the
    // pool's rarest type: KL = ln(3). Both closed forms, both rounded
    // to the engine's 12-digit grid.
    assert(kl(1L) === kl(2L))
    assert(kl(1L) === BigDecimal(math.log(1.5)).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(kl(3L) === BigDecimal(math.log(3.0)).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(kl(3L) > kl(1L) * 2)
    val nEvents = out.map(_.getLong(1)).toList
    assert(nEvents === List(30L, 30L, 30L))
    // two identically-distributed days and nothing else: every day IS
    // the pool, so drift is exactly zero
    val flat = (Seq.fill(6)("a") ++ Seq.fill(3)("b")).flatMap(t =>
      Seq((1L * day0, t), (2L * day0, t)))
    val zero = Mixing.temporalDrift(flat.toDF("ts", "event_type")).collect()
    assert(zero.forall(_.getDouble(3) === 0.0))
  }

  test("length buckets: exact integer padding arithmetic, batch-of-8 round-up") {
    import spark.implicits._
    // 9 docs of 10 tokens (bucket 0, cap 64) and 3 docs of 100 tokens
    // (bucket 1, cap 128); empty doc lands in bucket 0
    val short = (1L to 9L).map(i => (i, Seq.fill(10)("w").mkString(" ")))
    val long = (11L to 13L).map(i => (i, Seq.fill(100)("w").mkString(" ")))
    val empty = Seq((20L, ""))
    val out = TextAnalysis.lengthBuckets(
        (short ++ long ++ empty).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.length === 2)
    // bucket 0: 10 docs (9 short + empty) -> ceil(10/8)*8 = 16 slots * 64
    assert(out(0) === ((0L, 64L, 10L, 90L, 16L * 64L, 90.0 / 1024.0)))
    // bucket 1: 3 docs of 100 -> ceil(3/8)*8 = 8 slots * 128
    assert(out(1) === ((1L, 128L, 3L, 300L, 8L * 128L, 300.0 / 1024.0)))
  }

  test("canonical docs: largest member wins its cluster, singletons keep themselves") {
    import spark.implicits._
    val core = (1 to 40).map(i => s"tok$i").mkString(" ")
    // 3-doc near-dup cluster: 30 is longest and must win despite the
    // highest id; 10/20 map onto it. 99 is unrelated (singleton).
    val docs = Seq(
      (10L, core, core.length.toLong),
      (20L, core + " tail20", (core + " tail20").length.toLong),
      (30L, core + " tail30 tail31 tail32", (core + " tail30 tail31 tail32").length.toLong),
      (99L, (1 to 40).map(i => s"other$i").mkString(" "), 400L)
    ).toDF("doc_id", "text", "n_chars")
    val out = Dedup.canonicalDocs(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(10L) === ((30L, 3L, false)))
    assert(out(20L) === ((30L, 3L, false)))
    assert(out(30L) === ((30L, 3L, true)))
    assert(out(99L) === ((99L, 1L, true)))
    // exactly one keeper per cluster
    val keepers = Dedup.canonicalDocs(docs).filter(col("keep")).collect()
    assert(keepers.map(_.getLong(1)).distinct.length === keepers.length)
  }

  test("canonical docs: n_chars ties break to the smallest doc_id") {
    import spark.implicits._
    val core = (1 to 40).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (7L, core, 1000L), (3L, core, 1000L), (5L, core, 999L)
    ).toDF("doc_id", "text", "n_chars")
    val out = Dedup.canonicalDocs(docs).collect()
    assert(out.forall(_.getLong(2) === 3L))
  }

  test("q95 water-filling: saturation, re-spread, degenerate budgets, weighted targets") {
    import spark.implicits._
    def alloc(rows: Seq[(String, Long, Long)], budget: Long): Map[String, (Boolean, Double)] =
      Mixing.mixtureAllocation(rows.toDF("lang", "a", "w"), budget).collect()
        .map(r => r.getString(0) -> (r.getBoolean(3), r.getDouble(4))).toMap

    // small group saturates, freed budget re-spreads onto the big one
    val m1 = alloc(Seq(("s", 10L, 1L), ("b", 100L, 1L)), 60L)
    assert(m1 == Map("s" -> (true, 10.0), "b" -> (false, 50.0)), s"$m1")
    // budget covers everything -> all saturated at availability
    val m2 = alloc(Seq(("s", 10L, 1L), ("b", 100L, 1L)), 200L)
    assert(m2 == Map("s" -> (true, 10.0), "b" -> (true, 100.0)), s"$m2")
    // nobody saturates -> plain proportional split (the m = 0 candidate)
    val m3 = alloc(Seq(("s", 10L, 1L), ("b", 100L, 1L)), 16L)
    assert(m3 == Map("s" -> (false, 8.0), "b" -> (false, 8.0)), s"$m3")
    // integer target weights shift both the order and the spread
    val m4 = alloc(Seq(("s", 10L, 3L), ("b", 100L, 1L)), 40L)
    assert(m4 == Map("s" -> (true, 10.0), "b" -> (false, 30.0)), s"$m4")
    // conservation: when the budget is binding, allocations sum to it
    assert(m1.values.map(_._2).sum == 60.0 && m3.values.map(_._2).sum == 16.0
      && m4.values.map(_._2).sum == 40.0)
  }
}
