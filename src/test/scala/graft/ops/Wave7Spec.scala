package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral specs for the wave-7 operators: two-sided interval
  * overlap join (q111) — bucketed ≡ nested-loop, exactly-once pair
  * emission (the ownership rule), and an equi-join physical plan. */
class Wave7Spec extends SparkSpec {

  test("interval overlap: bucketed join equals nested loop, one row per pair, no BNLJ") {
    import spark.implicits._
    // spans 0–340s vs bucketWidth 100: intervals cover 1–5 buckets, so
    // the multi-bucket-co-occurrence dedup path is exercised hard
    val a = (1 to 400).map { i =>
      val s = (i * 37L) % 3000
      (i.toLong, s"k${i % 3}", s, s + 20 + (i % 17) * 20)
    }.toDF("aid", "key", "s", "e")
    val b = (1 to 400).map { i =>
      val s = (i * 53L) % 3000
      (i.toLong, s"k${i % 3}", s, s + 20 + (i % 13) * 20)
    }.toDF("bid", "key", "s", "e")

    val bucketed = RangeJoin.intervalOverlap(a, b, Seq("key"), "s", "e", 100L)
      .select("a_aid", "b_bid")
    val pairs = bucketed.collect().map(r => (r.getLong(0), r.getLong(1)))
    val naivePairs = a.as("l").join(b.as("r"),
        col("l.key") === col("r.key") &&
          col("l.s") <= col("r.e") && col("r.s") <= col("l.e"))
      .select(col("l.aid"), col("r.bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === naivePairs.toSet)
    assert(naivePairs.nonEmpty)
    // ownership rule: exactly once per overlapping pair, no distinct needed
    assert(pairs.length === pairs.toSet.size,
      s"duplicate pairs: ${pairs.length} rows vs ${pairs.toSet.size} distinct")
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("bloom filter: zero false negatives, FPP near theory, SQL surface") {
    import spark.implicits._
    val present = (1 to 20000).map(i => i.toLong * 7 + 3)
    val bf = BloomPrune.bloomOf(present.toDF("k"), "k").head().getAs[Array[Byte]](0)
    // 128 KiB for 2^20 bits + 8-byte header
    assert(bf.length === (1 << 20) / 8 + 8)
    // no false negatives — every inserted key probes true
    assert(present.forall(k => graft.functions.BloomFormat.mightContain(bf, k)))
    // false-positive rate on 20k known-absent keys near (1-e^(-nk/m))^k ≈ 0.04%
    val absent = (1 to 20000).map(i => -i.toLong * 13 - 1)
    val fpp = absent.count(k => graft.functions.BloomFormat.mightContain(bf, k)) / 20000.0
    assert(fpp < 0.005, s"fpp $fpp")
    // SQL registration round-trips
    graft.GraftExtensions.register(spark)
    present.toDF("k").createOrReplaceTempView("bloom_keys")
    val viaSql = spark.sql(
      """SELECT bloom_might_contain(b.bf, 10L), bloom_might_contain(b.bf, -14L)
        |FROM (SELECT bloom_agg(k) AS bf FROM bloom_keys) b""".stripMargin).head()
    assert(viaSql.getBoolean(0) && !viaSql.getBoolean(1))
  }

  test("bloom semi join: equals plain semi join, bloom prunes before the exchange") {
    import spark.implicits._
    val probe = (1 to 50000).map(i => (i.toLong, i % 100)).toDF("k", "payload")
    val build = (1 to 500).map(i => i.toLong * 97).toDF("bk")
    val pruned = BloomPrune.bloomSemiJoin(probe, "k", build, "bk")
    val plain = probe.join(build.withColumnRenamed("bk", "k"), Seq("k"), "left_semi")
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ===
      plain.collect().map(_.getLong(0)).sorted.toSeq)
    // the prefilter drops non-matching rows before the semi join:
    // of 50k probe rows only ~515 (matches + FPP) survive the bloom
    val bf = BloomPrune.bloomOf(build, "bk").head().getAs[Array[Byte]](0)
    val survivors = (1 to 50000).count(i =>
      graft.functions.BloomFormat.mightContain(bf, i.toLong))
    assert(survivors < 1000, s"bloom let $survivors of 50000 through")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan)
  }

  test("triangle counts: K4 plus pendant, orientation handles a hub without wedge explosion") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant 5 (0)
    // + hub 100 connected to 20 leaves (star: no triangles at all)
    val k4 = for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong)
    val star = (6 to 25).map(i => (100L, i.toLong))
    val edges = (k4 ++ Seq((4L, 5L)) ++ star).toDF("src", "dst")
    val nodes = ((1 to 5) ++ (6 to 25) ++ Seq(100)).map(_.toLong).toDF("id")
    val got = Graph.triangleCounts(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 3 && got(2L) === 3 && got(3L) === 3 && got(4L) === 3)
    assert(got(5L) === 0 && got(100L) === 0 && got(10L) === 0)
    // duplicate/reversed/self-loop edges don't change counts
    val dirty = edges.unionAll(Seq((2L, 1L), (1L, 1L), (3L, 1L)).toDF("src", "dst"))
    val got2 = Graph.triangleCounts(nodes, dirty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === got)
  }

  test("adjacent pairs: chunked heavy path equals plain window under a planted bot") {
    import spark.implicits._
    // bot user 1: 50k events; light users 2..20: 40 events each.
    // hotAt=1000 routes ONLY the bot through the chunked path.
    val bot = (1 to 50000).map(i => (1L, i.toLong * 10, i.toLong, s"t${i % 7}"))
    val light = for (u <- 2 to 20; i <- 1 to 40)
      yield (u.toLong, i.toLong * 1000, (u * 100 + i).toLong, s"t${(u + i) % 5}")
    val rows = (bot ++ light).toDF("user_id", "ts", "event_id", "v")
    val routed = SkewWindows.adjacentPairs(rows, "user_id", "ts", "event_id", "v",
      hotAt = 1000L, chunkTarget = 4096L)
    val plain = SkewWindows.adjacentPairs(rows, "user_id", "ts", "event_id", "v",
      hotAt = Long.MaxValue)
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("user_id", "cur", "nxt").count()
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(counts(routed) === counts(plain))
    // pair cardinality: n-1 per user
    assert(routed.count() === 50000 - 1 + 19 * (40 - 1))
  }

  test("frequent pairs: in-row generation equals self-join; mega-basket capped") {
    import spark.implicits._
    val rows = Seq(
      // baskets: {1,2,3} x3 -> pairs (1,2),(1,3),(2,3) support 3
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 2L), (12L, 3L), (12L, 3L), // dup item ignored
      // {1,2} once more -> (1,2) support 4
      (13L, 1L), (13L, 2L),
      // singleton basket contributes nothing
      (14L, 9L)).toDF("b", "i")
    val got = Baskets.frequentPairs(rows, "b", "i", minSupport = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((1L, 2L) -> 4L, (1L, 3L) -> 3L, (2L, 3L) -> 3L))
    // a basket over maxBasket vanishes entirely instead of exploding
    val mega = (1 to 50).map(i => (99L, i.toLong)).toDF("b", "i")
    val capped = Baskets.frequentPairs(rows.unionAll(mega), "b", "i",
      minSupport = 3L, maxBasket = 40)
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      === Map((1L, 2L) -> 4L, (1L, 3L) -> 3L, (2L, 3L) -> 3L))
  }

  test("scd2 lookup: versioned values resolve per entity, gap rows survive with NULL") {
    import spark.implicits._
    val facts = Seq(
      (1L, 100L, 5L),   // user 100, day 5  -> v0
      (2L, 100L, 15L),  // user 100, day 15 -> v1
      (3L, 100L, 11L),  // user 100, day 11 -> GAP: NULL attrs
      (4L, 200L, 5L),   // user 200, day 5  -> its own v0, not user 100's
      (5L, 300L, 5L)    // user 300: no dim rows at all -> NULL
    ).toDF("fact_id", "uid", "d")
    val dim = Seq(
      (100L, 0L, 9L, "a0"), (100L, 12L, 19L, "a1"),
      (200L, 0L, 9L, "b0")).toDF("uid", "lo", "hi", "attr")
    val got = RangeJoin.scd2Lookup(facts, "fact_id", "d", dim, "lo", "hi",
        bucketWidth = 10.0, keys = Seq("uid"))
      .collect().map(r => r.getLong(r.fieldIndex("fact_id")) ->
        Option(r.getAs[String]("attr"))).toMap
    assert(got === Map(1L -> Some("a0"), 2L -> Some("a1"), 3L -> None,
      4L -> Some("b0"), 5L -> None))
  }

  test("frequent pairs plans join-free: in-row pair generation, no self-join") {
    import spark.implicits._
    val rows = (1 to 2000).map(i => (i.toLong % 400, i.toLong % 37)).toDF("b", "i")
    val plan = Baskets.frequentPairs(rows, "b", "i", 2L)
      .queryExecution.executedPlan.toString
    // the item-basket relation is never self-joined: pairs explode from
    // each basket's sorted array in-row, so the physical plan has zero
    // join operators of any kind
    for (j <- Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                  "BroadcastNestedLoopJoin", "CartesianProduct"))
      assert(!plan.contains(j), s"unexpected $j in:\n$plan")
  }

  test("item cosine: hand-computed binary cosine, threshold gates") {
    import spark.implicits._
    // A in baskets {1,2,3,4}; B in {1,2}; A,B co-occur twice
    // cos(A,B) = 2/sqrt(4*2) = 0.707107; C rides basket 5 alone
    val rows = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "X"), (4L, "A"), (4L, "Y"), (5L, "C")).toDF("b", "i")
    val got = Baskets.itemCosine(rows, "b", "i", minSupport = 2L, minCos = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq === Seq(("A", "B", 2L, 4L, 2L, 0.707107)))
    // threshold above the pair's cosine -> empty
    assert(Baskets.itemCosine(rows, "b", "i", 2L, 0.8).count() === 0)
  }

  test("group centroids and centroid cosines: hand-computed 2-d fixture") {
    import spark.implicits._
    val emb = Seq(
      (0, Array(1f, 0f)), (0, Array(1f, 0f)),   // centroid (1, 0)
      (1, Array(0f, 2f)), (1, Array(0f, 0f)),   // centroid (0, 1)
      (2, Array(3f, 3f)), (2, Array(1f, 1f)))   // centroid (2, 2)
      .toDF("label", "embedding")
    val cents = Clustering.groupCentroids(emb, "label")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(cents === Map((0, 0) -> 1.0, (0, 1) -> 0.0, (1, 0) -> 0.0,
      (1, 1) -> 1.0, (2, 0) -> 2.0, (2, 1) -> 2.0))
    val cos = Clustering.centroidCosines(Clustering.groupCentroids(emb, "label"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // cos((1,0),(0,1)) = 0; cos((1,0),(2,2)) = cos((0,1),(2,2)) = 1/sqrt2
    assert(cos === Map((0, 1) -> 0.0, (0, 2) -> 0.707107, (1, 2) -> 0.707107))
  }

  test("property: prefix-filter join equals brute force on random set corpora (3 seeds)") {
    import spark.implicits._
    // the PPJoin length/positional bounds and the hashed dictionary must
    // not drop a single true pair at ANY threshold — random corpora with
    // planted overlap structure probe the boundary cases (α exactly
    // integral, equal-size sets, subset pairs) the fixture can't
    for (seed <- Seq(3, 11, 29); t <- Seq(0.5, 0.8)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (1 to 120).map(i => s"w$i")
      val docs = (1 to 80).map { id =>
        val base = rnd.shuffle(vocab).take(5 + rnd.nextInt(25)).toSet
        // every 4th doc clones the previous with a small tweak so high-
        // jaccard pairs actually exist
        (id.toLong, base)
      }
      val cloned = docs.zipWithIndex.map { case ((id, s), i) =>
        if (i % 4 == 3) (id, docs(i - 1)._2 + s"w${rnd.nextInt(120) + 1}")
        else (id, s)
      }
      val df = cloned.map { case (id, s) => (id, s.toSeq) }.toDF("id", "toks")
      val got = SetSimilarity.prefixFilterJoin(df, t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (i1, s1) <- cloned; (i2, s2) <- cloned if i1 < i2
        inter = (s1 & s2).size
        if inter.toDouble / (s1.size + s2.size - inter) >= t
      } yield (i1, i2)).toSet
      assert(got === want, s"seed=$seed t=$t")
      assert(want.nonEmpty, s"degenerate fixture: seed=$seed t=$t")
    }
  }

  test("ecdf: equals the percent_rank window under ties, constants, and skewed values") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    // heavy ties (quantized) + a long tail clustered in one range bucket
    val rows = (1 to 5000).map { i =>
      val s = if (i % 3 == 0) (i % 7).toDouble
              else if (i % 3 == 1) 100.0 + rnd.nextDouble() * 0.001
              else rnd.nextDouble() * 50
      (i.toLong, s)
    }.toDF("id", "s")
    val got = Selection.ecdf(rows, "id", "s")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"))
    val want = rows.withColumn("pct", round(percent_rank().over(w), 6))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got === want)
    // all-identical scores: every row pct 0 via one aggregated row
    val const = (1 to 100).map(i => (i.toLong, 5.0)).toDF("id", "s")
    val gotC = Selection.ecdf(const, "id", "s").collect().map(_.getDouble(2))
    assert(gotC.length === 100 && gotC.forall(_ === 0.0))
  }

  test("multi-block fuzzy: catches the mid-title tweak single-pass blocking misses") {
    import spark.implicits._
    val base = "the quick brown fox jumps over a lazy dog end pad pad"
    val titled = Seq(
      (1L, base.take(32)),
      // substitution at char 12 — inside q109's chars-9..16 block
      (2L, base.take(11) + "m" + base.slice(12, 32)),
      // substitution at char 1 — inside slice 0 only
      (3L, "x" + base.slice(1, 32)),
      // unrelated title: no pair with anything
      (4L, "completely different text here a")).toDF("doc_id", "title")
    // q109-style SINGLE block on chars 9..16 misses the (1,2) pair:
    // their block slices differ
    val single = Fuzzy.fuzzyPairs(
      titled.select(col("doc_id"), col("title")), maxDist = 2, maxBlock = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!single.contains((1L, 2L)),
      "fixture broken: single-pass was supposed to miss the mid-title tweak")
    // three positional passes find every ≤2-substitution pair exactly once
    val multi = Fuzzy.multiBlockPairs(titled, maxDist = 2, maxBlock = 64L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(multi.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(multi((1L, 2L)) === 1L && multi((1L, 3L)) === 1L && multi((2L, 3L)) === 2L)
  }

  test("interval overlap: touching endpoints overlap (closed intervals), disjoint don't pair") {
    import spark.implicits._
    val a = Seq((1L, "k", 0L, 100L), (2L, "k", 500L, 600L)).toDF("aid", "key", "s", "e")
    val b = Seq((10L, "k", 100L, 150L), (11L, "k", 300L, 499L)).toDF("bid", "key", "s", "e")
    val got = RangeJoin.intervalOverlap(a, b, Seq("key"), "s", "e", 50L)
      .select("a_aid", "b_bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
  }
}
