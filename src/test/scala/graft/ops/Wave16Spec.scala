package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral specs for wave 16: positional phrase search (q160) and
  * interpolated Kneser-Ney bigram scoring (q161) — planted fixtures
  * where every count is checkable on paper. */
class Wave16Spec extends SparkSpec {

  test("phrase search: adjacency counts, overlap semantics, top-doc tie-break") {
    import spark.implicits._
    // "a a" occurs per starting position: doc 0 has "a a a" → 2
    // overlapping matches; doc 1 has one; doc 2 has the words but never
    // adjacent. "b c" appears once each in docs 1 and 2 (tie → doc 1).
    val docs = Seq(
      (0L, "a a a x"),
      (1L, "a a b c"),
      (2L, "a x a b c")).toDF("doc_id", "text")
    val rows = Phrase.phraseSearch(docs, nPhrases = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // corpus bigram counts: "a a"=3 (2+1+0), "b c"=2, "a b"=2, "a x"=2,
    // "x a"=1, "c a"? no. top-2 by (cnt desc, w1, w2): "a a"(3), then
    // ties at 2: "a b" < "a x" < "b c" lexicographically → "a b"
    assert(rows.keySet == Set("a a", "a b"))
    assert(rows("a a") == ((2L, 3L, 0L, 2L)),
      s"a a: 2 docs, 3 occurrences (overlaps count), top doc 0 with 2: ${rows("a a")}")
    assert(rows("a b") == ((2L, 2L, 1L, 1L)),
      "a b: docs 1 and 2 once each; occurrence tie → smaller doc_id")
  }

  test("phrase search: workload selection is deterministic under count ties") {
    import spark.implicits._
    val docs = Seq((0L, "z y z y"), (1L, "y z y z")).toDF("doc_id", "text")
    // "z y" = 2 (doc0 pos1, doc1 pos2), "y z" = 2 (doc0 pos2, doc1
    // pos1+3 = 2) — counts: doc0: zy@1, yz@2, zy@3 → zy 2, yz 1;
    // doc1: yz@1, zy@2, yz@3 → yz 2, zy 1. Both total 3: tie broken
    // by (w1, w2) → "y z" first
    val one = Phrase.phraseSearch(docs, nPhrases = 1).collect()
    assert(one.length == 1 && one(0).getString(0) == "y z")
  }

  test("kn: seen bigram discounts, unseen transition backs off, unseen context = pcont") {
    import spark.implicits._
    // train: "a b a b a c" → bigrams ab,ba,ab,ba? No: a b, b a, a b,
    // b a, a c → c(a,b)=2 c(b,a)=2 c(a,c)=1; c1(a)=3 c1(b)=2;
    // n1fw(a)=2 n1fw(b)=1; n1pr(b)=1 n1pr(a)=1 n1pr(c)=1; B=3; V=3
    val train = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    // heldout: "a b" (seen), "b c" (unseen transition, seen context),
    // "z a" (unseen context → pure pcont)
    val held = Seq((10L, "a b"), (15L, "b c"), (20L, "z a"))
      .toDF("doc_id", "text")
    val out = KneserNey.knBigramScore(train, held)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val B = 3.0; val V = 3.0
    def pcont(n1pr: Double) = (n1pr + 0.5) / (B + 0.5 * V)
    def lp(p: Double) =
      BigDecimal(math.log(p)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    // p(b|a) = (2-0.75 + 0.75*2*pcont(1)) / 3
    val pAB = (2.0 - 0.75 + 0.75 * 2 * pcont(1)) / 3.0
    // p(c|b): c(b,c)=0 → (0 + 0.75*1*pcont(1)) / 2
    val pBC = (0.75 * 1 * pcont(1)) / 2.0
    // p(a|z): z unseen → pcont(a) with n1pr(a)=1
    val pZA = pcont(1)
    assert(math.abs(out(10L) - lp(pAB)) < 1e-9, s"seen: ${out(10L)} vs ${lp(pAB)}")
    assert(math.abs(out(15L) - lp(pBC)) < 1e-9, s"backoff: ${out(15L)} vs ${lp(pBC)}")
    assert(math.abs(out(20L) - lp(pZA)) < 1e-9, s"unseen ctx: ${out(20L)} vs ${lp(pZA)}")
    // discounting reserved real mass: the seen transition still scores
    // strictly higher than the backed-off one
    assert(out(10L) > out(15L))
  }

  test("kn: probabilities over the training vocab sum below 1 per seen context (discount holds mass)") {
    import spark.implicits._
    val train = Seq((1L, "a b a b a c b c")).toDF("doc_id", "text")
    // score every (a, w) for w in vocab {a,b,c} as singleton held-out docs
    val held = Seq((0L, "a a"), (5L, "a b"), (10L, "a c")).toDF("doc_id", "text")
    val lps = KneserNey.knBigramScore(train, held)
      .collect().map(r => math.exp(r.getDouble(2)))
    val s = lps.sum
    // with add-half continuation smoothing some mass sits on unseen
    // words, so the seen-vocab sum is strictly inside (0, 1]
    assert(s > 0.0 && s <= 1.0 + 1e-9, s"sum over vocab = $s")
  }

  test("streamed ivf store: ingest ≡ direct assignment, cell layout prunes probes") {
    import spark.implicits._
    val emb = (0L until 60L).map(i =>
        (i, Array.tabulate(8)(d => ((i * 7 + d * 3) % 13).toFloat / 13f).toSeq))
      .toDF("vec_id", "embedding")
    val centroids = Clustering.trainCentroids(emb, k = 4, sampleCap = 60)
    val dst = "/tmp/graft_spec_ivf_store"
    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dst), true)
    // three "micro-batches" through the SAME append the stream calls
    (0 until 3).foreach { i =>
      VectorStore.appendAssignments(
        emb.filter(pmod(col("vec_id"), lit(3)) === i), centroids, dst)
    }
    val served = VectorStore.serveAssignments(spark, dst)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val direct = Clustering.assign(emb, centroids)
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(served == direct, "streamed-store read-back must equal direct assignment")
    // the store is cell-partitioned: a one-cell probe is a PARTITION
    // filter (pruned before file listing), not a post-scan data filter
    val probeCell = served.head._2
    val probe = spark.read.parquet(dst).filter(col("cluster") === probeCell)
    val p = probe.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("cluster")),
      s"cell probe did not become a partition filter:\n$p")
    val dirsRead = probe
      .select(regexp_extract(input_file_name(), "cluster=\\d+", 0))
      .distinct().collect().map(_.getString(0)).toSet
    assert(dirsRead == Set(s"cluster=$probeCell"),
      s"probe touched non-probed cells: $dirsRead")
  }

  test("k-center: greedy picks the farthest point each round, on paper") {
    import spark.implicits._
    // 1-d geometry (dim 2, zero second comp): points 0, 1, 10, 11, 20.
    // Seed = max norm → 20. Round 2 argmax min-dist → 0 (400 > 100).
    // Round 3: mins to {20,0} are 1, 100, 81 → 10. Centers: 20, 0, 10.
    val emb = Seq(0L -> 0f, 1L -> 1f, 10L -> 10f, 11L -> 11f, 20L -> 20f)
      .map { case (id, v) => (id, Seq(v, 0f)) }.toDF("vec_id", "embedding")
    val picks = Coreset.kcenterSelect(emb, 3).map(_._1)
    assert(picks == Seq(20L, 0L, 10L), s"greedy order: $picks")
    val out = Coreset.kcenterAssign(emb, 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) == ((0L, 2L)) && out(1L) == ((0L, 2L)),
      "0 and 1 belong to center 0 (rank 2)")
    assert(out(10L) == ((10L, 3L)) && out(11L) == ((10L, 3L)))
    assert(out(20L) == ((20L, 1L)))
  }

  test("k-center: empty vectors are never selected and assign to the smallest center id") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(5f, 5f)), (1L, Seq(-5f, 5f)), (2L, Seq(0f, -7f)),
      (3L, Seq.empty[Float])).toDF("vec_id", "embedding")
    val picks = Coreset.kcenterSelect(emb, 3).map(_._1)
    assert(!picks.contains(3L), s"empty vector must never be a center: $picks")
    val row3 = Coreset.kcenterAssign(emb, 3)
      .filter(col("vec_id") === 3L).head()
    // distance 0 to every center → tie broken to the smallest center id
    assert(row3.getLong(3) == 0L && row3.getLong(1) == picks.min)
  }

  test("ivf lifecycle: tombstones hide rows, compaction makes it physical and collapses segments") {
    import spark.implicits._
    val emb = (0L until 40L).map(i =>
        (i, Seq.tabulate(4)(d => ((i * 5 + d) % 11).toFloat)))
      .toDF("vec_id", "embedding")
    val centroids = Clustering.trainCentroids(emb, k = 3, sampleCap = 40)
    val root = "/tmp/graft_spec_ivf_lifecycle"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    (0 until 4).foreach { i =>
      VectorStore.appendCellRows(
        emb.filter(pmod(col("vec_id"), lit(4)) === i), centroids, s"$root/store")
    }
    VectorStore.appendTombstones(emb.filter(col("vec_id") < 5L), root)

    def liveIds(): Set[Long] = {
      val tomb = spark.read.parquet(s"$root/tombstones")
      spark.read.parquet(s"$root/store")
        .join(tomb, Seq("vec_id"), "left_anti")
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val before = liveIds()
    assert(before == (5L until 40L).toSet, "tombstoned ids must be hidden")

    val (filesBefore, filesAfter) = VectorStore.compactCells(spark, root)
    assert(filesAfter < filesBefore,
      s"segments must collapse: $filesBefore -> $filesAfter")
    assert(liveIds() == before, "compaction must not change served content")
    // physical: the raw store (no anti-join) no longer holds deleted rows
    val raw = spark.read.parquet(s"$root/store")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(raw == before, "deleted rows must be physically gone after compaction")

    // probe prunes to its cells' directories only
    val qx = Seq(1000L, 2000L, 3000L, 4000L)
    val probe = VectorStore.probeTopK(spark, root, qx, centroids, nprobe = 1, k = 5)
    assert(probe.count() == 5)
    val cells = centroids.zipWithIndex.map { case (c, cid) =>
      (qx.zipAll(c.toSeq, 0L, 0L).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
    }.sorted.take(1).map(_._2).toSet
    val dirsRead = spark.read.parquet(s"$root/store")
      .filter(col("cluster").isin(cells.map(Int.box).toSeq: _*))
      .select(regexp_extract(input_file_name(), "cluster=\\d+", 0))
      .distinct().collect().map(_.getString(0)).toSet
    assert(dirsRead == cells.map(c => s"cluster=$c"),
      s"probe must touch only its cells: $dirsRead vs $cells")
  }

  test("span corruption: round-trips, spans are disjoint, short docs pass through") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")), // eligible
      (2L, "a b c d e f g h i j"),                    // eligible (n=10)
      (3L, "only five words here now"),               // n=5 < 6: pass-through
      (4L, "")).toDF("doc_id", "text")
    val out = SpanCorruption.spanCorrupt(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3)))).toMap

    // short docs: unmasked input, empty target
    assert(out(3L) == ((5L, "only five words here now", "")))
    assert(out(4L) == ((0L, "", "")))

    // eligible docs: exactly one sentinel pair in the input, targets
    // carry L=3 tokens per span, and splicing the targets back into
    // the sentinel slots reconstructs the original token stream
    Seq(1L, 2L).foreach { id =>
      val (_, input, target) = out(id)
      val orig = docs.filter(col("doc_id") === id)
        .head().getString(1).toLowerCase
      val tgt = target.stripPrefix("<extra_id_0> ")
        .stripSuffix(" <extra_id_2>").split(" <extra_id_1> ")
      assert(tgt.length == 2 && tgt.forall(_.split(" ").length == 3),
        s"doc $id: two 3-token spans expected: $target")
      val rebuilt = input
        .replace("<extra_id_0>", tgt(0)).replace("<extra_id_1>", tgt(1))
      assert(rebuilt == orig, s"doc $id: splice-back must reconstruct:\n$rebuilt\n$orig")
    }
  }

  test("doc novelty: df=1 fraction on a planted corpus, store serve = from-scratch") {
    import spark.implicits._
    // doc 0 and doc 1 share their entire text (every 3-gram df >= 2);
    // doc 2 is fully unique; doc 3 mixes one shared gram with unique
    // ones; doc 4 is too short for any 3-gram
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),
      (2L, "one two three four"),
      (3L, "alpha beta gamma nine ten eleven"),
      (4L, "too short")).toDF("doc_id", "text")
    val store = "/tmp/graft_spec_novelty"
    val p = new org.apache.hadoop.fs.Path(store)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    // two disjoint appends — the serve must merge partials
    Boilerplate.appendGramDf(docs.filter(col("doc_id") < 2), store, 3)
    Boilerplate.appendGramDf(docs.filter(col("doc_id") >= 2), store, 3)
    val out = Novelty.noveltyFromStore(spark, docs, store)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // docs 0/1: grams {abc, bcd} both df 2 → novelty 0
    assert(out(0L) == ((2L, 0L, 0.0)) && out(1L) == ((2L, 0L, 0.0)))
    // doc 2: both grams unique → novelty 1
    assert(out(2L) == ((2L, 2L, 1.0)))
    // doc 3: grams abg(df 3: docs 0,1,3), bgn, gnt, nte — 3 of 4 unique
    assert(out(3L) == ((4L, 3L, 0.75)), s"doc 3: ${out(3L)}")
    // doc 4: no 3-grams → zeros
    assert(out(4L) == ((0L, 0L, 0.0)))
  }

  test("quantile normalization: hand-computed cross-source mapping; identity on one source") {
    import spark.implicits._
    // source A: values 1..4; source B: 10, 20. Pooled CumG:
    // 1->1 2->2 3->3 4->4 10->5 20->6 (N=6)
    val scored = Seq(
      (0L, "A", 1L), (1L, "A", 2L), (2L, "A", 3L), (3L, "A", 4L),
      (4L, "B", 10L), (5L, "B", 20L)).toDF("doc_id", "source", "v")
    val out = QuantileNorm.quantileNormalize(scored)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getLong(4)))).toMap
    // A(v): q=(2*below+1)/8; target = min w with 8*CumG >= 6*(2*below+1)
    assert(out(0L) == ((0.125, 1L)))
    assert(out(1L) == ((0.375, 3L)))
    assert(out(2L) == ((0.625, 4L)))
    assert(out(3L) == ((0.875, 20L)))
    // B(v): q=(2*below+1)/4; target = min w with 4*CumG >= 6*(2*below+1)
    assert(out(4L) == ((0.25, 2L)))
    assert(out(5L) == ((0.75, 10L)))

    // one source: normalization must be the identity
    val one = Seq((0L, "A", 1L), (1L, "A", 2L), (2L, "A", 3L), (3L, "A", 4L))
      .toDF("doc_id", "source", "v")
    QuantileNorm.quantileNormalize(one).collect().foreach { r =>
      assert(r.getLong(2) == r.getLong(4),
        s"identity broken: v=${r.getLong(2)} norm=${r.getLong(4)}")
    }
  }

  test("fim: PSM reassembles to the original, cuts are ordered, short docs pass through") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 12).map(i => s"w$i").mkString(" ")),
      (2L, "a b c")).toDF("doc_id", "text")
    val out = graft.ops.SpanCorruption.fimTransform(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val (n, lo, hi, psm) = out(1L)
    assert(n == 12L && lo <= hi && lo >= 0L && hi <= n)
    val m = "<fim_prefix> (.*) <fim_suffix> (.*) <fim_middle> (.*)".r
    psm match {
      case m(p, sfx, mid) =>
        val rebuilt = Seq(p, mid, sfx).map(_.trim).filter(_.nonEmpty)
          .mkString(" ")
        val orig = (1 to 12).map(i => s"w$i").mkString(" ")
        assert(rebuilt == orig, s"P+M+S must reassemble:\n$rebuilt\n$orig")
      case _ => fail(s"bad PSM shape: $psm")
    }
    // short doc: no rearrangement
    assert(out(2L)._4 == "a b c")
  }

  test("streamed near-dup index: probe equals the one-shot q89 build") {
    val dir = "/root/testdata/sf0.001"
    val streamed = NearDupIndex.q169StreamedNearDupIndex(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val oneShot = NearDupIndex.q89IndexProbe(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed == oneShot,
      s"stream-maintained index must probe identically: $streamed vs $oneShot")
  }

  test("pav: pools exact violations, preserves mass, ends monotone") {
    // rates 0.5, 0.2, 0.8: the first two violate → pool to 7/20 = 0.35,
    // which sits below 0.8 → stop. Cascading case: 0.9 then 0.1 then
    // 0.1 pools all three.
    val p1 = QualityModel.pav(Seq((0L, 10L, 5L), (1L, 10L, 2L), (2L, 10L, 8L)))
    assert(p1.map(t => (t._1, t._2, t._3)) ==
      Vector((Vector(0L, 1L), 7L, 20L), (Vector(2L), 8L, 10L)))
    val p2 = QualityModel.pav(Seq((0L, 10L, 9L), (1L, 10L, 1L), (2L, 10L, 1L)))
    assert(p2.length == 1 && p2.head._2 == 11L && p2.head._3 == 30L,
      s"cascade must pool everything: $p2")
    // already monotone input is untouched
    val p3 = QualityModel.pav(Seq((0L, 5L, 1L), (1L, 5L, 2L), (2L, 5L, 5L)))
    assert(p3.length == 3)
    // generic properties on a violating sequence: pooled rates are
    // nondecreasing and total mass is preserved
    val bins = Seq((0L, 7L, 6L), (1L, 13L, 3L), (2L, 5L, 4L), (3L, 11L, 2L))
    val pools = QualityModel.pav(bins)
    val rates = pools.map(p => p._2.toDouble / p._3.toDouble)
    assert(rates.zip(rates.drop(1)).forall { case (a, b) => a <= b })
    assert(pools.map(_._2).sum == bins.map(_._3).sum &&
      pools.map(_._3).sum == bins.map(_._2).sum)
  }

  test("dedup attribution: tiers catch in strictness order, marginals are first-tier") {
    import spark.implicits._
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, base),                                  // T1 canonical
      (1L, base),                                  // exact dup -> T1 victim
      (2L, (1 to 8).map(i => s"p$i").mkString(" ") + " xx yy zz aa bb cc dd ee ff gg hh ii"),
      (3L, (1 to 8).map(i => s"p$i").mkString(" ") + " qq ww rr tt uu vv w2 x2 y2 z2 a2 b2"),
      (4L, base + " tail"),                        // near-dup of 0 (superset)
      (5L, "completely different text with nothing shared at all here now"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupAttribution(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // T1: exact text group {0,1} -> victim 1
    assert(out(1L)._2 == 1L && out(1L)._3 == 1L, s"exact tier: ${out(1L)}")
    // T2: prefix8 groups {0,1,4} (victims 1,4) and {2,3} (victim 3) -> caught 3
    assert(out(2L)._2 == 3L, s"prefix tier caught: ${out(2L)}")
    assert(out(2L)._3 == 2L, "marginal prefix victims: 3 and 4 (1 already caught)")
    // remaining after all tiers: every tier's marginal subtracted once
    val totalMarg = out.values.map(_._3).sum
    assert(out(3L)._4 == 6L - totalMarg, s"remaining: ${out(3L)}")
    // tier 3 catches nothing NEW here (victims 1 and 4 already caught)
    assert(out(3L)._3 == 0L, s"neardup marginal: ${out(3L)}")
  }

  test("query expansion: feedback terms lift co-occurring docs, off-topic stays out") {
    import spark.implicits._
    // seed "spark": feedback docs 0,1. Candidate terms: engine (tf 2,
    // df 2), fast / cluster (tf 1, df 1). idf favors the rarer terms;
    // expandBy=2 takes the top two by (w desc, term asc).
    val docs = Seq(
      (0L, "spark engine fast"),
      (1L, "spark engine cluster"),
      (2L, "cat dog bird"),
      (3L, "fast cluster engine")).toDF("doc_id", "text")
    val out = Retrieval.queryExpansion(docs, Seq("spark"), k1 = 2,
        expandBy = 2, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // doc 3 has NO seed term but both expansion candidates — pseudo-
    // relevance feedback is exactly what lets it surface
    assert(out.contains(3L), s"expanded query must surface doc 3: $out")
    assert(!out.contains(2L), "off-topic doc must stay out")
    // docs 0/1 match seed + expansion terms; hit counts reflect that
    assert(out(0L) >= 2L && out(1L) >= 2L)
  }

  test("crop pairs: views are real substrings, overlap counts shared positions") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"c$i").mkString(" ")),
      (2L, "a b c")).toDF("doc_id", "text")
    val out = graft.ops.SpanCorruption.cropPairs(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))).toMap
    val (n, a, b, ov) = out(1L)
    assert(n == 10L && a.split(" ").length == 5 && b.split(" ").length == 5)
    val orig = (1 to 10).map(i => s"c$i").mkString(" ")
    assert(orig.contains(a) && orig.contains(b), "crops are contiguous views")
    // overlap equals the actual shared token positions
    val posOf = (s: String) => orig.split(" ").indexOf(s.split(" ").head)
    val (sa, sb) = (posOf(a), posOf(b))
    val expected = math.max(0, math.min(sa, sb) + 5 - math.max(sa, sb))
    assert(ov == expected, s"overlap $ov vs $expected (sa=$sa sb=$sb)")
    // short doc: whole text twice, full overlap
    assert(out(2L) == ((3L, "a b c", "a b c", 3L)))
  }

  test("tokenizer compare: fertilities are >= 1 and totals are word-count consistent") {
    val out = Unigram.q174TokenizerCompare(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (ws, bpe, uni) = (r.getLong(2), r.getLong(3), r.getLong(4))
      // every whitespace word yields at least one subword in both
      assert(bpe >= ws && uni >= ws,
        s"fertility < 1 impossible: ws=$ws bpe=$bpe uni=$uni")
      assert(r.getDouble(5) >= 1.0 && r.getDouble(6) >= 1.0)
    }
  }

  test("kn: zero-bigram held-out docs emit zeros and every doc appears") {
    import spark.implicits._
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val held = Seq((0L, "single"), (5L, ""), (10L, "a b"))
      .toDF("doc_id", "text")
    val out = KneserNey.knBigramScore(train, held).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 5L, 10L))
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(0L) == 0L && byId(5L) == 0L && byId(10L) == 1L)
  }
}
