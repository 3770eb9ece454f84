package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 20: source-coverage Shapley (q189), winnowing fingerprints
  * (q190), CUPED variance reduction (q191), Benford first-digit audit
  * (q192) — closed-form math on hand-built fixtures where feasible,
  * structural axioms (Shapley efficiency, the winnowing guarantee,
  * chi-square reconciliation) on the shipped corpus. */
class Wave20Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q189: Shapley efficiency axiom — values sum to the vocabulary size") {
    val out = Valuation.q189SourceShapley(spark, dir).collect()
    assert(out.length == 20)
    val vocab = Dedup.shingles(
        graft.Tables.documents(spark, dir)
          .withColumn("doc_id", col("source")), 3)
      .select(col("g")).distinct().count()
    val total = out.map(_.getDouble(3)).sum
    // each gram's 1/n is rounded 1e-12 before the exact decimal sum, so
    // the efficiency identity holds to |vocab| * quantum
    assert(math.abs(total - vocab) < vocab * 1e-9,
      s"shapley sum $total != vocab $vocab")
    out.foreach { r =>
      // a gram carried by this source alone contributes exactly 1; all
      // its other grams contribute > 0 ⇒ unique-count lower-bounds φ
      assert(r.getDouble(3) >= r.getLong(2) - 1e-9, s"$r")
      assert(r.getLong(1) >= r.getLong(2))
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) < 1.0)
    }
  }

  test("q190: winnowing guarantee — a shared run of >= w+k-1 tokens leaves a common fingerprint") {
    import spark.implicits._
    // k=3, w=8: guarantee threshold = 10 shared tokens. Docs 1/2 share
    // exactly a 10-token passage inside distinct noise; doc 3 is disjoint.
    val passage = (1 to 10).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $passage delta epsilon zeta"),
      (2L, s"one two three four $passage five six seven"),
      (3L, "totally different words with no overlap at all here"))
      .toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(docs, 3, 8)
    val byDoc = fp.collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "guarantee violated")
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    // density: selection keeps ~2/(w+1) of grams — strictly fewer than
    // all grams for any doc longer than one window
    val grams1 = docs.filter(col("doc_id") === 1L)
      .select(TextAnalysis.tokens(col("text"))).head().getSeq[String](0).length - 2
    assert(byDoc(1L).size < grams1 && byDoc(1L).size >= grams1 / 8)
  }

  test("q190: the codegen'd kernel is bit-identical to the HOF reference formulation") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir).limit(100)
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("l"))
    // the replaced formulation, kept here as the independent oracle of
    // the kernel: interpreted HOF chain, same hash/window contract
    val hof = toks.select(col("doc_id"), when(size(col("l")) >= 3,
        transform(sequence(lit(1), size(col("l")) - 2),
          i => conv(substring(md5(array_join(slice(col("l"), i, lit(3)), " ")),
            1, 15), 16, 10).cast("long")))
        .otherwise(array().cast("array<long>")).as("hs"))
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("hs"))),
          e => array_min(slice(col("hs"),
            greatest(e - 7, lit(1)), least(e, lit(8))))))).as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val kernel = Winnowing.fingerprints(docs, 3, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kernel == hof)
    // SQL registration round-trip ≡ the column API on the same input
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT winnow_fingerprints(array('a','b','c','d'), 3, 8) AS f")
      .head().getSeq[Long](0)
    val viaCol = Seq(Seq("a", "b", "c", "d")).toDF("l")
      .select(graft.functions.exprs.winnow_fingerprints(col("l"), 3, 8))
      .head().getSeq[Long](0)
    assert(viaSql.nonEmpty && viaSql == viaCol)
  }

  test("word_ngrams kernel is bit-identical to the HOF formulation, both modes") {
    val docs = graft.Tables.documents(spark, dir).limit(120)
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("l"))
    def hof(distinct: Boolean) = {
      val raw = when(size(col("l")) >= 3,
        transform(sequence(lit(1), size(col("l")) - 2),
          i => array_join(slice(col("l"), i, lit(3)), " ")))
        .otherwise(array().cast("array<string>"))
      toks.select(col("doc_id"),
        (if (distinct) array_distinct(raw) else raw).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    }
    def kernel(distinct: Boolean) =
      toks.select(col("doc_id"),
          graft.functions.exprs.word_ngrams(col("l"), 3, distinct).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // ORDER included — first-occurrence order must match array_distinct
    assert(kernel(false) == hof(false))
    assert(kernel(true) == hof(true))
    // degenerate short docs
    import spark.implicits._
    val shorty = Seq((1L, Seq("a", "b")), (2L, Seq[String]()))
      .toDF("doc_id", "l")
      .select(graft.functions.exprs.word_ngrams(col("l"), 3).as("g"))
      .collect()
    shorty.foreach(r => assert(r.getSeq[String](0).isEmpty))
  }

  test("null array elements are skipped, not NPE'd (user-facing SQL surface)") {
    // both kernels accept ArrayType(StringType, containsNull=true) from SQL;
    // a null element must behave as absent, matching compaction semantics
    import spark.implicits._
    val df = Seq(
      (1L, Seq[String]("a", null, "b", "c")),
      (2L, Seq[String](null, null)),
      (3L, Seq[String]("x", "y", "z")))
      .toDF("doc_id", "l")
    val g = df.select(col("doc_id"),
        graft.functions.exprs.word_ngrams(col("l"), 3).as("g"),
        graft.functions.exprs.winnow_fingerprints(col("l"), 3, 8).as("f"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[String](1), r.getSeq[Long](2))).toMap
    // doc 1 compacts to (a,b,c) → one 3-gram; doc 2 to () → none
    assert(g(1L)._1 == Seq("a b c") && g(1L)._2.nonEmpty)
    assert(g(2L)._1.isEmpty && g(2L)._2.isEmpty)
    assert(g(3L)._1 == Seq("x y z"))
    // the compacted doc must hash identically to a literal null-free one
    val clean = Seq((9L, Seq("a", "b", "c"))).toDF("doc_id", "l")
      .select(graft.functions.exprs.winnow_fingerprints(col("l"), 3, 8).as("f"))
      .collect()(0).getSeq[Long](0)
    assert(g(1L)._2 == clean)
  }

  test("q190: identical docs pair at sim 1.0; corpus pairs match q25's planted near-dups") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a quick brown fox jumps over the lazy dog again today"),
      (2L, "a quick brown fox jumps over the lazy dog again today"),
      (3L, "entirely unrelated content lives in this third document body"))
      .toDF("doc_id", "text")
    val pairs = Winnowing.winnowPairs(docs, 3, 8, 0.5, 50L).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    assert(pairs(0).getDouble(3) == 1.0)
    // on the shipped corpus the winnow pair set must recall the exact
    // near-dup groups q25 finds (winnowing keeps a subset of grams, so
    // only strong pairs survive — every one it reports must be real)
    val w = Winnowing.q190Winnowing(spark, dir).select(col("d1"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val j = Dedup.q25NgramJaccard(spark, dir).select(col("d1"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(w.nonEmpty)
    val recall = (w & j).size.toDouble / j.size
    assert(recall >= 0.8, s"winnowing recalled only $recall of q25 pairs")
  }

  test("q191: CUPED math on a hand-built fixture reproduces the closed form") {
    import spark.implicits._
    // 4 users, days 0..3 (split day = 2): counts (x, y) per user below.
    // md5-arm assignment is deterministic; compute expectations from the
    // same moments the op uses.
    val ev = (
      Seq.fill(3)((1L, 0L)) ++ Seq.fill(5)((1L, 2L)) ++ // u1: x=3 y=5
      Seq.fill(1)((2L, 1L)) ++ Seq.fill(2)((2L, 3L)) ++ // u2: x=1 y=2
      Seq.fill(4)((3L, 0L)) ++ Seq.fill(6)((3L, 3L)) ++ // u3: x=4 y=6
      Seq.fill(2)((4L, 1L)) ++ Seq.fill(1)((4L, 2L)))   // u4: x=2 y=1
      .zipWithIndex
      .map { case ((u, day), i) =>
        (i.toLong, day * 86400000000000L + i.toLong, u, "e")
      }.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val out = Experiment.cuped(ev).collect()
    val xy = Map(1L -> (3L, 5L), 2L -> (1L, 2L), 3L -> (4L, 6L), 4L -> (2L, 1L))
    val n = 4.0
    val sx = xy.values.map(_._1).sum.toDouble
    val sy = xy.values.map(_._2).sum.toDouble
    val sxx = xy.values.map(v => v._1 * v._1).sum.toDouble
    val sxy = xy.values.map(v => v._1 * v._2).sum.toDouble
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val theta = r((n * sxy - sx * sy) / (n * sxx - sx * sx), 12)
    val mxAll = r(sx / n, 12)
    // group users by the op's own md5 arms
    val arms = ev.select(col("user_id")).distinct()
      .withColumn("v", Experiment.variantOf(col("user_id"), 2))
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
    out.foreach { row =>
      val members = xy.filter { case (u, _) => arms(u) == row.getLong(0) }
      assert(row.getLong(1) == members.size)
      assert(math.abs(row.getDouble(6) - theta) < 1e-11)
      if (members.size >= 2) {
        val my = members.values.map(_._2).sum.toDouble / members.size
        val mx = members.values.map(_._1).sum.toDouble / members.size
        assert(math.abs(row.getDouble(2) - r(my, 6)) < 1e-9)
        assert(math.abs(row.getDouble(3) - r(my - theta * (mx - mxAll), 6)) < 1e-9)
      }
    }
  }

  test("q191 on the corpus: arms partition the user universe; reduction = 1 - var ratio") {
    val out = Experiment.q191Cuped(spark, dir).collect()
    val users = graft.Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(out.map(_.getLong(1)).sum == users)
    out.filter(r => !r.isNullAt(7)).foreach { r =>
      val expect = 1.0 - r.getDouble(5) / r.getDouble(4)
      // both sides rounded 6 independently — agree to the quantum
      assert(math.abs(r.getDouble(7) - expect) < 2e-6, s"$r")
    }
  }

  test("q192: digit extraction from exact cents; totals reconcile; expected shares sum to 1") {
    import spark.implicits._
    val amounts = Seq(("s", 123.45), ("s", 0.01), ("s", 999.995), ("s", 8.0))
      .toDF("segment", "amount")
    val out = Benford.firstDigitAudit(amounts).collect()
    val byBin = out.filter(!_.getString(1).startsWith("__"))
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    // 123.45→12345→'1'; 0.01→1→'1'; 999.995→100000→'1'; 8.0→800→'8'
    assert(byBin("1") == 3L && byBin("8") == 1L)
    val tot = out.find(_.getString(1) == "__total").get
    assert(tot.getLong(2) == 4L)
    // Benford masses over d=1..9 sum to 1 (each rounded 6)
    val pSum = out.filter(!_.isNullAt(4)).map(_.getDouble(4)).sum
    assert(math.abs(pSum - 1.0) < 1e-5)
    // chi-square total = decimal sum of the per-digit terms
    val termSum = out.filter(r => !r.getString(1).startsWith("__"))
      .map(r => BigDecimal(r.getDouble(5)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum
    assert(math.abs(tot.getDouble(5) - termSum.toDouble) < 1e-9)
  }

  test("q192 on orders: 50 rows, every segment's digit counts sum to its total") {
    val out = Benford.q192Benford(spark, dir).collect()
    assert(out.length == 50)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val total = rows.find(_.getString(1) == "__total").get.getLong(2)
      val digits = rows.filter(!_.getString(1).startsWith("__"))
      assert(digits.length == 9)
      assert(digits.map(_.getLong(2)).sum == total)
      val verdict = rows.find(_.getString(1) == "__total").get.getString(6)
      assert(verdict == "reject" || verdict == "consistent")
    }
  }
}
