package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 32: Aho–Corasick blocklist kernel (q227), MAD outliers (q228),
  * Heaps vocabulary growth (q229), Wasserstein-1 drift (q230), audio
  * fingerprint near-dup (q231). */
class Wave32Spec extends SparkSpec {

  private def bruteCount(text: String, p: String): Long =
    (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)).toLong

  test("q227: AC kernel == brute-force overlapping counts, incl. failure-link traps") {
    val pats = Seq("aa", "aba", "ba", "value", "alue t")
    val texts = Seq(
      "aaaa",                   // "aa" x3 overlapping
      "ababab",                 // "aba" x2 overlapping, "ba" x2
      "value table value tab",  // cross-pattern suffix/prefix
      "", "a", "xyz")
    val ac = graft.functions.AhoCorasick.build(pats)
    texts.foreach { t =>
      val got = ac.countsAll(org.apache.spark.unsafe.types.UTF8String.fromString(t))
        .toLongArray()
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) == bruteCount(t, p), s"'$t' / '$p': ${got(i)}")
      }
    }
    // the Column + SQL-registered paths agree with the kernel
    import spark.implicits._
    val df = texts.toDF("t")
    val viaCol = df.select(graft.functions.exprs.ac_counts(col("t"), pats)).collect()
    graft.GraftExtensions.register(spark)
    val viaSql = df.selectExpr("ac_counts(t, 'aa', 'aba', 'ba', 'value', 'alue t')").collect()
    assert(viaCol.map(_.getSeq[Long](0)).toSeq == viaSql.map(_.getSeq[Long](0)).toSeq)
  }

  test("q228: hand fixture pins med/MAD/flags") {
    import spark.implicits._
    // lengths 1..9 tokens plus one 100-token doc: med = 5 (lower median
    // of 10), |x-med| = {4,3,2,1,0,1,2,3,4,95}, MAD = 2 (wait: sorted
    // d = 0,1,1,2,2,3,3,4,4,95 -> 5th = 2); outlier: 1349*d > 7000*2
    // = 14000 -> d > 10.378 -> only the 100-token doc
    val docs = ((1 to 9).map(n => ("s", ("w " * n).trim)) :+
      (("s", ("w " * 100).trim))).toDF("source", "text")
    val r = RobustStats.madOutliers(docs).collect()(0)
    assert(r.getLong(1) == 10L && r.getLong(2) == 5L && r.getLong(3) == 2L,
      r.toString)
    assert(r.getLong(4) == 1L && r.getDouble(5) == 0.1, r.toString)
  }

  test("q229: hand corpus pins the growth curve") {
    import spark.implicits._
    // 10 docs, ids 1..10: doc i introduces token "t<i>" and repeats "c"
    val docs = (1 to 10).map(i => (i.toLong, s"c t$i")).toDF("doc_id", "text")
    val out = Vocabulary.growthCurve(docs).collect()
    assert(out.length == 10)
    // threshold j covers docs 1..j: vocab = j distinct t's + "c"
    out.foreach { r =>
      val j = r.getLong(0)
      assert(r.getLong(2) == j, s"n_docs at $j: $r")        // j docs
      assert(r.getLong(3) == 2 * j, s"n_tokens at $j: $r")  // 2 tokens each
      assert(r.getLong(4) == j + 1, s"vocab at $j: $r")
    }
    // V = N/2 + 1 ~ N^beta: hand OLS over the 10 log-points gives ~0.754
    val beta = out.head.getDouble(5)
    assert(beta > 0.7 && beta < 0.8, s"beta $beta")
  }

  test("q230: uniform 2-token shift has W1 = 2 against the rest") {
    import spark.implicits._
    val vals = (Seq.fill(50)(("a", 10L)) ++ Seq.fill(50)(("b", 12L)))
      .toDF("source", "v")
    val out = Drift.wassersteinDrift(vals).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("a") == 2.0 && out("b") == 2.0, out.toString)
  }

  test("q231: WAV encode/decode round-trips; half-volume keeps the fingerprint") {
    val base = Array.tabulate(2048)(t => 2 * (((t * 37) % 2000) - 1000))
    val decoded = Multimodal.decodeWavSamples(Multimodal.encodeWav(base))
    assert(decoded.isDefined && decoded.get.toSeq == base.toSeq)
    val half = base.map(_ / 2)
    assert(Multimodal.audioFingerprint(base) == Multimodal.audioFingerprint(half))
    // different signal -> different fingerprint (not constant)
    val other = Array.tabulate(2048)(t => 2 * (((t * 91 + 13) % 2000) - 1000))
    assert(Multimodal.audioFingerprint(base) != Multimodal.audioFingerprint(other))
  }
}
