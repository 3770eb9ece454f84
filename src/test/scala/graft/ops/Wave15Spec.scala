package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral specs for the unigram-LM tokenizer: hand-built piece
  * tables where the maximum-likelihood segmentation is checkable on
  * paper, the integer tie-break, UNK coverage, and train determinism. */
class Wave15Spec extends SparkSpec {

  private def fix(x: Double): Long =
    (BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP) *
      BigDecimal(1000000000000L)).toLongExact

  test("viterbi picks the maximum-likelihood segmentation, not greedy-longest") {
    // "abc": piece 'abc' scores -2.5, but 'ab'+'c' scores -1 + -1.2 =
    // -2.2 — the DP must take the two-piece path a greedy longest-match
    // would skip
    val pieces = Array("a", "ab", "abc", "b", "c")
    val lps = Array(fix(-3.0), fix(-1.0), fix(-2.5), fix(-3.0), fix(-1.2))
    val seg = new Unigram.Segmenter(pieces, lps)
    assert(seg.segments("abc").toSeq == Seq("ab", "c"))
    assert(seg.idsWord("abc").toSeq == Seq(1, 4))
  }

  test("exact score tie prefers the longer piece; unk chars map to -1") {
    // 'ab' = -2.0 exactly equals 'a'+'b' = -1.0 + -1.0: longer wins
    val pieces = Array("a", "ab", "b")
    val lps = Array(fix(-1.0), fix(-2.0), fix(-1.0))
    val seg = new Unigram.Segmenter(pieces, lps)
    assert(seg.segments("ab").toSeq == Seq("ab"))
    // 'x' is not in the table: UNK single char, id -1, then 'ab'
    assert(seg.idsWord("xab").toSeq == Seq(-1, 1))
    assert(seg.segments("xab").toSeq == Seq("x", "ab"))
    // memo returns the same answer on the second call
    assert(seg.idsWord("xab").toSeq == Seq(-1, 1))
  }

  test("training is deterministic and gives frequent words one piece") {
    import spark.implicits._
    val docs = (0 until 60).map(i =>
        (i.toLong, if (i % 3 == 0) "hello world" else "hello there"))
      .toDF("doc_id", "text")
    val p1 = Unigram.trainFromCounts(
      Array(("hello", 60L), ("world", 20L), ("there", 40L)), 512, 2)
    val p2 = Unigram.trainFromCounts(
      Array(("hello", 60L), ("world", 20L), ("there", 40L)), 512, 2)
    assert(p1.toSeq == p2.toSeq, "train must be deterministic")
    val seg = new Unigram.Segmenter(p1.map(_._1), p1.map(_._2))
    // every training word is ≤ 6 chars and frequent: one piece each
    Seq("hello", "world", "there").foreach { w =>
      assert(seg.segments(w).toSeq == Seq(w), s"$w should be one piece")
    }
    // end-to-end: the declared query shape on a local frame
    val probs = Unigram.train(docs)
    val out = docs.select(col("doc_id"),
        Unigram.unigramIdsStr(col("text"), probs).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L).split(" ").length == 2, s"two words → two ids: ${out(0L)}")
  }

  test("perplexity filter: gibberish scores above fluent text, nll is the exact score sum") {
    import spark.implicits._
    // train on fluent text; doc 9 is character soup the LM never saw
    val fluent = (0L until 9L).map(i => (i, "the quick brown fox jumps"))
    val docs = (fluent :+ (9L, "zq xv qzx vqz wqx")).toDF("doc_id", "text")
    val probs = Unigram.train(docs)
    val rows = docs.select(col("doc_id"),
        Unigram.unigramCount(col("text"), probs).as("n"),
        Unigram.unigramNll12(col("text"), probs).as("nll"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fluentAvg = rows(0L)._2.toDouble / rows(0L)._1
    val soupAvg = rows(9L)._2.toDouble / rows(9L)._1
    assert(soupAvg > fluentAvg,
      s"soup must score above fluent: $soupAvg vs $fluentAvg")
    // nll ≡ −Σ best word scores: recompute through the same segmenter
    val seg = new Unigram.Segmenter(probs.map(_._1), probs.map(_._2))
    val expect = "the quick brown fox jumps".split(" ")
      .map(w => -seg.score12Word(w)).sum
    assert(rows(0L)._2 == expect, s"nll12 ${rows(0L)._2} != $expect")
  }

  test("rag context: relevance-ordered packing is budget-maximal and offsets are real") {
    import spark.implicits._
    // doc 0: dense in the query term; doc 1: one hit; doc 2: none
    val docs = Seq(
      (0L, ("q " * 10 + "pad " * 10).trim),
      (1L, ("q " + "pad " * 19).trim),
      (2L, ("pad " * 20).trim)).toDF("doc_id", "text")
    val out = Rag.ragContext(docs, Seq("q"), maxLen = 8, stride = 4,
        k = 10, tokenBudget = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out.nonEmpty)
    // ranks contiguous from 1, running total monotone and within budget
    assert(out.map(_._1) == (1L to out.size.toLong), s"ranks: $out")
    assert(out.last._5 <= 20, s"over budget: $out")
    assert(out.map(_._4).sum == out.last._5, "cum must be the running sum")
    // doc 2 never retrieves (no hit term); rank 1 comes from doc 0
    assert(!out.exists(_._2 == 2L))
    assert(out.head._2 == 0L, s"densest chunk should lead: $out")
    // budget-maximality: with an unbounded budget the (m+1)-th ranked
    // chunk exists and would have pushed the total past the budget
    val all = Rag.ragContext(docs, Seq("q"), 8, 4, 10, Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSeq
    assert(all.size > out.size, "plant must leave a cut chunk")
    assert(all(out.size)._2 > 20, "the first cut chunk must overflow the budget")
  }

  test("ltr features: planted near-dup flags, zero-norm null cosine, exact jaccard") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta q"),
      (1L, "alpha beta gamma delta q"), // identical text: jaccard 1
      (2L, "q unrelated words entirely here"),
      (3L, "q zero norm embedding doc")).toDF("doc_id", "text")
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val emb = Seq(
      (0L, v(1, 0)), (1L, v(1, 0)),     // cos 1 → near_dup
      (2L, v(0, 1)),                    // cos 0
      (3L, v(0, 0))).toDF("vec_id", "embedding") // zero norm → NULL cos
    val out = Ltr.ltrFeatures(docs, emb, probeId = 0L, k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), Option(r.get(5)).map(_.asInstanceOf[Double]),
         r.getBoolean(6))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), s"candidates: ${out.keySet}")
    val (j1, c1, nd1) = out(1L)
    assert(j1 == 1.0 && c1.contains(1.0) && nd1, s"identical doc: ${out(1L)}")
    val (j2, c2, nd2) = out(2L)
    assert(j2 == 0.0 && c2.contains(0.0) && !nd2, s"orthogonal doc: ${out(2L)}")
    val (_, c3, nd3) = out(3L)
    assert(c3.isEmpty && !nd3, s"zero-norm doc must have NULL cos: ${out(3L)}")
  }
}
