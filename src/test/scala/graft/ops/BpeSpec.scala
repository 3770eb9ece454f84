package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {

  test("bpe training: classic merge order on a planted corpus; application is greedy by rank") {
    // "aaab" x3, "ab" x2: pair counts are (a,a)=6, (a,b)=5 -> first
    // merge (a,a); then (aa,ab)? counts recompute over merged words
    val counts = Array(("aaab", 3L), ("ab", 2L))
    val all = Bpe.trainFromCounts(counts, nMerges = 3)
    assert(all.head == ("a", "a"), s"first merge should be (a,a): ${all.toSeq}")
    // after (a,a): words are [aa,a,b]x3, [a,b]x2 -> (a,b)=5 beats (aa,a)=3
    assert(all(1) == ("a", "b"), s"second merge should be (a,b): ${all.toSeq}")
    // then [aa,ab]x3, [ab]x2 -> (aa,ab)=3 is all that's left
    assert(all(2) == ("aa", "ab"), s"third merge should be (aa,ab): ${all.toSeq}")

    // greedy application follows rank order, non-overlapping
    // left-to-right — with only the first two rules, so "aaab" stops at
    // [aa, ab] instead of collapsing under rule 3
    val merges = all.take(2)
    val ap = new Bpe.Applier(merges)
    import org.apache.spark.unsafe.types.UTF8String
    // "aaab": (a,a) first -> [aa,a,b]; then (a,b) -> [aa,ab]
    assert(ap.countText(UTF8String.fromString("aaab")) == 2L)
    // "aaa" merges once (non-overlap) -> [aa,a]; (a,a) no longer adjacent? it is:
    // [aa,a] has pair (aa,a) not (a,a) -> stops at 2 symbols
    assert(ap.countText(UTF8String.fromString("aaa")) == 2L)
    // memoized second call agrees
    assert(ap.countText(UTF8String.fromString("aaa aaab")) == 4L)
    // unseen symbols stay characters
    assert(ap.countText(UTF8String.fromString("xyz")) == 3L)
    // case-folding matches the tokens() convention
    assert(ap.countText(UTF8String.fromString("AAAB")) == 2L)
  }

  test("bpe column: engine counts equal a driver-side replay on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
    val merges = Bpe.train(docs, nMerges = 80, vocabCap = 2000)
    assert(merges.length == 80)
    // training is deterministic end-to-end
    assert(Bpe.train(docs, nMerges = 80, vocabCap = 2000).toSeq == merges.toSeq)

    val got = docs.select(col("doc_id"),
        Bpe.bpeCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ap = new Bpe.Applier(merges)
    val expected = docs.select(col("doc_id"), col("text")).collect()
      .map { r =>
        r.getLong(0) -> ap.countText(
          org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)))
      }.toMap
    assert(got == expected)
    // BPE always counts at least as many tokens as whitespace (a word
    // is >= 1 subword), and strictly more somewhere on real text
    val ws = docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.forall { case (id, n) => n >= ws(id) })
    assert(got.exists { case (id, n) => n > ws(id) })
  }

  test("token budget under BPE counts cuts different documents than whitespace") {
    import spark.implicits._
    // planted: doc 1 is out-of-vocabulary gibberish — same integer
    // priority as the prose docs (avg token length and punctuation in
    // range), few whitespace tokens, but NO trained merge applies, so
    // BPE counts every character; docs 2-4 are the training prose and
    // merge back to ~one token per word
    val docs = Seq(
      (1L, "en", "web", "qqqqq wwwww eeeee rrrrr ttttt yyyyy uuuuu"),
      (2L, "en", "web", "the quick brown fox jumps over the lazy dog"),
      (3L, "en", "web", "the quick brown fox jumps over the lazy dog"),
      (4L, "en", "web", "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "lang", "source", "text")
    val trainDocs = Seq((9L, "en", "web",
      "the quick brown fox jumps over the lazy dog the the quick quick"))
      .toDF("doc_id", "lang", "source", "text")
    val merges = Bpe.train(trainDocs, nMerges = 60, vocabCap = 100)

    def selectedUnder(counter: org.apache.spark.sql.Column): Set[Long] =
      Selection.tokenBudget(docs, budget = 25L, counter = counter)
        .filter(col("selected")).select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
    val underWs = selectedUnder(TextAnalysis.tokenCount(col("text")))
    val underBpe = selectedUnder(Bpe.bpeCount(col("text"), merges))
    // same priority order, different token mass -> different cut
    assert(underWs != underBpe,
      s"budget cut identical under both counters: $underWs")
    // whitespace sees 7 tokens in the gibberish doc (fits); BPE sees
    // ~35 character symbols (blows the budget for it AND everyone after)
    assert(underWs.contains(1L) && !underBpe.contains(1L))
  }

  test("token ids: decode back to the text, agree with counts, OOV is -1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the the the quick quick fox"),
      (3L, ""))
      .toDF("doc_id", "text")
    val words = Bpe.topWordCounts(docs, 100)
    val merges = Bpe.trainFromCounts(words, 40)
    val vocab = Bpe.vocabOf(words, merges)

    val got = docs.select(col("doc_id"),
        Bpe.bpeIds(col("text"), merges, vocab).as("ids"),
        Bpe.bpeCount(col("text"), merges).as("n"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getLong(2)))

    got.foreach { case (id, ids, n) =>
      // the id sequence length IS the bpe token count
      assert(ids.length.toLong == n, s"doc $id: ${ids.length} ids vs count $n")
      // no OOV on the training corpus itself, and every id decodes;
      // concatenating the decoded symbols re-spells the text without
      // whitespace — the sequence is order-true, not just set-true
      assert(ids.forall(i => i >= 0 && i < vocab.length))
    }
    val texts = Map(1L -> "thequickbrownfoxjumpsoverthelazydog",
      2L -> "thethethequickquickfox", 3L -> "")
    got.foreach { case (id, ids, _) =>
      assert(ids.map(vocab).mkString == texts(id),
        s"doc $id ids do not decode to its text")
    }

    // a symbol never seen in training encodes as the unk sentinel -1
    val oov = Seq((9L, "the zzzü"))
      .toDF("doc_id", "text")
      .select(Bpe.bpeIds(col("text"), merges, vocab).as("ids"))
      .collect().head.getSeq[Int](0)
    assert(oov.contains(-1), s"expected an unk id in $oov")
    assert(oov.count(_ == -1) == 1, "only the unseen codepoint is unk")
  }
}
