package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Skip-gram training pairs with negative sampling — the word2vec /
  * contrastive-embedding data-prep stage (Mikolov et al., NeurIPS
  * 2013): positives are (center, context) token pairs within a
  * ±`window` offset; negatives draw contexts from the corpus unigram
  * distribution raised to the classic 3/4 power. Deterministic end to
  * end: the sampler's uniforms are q62's exact dyadic 52-bit md5
  * recipe, the distribution's weights are round-9 decimals (the q45
  * pow rule), and the inverse-CDF boundaries are decimal prefix sums
  * compared in double — so the oracle replays every sampled negative
  * bit-for-bit.
  *
  * Scale shape:
  *  - positives are generated IN-ROW (nested transform over the doc's
  *    own token array — no struct in the lambda, the q149 codegen
  *    lesson; pairs leave the row as strings and explode to ≤
  *    2·window·tokens rows);
  *  - the sampling vocabulary is CAPPED to the `vocabCap` most
  *    frequent tokens (what word2vec does anyway), so the CDF table is
  *    bounded and broadcasts; its prefix sum runs over ≤ vocabCap rows
  *    (the benign bounded-window shape);
  *  - each negative finds its CDF interval through a BUCKET-equality
  *    join (floor(scaled/W·B) — every interval covers a contiguous
  *    bucket range, exploded vocab-side to ≤ vocabCap + B rows), never
  *    a broadcast-nested-loop range probe;
  *  - the gate aggregates per (center, label) for hashability; the
  *    trainer-facing product is the raw pair frame ([[skipgramPairs]] /
  *    [[negativePairs]]), corpus-linear by construction.
  */
object SkipGram {

  /** q153: window ±2, 2 negatives per center occurrence, vocab cap
    * 4096, summarized per (center, label). */
  def q153SkipgramPairs(s: SparkSession, dir: String): DataFrame =
    skipgramSummary(Tables.documents(s, dir),
      window = 2, negK = 2, vocabCap = 4096)

  /** Positive pairs: one row per (center position, in-window context),
    * generated in-row and exploded as strings. */
  def skipgramPairs(docs: DataFrame, window: Int): DataFrame = {
    val l = col("l")
    val s_ = size(l)
    val pairsArr =
      when(s_ === 0, array().cast("array<string>"))
        .otherwise(flatten(transform(sequence(lit(1), s_), i =>
          transform(
            filter(sequence(greatest(i - window, lit(1)),
              least(i + window, s_)), j => j =!= i),
            j => concat(element_at(l, i), lit(" "), element_at(l, j))))))
    Par.widen(docs)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("l"))
      .select(col("doc_id"), explode(pairsArr).as("p"))
      .select(col("doc_id"),
        split(col("p"), " ", 2).getItem(0).as("center"),
        split(col("p"), " ", 2).getItem(1).as("context"))
  }

  /** The capped unigram^0.75 CDF: (token, lo, hi) decimal prefix
    * boundaries over the `vocabCap` most frequent tokens, in token
    * order, plus the grand total W on every row. */
  private def vocabCdf(toks: DataFrame, vocabCap: Int): DataFrame = {
    val counts = toks.groupBy(col("t")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t")).limit(vocabCap)
    val w9 = round(pow(col("cnt").cast("double"), 0.75), 9)
      .cast("decimal(20,9)")
    // ≤ vocabCap rows: the bounded-window shape, not a corpus window
    val cum = sum(col("w9")).over(Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val withCum = counts.withColumn("w9", w9)
      .withColumn("hi", cum)
      .withColumn("lo", col("hi") - col("w9"))
    val tot = withCum.agg(max(col("hi")).as("W"))
    withCum.crossJoin(broadcast(tot))
      .select(col("t"), col("lo"), col("hi"), col("W"))
  }

  /** Sampled negatives: `negK` rows per center occurrence, context
    * drawn by exact inverse-CDF over the capped unigram^0.75 table. */
  def negativePairs(docs: DataFrame, negK: Int, vocabCap: Int,
                    buckets: Int = 1024): DataFrame = {
    val toksFrame = Par.widen(docs)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("l"))
    val toks = toksFrame.select(explode(col("l")).as("t"))
    val cdf = vocabCdf(toks, vocabCap)

    val wD = col("W").cast("double")
    // vocab side: each interval covers a contiguous bucket range,
    // WIDENED ±1 bucket — the probe buckets on floor(u·B) while this
    // side buckets on floor(lo/W·B), and (u·W)/W can sit 1 ulp off u,
    // which at a bucket boundary would shift floor by one and silently
    // drop the draw; the widening only adds candidates, the exact
    // interval filter after the join still decides
    val vb = cdf
      .withColumn("bLo", greatest(
        floor(col("lo").cast("double") / wD * buckets).cast("int") - 1,
        lit(0)))
      .withColumn("bHi", least(
        floor(col("hi").cast("double") / wD * buckets).cast("int") + 1,
        lit(buckets - 1)))
      .select(col("t"), col("lo"), col("hi"), col("W"),
        explode(sequence(col("bLo"), col("bHi"))).as("b"))

    // one row per (center occurrence, draw index), seeded like q62
    val draws = toksFrame
      .select(col("doc_id"), posexplode(col("l")))
      .select(col("doc_id"), (col("pos") + 1).as("i"), col("col").as("center"))
      .select(col("*"), explode(sequence(lit(1), lit(negK))).as("j"))
    val h52 = conv(substring(md5(concat(lit("neg:"),
      col("doc_id").cast("string"), lit(":"), col("i").cast("string"),
      lit(":"), col("j").cast("string"))), 1, 13), 16, 10).cast("long")
    val u = (h52.cast("double") + 1.0) / lit(4503599627370496.0) // 2^52, u ∈ (0,1]
    // scaled/W = u, so the sample's bucket is floor(u·B) — no W needed
    // on the probe side; the interval check runs after the equi-join
    val probes = draws.withColumn("u", u)
      .withColumn("b",
        least(floor(col("u") * buckets), lit(buckets - 1)).cast("int"))

    probes.join(broadcast(vb), Seq("b"))
      .withColumn("scaled", col("u") * col("W").cast("double"))
      .filter(col("lo").cast("double") < col("scaled") &&
        col("scaled") <= col("hi").cast("double"))
      .select(col("doc_id"), col("center"), col("t").as("context"))
  }

  /** The gate summary: per (center, label) pair count, distinct
    * contexts, and a COMMUTATIVE digest of the context multiset — the
    * sum of each context's 52-bit md5 value in DECIMAL(38,0), which is
    * order-free and map-side combinable. A sorted collect_list md5
    * would be corpus-UNBOUNDED per key (a stop-word center gathers a
    * constant fraction of all pairs in one group — the q71-class
    * hot-key cliff); the sum never materializes a group and cannot
    * overflow 38 digits below ~10²⁲ pairs per key. */
  def skipgramSummary(docs: DataFrame, window: Int, negK: Int,
                      vocabCap: Int): DataFrame = {
    val pos = skipgramPairs(docs, window)
      .select(col("center"), col("context"), lit(1L).as("label"))
    val neg = negativePairs(docs, negK, vocabCap)
      .select(col("center"), col("context"), lit(0L).as("label"))
    val h52 = conv(substring(md5(col("context")), 1, 13), 16, 10)
      .cast("decimal(38,0)")
    pos.unionByName(neg)
      .groupBy(col("center"), col("label"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("context")).cast("long").as("n_ctx"),
        // stringified: a 38-digit decimal survives the pandas gate as
        // exact text, never a lossy float (the q91 stringify rule)
        sum(h52).cast("decimal(38,0)").cast("string").as("ctx_hash"))
      .orderBy(col("center"), col("label"))
  }
}
