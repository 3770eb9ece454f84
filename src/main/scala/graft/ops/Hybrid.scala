package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.exprs

/** Hybrid retrieval — fuse the engine's lexical (BM25, q58 machinery)
  * and dense (embedding-cosine, q28 machinery) rankings with Reciprocal
  * Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
  * `rrf(d) = Σ_lists 1/(K + rank_list(d))`, the standard score-free
  * fusion every hybrid-search / RAG stack runs because BM25 scores and
  * cosine scores live on incomparable scales.
  *
  * The probe is a DOCUMENT (its distinct tokens are the lexical query,
  * its embedding the dense query — classic more-like-this), excluded
  * from the corpus on both sides so the trivial self-match doesn't
  * occupy rank 1.
  *
  * Scale shape: the lexical side is q58's pre-pruned posting dataflow
  * unchanged; the dense side is one codegen'd float-cosine corpus scan
  * with a `TakeOrderedAndProject` bounded top-kf (never a window over
  * the corpus), decimal-exact rescoring only on the kf survivors, and
  * the q28 widening guard proving the float cut didn't clip the
  * decimal top-k. Fusion itself touches two ≤`listK`-row frames.
  * Ranks are decimal-exact on both engines (BM25 partials and cosines
  * are the audited round-12 decimals), so the fused ordering replays
  * bit-for-bit in the oracle.
  */
object Hybrid {

  /** q151: RRF (K=60) over BM25 top-50 and cosine top-50 for probe
    * document 0, fused top-20. */
  def q151HybridRrf(s: SparkSession, dir: String): DataFrame =
    hybridRrf(Tables.documents(s, dir), Tables.embeddings(s, dir),
      probeId = 0L, listK = 50, fuseK = 20, rrfK = 60)

  /** The reusable core: `docs` (doc_id, text) and `emb` (vec_id,
    * embedding) share an id space; the probe doc supplies both query
    * representations. Output: the `fuseK` best docs by RRF with each
    * list's rank (NULL where the doc missed that list) and the fused
    * score. */
  def hybridRrf(docs: DataFrame, emb: DataFrame, probeId: Long,
                listK: Int, fuseK: Int, rrfK: Int): DataFrame = {
    // the probe's distinct tokens — a single document's vocabulary, the
    // same bounded 1-row collect as q28's query-side broadcast
    val terms = docs.filter(col("doc_id") === probeId)
      .select(array_sort(array_distinct(TextAnalysis.tokens(col("text")))).as("t"))
      .head().getSeq[String](0)
    require(terms.nonEmpty, s"probe doc $probeId has no tokens")

    val corpus = docs.filter(col("doc_id") =!= probeId)
    val lex = Retrieval.bm25TopK(corpus, terms, listK)
      // ≤ listK rows: the global window is over a limited frame (the
      // audited benign shape), re-deriving ranks from the k results
      .withColumn("rank_lex", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rank_lex"))

    val dense = denseTopK(emb, probeId, listK)

    val fused = lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        rrfTerm(col("rank_lex"), rrfK) + rrfTerm(col("rank_dense"), rrfK))
      .orderBy(col("rrf").desc, col("doc_id")).limit(fuseK)
    fused.select(col("doc_id"), col("rank_lex"), col("rank_dense"),
        col("rrf").cast("double").as("rrf_score"))
      .orderBy(col("doc_id"))
  }

  /** One list's RRF contribution: round-12 double of 1/(K+rank) cast to
    * decimal so the two-list sum is exact, 0 when the doc missed the
    * list. The division's operands are small exact integers — the same
    * IEEE result on any engine — and round-12 absorbs nothing here; it
    * mirrors the repo-wide float discipline. */
  private def rrfTerm(rank: org.apache.spark.sql.Column, rrfK: Int) =
    coalesce(round(lit(1.0) / (lit(rrfK.toLong) + rank), 12)
      .cast("decimal(28,12)"), lit(0).cast("decimal(28,12)"))

  /** Exact cosine top-k for one probe vector: float-cosine corpus scan
    * → bounded top-kf (TakeOrderedAndProject) → decimal rescore of the
    * kf survivors → q28's guard (exact iff the heap never filled or the
    * decimal rank-k clears the float cutoff by more than the summation
    * error band), widening kf ×4 on the (never-observed) failure path. */
  private def denseTopK(emb: DataFrame, probeId: Long, k: Int): DataFrame = {
    val probe = broadcast(emb.filter(col("vec_id") === probeId)
      .select(col("embedding").as("qe")))
    // zero-norm vectors cosine to NaN, which sorts above every double —
    // drop them (the q36 rule; the float pass surfaces the NaN cheaply)
    val fscored = emb.filter(col("vec_id") =!= probeId).crossJoin(probe)
      .select(col("vec_id"), col("embedding"), col("qe"),
        exprs.cosine_similarity(col("qe"), col("embedding")).as("fcos"))
      .filter(!isnan(col("fcos")))

    @annotation.tailrec
    def attempt(kf: Int, widenings: Int): DataFrame = {
      val survivors = fscored.orderBy(col("fcos").desc, col("vec_id")).limit(kf)
        .withColumn("cos",
          round(Similarity.decCosine(col("qe"), col("embedding")), 12))
        .withColumn("rank_dense", row_number()
          .over(Window.orderBy(col("cos").desc, col("vec_id"))).cast("long"))
        .select(col("vec_id").as("doc_id"), col("rank_dense"),
          col("cos"), col("fcos"))
      val rows = survivors.collect() // ≤ kf rows by construction
      val exact = rows.length < kf || {
        val fmin = rows.iterator.map(_.getAs[Double]("fcos")).min
        val dk = rows.find(_.getAs[Long]("rank_dense") == k.toLong)
          .map(_.getAs[Double]("cos")).getOrElse(Double.NegativeInfinity)
        dk - fmin > Similarity.FloatGuardBand
      }
      if (exact) {
        val s = emb.sparkSession
        s.createDataFrame(
            s.sparkContext.parallelize(rows.toIndexedSeq, 1), survivors.schema)
          .filter(col("rank_dense") <= k)
          .select(col("doc_id"), col("rank_dense"))
      } else if (widenings >= MaxWidenings) {
        // a tie-heavy corpus (dk - fmin stuck at 0, e.g. many identical
        // float cosines at the cut) would otherwise widen until kf
        // exceeds the corpus — a silent full driver-side collect
        sys.error(s"denseTopK: guard still ambiguous after $MaxWidenings " +
          s"×4 widenings (kf=$kf, probe=$probeId) — degenerate tie plateau " +
          "at the cut; raise MaxWidenings deliberately or dedup the corpus")
      } else {
        println(s"denseTopK: float/decimal guard failed at kf=$kf " +
          s"(probe=$probeId), widening to ${kf * 4} (attempt ${widenings + 1}/$MaxWidenings)")
        attempt(kf * 4, widenings + 1)
      }
    }
    attempt(k + 16, 0)
  }

  /** Bound on denseTopK's guard-failure widenings: each ×4 retry is a
    * driver-side collect of kf rows, so an unbounded loop on a
    * degenerate (tie-plateau) corpus degrades to collecting the whole
    * scored table. 3 attempts = ×64 headroom — never observed needed. */
  private val MaxWidenings = 3
}
