package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data valuation: the exact SHAPLEY VALUE of every source for the
  * corpus's distinct-3-gram coverage — "how much vocabulary does this
  * source actually buy us?", the question behind source licensing and
  * mixture-pruning decisions. Reference scope note: the reference
  * engine has no valuation surface (its cmd scripts only export); this
  * belongs to the engine's training-data extension layer next to q45's
  * mixture weights and q75's source diversity.
  *
  * Exactness without 2^|sources| subsets: for a COVERAGE game
  * v(C) = |grams covered by C|, the Shapley value has a closed form —
  * each gram splits its one unit of value equally among the sources
  * that carry it, φ_src = Σ_{g ∋ src} 1/|sources(g)| (Shapley 1953;
  * the standard cost-sharing identity: a gram's marginal contribution
  * is 1 exactly when the source arrives first among the gram's
  * carriers, which happens in 1/|sources(g)| of all orderings). So the
  * exact game-theoretic answer costs two aggregates, not 2^20
  * coalition evaluations.
  *
  * Scale shape: distinct (source, gram) pairs come from the same
  * in-row shingle dedup as q25 (array_distinct before the explode —
  * shared-prefix discipline), ONE distinct shuffle; per-gram carrier
  * counts are a second aggregate on the gram key; the value join rides
  * the same gram partitioning; the final per-source fold is a ≤
  * |sources| frame with the 1-row vocabulary total attached by
  * broadcast. Nothing is ever corpus-quadratic and no subset is ever
  * enumerated.
  *
  * Determinism: counts exact; each gram's 1/n_sources is rounded 12
  * then summed as DECIMAL(28,12) — exact and order-independent (the
  * q41 rule), so Σ_src φ_src reproduces |vocab| to the rounding
  * quantum and the oracle's aggregation order cannot drift the hash. */
object Valuation {

  /** Per-source Shapley coverage value over distinct word-n-grams of
    * `docs` (doc_id, text, source): (source, n_grams, n_unique_grams,
    * shapley, vocab_share). `n_unique_grams` is the source's count of
    * grams no other source carries — its marginal value if added LAST,
    * the pessimistic companion the Shapley number interpolates. */
  def sourceShapley(docs: DataFrame, n: Int): DataFrame = {
    // ride q25's in-row shingle front end with the SOURCE as the key:
    // per-(doc=source-slice) array_distinct pre-shrinks the explode, the
    // one distinct shuffle finishes the per-source gram sets
    val sg = Dedup.shingles(docs.withColumn("doc_id", col("source")), n)
      .select(col("doc_id").as("source"), col("g")).distinct()
    val carriers = sg.groupBy(col("g")).agg(count(lit(1)).as("n_sources"))
    val vocab = carriers.agg(count(lit(1)).as("n_vocab"))
    sg.join(carriers, Seq("g"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("n_sources") === 1L, 1L).otherwise(0L)).as("n_unique_grams"),
        sum(round(lit(1.0) / col("n_sources").cast("double"), 12)
          .cast("decimal(28,12)")).cast("double").as("shapley"))
      .crossJoin(broadcast(vocab))
      .withColumn("vocab_share",
        round(col("shapley") / col("n_vocab").cast("double"), 12))
      .select(col("source"), col("n_grams"), col("n_unique_grams"),
        col("shapley"), col("vocab_share"))
      .orderBy(col("source"))
  }

  /** q189: 3-gram coverage Shapley over the documents corpus. */
  def q189SourceShapley(s: SparkSession, dir: String): DataFrame =
    sourceShapley(Tables.documents(s, dir), 3)
}
