package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Pointwise mutual information over document-level token
  * co-occurrence — the classic collocation / related-term statistic
  * (Church & Hanks, CL 1990): `pmi(a,b) = ln(n_ab · N / (n_a · n_b))`
  * with document counts as the probability estimates. The corpus
  * analytics behind phrase mining, taxonomy seeds, and "what co-occurs
  * with this entity" exploration.
  *
  * Scale shape (the q116 rule, token edition): pairs are generated
  * IN-ROW from each doc's sorted distinct token set CAPPED at
  * `maxTokens` — a 10⁵-distinct-token doc would emit n²/2 pairs, so
  * the cap bounds per-doc fan-out on engine AND oracle (the capped set
  * is also what the marginals count, keeping pmi self-consistent).
  * Both the pair counts and the marginals are map-side-combined
  * aggregates; N rides a broadcast 1-row cross join. ln differs by
  * ulps across libms (the q41 note) — pmi is rounded to 6, far above
  * ulp scale on this value range. */
object Collocations {

  /** Document-frequency PMI over capped distinct token sets:
    * (t1, t2, n_pair, pmi) for pairs in ≥ `minPairDocs` docs with
    * positive pmi. */
  def pmiPairs(docs: DataFrame, textCol: String, idCol: String,
               maxTokens: Int, minPairDocs: Long): DataFrame = {
    val capped = docs.select(col(idCol).as("__id"),
      slice(array_sort(array_distinct(
        TextAnalysis.tokens(col(textCol)))), 1, maxTokens).as("__ts"))
    val nDocs = capped.agg(count(lit(1)).as("__n"))
    // in-row ordered pairs from the sorted set (t1 < t2 structural)
    val pairCounts = capped
      .select(explode(flatten(transform(col("__ts"), (x, pos) =>
        transform(slice(col("__ts"), pos + 2, size(col("__ts"))),
          y => struct(x.as("t1"), y.as("t2")))))).as("p"))
      .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairDocs)
    val marginals = capped
      .select(explode(col("__ts")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
    pairCounts
      .join(marginals.select(col("t").as("t1"), col("df").as("__d1")), Seq("t1"))
      .join(marginals.select(col("t").as("t2"), col("df").as("__d2")), Seq("t2"))
      .crossJoin(broadcast(nDocs))
      .select(col("t1"), col("t2"), col("n_pair"),
        round(log(col("n_pair").cast("double") * col("__n").cast("double") /
          (col("__d1").cast("double") * col("__d2").cast("double"))), 6).as("pmi"))
      .filter(col("pmi") > 0.0)
  }

  /** q133: positive-PMI collocations in ≥ 5 docs, 48-token cap. */
  def q133PmiCollocations(s: SparkSession, dir: String): DataFrame =
    pmiPairs(Tables.documents(s, dir), "text", "doc_id",
      maxTokens = 48, minPairDocs = 5L)
      .orderBy(col("t1"), col("t2"))
}
