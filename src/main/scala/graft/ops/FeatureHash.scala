package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Hashing-trick featurization — tokens mapped straight into a
  * fixed-width bucket space with no vocabulary pass (Weinberger et al.,
  * ICML 2009): `bucket = md5(token)[0:8] as uint mod D`. The
  * vocabulary-free sibling of q91's trained token-ID encoding: no
  * dictionary to train, broadcast, or keep in sync — the price is
  * collisions, which a linear model absorbs and which `D` controls.
  *
  * Scale shape — an instructive MEASURED reversal of the repo's usual
  * in-row-first rule: the no-shuffle formulation ([[hashedCountsInRow]],
  * sorted bucket array + run counting, histogram never leaves its row)
  * loses badly here, because higher-order functions (`transform`/
  * `filter`/`aggregate`) evaluate INTERPRETED — outside whole-stage
  * codegen — at ~µs/element, and a narrow op also inherits the scan's
  * partitioning (one fat parquet file = ONE task doing all the work).
  * The explode+groupBy formulation ([[hashedCounts]], the primary) runs
  * generate → codegen'd md5/conv projection → hash aggregate entirely
  * inside WholeStageCodegen, and its map-side combine bounds the
  * shuffle to ≤ min(|tokens|, D) rows per doc — the tiny-output
  * shuffle buys codegen and scan-independent parallelism. Soak numbers
  * in COVERAGE.md. md5 keys the engine↔oracle parity: both sides
  * derive the same 32-bit prefix integer. */
object FeatureHash {

  /** Bucket id for one token: first 8 md5 hex chars as a uint32, mod
    * `dims`. conv() parses unsigned hex, so the long is non-negative. */
  def bucketOf(token: Column, dims: Int): Column =
    pmod(conv(substring(md5(token), 1, 8), 16, 10).cast("long"), lit(dims.toLong))

  /** Sparse hashed count vector per row: (idCol, bucket, n) for every
    * occupied bucket, from an array<string> token column. The primary
    * (codegen) formulation: explode tokens, bucket in a codegen'd
    * projection, hash-aggregate with map-side combine (≤ min(|tokens|,
    * dims) shuffled rows per doc). Rows with no tokens emit nothing
    * (an empty doc has an all-zero feature vector). */
  def hashedCounts(rows: DataFrame, idCol: String, tokensCol: String,
                   dims: Int): DataFrame =
    rows.select(col(idCol), explode(col(tokensCol)).as("__tok"))
      .select(col(idCol), bucketOf(col("__tok"), dims).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("n"))

  /** The no-shuffle alternative, kept for the measured comparison (see
    * object scaladoc): sort the bucketed array in-row; a run starts at
    * 1-based position i where b[i] ≠ b[i-1]; its length is the next
    * start (or end+1) minus its own. The emptiness filter reads
    * `size(tokensCol)` — filtering on the DERIVED array would push the
    * whole interpreted transform+sort chain into the predicate and
    * evaluate it twice per row. */
  def hashedCountsInRow(rows: DataFrame, idCol: String, tokensCol: String,
                        dims: Int): DataFrame =
    rows
      .filter(size(col(tokensCol)) > 0)
      .withColumn("__b", sort_array(transform(col(tokensCol),
        tok => bucketOf(tok, dims))))
      .withColumn("__starts",
        filter(sequence(lit(1), size(col("__b"))),
          i => i === lit(1) ||
            element_at(col("__b"), i) =!= try_element_at(col("__b"), i - 1)))
      .select(col(idCol), col("__b"), col("__starts"),
        posexplode(col("__starts")).as(Seq("__si", "__s")))
      .select(col(idCol),
        element_at(col("__b"), col("__s")).as("bucket"),
        // the last run has no next start — its end is the array end
        (coalesce(try_element_at(col("__starts"), col("__si") + 2),
          size(col("__b")) + 1) - col("__s")).cast("long").as("n"))

  /** q129: hashed 64-bucket token counts over documents. */
  def q129FeatureHash(s: SparkSession, dir: String): DataFrame =
    hashedCounts(
      Tables.documents(s, dir)
        .withColumn("__toks", TextAnalysis.tokens(col("text"))),
      "doc_id", "__toks", dims = 64)
      .orderBy(col("doc_id"), col("bucket"))
}
