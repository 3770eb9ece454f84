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
  * Scale shape: bucketing is a pure narrow expression (md5 + hex→long);
  * the per-(doc, bucket) counts come from ONE in-row pass — the
  * bucketed token array is sorted and equal runs are counted from the
  * run-start positions, then exploded as (bucket, n) pairs. So the
  * explode emits ≤ min(|tokens|, D) rows per doc (the distinct-bucket
  * count), never the raw token stream, and there is NO shuffle at all —
  * the histogram never leaves its row. md5 keys the engine↔oracle
  * parity: both sides derive the same 32-bit prefix integer. */
object FeatureHash {

  /** Bucket id for one token: first 8 md5 hex chars as a uint32, mod
    * `dims`. conv() parses unsigned hex, so the long is non-negative. */
  def bucketOf(token: Column, dims: Int): Column =
    pmod(conv(substring(md5(token), 1, 8), 16, 10).cast("long"), lit(dims.toLong))

  /** Sparse hashed count vector per row: (idCol, bucket, n) for every
    * occupied bucket, from an array<string> token column. In-row run
    * counting: sort the bucketed array; a run starts at 1-based
    * position i where b[i] ≠ b[i-1]; its length is the next start (or
    * end+1) minus its own. Rows with no tokens emit nothing (an empty
    * doc has an all-zero feature vector). */
  def hashedCounts(rows: DataFrame, idCol: String, tokensCol: String,
                   dims: Int): DataFrame =
    rows
      .withColumn("__b", sort_array(transform(col(tokensCol),
        tok => bucketOf(tok, dims))))
      .filter(size(col("__b")) > 0)
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
