package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Per-dimension feature standardization (z-scoring) of an embedding
  * column — the normalization pass a training pipeline runs before
  * clustering or mixing embedding families whose dimensions carry
  * different scales, plus the per-vector outlier summary that feeds
  * anomaly triage (a corrupted encoder run shows up as |z| spikes).
  *
  * Scale shape: the stats pass posexplodes to (dim, value) but the
  * shuffle moves only DIM-COUNT × partitions map-side-combined partials
  * (64 dims × 32 tasks, not |corpus|×64 rows). Cross-row float sums are
  * NOT reproducible under re-partitioning, so each element is rounded
  * to a fixed scale and summed as DECIMAL — exact, associative,
  * order-free (the q42/runningSum rule applied to moments). The apply
  * pass never explodes: the 64 (mu, sigma) pairs ride one broadcast
  * 1-row cross join as sorted arrays, and z-scoring is an in-row
  * `transform` over the vector — a pure narrow map at corpus scale. */
object Standardize {

  /** Per-dimension (dim, n, mu, sigma) from exact decimal moment sums.
    * `dim` is 0-based vector position. */
  def dimStats(emb: DataFrame, vecCol: String): DataFrame = {
    val ex = emb.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"), col("x").cast("double").as("xi"))
    ex.groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("xi"), 6).cast("decimal(28,6)")).as("s1"),
        sum(round(col("xi") * col("xi"), 12).cast("decimal(28,12)")).as("s2"))
      .withColumn("mu", col("s1").cast("double") / col("n").cast("double"))
      .withColumn("sigma", sqrt(greatest(
        col("s2").cast("double") / col("n").cast("double") - col("mu") * col("mu"),
        lit(0.0))))
      .select(col("dim"), col("n"), col("mu"), col("sigma"))
  }

  /** Per-vector standardized outlier summary: worst |z| across dims and
    * the count of dims with |z| > `zCut`. Stats arrive as broadcast
    * arrays; z-scoring is in-row. A zero-sigma dimension (constant
    * feature) standardizes to 0 by convention. */
  def outlierSummary(emb: DataFrame, vecCol: String, idCol: String,
                     zCut: Double = 2.0): DataFrame = {
    val packed = dimStats(emb, vecCol).agg(
      transform(sort_array(collect_list(struct(col("dim"), col("mu")))),
        e => e("mu")).as("mus"),
      transform(sort_array(collect_list(struct(col("dim"), col("sigma")))),
        e => e("sigma")).as("sigmas"))
    emb.crossJoin(broadcast(packed))
      .withColumn("z", transform(col(vecCol), (x, i) =>
        when(element_at(col("sigmas"), i + 1) > 0.0,
          abs((x.cast("double") - element_at(col("mus"), i + 1)) /
            element_at(col("sigmas"), i + 1)))
          .otherwise(lit(0.0))))
      .select(col(idCol).as("vec_id"),
        size(col("z")).cast("long").as("n_dims"),
        round(array_max(col("z")), 6).as("z_max"),
        size(filter(col("z"), z => z > zCut)).cast("long").as("n_outliers"))
  }

  /** q127: standardized outlier summary over the embeddings table. */
  def q127EmbeddingStandardize(s: SparkSession, dir: String): DataFrame =
    outlierSummary(Tables.embeddings(s, dir), "embedding", "vec_id")
      .orderBy(col("vec_id"))
}
