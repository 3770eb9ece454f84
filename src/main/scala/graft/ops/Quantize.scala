package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Int8 embedding quantization — the standard 4× storage/IO compressor
  * for ANN layouts: symmetric per-vector scale (max|x| / 127), values
  * rounded to [-127, 127]. A cell-bucketed corpus stored int8
  * ([[Similarity.writeCellBucketed]]'s natural companion) reads 4× fewer
  * bytes per probe, and because cosine is scale-invariant the quantized
  * rerank needs no dequantization at all: cos(q̂a, q̂b) over the integer
  * vectors IS the quantized cosine (the per-vector scales cancel).
  *
  * Everything is in-row HOFs (no UDFs, no shuffle — a pure narrow map),
  * and the q38 outputs are integers plus two IEEE-deterministic doubles
  * (single-division scale; error chain rounded to 12), so the DuckDB
  * oracle hash-matches.
  */
object Quantize {

  /** Per-vector symmetric int8 quantization: (vec_id, scale, q) with
    * q_i = floor(x_i/scale + 0.5) ∈ [-127, 127] (round-half-up matches
    * both engines' floor semantics; an all-zero vector gets scale 0 and
    * q = 0s). */
  def quantized(emb: DataFrame): DataFrame =
    emb
      .withColumn("maxabs",
        array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .withColumn("scale", col("maxabs") / lit(127.0))
      .withColumn("q",
        when(col("maxabs") > 0,
          transform(col("embedding"),
            x => floor(x.cast("double") / col("scale") + lit(0.5))))
          .otherwise(transform(col("embedding"), _ => lit(0L))))
      .drop("maxabs")

  /** Cosine over integer-quantized vectors — scales cancel, so this is
    * pure integer dot products fed into one double division. */
  def quantizedCosine(qa: Column, qb: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, r) => p * r), lit(0L), (acc, e) => acc + e)
    dot(qa, qb).cast("double") /
      (sqrt(dot(qa, qa).cast("double")) * sqrt(dot(qb, qb).cast("double")))
  }

  /** q38: quantization audit over the embeddings table — per vector the
    * scale, integer checksums of the quantized vector, and the max
    * reconstruction error (must be ≤ scale/2 by construction; asserted
    * in OpsSpec, hash-checked by the oracle). */
  def q38Quantize(s: SparkSession, dir: String): DataFrame =
    quantized(Tables.embeddings(s, dir))
      .select(
        col("vec_id"),
        col("scale"),
        aggregate(col("q"), lit(0L), (acc, e) => acc + e).as("q_sum"),
        array_min(col("q")).cast("long").as("q_min"),
        array_max(col("q")).cast("long").as("q_max"),
        // |q_i·scale − x_i|: multiply/subtract chains can fuse to FMA
        // differently per engine (~1e-17 drift — same as q34/q36), so
        // the error is rounded to 12 digits on both sides
        round(array_max(zip_with(col("q"), col("embedding"),
          (qi, x) => abs(qi * col("scale") - x.cast("double")))), 12).as("max_err"))
      .orderBy(col("vec_id"))
}
