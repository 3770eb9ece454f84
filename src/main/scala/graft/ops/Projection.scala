package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Johnson–Lindenstrauss random projection over the int8-quantized
  * embeddings (Achlioptas 2001's database-friendly ±1 variant: each
  * projected coordinate is a Rademacher-signed sum of the inputs —
  * inner products are preserved in expectation, so projected cosine
  * tracks full-dim cosine).
  *
  * Why INTEGER and why these signs:
  *  - projecting the int8-quantized vector keeps every coordinate an
  *    exact 64-bit sum — no float accumulation order exists on either
  *    engine, so the oracle hash-matches the whole projected vector
  *    (the q38 rule extended to a matrix product);
  *  - the sign matrix is DERIVED, not stored: sign(j,i) = +1 iff the
  *    last hex nibble of md5("rp:j:i") < 8. Both engines compute the
  *    same md5, so query and oracle agree on every entry without a
  *    side-channel table — and a 1000-executor run broadcasts nothing
  *    (each task re-derives the k×d matrix from the literal in the
  *    plan, ~1k scalars).
  *
  * Scale shape: ONE narrow codegen'd pass (k zip_with/aggregate HOF
  * chains per row, k·d integer mul-adds — d=64, k=24 → ~1.5k ops/row);
  * no shuffle, no driver data. The projected table is the cheap
  * coarse-search side of a reduce-then-rerank ANN: 24 ints = 96
  * bytes/row vs 256 bytes of floats — ~2.7× less candidate-scan IO at
  * probe time, with the exact re-rank fetching full vectors for
  * survivors only (the PQ/ADC pattern with a weaker-but-simpler code;
  * PQ's 8-byte codes remain the stronger compression, JL keeps a
  * LINEAR geometry — no codebook to train/refresh, appends never
  * drift).
  *
  * Measured on this weakly-clustered corpus (sf0.001, recall@10 of the
  * exact top-10, rerank from a 500-vector corpus): kProj=16/rerank=50
  * → 0.48, 16/100 → 0.64, 24/50 → 0.62, **24/100 → 0.84**, 32/100 →
  * 0.84 — 24 is the knee, so it is the default.
  */
object Projection {

  /** Deterministic Rademacher sign: +1 iff the low nibble of the last
    * md5 byte of "rp:j:i" is < 8 — i.e. the 32nd hex digit < '8'. */
  def sign(j: Int, i: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$j:$i".getBytes("UTF-8"))
    if ((d(15) & 0x08) == 0) 1 else -1
  }

  def signMatrix(k: Int, d: Int): Array[Array[Int]] =
    Array.tabulate(k, d)(sign)

  /** y_j = Σ_i sign(j,i)·q_i for each output dim j — exact ints
    * (|y_j| ≤ d·127 = 8128 at d=64, so INT is the honest storage type:
    * 24 ints = 96 bytes/row vs 256 bytes of floats on the coarse
    * scan). */
  def projectQ(q: Column, signs: Array[Array[Int]]): Column =
    array(signs.map { row =>
      aggregate(
        zip_with(q, typedLit(row.toSeq), (x, s) => x * s.cast("long")),
        lit(0L), (acc, e) => acc + e).cast("int")
    }: _*)

  /** q92: the projected-embedding table — per vector the k=16 exact
    * integer JL coordinates (scale rides along so a consumer can map
    * projected dots back to the float magnitude). Null or empty
    * embeddings project to an EMPTY vector (the q28/q64 rule: they can
    * never score anyway), keeping the row present for audit. */
  def q92RandomProjection(s: SparkSession, dir: String, k: Int = 24): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val d = 64 // the corpus layout's dimension; signs are (j,i)-derived,
               // so another width only changes this constant
    val signs = signMatrix(k, d)
    // Joined-string projection column (the q35 rule: the driver gate
    // can't sort raw arrays; both sides stringify in the final select).
    Quantize.quantized(emb)
      .select(col("vec_id"), col("scale"),
        when(size(col("embedding")) > 0, projectQ(col("q"), signs))
          .otherwise(expr("CAST(array() AS ARRAY<INT>)")).as("p"))
      .select(col("vec_id"), col("scale"),
        array_join(transform(col("p"), x => x.cast("string")), ",").as("proj"))
      .orderBy(col("vec_id"))
  }

  /** Reduce-then-rerank ANN over the projection: coarse top-`rerank`
    * by projected cosine (16-long rows on the scan), exact float
    * re-rank of the survivors — the [[ProductQuantization.adcTopK]]
    * dataflow with the JL code standing in for ADC. Candidate cut and
    * final cut are both bounded top_k aggregates; nothing corpus-scale
    * is ever sorted. */
  def projectedTopK(emb: DataFrame, queries: DataFrame, k: Int = 10,
                    rerank: Int = 100, kProj: Int = 24): DataFrame = {
    val d = 64
    val signs = signMatrix(kProj, d)
    val valid = emb.filter(size(col("embedding")) > 0)
    val corpus = Quantize.quantized(valid)
      .select(col("vec_id"), projectQ(col("q"), signs).as("cp"))
    val qs = Quantize.quantized(
        queries.select(col("vec_id").as("query_id"), col("embedding")))
      .select(col("query_id"), projectQ(col("q"), signs).as("qp"))
    // projected cosine: scales cancel exactly as in quantizedCosine
    // (int_dot takes longs; the widen costs nothing — storage stays int)
    val coarse = corpus.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", Quantize.quantizedCosine(
        col("cp").cast("array<bigint>"), col("qp").cast("array<bigint>")))
      .filter(col("score").isNotNull)
    val cands = TopKPerGroup.topKPerKey(coarse, "query_id", "score", "vec_id", rerank)
      .select(col("key").as("query_id"), col("id").as("vec_id"))
    // exact float re-rank of the bounded candidate set
    val withVecs = cands
      .join(valid.select(col("vec_id"), col("embedding").as("ce")), "vec_id")
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qe"))), "query_id")
      .withColumn("cos", Similarity.cosine(col("ce"), col("qe")))
    TopKPerGroup.topKPerKey(withVecs, "query_id", "cos", "vec_id", k)
      .select(col("key").as("query_id"), col("rank"),
        col("id").as("vec_id"), col("score").as("cos"))
  }
}
