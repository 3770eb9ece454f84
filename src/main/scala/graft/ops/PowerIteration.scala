package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Leading principal component of the embedding table by POWER
  * ITERATION on the (mean-centered) covariance — matrix-free: each
  * iteration is ONE corpus pass computing Σv = (1/n)·Σᵢ xᵢ(xᵢ·v) −
  * μ(μ·v), so the 64×64 covariance is never materialized and the
  * pass shape is exactly the q68/q202 cached-aggregate-training
  * family (k passes over a cached narrow frame, bounded per-dim
  * reads back to the driver). The spectrum read matters to the ANN
  * family directly: a dominant PC means anisotropic embeddings —
  * PQ/IVF cell shapes and JL distortion all degrade — and
  * `explained_frac` is the one-number diagnostic.
  *
  * Determinism (the oracle unrolls every iteration): every dot and
  * every per-dim accumulation is a decimal sum of ROUNDED-12 terms
  * (order-free — Spark may fold sequentially and DuckDB may sum
  * unnested rows in any order; exact decimal addition commutes), and
  * every derived scalar (normalizer, eigenvalue, update) is rounded
  * 12 before reuse. The deterministic start vector is uniform
  * 1/√dims. λ is the final iterate's ‖Σv‖ (the power-iteration
  * eigenvalue estimate), explained_frac = λ / trace(Σ) with the
  * trace from exact per-dim moments. */
object PowerIteration {

  private def r12(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** q212: (dim, mean, loading, eigenvalue, explained_frac) — 1-indexed
    * dims; loading = the unit leading-PC coordinate. */
  def q212LeadingPc(s: SparkSession, dir: String, iters: Int = 10): DataFrame =
    leadingPc(Tables.embeddings(s, dir), iters)

  /** The power-iteration core over any (vec_id, embedding) frame. */
  def leadingPc(emb0: DataFrame, iters: Int = 10): DataFrame = {
    val s = emb0.sparkSession
    val emb = Par.widen(emb0)
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint() // scanned once per iteration + two moment passes
    // one pass for both corpus stats; dims = MAX over all rows (matches
    // the oracle's MAX(len(embedding))) — a head() on an unordered frame
    // could pick a short row on ragged input
    val stats = emb.agg(count(lit(1)), max(size(col("embedding")))).head()
    val n = stats.getLong(0).toDouble
    val dims = stats.getInt(1)

    // exact per-dim moments: decimal sums of rounded-12 terms
    val byDim = emb.select(posexplode(col("embedding")).as(Seq("d0", "x")))
      .select((col("d0") + 1).cast("long").as("d"), col("x").cast("double").as("x"))
      .groupBy(col("d"))
      .agg(sum(round(col("x"), 12).cast("decimal(28,12)")).as("sx"),
        sum(round(col("x") * col("x"), 12).cast("decimal(28,12)")).as("sxx"))
      .collect().map(r => r.getLong(0).toInt ->
        (r.getDecimal(1).doubleValue(), r.getDecimal(2).doubleValue())).toMap
    // ragged rows never emit their missing dims from posexplode, so a dim
    // can be absent from the map entirely — zero contribution, like the
    // oracle's sum over only the rows that have the dim
    val mean = Array.tabulate(dims)(d => r12(byDim.getOrElse(d + 1, (0.0, 0.0))._1 / n))
    val varD = Array.tabulate(dims)(d =>
      r12(r12(byDim.getOrElse(d + 1, (0.0, 0.0))._2 / n) - r12(mean(d) * mean(d))))
    val trace = varD.map(v => BigDecimal(r12(v)).setScale(12)).sum.toDouble

    var v = Array.fill(dims)(r12(1.0 / math.sqrt(dims.toDouble)))
    var lambda = 0.0
    (1 to iters).foreach { _ =>
      val vLit = typedlit(v.toSeq)
      // s_i = Σ_d round12(x_d · v_d), exact decimal (order-free) — the
      // codegen'd kernel; valueOf(p).setScale(12) ≡ the HOF chain's
      // round(p,12)→cast(decimal(28,12)) round-trip (Wave29Spec)
      val si = graft.functions.exprs.dec_dot(col("embedding"), vLit, 12)
      // z_d = Σ_i round12(x_d · s_i), exact decimal per dim
      val z = emb.withColumn("si", si.cast("double"))
        .select(posexplode(col("embedding")).as(Seq("d0", "x")), col("si"))
        .groupBy((col("d0") + 1).cast("long").as("d"))
        .agg(sum(round(col("x").cast("double") * col("si"), 12)
          .cast("decimal(28,12)")).as("z"))
        .collect().map(r => r.getLong(0).toInt -> r.getDecimal(1).doubleValue())
        .toMap
      val muDotV = (0 until dims)
        .map(d => BigDecimal(r12(mean(d) * v(d))).setScale(12)).sum.toDouble
      val raw = Array.tabulate(dims)(d =>
        r12(r12(z.getOrElse(d + 1, 0.0) / n) - r12(mean(d) * muDotV)))
      val nrm = math.sqrt(
        raw.map(x => BigDecimal(r12(x * x)).setScale(12)).sum.toDouble)
      lambda = r12(nrm)
      v = raw.map(x => r12(x / nrm))
    }
    val explained = r12(lambda / trace)
    import s.implicits._
    (1 to dims).map { d =>
      (d.toLong,
        BigDecimal(mean(d - 1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(v(d - 1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(lambda).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(explained).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("dim", "mean", "loading", "eigenvalue", "explained_frac")
      .orderBy(col("dim"))
  }
}
