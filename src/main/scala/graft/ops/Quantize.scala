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

  /** Integer dot product over quantized vectors — the native codegen'd
    * [[graft.functions.IntDot]] expression (the HOF formulation is
    * CodegenFallback and its tree gets inlined into referencing
    * filters/join conditions; see the expression's scaladoc). */
  def intDot(x: Column, y: Column): Column = graft.functions.exprs.int_dot(x, y)

  /** Cosine over integer-quantized vectors — scales cancel, so this is
    * pure integer dot products fed into one double division. */
  def quantizedCosine(qa: Column, qb: Column): Column =
    intDot(qa, qb).cast("double") /
      (sqrt(intDot(qa, qa).cast("double")) * sqrt(intDot(qb, qb).cast("double")))

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

  /** q47: SemDeDup-style semantic dedup DECISION over the int8-quantized
    * corpus — which vectors to drop, and which kept vector justifies each
    * drop. A vector is dropped when a smaller-id vector sits within
    * quantized-cosine ≥ 0.45 of it; `keeper_id` is the smallest such
    * neighbor, `n_better` how many exist. (Pairwise rule; q40's connected
    * components turn the same pairs into transitive clusters when a
    * global canonical is wanted.)
    *
    * The similarity test is INTEGER-exact: cos(qa,qb) ≥ 0.45 is evaluated
    * as `dot > 0 ∧ 400·dot² ≥ 81·‖qa‖²·‖qb‖²` — 64-dim int8 keeps every
    * term under ~4.3e14, well inside long range, and the oracle needs no
    * rounding tricks at all. The cheap codegen'd FLOAT cosine prunes the
    * pair stream first with a 0.03 guard band (measured float-vs-int8
    * cosine gap on this corpus: ≤ 0.005; the analytic bound for int8 is
    * ~a few 1e-2) — the oracle carries no prefilter, so a guard-band
    * violation would surface as a hash mismatch, not stay hidden.
    *
    * Scale shape: same two-phase broadcast pair join as q36; at 100 TB
    * the pair generation composes with the banded-LSH candidate
    * generator or the IVF cell layout (SemDeDup proper dedups within
    * coarse clusters — `writeCellBucketed` cells — which bounds the
    * quadratic term by the cell population). */
  def q47SemanticDedup(s: SparkSession, dir: String,
                       num: Int = 400, den: Int = 81): DataFrame = {
    // Phase 1 — candidate pairs on NARROW rows: the prefilter touches
    // every pair, so only (id, float vector) may ride it. A first cut
    // that carried the int8 arrays through the pair stream was 3.5x
    // slower — row width, not the cosine, dominated the all-pairs scan.
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val a = emb.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id").as("d1"), col("embedding").as("ea"))
    val b = broadcast(emb.select(col("vec_id").as("d2"), col("embedding").as("eb")))
    val cand = a.join(b, col("d1") < col("d2"))
      .filter(graft.functions.exprs.cosine_similarity(col("ea"), col("eb")) >= 0.42)
      .select(col("d1"), col("d2"))
    // Phase 2 — exact integer verify on survivors only: the tiny
    // candidate set rides the broadcast side of two joins against the
    // quantized corpus (scanned narrowly, never shuffled).
    val q = quantized(Tables.embeddings(s, dir))
      .withColumn("n2", intDot(col("q"), col("q")))
      .select(col("vec_id"), col("q"), col("n2"))
    val sim = q.select(col("vec_id").as("v1"), col("q").as("qa"), col("n2").as("na2"))
      .join(broadcast(cand), col("v1") === col("d1"))
      .join(q.select(col("vec_id").as("v2"), col("q").as("qb"), col("n2").as("nb2")),
        col("v2") === col("d2"))
      .withColumn("dot", intDot(col("qa"), col("qb")))
      .filter(col("dot") > 0 &&
        lit(num.toLong) * col("dot") * col("dot") >=
          lit(den.toLong) * col("na2") * col("nb2"))
    sim.groupBy(col("d2").as("vec_id"))
      .agg(min(col("d1")).as("keeper_id"), count(lit(1)).as("n_better"))
      .orderBy(col("vec_id"))
  }

  /** SemDeDup proper — the 100 TB path for q47's decision: dedup WITHIN
    * the coarse k-means cells of a [[Similarity.writeCellBucketed]]
    * layout (the original SemDeDup recipe: cluster, then drop
    * near-duplicates inside each cluster). The all-pairs term is bounded
    * by the cell population ((n/nlist)² per cell instead of n² global),
    * the join key is the layout's own partition column, and an int8
    * layout never touches a float on the read path — the whole pairwise
    * test is [[intDot]] integer arithmetic. Missed cross-cell pairs are
    * the accepted SemDeDup tradeoff; the spec measures recall against
    * the exact q47 decision and asserts the detected set is a strict
    * subset (a within-cell similar pair is globally similar by the same
    * integer test, so no false drops — only misses).
    *
    * Skewed cells (one mega-cluster) are the known hazard: AQE's skew
    * join splits the probe side, and the layout writer's k-means on
    * L2-normalized vectors keeps cells balanced by construction. */
  def semanticDedupInCells(s: SparkSession, bucketedDir: String,
                           num: Int = 400, den: Int = 81): DataFrame = {
    val corpus = s.read.parquet(bucketedDir)
    val q = (if (corpus.columns.contains("q")) corpus
             else quantized(corpus))
      .withColumn("n2", intDot(col("q"), col("q")))
      .select(col("cell"), col("vec_id"), col("q"), col("n2"))
    inCellDecision(q, num, den)
  }

  /** The shared within-cell SemDeDup decision over a (cell, vec_id, q,
    * n2) frame: cell-equi-join candidate pairs (never all-pairs), the
    * integer-exact cross-multiplied cosine test, keeper aggregation. */
  private def inCellDecision(q: DataFrame, num: Int, den: Int): DataFrame = {
    val a = q.select(col("cell"), col("vec_id").as("d1"),
      col("q").as("qa"), col("n2").as("na2"))
    val b = q.select(col("cell"), col("vec_id").as("d2"),
      col("q").as("qb"), col("n2").as("nb2"))
    val sim = a.join(b, Seq("cell"))
      .filter(col("d1") < col("d2"))
      .withColumn("dot", intDot(col("qa"), col("qb")))
      .filter(col("dot") > 0 &&
        lit(num.toLong) * col("dot") * col("dot") >=
          lit(den.toLong) * col("na2") * col("nb2"))
    sim.groupBy(col("d2").as("vec_id"))
      .agg(min(col("d1")).as("keeper_id"), count(lit(1)).as("n_better"))
      .orderBy(col("vec_id"))
  }

  /** q206's persisted centroid table (the q83/q94 independence rule). */
  val SemDedupCellCentroidsPath = graft.Sidecars.path("graft_kmeans_centroids_semdedup.parquet")

  /** q206: SemDeDup-in-cells DECLARED AND ORACLE-GATED — the 100 TB
    * dataflow (cell-restricted candidate generation, (n/c)² per-cell
    * pair volume, integer-exact verify, keeper aggregation) proven
    * hash-for-hash by the driver gate, not just spec/soak. The cell
    * quantizer here is the grid-snapped integer-argmin k-means
    * ([[Clustering]], the q81 "persisted model is data" recipe) so the
    * DuckDB oracle replays assignment + quantization + within-cell test
    * end-to-end from the centroid sidecar; the production
    * [[Similarity.writeCellBucketed]] layout (ML k-means, float argmin)
    * shares every stage downstream of assignment — this gate proves
    * that shared dataflow, including the cross-cell misses the
    * approximation legitimately accepts. nCells=8 is the tuned value
    * for this corpus ([[AnnTuner.tuneSemDedupCells]]: 64 split most
    * near-dup pairs, 8 keeps them co-located at recall ≥ 0.7).
    *
    * PlanAudit note: the BroadcastNestedLoopJoin it flags here is
    * [[Clustering.assignByJoin]]'s `crossJoin(broadcast(centroids))` —
    * nCells bounded model rows broadcast against one narrow corpus
    * scan, linear in n·c (the standing bounded-model-attach idiom). */
  def q206SemanticDedupCells(s: SparkSession, dir: String, nCells: Int = 8,
                             num: Int = 400, den: Int = 81): DataFrame =
    semanticDedupCellsAt(s, dir, nCells, SemDedupCellCentroidsPath, num, den)

  /** The q206 pipeline with the centroid sidecar parameterized so q226
    * can run it at a TUNED cell count against its own sidecar (the
    * q83/q94 independence rule — gated queries never share sidecars). */
  def semanticDedupCellsAt(s: SparkSession, dir: String, nCells: Int,
                           centroidsPath: String, num: Int = 400,
                           den: Int = 81): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val centroids = Clustering.trainCentroids(emb, nCells)
    Clustering.persistCentroids(s, centroids, centroidsPath)
    val cells = Clustering.assignByJoin(emb, centroids)
      .select(col("vec_id"), col("cluster").as("cell"))
    val q = quantized(emb)
      .withColumn("n2", intDot(col("q"), col("q")))
      .join(cells, Seq("vec_id"))
      .select(col("cell"), col("vec_id"), col("q"), col("n2"))
    inCellDecision(q, num, den)
  }

  /** q226's sidecars: the tuner's candidate grid (the knob DECISION
    * INPUT — persisted model is data) and the centroids of the run at
    * the chosen knob. A degenerate tuner (sample too small / no true
    * pairs) persists its fallback candidate (nlist=1, recall 1, frac 1)
    * as the lone grid row so the oracle's pick replay stays uniform. */
  val TunedGridPath: String = graft.Sidecars.path("graft_semdedup_tuner_grid.parquet")
  val TunedCellCentroidsPath: String =
    graft.Sidecars.path("graft_kmeans_centroids_semdedup_tuned.parquet")

  /** q226: the TUNED-KNOB path ORACLE-GATED — [[AnnTuner.semDedupGrid]]
    * estimates per-nlist co-location recall and pair cost from the
    * seeded bounded sample, the grid is PERSISTED, and the oracle
    * independently replays [[AnnTuner.pick]]'s rule over the persisted
    * rows (recall ≥ target → min (pair frac, −recall, nlist); else max
    * (recall, −frac, nlist asc)) — so a regression in the knob
    * selection logic breaks the hash, closing the r12 verdict's "tuned
    * paths are not gated" gap. The chosen row also carries `n_removed`,
    * the realized dedup-decision count of the q206 dataflow run at the
    * chosen nlist (replayed by the oracle from the tuned centroid
    * sidecar), tying the declared decision to the run it produced. */
  def q226SemanticDedupTuned(s: SparkSession, dir: String,
                             targetRecall: Double = 0.7): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val sample = AnnTuner.sampleUnit(emb)
    val grid0 = AnnTuner.semDedupCandidates(sample)
    val grid = if (grid0.nonEmpty) grid0
      else Seq(AnnTuner.SemDedupKnobs(1, estRecall = 1.0, estPairFrac = 1.0))
    import s.implicits._
    grid.map(k => (k.nlist.toLong, k.estRecall, k.estPairFrac))
      .toDF("nlist", "est_recall", "est_pair_frac")
      .coalesce(1).write.mode("overwrite").parquet(TunedGridPath)
    val chosen = AnnTuner.pickSemDedup(grid, targetRecall).nlist
    val nRemoved = semanticDedupCellsAt(s, dir, chosen, TunedCellCentroidsPath)
      .count()
    s.read.parquet(TunedGridPath)
      .select(col("nlist"),
        round(col("est_recall"), 6).as("est_recall"),
        round(col("est_pair_frac"), 6).as("est_pair_frac"),
        (col("nlist") === chosen.toLong).as("chosen"),
        when(col("nlist") === chosen.toLong, lit(nRemoved))
          .otherwise(lit(0L)).as("n_removed"))
      .orderBy(col("nlist"))
  }

  /** [[semanticDedupInCells]] with the cell count DERIVED from a bounded
    * corpus sample instead of guessed: [[AnnTuner.tuneSemDedupCells]]
    * picks the largest nlist (cheapest per-cell quadratic) whose sampled
    * near-dup pairs stay co-located at the target recall — the knob the
    * within-cell spec showed must track corpus size (64 cells over 500
    * vectors split most pairs; 8 kept them together). Writes the int8
    * cell layout at `dst` and returns the knobs with the decision frame. */
  def semanticDedupCellsTuned(s: SparkSession, dir: String, dst: String,
                              targetRecall: Double = 0.7)
      : (AnnTuner.SemDedupKnobs, DataFrame) = {
    val emb = Tables.embeddings(s, dir)
    val knobs = AnnTuner.tuneSemDedupCells(AnnTuner.sampleUnit(emb), targetRecall)
    Similarity.writeCellBucketed(emb, dst, nlist = knobs.nlist, int8 = true)
    (knobs, semanticDedupInCells(s, dst))
  }
}
