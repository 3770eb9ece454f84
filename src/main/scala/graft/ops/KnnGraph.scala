package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.exprs

/** Corpus-wide k-NN GRAPH operators over the embedding table — the
  * structures a curation pipeline derives from neighborhoods rather
  * than from one query's top-k:
  *
  *  - q177 MUTUAL (reciprocal) k-NN: the edge (a, b) survives iff a is
  *    in b's top-k AND b is in a's top-k. Mutuality is the standard
  *    hubness filter (Jégou et al., "Accurate image search using the
  *    contextual dissimilarity measure"; Radovanović et al. JMLR'10):
  *    hub vectors sit in everyone's top-k but reciprocate few, so
  *    mutual edges are the trustworthy near-dup / same-concept pairs a
  *    SemDeDup-style pass should act on first.
  *  - q179 TRUNCATION RECALL: overlap@k of the top-k computed from the
  *    16-dim PREFIX of each embedding vs the full 64 dims — the
  *    matryoshka/dimension-truncation diagnostic (how much ANN recall
  *    a cheap low-dim first pass keeps) measured per query, the same
  *    question the PQ/JL ops answer for their own compressions.
  *
  * Scale shape (q177): the all-pairs float cosine pass is ONE codegen'd
  * self-join scan; per-source top-kf survives through the bounded
  * [[TopKPerGroup]] heap aggregate (never a corpus-wide window); the
  * exact-decimal rescore touches only n×kf survivor rows, and its
  * row_number window is per-key over ≤ kf rows. The q28 float-cut
  * guard is checked GLOBALLY (one n-row aggregate → 1-row driver
  * read): exact iff every key's decimal rank-k clears its float
  * rank-kf by more than the summation-error band, else kf widens ×4
  * (never observed on real data). NOTHING corpus-sized reaches the
  * driver — the result stays a distributed frame, unlike the
  * bounded-query q28 emit. At 100 TB the all-pairs pass is the part
  * you replace: restrict candidate pairs to shared IVF cells /
  * LSH bands (the standing [[Similarity]] layouts) and the rest of the
  * dataflow is unchanged — the graph edges themselves are O(n·k).
  *
  * Determinism: the kept scores are decimal-exact cosines rounded to
  * 12 digits with (cos DESC, vec_id) tie order — the q28/q36 recipe —
  * so the DuckDB oracle replays both rankings hash-for-hash.
  */
object KnnGraph {

  // the codegen'd exact-decimal kernel (functions.DecDot) — replaces
  // the aggregate/zip_with HOF chain (CodegenFallback, a Decimal box
  // per element); bit parity asserted in Wave29Spec
  private def decDot(x: Column, y: Column): Column =
    graft.functions.exprs.dec_dot(x, y, 18)

  /** Directed exact top-k edges (src, rank, dst, cos) for EVERY vector:
    * float pass + bounded heap + decimal rescore of survivors, guarded
    * globally. `cos` is the decimal cosine rounded 12. `nCells = Some(c)`
    * restricts candidates to IVF-cell co-residents (the 100 TB path —
    * per-cell pair volume is (n/c)², the SemDeDup bound); None scores
    * all pairs (exact, the gate form). */
  /** q205's persisted centroid table (the q83/q94 independence rule:
    * each gated query replays from its OWN sidecar, so oracle runs
    * never depend on whether/when another query trained). */
  val CellCentroidsPath = graft.Sidecars.path("graft_kmeans_centroids_knncells.parquet")

  private[ops] def topKEdges(emb0: DataFrame, k: Int, kFloat0: Int,
                             nCells: Option[Int] = None,
                             persistCellsTo: Option[String] = None): DataFrame = {
    val emb = Par.widen(emb0).localCheckpoint() // scanned by 3 passes below
    val norms = emb.select(col("vec_id"),
      sqrt(decDot(col("embedding"), col("embedding")).cast("double")).as("nrm"))
      .localCheckpoint() // n tiny rows, reused on both survivor sides
    val celled = nCells.map { c =>
      // table-join assignment: at IVF-scale cell counts the literal-
      // expression Clustering.assign would compile c struct aggregates
      // into one interpreted mega-expression (measured super-linear at
      // the 100× soak); the broadcast-join form stays codegen'd and
      // linear in n·c. Fewer k-means iters — cells here are a pruning
      // partition, not a model; 4 sweeps place centers well enough
      val centroids = Clustering.trainCentroids(emb, c, iters = 4)
      persistCellsTo.foreach(p =>
        Clustering.persistCentroids(emb.sparkSession, centroids, p))
      emb.join(Clustering.assignByJoin(emb, centroids)
        .select(col("vec_id"), col("cluster")), Seq("vec_id"))
        .localCheckpoint()
    }

    @annotation.tailrec
    def attempt(kf: Int): DataFrame = {
      val fscored0 = celled match {
        case Some(ce) => ce.as("a").join(ce.as("b"),
          col("a.cluster") === col("b.cluster") &&
            col("a.vec_id") =!= col("b.vec_id"))
        case None => emb.as("a").join(emb.as("b"),
          col("a.vec_id") =!= col("b.vec_id"))
      }
      val fscored = fscored0
        .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
          exprs.cosine_similarity(col("a.embedding"), col("b.embedding")).as("fcos"))
        .filter(!isnan(col("fcos"))) // zero-norm vectors: the q36 rule
      val surv = TopKPerGroup.topKPerKey(fscored, "src", "fcos", "dst", kf)
        .select(col("key").as("src"), col("id").as("dst"), col("score").as("fcos"))
      val rescored = surv
        .join(emb.select(col("vec_id").as("src"), col("embedding").as("ea")), Seq("src"))
        .join(emb.select(col("vec_id").as("dst"), col("embedding").as("eb")), Seq("dst"))
        .join(norms.select(col("vec_id").as("src"), col("nrm").as("na")), Seq("src"))
        .join(norms.select(col("vec_id").as("dst"), col("nrm").as("nb")), Seq("dst"))
        .select(col("src"), col("dst"), col("fcos"),
          round(decDot(col("ea"), col("eb")).cast("double") /
            (col("na") * col("nb")), 12).as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("src"))
            .orderBy(col("cos").desc, col("dst"))).cast("long"))
        .localCheckpoint() // feeds the guard AND the edge cut
      // global guard (one 1-row read): for every src with a full heap,
      // the decimal rank-k must clear the float rank-kf by more than
      // the float summation-error band — then no cut candidate can
      // outrank the kept k (the q28 argument, all keys at once)
      val g = rescored.groupBy(col("src"))
        .agg(count(lit(1)).as("n"),
          min(col("fcos")).as("fmin"),
          max(when(col("rank") === k, col("cos"))).as("dk"))
        .agg(min(when(col("n") >= kf, col("dk") - col("fmin"))).as("worst"))
        .head()
      val exact = g.isNullAt(0) || g.getDouble(0) > Similarity.FloatGuardBand
      if (exact) rescored.filter(col("rank") <= k)
        .select(col("src"), col("rank"), col("dst"), col("cos"))
      else attempt(kf * 4)
    }
    attempt(kFloat0)
  }

  private def mutualOf(edges0: DataFrame): DataFrame = {
    val edges = edges0
    edges.as("f").join(edges.as("r"),
        col("f.src") === col("r.dst") && col("f.dst") === col("r.src") &&
          col("f.src") < col("f.dst"))
      .select(col("f.src").as("v1"), col("f.dst").as("v2"),
        col("f.cos").as("cos"),
        col("f.rank").as("rank_fwd"), col("r.rank").as("rank_rev"))
  }

  /** q177: the mutual k-NN edge list at k=5 — (v1 < v2, cos, and both
    * directed ranks), sorted. Edge volume is ≤ n·k by construction. */
  def q177MutualKnn(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    mutualOf(topKEdges(Tables.embeddings(s, dir), k, kFloat0 = k + 11))
      .orderBy(col("v1"), col("v2"))

  /** The 100 TB form of q177: mutual k-NN over IVF-cell co-resident
    * candidates — within-cell pair volume is (n/c)² per cell, never an
    * all-pairs corpus join (the SemDeDup/q47 bound). Approximate in the
    * standard IVF sense (a true neighbor in another cell is missed);
    * the declared q177 stays exact because the gate corpus fits the
    * exact form. Soak-measured, not oracle-gated. */
  def mutualKnnInCells(emb: DataFrame, k: Int, nCells: Int): DataFrame =
    mutualOf(topKEdges(emb, k, kFloat0 = k + 11, nCells = Some(nCells)))

  /** q205: the 100 TB form DECLARED AND ORACLE-GATED — mutual k-NN over
    * IVF-cell co-residents at a pinned nCells, the n^1.5 dataflow
    * (assignment n·c + within-cell pairs Σ(n_c)²), never the all-pairs
    * corpus join q177 runs at gate scale. The trained grid-snapped
    * centroids are persisted to [[CellCentroidsPath]] (the q81
    * "model is data" rule) and the DuckDB oracle replays the ENTIRE
    * dataflow from them: integer argmin cell assignment, within-cell
    * exact decimal cosines, per-src rank ≤ k, mutual join. Hash-green
    * here means the scale path's semantics — including which cross-cell
    * neighbors it legitimately misses — are driver-proven, not just
    * spec/soak-proven. */
  def q205MutualKnnCells(s: SparkSession, dir: String, k: Int = 5,
                         nCells: Int = 16): DataFrame =
    mutualOf(topKEdges(Tables.embeddings(s, dir), k, kFloat0 = k + 11,
        nCells = Some(nCells), persistCellsTo = Some(CellCentroidsPath)))
      .orderBy(col("v1"), col("v2"))

  /** q181: k-NN-graph HUBNESS — each vector's in-degree in the directed
    * exact top-k graph (how many OTHER vectors count it among their k
    * nearest). Hubness is the high-dimensional pathology (Radovanović
    * et al. JMLR'10) that silently skews ANN-driven dedup and retrieval:
    * a hub looks "near everything", so pair-based semantic dedup keeps
    * deleting against it and k-NN classification over-votes it. This is
    * the diagnostic read before trusting q47/q76/q177-style decisions;
    * `is_hub` flags in-degree ≥ 2k (the standard skew cutoff). In-degree
    * sums to ≤ n·k by construction; everything after the topKEdges
    * dataflow is one hash aggregate + an n-row join. */
  def q181KnnHubness(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val indeg = topKEdges(emb, k, kFloat0 = k + 11)
      .groupBy(col("dst").as("vec_id")).agg(count(lit(1)).as("in_degree"))
    emb.select(col("vec_id")).join(indeg, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .withColumn("is_hub", col("in_degree") >= 2L * k)
      .orderBy(col("vec_id"))
  }

  /** q184: SEMANTIC DUPLICATE GROUPS — connected components over the
    * mutual k-NN edges at cos ≥ `minCos`: the GROUP-level view q177's
    * pairs feed. A dedup pass acts on clusters (keep the canonical
    * member, drop the rest), not on an unordered pair soup, and
    * mutual-edge components are the hubness-safe grouping (a hub's
    * one-way edges never glue unrelated clusters together — the q40
    * move with reciprocal edges instead of raw LSH pairs). Components
    * from [[Dedup.connectedComponents]] (pointer-jumping, O(log
    * diameter) rounds, singletons never iterate); canonical = min id.
    * Edge volume into CC is ≤ n·k by construction. */
  def q184MutualKnnClusters(s: SparkSession, dir: String, k: Int = 5,
                            minCos: Double = 0.4): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val pairs = mutualOf(topKEdges(emb, k, kFloat0 = k + 11))
      .filter(col("cos") >= minCos)
      .select(col("v1").as("d1"), col("v2").as("d2"))
    val comp = Dedup.connectedComponents(
      emb.select(col("vec_id").as("id")), pairs)
    val sizes = comp.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, Seq("component"))
      .select(col("id").as("vec_id"), col("component"), col("cluster_size"),
        (col("id") === col("component")).as("is_canonical"))
      .orderBy(col("vec_id"))
  }

  /** q179: dimension-truncation recall — for the 8 fixed probe vectors
    * (vec_id < 8, the q28 query convention), the exact top-10 by the
    * 16-dim embedding PREFIX vs by the full vector; reports the
    * overlap. Both rankings are decimal-exact rounded 12 (ties by
    * vec_id), each cut by the bounded heap — the probe count is fixed,
    * so the scan is 8·n rows and everything after is ≤ 8·k. */
  def q179TruncationRecall(s: SparkSession, dir: String, k: Int = 10,
                           dims: Int = 16): DataFrame =
    q179TruncationRecallOver(Tables.embeddings(s, dir), k, dims)

  /** The reusable core of q179 over any (vec_id, embedding) frame. */
  def q179TruncationRecallOver(emb0: DataFrame, k: Int = 10,
                               dims: Int = 16): DataFrame = {
    val emb = Par.widen(emb0).localCheckpoint()
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    def topSet(xform: Column => Column, label: String): DataFrame = {
      val scored = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          round(decDot(xform(col("qe")), xform(col("embedding"))).cast("double") /
            (sqrt(decDot(xform(col("qe")), xform(col("qe"))).cast("double")) *
             sqrt(decDot(xform(col("embedding")), xform(col("embedding"))).cast("double"))),
            12).as("cos"))
        .filter(!isnan(col("cos")))
      // the heap's (score DESC, id ASC) tie order IS the canonical cut
      // — the ranking needs no window at all
      TopKPerGroup.topKPerKey(scored, "query_id", "cos", "vec_id", k)
        .groupBy(col("key").as("query_id"))
        .agg(sort_array(collect_list(col("id"))).as(label))
    }
    topSet(identity, "full_set")
      .join(topSet(e => slice(e, 1, dims), "trunc_set"), Seq("query_id"))
      .select(col("query_id"),
        size(array_intersect(col("full_set"), col("trunc_set"))).cast("long")
          .as("n_overlap"),
        round(size(array_intersect(col("full_set"), col("trunc_set")))
          .cast("double") / k, 12).as("recall_at_k"))
      .orderBy(col("query_id"))
  }

  /** q260: LABEL-NOISE audit via k-NN label agreement (the Confident-
    * Learning read): for every vector, how many of its EXACT top-k
    * cosine neighbors carry the same label — a vector whose
    * neighborhood disagrees (≤ 1 of k) is a suspected mislabel, the
    * single highest-yield data-quality pass a labeled training set
    * gets. Reuses [[topKEdges]] (decimal-exact ranking, so the oracle
    * replays the neighborhood bit-for-bit); the suspect fence is the
    * integer cross-multiply k·n_agree ≤ n_neighbors — no float
    * boundary. Vectors with no scorable neighbors (zero-norm) report
    * 0/NULL/false. */
  def q260LabelNoise(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    labelNoiseOver(Tables.embeddings(s, dir), k, nCells = None)

  /** The audit core: exact neighborhoods when `nCells` is None (the
    * gate form), IVF-cell co-resident neighborhoods otherwise (the
    * 100 TB path — the q177/q205 split applied here). */
  def labelNoiseOver(emb: DataFrame, k: Int,
                     nCells: Option[Int]): DataFrame = {
    val lbl = emb.select(col("vec_id"), col("label").cast("long").as("label"))
      .localCheckpoint() // three consumers (two edge sides + the spine)
    val edges = topKEdges(emb.select(col("vec_id"), col("embedding")), k,
      k + 11, nCells)
    val agree = edges
      .join(lbl.select(col("vec_id").as("src"), col("label").as("l_src")), Seq("src"))
      .join(lbl.select(col("vec_id").as("dst"), col("label").as("l_dst")), Seq("dst"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_neighbors"),
        sum(when(col("l_src") === col("l_dst"), 1L).otherwise(0L)).as("n_agree"))
    lbl.join(agree.withColumnRenamed("src", "vec_id"), Seq("vec_id"), "left")
      .withColumn("n_neighbors", coalesce(col("n_neighbors"), lit(0L)))
      .withColumn("n_agree", coalesce(col("n_agree"), lit(0L)))
      .withColumn("agree_frac", when(col("n_neighbors") > 0,
        round(col("n_agree").cast("double") / col("n_neighbors").cast("double"), 12)))
      .withColumn("suspect", col("n_neighbors") > 0 &&
        lit(k.toLong) * col("n_agree") <= col("n_neighbors"))
      .select(col("vec_id"), col("label"), col("n_neighbors"), col("n_agree"),
        col("agree_frac"), col("suspect"))
      .orderBy(col("vec_id"))
  }
}
