package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.exprs

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`, dim 64 in the testdata).
  *
  * Three tiers:
  *  - `cosine` — fast codegen'd dot product (`zip_with` + `aggregate`),
  *    double accumulation in array order. The per-row hot path.
  *  - q28 brute-force top-k — exact k-NN by cosine; per-element products
  *    are cast to DECIMAL(38,18) before summing so the score is
  *    bit-identical across engines (the DuckDB oracle mirrors it). Rank
  *    output only; ties broken by vec_id.
  *  - q29 LSH top-k — the 100 TB path: random-hyperplane signatures
  *    bucket the corpus, candidates come from the query's bucket ring,
  *    and only candidates are re-ranked exactly. Corpus-size-independent
  *    candidate cost; recall tunable via planes/tables.
  */
object Similarity {

  /** Widen a small (few-split) corpus to the cluster's parallelism before
    * per-row signature/score work — see [[Par.widen]] (decided from the
    * logical plan; no physical-planning tax). */
  private def widen(df: DataFrame): DataFrame = Par.widen(df)

  /** Fast cosine similarity: the native CosineSimilarity expression — one
    * fused codegen loop. Bit-identical to `cosineHof` (same accumulation
    * order), which is kept as the built-ins-only formulation and for the
    * equality spec. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.exprs.cosine_similarity(a, b)

  /** Built-ins-only cosine (zip_with + aggregate HOFs). */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, e) => acc + e)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact-decimal dot product — engine-portable to the last bit: float
    * products are exact in double; each product is rounded once to
    * DECIMAL(28,18) and summed exactly (precision 28 leaves headroom so
    * Spark's add-widening never hits the 38 cap, which would silently
    * drop scale and diverge from DuckDB's exact SUM). */
  private def decDot(x: Column, y: Column): Column =
    aggregate(
      zip_with(x, y, (p, q) => (p.cast("double") * q.cast("double")).cast("decimal(28,18)")),
      lit(java.math.BigDecimal.ZERO).cast("decimal(28,18)"),
      (acc, e) => (acc + e).cast("decimal(28,18)"))

  /** q28: brute-force exact top-10 cosine neighbors for query vectors
    * vec_id < 5 (self excluded). Queries are broadcast; one scan of the
    * corpus per batch of queries, no shuffle until the final top-k. */
  def q28BruteForceTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = widen(Tables.embeddings(s, dir))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // two-phase exact ranking (same trick as q36): the fused native float
    // cosine scores ALL pairs in one codegen pass, and a bounded-heap
    // top-k per query — NOT a window, which would sort the whole corpus
    // through one task per query — keeps the float top-32. The expensive
    // exact-decimal score then re-ranks only those 32×|queries| survivors
    // (re-fetched by broadcasting the tiny survivor list against one more
    // corpus scan). Float error is <=1e-12 while neighbor score gaps are
    // ~1e-3, so the decimal top-10 always sits inside the float top-32 —
    // and the oracle hash check would catch it if it ever didn't.
    val fscored = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        exprs.cosine_similarity(col("qe"), col("embedding")).as("fcos"))
    val survivors = TopKPerGroup.topKPerKey(fscored, "query_id", "fcos", "vec_id", 32)
      .select(col("key").as("query_id"), col("id").as("cand_id"))
    emb.join(broadcast(survivors), col("vec_id") === col("cand_id"))
      .join(broadcast(q.withColumnRenamed("query_id", "qq")), col("query_id") === col("qq"))
      .withColumn("cos",
        decDot(col("qe"), col("embedding")).cast("double") /
          (sqrt(decDot(col("qe"), col("qe")).cast("double")) *
           sqrt(decDot(col("embedding"), col("embedding")).cast("double"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component p of plane j:
    * a fixed hash of (j, p) mapped to [-0.5, 0.5). No RNG state — every
    * executor derives the same planes, nothing is shipped. */
  private def planeComponent(j: Int, p: Int): Double =
    ((java.util.Objects.hash(Int.box(j), Int.box(p)) & 0xffff).toDouble / 0x10000) - 0.5

  /** Sign-of-projection LSH signature: bit j = (v · plane_j) >= 0.
    * Each plane is an array literal consumed by one zip_with/aggregate
    * pass — a per-element expression sum would build a planes×dim-term
    * tree that blows up codegen (measured 6× slower). */
  def lshSignature(v: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { j =>
      val plane = typedlit((0 until dim).map(p => planeComponent(j, p)).toArray)
      val proj = aggregate(
        zip_with(v, plane, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, e) => acc + e)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** q29: LSH-bucketed multi-probe ANN (rows-only check — float path, no
    * oracle; recall vs the q28 ground truth is asserted in OpsSpec).
    * The corpus is bucketed by its 12-bit signature; each query probes its
    * own bucket PLUS every Hamming-distance-1 bucket (sig ⊕ 2^j) — the
    * standard multi-probe trick: near-threshold vectors most often differ
    * in exactly one marginal plane, so probing the 12 adjacent buckets
    * buys most of the recall of 13 independent tables for one signature
    * evaluation. Probe fan-out lives on the broadcast (query) side —
    * queries × (planes+1) rows — the corpus is still scanned once.
    * At 100 TB: bucket the corpus once (write-time, cluster by sig);
    * each probe then reads ~(planes+1)/2^planes of the data. */
  def q29LshTopK(s: SparkSession, dir: String): DataFrame = {
    val planes = 12
    val emb = widen(Tables.embeddings(s, dir))
      .withColumn("sig", lshSignature(col("embedding"), 64, planes))
    val masks = array((lit(0L) +: (0 until planes).map(j => lit(1L << j))): _*)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(transform(masks, m => col("sig").bitwiseXOR(m))).as("psig"))
    // bounded-heap top-10 per query: a hot signature bucket can hold a
    // large slice of a clustered corpus, and a rank window would sort all
    // of its candidates through one task per query
    val scored = emb.join(broadcast(q),
        col("sig") === col("psig") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("qe"), col("embedding")).as("cos"))
    TopKPerGroup.topKPerKey(scored, "query_id", "cos", "vec_id", 10)
      .select(col("key").as("query_id"), col("rank"),
        col("id").as("neighbor_id"), col("score").as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** q36: embedding-cosine near-duplicate pairs, exact all-pairs with
    * decimal-exact scoring (oracle-mirrorable). The LSH-bucketed
    * `nearDupPairs` below is the 100 TB path; this is its exact
    * ground-truth companion. Norms computed once per vector. */
  def q36EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .withColumn("nrm", sqrt(decDot(col("embedding"), col("embedding")).cast("double")))
    // the corpus arrives as one small file = one partition; without the
    // repartition the nested-loop pair generation (and all the decimal
    // dot products) would run in a single task (measured 30x slower).
    // defaultParallelism, not a constant: 32 would be wrong on any
    // differently-sized cluster
    val a = emb.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id").as("d1"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = broadcast(emb
      .select(col("vec_id").as("d2"), col("embedding").as("eb"), col("nrm").as("nb")))
    a.join(b, col("d1") < col("d2"))
      // two-phase scoring: the fused native cosine prunes ~all pairs in
      // one codegen pass; the expensive exact-decimal score runs only on
      // survivors. The 1e-4 guard band vastly exceeds the ≤1e-12 float
      // error, so the final result set is unchanged.
      .filter(exprs.cosine_similarity(col("ea"), col("eb")) >= 0.4499)
      // round(…,12): the dot and norms are bit-identical across engines,
      // but the final fused multiply-divide drifts 1 ulp (see q34)
      .withColumn("cos", round(
        decDot(col("ea"), col("eb")).cast("double") / (col("na") * col("nb")), 12))
      .filter(col("cos") >= 0.45)
      .select(col("d1"), col("d2"), col("cos"))
      .orderBy(col("d1"), col("d2"))
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * corpus into nlist cells; a query probes only its nprobe nearest
    * cells and exact-reranks those candidates. The other classic ANN
    * scale path next to LSH (q29): at 100 TB the corpus is written
    * bucketed by cell id, so a probe reads nprobe/nlist of the data.
    * Centroids are a tiny model (nlist × dim) — computed once, broadcast
    * via the closure; only the assignment and rerank are distributed.
    *
    * Vectors are L2-NORMALIZED before clustering and assignment
    * (spherical k-means): the query metric is cosine, and on the unit
    * sphere euclidean distance is monotonic in cosine
    * (‖a−b‖² = 2 − 2·cos), so cells align with cosine neighborhoods.
    * Clustering raw magnitudes split cosine-close vectors across cells —
    * measured recall 0.2-0.4 raw vs ≥0.6 normalized at the same
    * nlist/nprobe. */
  def ivfTopK(s: SparkSession, dir: String, nlist: Int = 16, nprobe: Int = 6,
              k: Int = 10): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val emb = Tables.embeddings(s, dir)
      .withColumn("nrm", sqrt(aggregate(
        transform(col("embedding"), x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, e) => acc + e)))
      .withColumn("features",
        array_to_vector(transform(col("embedding"), x => x.cast("double") / col("nrm"))))
    val model = new KMeans().setK(nlist).setSeed(42).setMaxIter(20).fit(emb)
    val centers = model.clusterCenters.map(_.toArray)
    val assigned = model.transform(emb).withColumnRenamed("prediction", "cell")

    def nearestCells(v: Array[Double]): Seq[Int] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      val u = if (n == 0) v else v.map(_ / n)
      centers.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < u.length) { val t = u(j) - c(j); d += t * t; j += 1 }
        (d, i)
      }.sortBy(_._1).take(nprobe).map(_._2).toSeq
    }
    import s.implicits._
    val queries = assigned.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect() // 5 query vectors — not corpus data
      .map { case (id, e) => (id, e, nearestCells(e.map(_.toDouble))) }
    val probeCells = queries.flatMap { case (qid, qe, cells) =>
      cells.map(c => (qid, qe, c))
    }.toSeq.toDF("query_id", "qe", "qcell")

    // bounded-heap top-k per query (hot cells hold a large corpus slice;
    // see q29)
    val scored = assigned.join(broadcast(probeCells),
        col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("qe"), col("embedding")).as("cos"))
    TopKPerGroup.topKPerKey(scored, "query_id", "cos", "vec_id", k)
      .select(col("key").as("query_id"), col("rank"),
        col("id").as("neighbor_id"), col("score").as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (all-pairs over a bucketed
    * join): docs whose embeddings' cosine ≥ threshold, LSH-bucketed so
    * only same-signature pairs are compared.
    *
    * The self-join is CHUNK-SPLIT: a dense embedding cluster puts a large
    * fraction of the corpus into one signature bucket, whose pair count is
    * quadratic and would otherwise land in a single task (measured on a
    * 20× soak: a 20k-row hot bucket = 400M pairs = 1 task = the whole
    * job's wall time). Each left row fans out to `chunks` join keys
    * (sig, partnerChunk); each right row carries its own (sig, chunk) —
    * so a hot bucket's pair grid spreads over `chunks` tasks while every
    * pair is still generated exactly once. Left-side replication costs
    * chunks×|corpus| shuffled rows — linear, the price of splitting a
    * quadratic hotspot. The signed corpus is cached: both join sides
    * consume it, and the signatures (planes × HOF passes per row) are the
    * second-largest cost. */
  def nearDupPairs(emb: DataFrame, threshold: Double, planes: Int = 8,
                   chunks: Int = 0): DataFrame = {
    val c = if (chunks > 0) chunks
            else math.max(emb.sparkSession.sparkContext.defaultParallelism, 8)
    val sigs = widen(emb)
      .withColumn("sig", lshSignature(col("embedding"), 64, planes))
      .withColumn("ch", pmod(col("vec_id"), lit(c.toLong))).cache()
    val x = sigs.withColumn("py",
      explode(array((0 until c).map(k => lit(k.toLong)): _*)))
    x.as("x").join(sigs.as("y"),
        col("x.sig") === col("y.sig") && col("x.py") === col("y.ch") &&
          col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos", cosine(col("x.embedding"), col("y.embedding")))
      .filter(col("cos") >= threshold)
      .select(col("x.vec_id").as("d1"), col("y.vec_id").as("d2"), col("cos"))
  }
}
