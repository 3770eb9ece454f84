package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Greedy k-center coreset selection — diversity-driven data selection
  * (Sener & Savarese, "Active Learning for CNNs: A Core-Set Approach",
  * ICLR 2018): pick the point farthest from everything chosen so far,
  * m times. The chosen set 2-approximates the optimal k-center cover,
  * so a trainer sampling "m maximally spread examples" gets coverage
  * guarantees a random sample cannot give. Complements q83 (cluster-
  * stratified sampling: match the density) — k-center does the
  * opposite (cover the extremes), which is what dedup-adjacent
  * selection and eval-set seeding want.
  *
  * Shape at 100 TB: m scan-and-reduce rounds. Each round keeps ONE
  * running column — the min squared distance to the chosen set — and
  * updates it against the single new center (broadcast literal): an
  * O(n·dim) map + a 1-row argmax reduce, no shuffle of the corpus, no
  * n×m distance matrix. The running frame is localCheckpoint'ed per
  * round so lineage stays flat (the q40 iterative rule; swap for
  * reliable checkpoint under executor churn). Driver state is m
  * (id, vector) pairs — bounded by construction.
  *
  * Determinism is INTEGER end to end: vectors snap to the
  * [[Clustering.Grid]] fixed-point grid, every distance is an exact
  * long, the seed is the max-norm point (ties to the smaller vec_id),
  * each round's pick is argmax(mind) with the same tie rule, and the
  * final assignment breaks distance ties toward the smaller center id
  * — all replayable move-for-move in SQL. NULL/empty embeddings are
  * distance 0 to everything (the q81 convention) and thus never get
  * picked while any spread remains.
  */
object Coreset {

  val M = 6

  /** q163: select the M k-center representatives of the embeddings
    * table, then assign every vector to its nearest representative.
    * Output: (vec_id, center_id, center_rank, sq_dist). */
  def q163KcenterCoreset(s: SparkSession, dir: String): DataFrame =
    kcenterAssign(Tables.embeddings(s, dir), M)

  /** Integer squared L2 from the snapped `qx` column to a fixed center
    * (padded positions contribute 0 — [[Clustering.assign]]'s rule). */
  private def distTo(c: Seq[Long]): Column =
    // codegen'd kernel (functions.IntSqDist) — bit parity with the HOF
    // chain asserted in Wave29Spec
    coalesce(graft.functions.exprs.int_sqdist(col("qx"), typedlit(c)), lit(0L))

  /** The greedy selection: m rounds of (argmax running-min-distance,
    * fold the new center into the running column). Returns the picks in
    * order with each pick's covering radius (its distance to the
    * already-chosen set; the seed's is its squared norm rank proxy, 0
    * by convention). */
  def kcenterSelect(emb: DataFrame, m: Int): Seq[(Long, Seq[Long])] = {
    require(m >= 1, "need at least one center")
    // lazy checkpoint: the seed argmax right below is the materializing
    // action, so pinning costs no extra job (the r14 pin-then-count rule)
    val base = emb
      .select(col("vec_id"), Clustering.snapped(col("embedding")).as("qx"))
      .localCheckpoint(false)

    // each pick rides ONE argmax job: the winner's qx is carried inside
    // the max struct — (key, nid) is unique per row (nid = -vec_id), so
    // the lexicographic struct comparison never reaches the qx field and
    // the pick is bit-identical to the old (key, nid) argmax; the old
    // plan paid a second full-scan job (qxOf) per round just to fetch
    // the winner's vector
    def argmaxCarry(df: DataFrame, key: Column): (Long, Seq[Long]) = {
      val r = df
        .agg(max(struct(key.as("key"), (-col("vec_id")).as("nid"),
          col("qx").as("qx"))).as("s"))
        .select(col("s.nid"), col("s.qx")).head()
      (-r.getLong(0), r.getSeq[Long](1))
    }

    // seed: max integer norm, ties to the smaller vec_id
    var chosen = Vector(argmaxCarry(
      base.withColumn("nrm", coalesce(aggregate(col("qx"), lit(0L),
        (acc, e) => acc + e * e), lit(0L))),
      col("nrm")))

    // per round: lazy checkpoint + argmax = ONE job (the materializing
    // action IS the pick; the old eager checkpoint was a separate job,
    // so each round paid 3 jobs — checkpoint, pick, qxOf — now 1)
    var cur = base.withColumn("mind", distTo(chosen.head._2))
      .localCheckpoint(false)
    (2 to m).foreach { _ =>
      val ids = chosen.map(_._1)
      val (id, qx) = argmaxCarry(
        cur.filter(!col("vec_id").isin(ids: _*)), col("mind"))
      chosen = chosen :+ (id, qx)
      cur = cur.withColumn("mind", least(col("mind"), distTo(qx)))
        .localCheckpoint(false)
    }
    chosen
  }

  /** Select m centers, then one narrow assignment pass: per vector the
    * nearest center by (distance, center id) — m literal distance
    * expressions, argmin via `array_min` over structs. */
  def kcenterAssign(emb: DataFrame, m: Int): DataFrame = {
    val centers = kcenterSelect(emb, m)
    val dists = centers.zipWithIndex.map { case ((id, qx), i) =>
      struct(distTo(qx).as("d"), lit(id).as("cid"),
        lit((i + 1).toLong).as("rank"))
    }
    emb.select(col("vec_id"), Clustering.snapped(col("embedding")).as("qx"))
      .withColumn("best", array_min(array(dists: _*)))
      .select(col("vec_id"),
        col("best.cid").as("center_id"),
        col("best.rank").as("center_rank"),
        col("best.d").as("sq_dist"))
      .orderBy(col("vec_id"))
  }
}
