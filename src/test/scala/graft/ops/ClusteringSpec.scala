package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q81 (k-means assignment) + q82 (duplicate-span removal) specs — planted
  * fixtures with hand-computable expectations. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def embDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("q81 assign: exact integer distances, ties to the smaller cluster id") {
    // snapped: [0.1, 0.2] -> [100, 200]
    val emb = embDf(Seq(1L -> Seq(0.1f, 0.2f)))
    val centroids = Array(Array(90L, 210L), Array(100L, 200L), Array(100L, 200L))
    val row = Clustering.assign(emb, centroids).collect().head
    // exact distance to centroid 1/2 is 0; tie broken to cluster 1 (not 2)
    assert(row.getAs[Int]("cluster") === 1)
    assert(row.getAs[Long]("sq_dist") === 0L)

    val far = Clustering.assign(emb, Array(Array(90L, 210L))).collect().head
    assert(far.getAs[Long]("sq_dist") === (10L * 10 + 10L * 10))
  }

  test("q81: planted separable groups cluster together and apart") {
    def around(base: Float, n: Int, from: Long): Seq[(Long, Seq[Float])] =
      (0 until n).map(i => (from + i) -> Seq(base + i * 0.001f, base - i * 0.001f))
    val emb = embDf(around(0.0f, 6, 0L) ++ around(5.0f, 6, 10L) ++ around(-5.0f, 6, 20L))
    val centroids = Clustering.trainCentroids(emb, k = 3, iters = 10)
    assert(centroids.length === 3)
    val got = Clustering.assign(emb, centroids).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    def clusterOf(ids: Range): Set[Int] = ids.map(i => got(i.toLong)).toSet
    val (a, b, c) = (clusterOf(0 until 6), clusterOf(10 until 16), clusterOf(20 until 26))
    assert(a.size === 1 && b.size === 1 && c.size === 1,
      s"each planted group lands in one cluster: $a $b $c")
    assert(Set(a.head, b.head, c.head).size === 3, "groups are separated")
  }

  test("q81: empty embedding lands in cluster 0 at distance 0 (the oracle's COALESCE)") {
    val emb = embDf(Seq(7L -> Seq.empty[Float]))
    val row = Clustering.assign(emb, Array(Array(5L, 5L), Array(1L, 1L))).collect().head
    assert(row.getAs[Int]("cluster") === 0)
    assert(row.getAs[Long]("sq_dist") === 0L)
  }

  test("q94 purity: aligned labels score 1.0; a flipped member drops it; ties break low") {
    import spark.implicits._
    // two clusters; labels aligned with cluster membership
    val joined = Seq(
      (0, 7), (0, 7), (0, 7),            // cluster 0: pure label 7
      (1, 3), (1, 3), (1, 9))            // cluster 1: majority 3, one stray 9
      .toDF("cluster", "label")
    val got = Clustering.purityTable(joined).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (0, 3L, 7, 3L, 1.0),
      (1, 3L, 3, 2L, 0.666666667)), s"purity table diverged: ${got.toSeq}")
    // exact tie on counts -> the SMALLER label must win (the pinned order)
    val tied = Seq((5, 4), (5, 2), (5, 4), (5, 2)).toDF("cluster", "label")
    val t = Clustering.purityTable(tied).collect().head
    assert(t.getInt(2) == 2 && t.getLong(3) == 2L)
  }

  // ---------------------------------------------------------------- q82

  /** ≥20-char unique filler built from a tag — no 20-gram repeats across
    * fillers because the tag is embedded every few chars. */
  private def filler(tag: String, n: Int): String =
    Iterator.continually(tag).flatten.take(n).mkString

  test("q83 clusterSample: equal-k draw per cluster, window-equivalent, removal-stable") {
    // 3 clusters with 30/5/12 members — unbalanced on purpose
    val assigned = ((0L until 30L).map((_, 0)) ++ (100L until 105L).map((_, 1))
      ++ (200L until 212L).map((_, 2))).toDF("vec_id", "cluster")
    val k = 8
    val got = Clustering.clusterSample(assigned, k).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // min(k, |cluster|) rows per cluster — the balance property
    val perCluster = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perCluster == Map(0 -> 8, 1 -> 5, 2 -> 8), s"allocation: $perCluster")
    // ≡ the row_number window formulation (the oracle's shape)
    val hash52 = conv(substring(
      md5(concat(lit("csample:"), col("vec_id").cast("string"))), 1, 13), 16, 10)
      .cast("long")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(hash52, col("vec_id"))
    val expected = assigned
      .withColumn("sample_rank", row_number().over(win).cast("long"))
      .filter(col("sample_rank") <= k)
      .select(col("cluster"), col("sample_rank"), col("vec_id")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.toSet == expected, "bounded top_k drifted from the window formulation")
    // q52's reservoir property: dropping non-sampled vectors never
    // changes the sample
    val sampledIds = got.map(_._3).toSet
    val pruned = assigned.filter(col("vec_id").isin(sampledIds.toSeq.map(Long.box): _*))
    val again = Clustering.clusterSample(pruned, k).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == got.toSet, "sample changed when non-sampled rows were removed")
  }

  test("q82: a cross-doc shared run is cut from BOTH documents, exactly") {
    val s = "SHARED-RUN-0123456789-ABCDEFGHIJKLMNOPQR" // 40 chars
    assert(s.length === 40)
    val p = filler("aquickbrownfoxjumped", 25)
    val q = filler("overthelazydogsback1", 25)
    val r = filler("nowisthewinterofour2", 25)
    val t = filler("discontentmadeglory3", 25)
    val docs = Seq((1L, p + s + q), (2L, r + s + t)).toDF("doc_id", "text")
    val got = Dedup.spanRemoved(docs, 20).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // span extent is exactly s in both docs
    assert(got(1L).getAs[Long]("removed_chars") === 40L)
    assert(got(2L).getAs[Long]("removed_chars") === 40L)
    assert(got(1L).getAs[Long]("n_spans") === 1L)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hex(x: String) = md5.digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(1L).getAs[String]("clean_md5") === hex(p + q))
    assert(got(2L).getAs[String]("clean_md5") === hex(r + t))
  }

  test("q82: an in-doc repeat merges into one span covering both copies") {
    val u = filler("neitherabborrowernor", 30)
    val v = "REPEATED-BLOCK-abcdefghijklmn!" // 30 chars
    assert(v.length === 30)
    val docs = Seq((1L, u + v + v)).toDF("doc_id", "text")
    val row = Dedup.spanRemoved(docs, 20).collect().head
    // duplicated window starts: 31..41 and 61..71 (1-based); the 20-gap
    // between runs is NOT > k, so they merge into one span [31, 71+19=90]
    assert(row.getAs[Long]("n_spans") === 1L)
    assert(row.getAs[Long]("removed_chars") === 60L)
    assert(row.getAs[Long]("clean_chars") === 30L)
  }

  test("q82: spanless and short documents pass through untouched") {
    // 35 < 2×20, so the cyclic filler cannot repeat a 20-gram in-doc
    val docs = Seq((1L, filler("uniquecontentblockq1", 35)),
                   (2L, "short")).toDF("doc_id", "text")
    val got = Dedup.spanRemoved(docs, 20).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    Seq(1L, 2L).foreach { id =>
      assert(got(id).getAs[Long]("removed_chars") === 0L)
      assert(got(id).getAs[Long]("n_spans") === 0L)
      assert(got(id).getAs[Long]("clean_chars") === got(id).getAs[Long]("n_chars"))
    }
  }

  test("q82 removed_chars ≡ q70 dup_chars on the same frame (shared span core)") {
    val s = "SHARED-RUN-0123456789-ABCDEFGHIJKLMNOPQR"
    val docs = Seq(
      (1L, filler("aquickbrownfoxjumped", 25) + s),
      (2L, s + filler("overthelazydogsback1", 25)),
      (3L, filler("nowisthewinterofour2", 50))).toDF("doc_id", "text")
    val removed = Dedup.spanRemoved(docs, 20).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("removed_chars")).toMap
    val dup = Dedup.substringDupStats(docs, 20).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("dup_chars")).toMap
    assert(removed === dup)
  }
}
