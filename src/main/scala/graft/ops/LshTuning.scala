package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** LSH band-configuration sweep — the tuning table behind q26's
  * banding choice: for every (bands b × rows r) split of the SAME
  * 8-component MinHash signature, measure candidate volume, recall
  * and precision against the exact Jaccard ≥ t truth set. The S-curve
  * P(collide) = 1 − (1 − s^r)^b trades recall against candidate cost:
  * (8,1) catches everything and floods the verifier, (1,8) is nearly
  * free and nearly blind — this query MEASURES the trade on the
  * corpus instead of trusting the formula, the q26 companion of
  * AnnTuner's IVF/hyperplane knob table. Reference scope note: the
  * reference has no similarity surface; this is the dedup family's
  * self-diagnostic.
  *
  * Scale shape: ONE capped-shingle materialization (the q25/q26 stop
  * cap bounds every posting list) feeds the signature aggregate, the
  * truth pair join AND all four band layouts; each config's candidate
  * join is the q26 equi-join on (band, bandhash) — per-key fan-out
  * bounded by the cap, never all-pairs; per-config results are 1-row
  * aggregates unioned into the 4-row report. The sweep costs ~4 band
  * joins over signature rows (|docs|·b each), all off the one cached
  * signature frame.
  *
  * Determinism: candidate/truth/hit counts are exact longs; recall
  * and precision are single divides rounded 6. */
object LshTuning {

  /** The (b, r) sweep at b·r = 8 over word-3-gram MinHash signatures,
    * truth = exact Jaccard ≥ `threshold` on the capped sets:
    * (n_bands, rows_per_band, n_candidates, n_true, n_hit, recall,
    * precision). */
  def bandSweep(docs: DataFrame, threshold: Double,
                maxDocFreq: Long): DataFrame = {
    val s = docs.sparkSession
    val sh = Dedup.cappedShingleSet(docs, 3, maxDocFreq)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val truth = Dedup.coGroupedPairCounts(sh)
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .filter(col("c").cast("double") /
        (col("s1.n") + col("s2.n") - col("c")).cast("double") >= threshold)
      .select(col("d1"), col("d2"))
      .localCheckpoint(false) // lazy: the count below materializes it
    val nTrue = truth.count()
    val sig = Dedup.withDigests(sh).groupBy(col("doc_id"))
      .agg(Dedup.minhashAgg(0), (1 until 8).map(Dedup.minhashAgg): _*)
      .localCheckpoint()
    val configs = Seq((1, 8), (2, 4), (4, 2), (8, 1))
    // Each config's candidate volume and truth-hit count fold into ONE
    // action (left join against the pinned truth, count + count(hit) in
    // one aggregate — the cand frame has a single consumer now, so its
    // old eager pin + two follow-up counts collapse), and the four
    // configs are mutually independent readers of the two pins (sig,
    // truth) — run concurrently (Par.inParallel contract). r14: the
    // sweep was 12 serialized actions; it is now 4 overlapped ones.
    // LOAD-BEARING invariant (r14 advisor note): the counts below assume
    // `truth` holds AT MOST ONE row per (d1, d2) — count(*) after the
    // left join equals the candidate count only then. This holds because
    // coGroupedPairCounts groups per pair (one row per (d1, d2) by
    // construction); a future truth source that can emit duplicates must
    // be .distinct()-ed before reaching here or both n_candidates and
    // n_hit silently inflate.
    val truthM = truth.withColumn("__t", lit(1))
    val rows = new Array[(Int, Int, Long, Long)](configs.size)
    Par.inParallel(configs.zipWithIndex.map { case ((b, r), ci) =>
      () => {
        val bandStructs = (0 until b).map { i =>
          struct(lit(i).as("band"),
            md5(concat((0 until r).map(j => col(s"h${r * i + j}")): _*)).as("bh"))
        }
        val bands = sig.select(col("doc_id"),
            explode(array(bandStructs: _*)).as("bb"))
          .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
        val cnt = bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .distinct()
          .join(truthM, Seq("d1", "d2"), "left")
          .agg(count(lit(1)).as("nc"), count(col("__t")).as("nh"))
          .head()
        rows(ci) = (b, r, cnt.getLong(0), cnt.getLong(1))
      }
    }: _*)
    import s.implicits._
    rows.toSeq.map { case (b, r, nc, nh) => (b, r, nc, nTrue, nh) }
      .toDF("n_bands", "rows_per_band", "n_candidates", "n_true", "n_hit")
      .select(col("n_bands").cast("long"), col("rows_per_band").cast("long"),
        col("n_candidates"), col("n_true"), col("n_hit"))
      .withColumn("recall", round(
        when(col("n_true") > 0L,
          col("n_hit").cast("double") / col("n_true").cast("double")), 6))
      .withColumn("precision", round(
        when(col("n_candidates") > 0L,
          col("n_hit").cast("double") / col("n_candidates").cast("double")), 6))
      .orderBy(col("n_bands"))
  }

  /** q196: the sweep at the q25/q26 production knobs (t=0.5, cap 50).
    *
    * Driver-state note: the per-config loop drives 4 counts — each a
    * 1-row scalar read off a bounded dataflow (the q141 "1-row knob
    * read" precedent); the result table is 4 literal rows. */
  def q196LshTuning(s: SparkSession, dir: String): DataFrame =
    bandSweep(Tables.documents(s, dir), 0.5, 50L)
}
