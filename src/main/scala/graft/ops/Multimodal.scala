package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column handling: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata alongside. Decode /
  * feature-extraction runs per-partition in batches (the Scala analogue
  * of `mapInPandas`): partition-local, no driver involvement, output
  * schema declared up front.
  *
  * The actual codec is STUBBED — no image/audio libraries ship in this
  * container — behind `decodeStub`, a deterministic fake that derives
  * "dimensions" and a "mean luminance" from the raw bytes. The Spark-side
  * plumbing (schema, encoders, partition batching, column pruning) is
  * real and tested; swapping `decodeStub` for a JNI/javacv decoder is a
  * one-function change.
  */
object Multimodal {

  case class MediaMeta(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      mean_luma: Double,
      payload_md5: String)

  /** STUB decode (see object scaladoc): deterministic features from raw
    * bytes so pipelines and tests exercise the full dataflow. */
  def decodeStub(docId: Long, mediaType: String, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    val w = if (n == 0) 0 else 64 + (payload(0) & 0x7f)
    val h = if (n == 0) 0 else 64 + (payload(n / 2) & 0x7f)
    var sum = 0L
    var i = 0
    while (i < n) { sum += (payload(i) & 0xff); i += 1 }
    val luma = if (n == 0) 0.0 else sum.toDouble / n
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    MediaMeta(docId, mediaType, n.toLong, w, h, luma,
      md.map("%02x".format(_)).mkString)
  }

  /** STUB resize: a real implementation decodes, scales, re-encodes; the
    * stub deterministically samples bytes so output size tracks the target
    * dims and pipelines can assert on shape. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, (w * h) / 64)
    if (payload.isEmpty) Array.emptyByteArray
    else Array.tabulate(math.min(target, payload.length))(i =>
      payload((i.toLong * payload.length / math.min(target, payload.length)).toInt % payload.length))
  }

  /** STUB frame sampling for video payloads: every nth "frame" is a
    * fixed-size byte window; real codecs slot in behind the same
    * signature (payload → frames). */
  def frameSampleStub(payload: Array[Byte], frameSize: Int, everyN: Int): Seq[Array[Byte]] = {
    if (frameSize <= 0 || everyN <= 0) Seq.empty
    else payload.grouped(frameSize).zipWithIndex
      .collect { case (frame, i) if i % everyN == 0 => frame }.toSeq
  }

  case class FrameMeta(doc_id: Long, frame_idx: Int, n_bytes: Long, frame_md5: String)

  /** Per-partition frame explosion: one media row → N sampled-frame rows.
    * Output cardinality is data-dependent, so this is an iterator-to-
    * iterator flatMap (no per-task buffering). */
  def sampleFrames(df: DataFrame, frameSize: Int = 256, everyN: Int = 2): Dataset[FrameMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        frameSampleStub(bytes, frameSize, everyN).zipWithIndex.map { case (f, i) =>
          val md = java.security.MessageDigest.getInstance("MD5").digest(f)
          FrameMeta(id, i, f.length.toLong, md.map("%02x".format(_)).mkString)
        }
      })
  }

  /** Batch feature extraction over a binary-payload DataFrame
    * (`doc_id: long, media_type: string, payload: binary`). Runs
    * partition-local with an iterator (constant memory per task). */
  def extractFeatures(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, mt, bytes) => decodeStub(id, mt, bytes) })
  }

  /** Synthesizes a media table from `documents` (text bytes stand in for
    * an encoded payload) — the container has no real media files. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"))

  /** q30: metadata over the binary column via pure column exprs (the
    * oracle-facing subset — byte length, content hash, head byte). The
    * stubbed decode path is exercised by ScalaTest instead. */
  def q30MultimodalMeta(s: SparkSession, dir: String): DataFrame = {
    mediaTable(s, dir)
      .select(
        col("doc_id"), col("media_type"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        ascii(col("payload").cast("string")).cast("long").as("head_byte"))
      .orderBy(col("doc_id"))
  }
}
