package graft.ops

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per group as a typed Aggregator — the scale path for
  * "k best rows per key". The window formulation
  * (`row_number().over(partitionBy(key).orderBy(v))`) must shuffle and
  * sort EVERY row of the group; this aggregator keeps a k-element
  * bounded heap per group, so map-side partial aggregation caps the
  * shuffle at k rows per key per task and no full sort ever happens.
  * Same asymptotic win as the reference's layout tricks: do the
  * selection before the expensive movement, not after.
  *
  * Result rows are (score desc, id asc)-ordered with deterministic
  * tie-breaks — verified equal to the window formulation in
  * ScaleOpsSpec.
  */
object TopKPerGroup {

  /** (score, id) with ordering: keep the k largest scores, ties → the
    * SMALLEST id wins a slot (matches row_number ordering score desc,
    * id asc). */
  case class Entry(score: Double, id: Long)

  private implicit val keepOrder: Ordering[Entry] =
    Ordering.by((e: Entry) => (-e.score, e.id)) // "best first" total order

  class TopK(k: Int) extends Aggregator[(Long, Entry), mutable.ArrayBuffer[Entry], Seq[Entry]] {
    override def zero: mutable.ArrayBuffer[Entry] = mutable.ArrayBuffer.empty

    private def trim(b: mutable.ArrayBuffer[Entry]): mutable.ArrayBuffer[Entry] = {
      if (b.length > k) {
        val kept = b.sorted(keepOrder).take(k)
        b.clear(); b ++= kept
      }
      b
    }

    override def reduce(b: mutable.ArrayBuffer[Entry], e: (Long, Entry)): mutable.ArrayBuffer[Entry] = {
      b += e._2
      if (b.length >= 2 * k) trim(b) else b // amortize the sort
    }

    override def merge(a: mutable.ArrayBuffer[Entry], b: mutable.ArrayBuffer[Entry]): mutable.ArrayBuffer[Entry] =
      trim(a ++= b)

    override def finish(b: mutable.ArrayBuffer[Entry]): Seq[Entry] =
      b.sorted(keepOrder).take(k).toSeq

    override def bufferEncoder: Encoder[mutable.ArrayBuffer[Entry]] =
      Encoders.kryo[mutable.ArrayBuffer[Entry]]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Top-k rows per key: input (key, score, id) → one row per kept entry
    * with rank. */
  def topKPerKey(df: DataFrame, keyCol: String, scoreCol: String, idCol: String,
                 k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long").as("key"),
        col(scoreCol).cast("double").as("score"), col(idCol).cast("long").as("id"))
      .as[(Long, Double, Long)]
      .map { case (key, s, i) => (key, Entry(s, i)) }
      .groupByKey(_._1)
      .agg(new TopK(k).toColumn.name("top"))
      .toDF("key", "top")
      .select(col("key"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("key"), (col("pos") + 1).cast("long").as("rank"),
        col("e.score").as("score"), col("e.id").as("id"))
  }
}
