package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic train/val/test assignment by content-id hash — the one
  * split expression shared by every split-aware operator (q32 summary,
  * q43 decontamination). Membership is a pure function of the id: stable
  * across runs, engines, partitionings and retries, so train/test never
  * bleed when a stage is recomputed. The 'cc'/'e6' byte boundaries split
  * the first md5 byte ~80/10/10.
  */
object Splits {
  def of(id: Column): Column = {
    val h = substring(md5(id.cast("string")), 1, 2)
    when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
  }
}
