package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Static vector kernels shared by the interpreted and codegen paths of
  * CosineSimilarity (no companion class → guaranteed static forwarders
  * for Janino-generated code). */
object VectorOps {

  /** Cosine over two float arrays with double accumulation in array
    * order — the same operation order as the zip_with/aggregate
    * formulation in ops.Similarity, so results are bit-identical
    * (asserted in ParseSpec). Returns NaN for zero-norm inputs. */
  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact integer squared L2 over two long arrays — the k-means /
    * k-center / IVF-probe assignment kernel (grid-snapped vectors,
    * terms ≤ ~64·(2·10³)² — far from overflow). Contract mirrors the
    * `coalesce(aggregate(zip_with(x, y, coalesce((a−b)², 0)), 0, +), 0)`
    * HOF chain it replaces: a null element or a position beyond the
    * shorter array contributes 0 (zip_with's null padding), so the sum
    * runs over positions where BOTH sides are present. */
  def sqDistLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val d = a.getLong(i) - b.getLong(i)
        s += d * d
      }
      i += 1
    }
    s
  }

  /** Exact integer dot product over two long arrays (int8-quantized
    * vectors — products bounded by 64·127², far from overflow). */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += a.getLong(i) * b.getLong(i)
      i += 1
    }
    dot
  }
}
