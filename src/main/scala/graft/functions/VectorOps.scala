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
