package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.Decimal

/** Exact-decimal dot product of two float arrays as ONE kernel call
  * per row — the codegen replacement for the repo's determinism-
  * critical `aggregate(zip_with(x, y, product→decimal), 0, +)` HOF
  * chain (CodegenFallback: an interpreted expression-tree walk and a
  * Decimal box per ELEMENT). Used by the kNN rescore (scale 18), the
  * truncation-recall probes, and the power-iteration passes (scale
  * 12).
  *
  * Bit contract (spec-asserted against the HOF chain): each term is
  * `BigDecimal.valueOf(x_i·y_i).setScale(scale, HALF_UP)` — exactly
  * what Spark's `Cast(double → decimal(28,s))` produces (valueOf's
  * canonical-string decimal, then HALF_UP), and for pre-rounded
  * `round(p, s)` terms the round-trip through double preserves the
  * s-dp value, so one formula covers both call-site recipes. Terms
  * accumulate with exact BigDecimal adds (order-free). NULL handling
  * mirrors the HOF chain: a null element nulls its product and a null
  * term nulls the running sum, and zip_with pads a length mismatch
  * with nulls — so any null element OR unequal lengths → null result.
  * Overflow mirrors it too: the HOF chain casts EVERY intermediate sum
  * to decimal(28,scale), so a running sum that transiently exceeds
  * precision 28 nulls the HOF result — the kernel checks the
  * accumulator's precision after each add and returns null the same
  * way (rather than succeeding where the HOF form would not). */
object DecimalOps {

  /** Σ valueOf(x_i·y_i).setScale(scale) as a Decimal(28, scale);
    * null on length mismatch or any null element (the HOF contract).
    * `xd`/`yd` say whether each side holds doubles (else floats) —
    * plan-time constants baked into the generated call. */
  def decDot(x: ArrayData, y: ArrayData, scale: Int,
             xd: Boolean, yd: Boolean): Decimal = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val a = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val b = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      acc = acc.add(JBigDecimal.valueOf(a * b)
        .setScale(scale, RoundingMode.HALF_UP))
      // the HOF chain re-casts the running sum to decimal(28,scale)
      // after every add; acc keeps scale = `scale`, so precision > 28
      // is exactly the overflow the cast would null out
      if (acc.precision() > 28) return null
      i += 1
    }
    Decimal(acc, 28, scale)
  }
}
