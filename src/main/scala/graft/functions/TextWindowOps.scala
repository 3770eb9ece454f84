package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Per-offset rolling hashes of every length-L character window of a
  * string — the candidate-generation kernel behind exact-substring
  * dedup (Lee et al., "Deduplicating Training Data Makes Language
  * Models Better", ACL'22: the ExactSubstr primitive). One O(n) pass
  * produces all n−L+1 window hashes; equal windows hash equal by
  * construction, so a corpus-wide group-by on the hash finds every
  * candidate duplicate position, and an exact verify pass on the
  * (rare) candidates removes collisions — the detection is EXACT, the
  * hash only prunes.
  *
  * Positions are CODE POINTS, not bytes: Spark's `substring` and
  * DuckDB's `substr` both index code points, so the verify pass and
  * the oracle replay read exactly the windows this kernel hashed,
  * multibyte text included. The string's code points are decoded once
  * into an int array (one pass over the UTF-8 bytes), then the hash
  * rolls: h_{i+1} = (h_i − cp_i·P^{L−1})·P + cp_{i+L}, all wrapping
  * 64-bit arithmetic — deterministic everywhere, no float anywhere.
  *
  * Why not a distributed suffix array: prefix doubling needs ⌈log L⌉
  * corpus-wide rank/sort shuffles to find the same length-≥L duplicate
  * spans this kernel finds with ONE narrow scan plus one hash shuffle
  * (positions whose window duplicates, merged into maximal spans, are
  * exactly the positions covered by a duplicated substring of length
  * ≥ L). On Spark the shuffle count is the cost model; the rolling
  * window form is the same primitive with 1/⌈log L⌉ the shuffles. */
object TextWindowOps {

  /** The polynomial base — same base as [[S3LogParse.rollingHash64]]. */
  val P = 1000003L

  /** All length-L code-point-window hashes of `s`, in position order
    * (index i = the window starting at code point i, 0-based). Empty
    * array when the string has fewer than L code points. */
  def windowHashes(s: UTF8String, L: Int): ArrayData = {
    val nb = s.numBytes()
    // decode code point values in one pass (1 cp per byte upper bound)
    val cp = new Array[Int](nb)
    var n = 0
    var i = 0
    while (i < nb) {
      val b0 = s.getByte(i)
      val w = UTF8String.numBytesForFirstByte(b0)
      val v = w match {
        case 1 => b0 & 0xff
        case 2 => ((b0 & 0x1f) << 6) | (s.getByte(i + 1) & 0x3f)
        case 3 => ((b0 & 0x0f) << 12) | ((s.getByte(i + 1) & 0x3f) << 6) |
          (s.getByte(i + 2) & 0x3f)
        case _ => ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3f) << 12) |
          ((s.getByte(i + 2) & 0x3f) << 6) | (s.getByte(i + 3) & 0x3f)
      }
      cp(n) = v
      n += 1
      i += w
    }
    val m = n - L + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    var pPow = 1L // P^(L-1), wrapping
    var j = 0
    while (j < L - 1) { pPow *= P; j += 1 }
    val out = new Array[Long](m)
    var h = 0L
    j = 0
    while (j < L) { h = h * P + cp(j); j += 1 }
    out(0) = h
    var k = 1
    while (k < m) {
      h = (h - cp(k - 1) * pPow) * P + cp(k + L - 1)
      out(k) = h
      k += 1
    }
    new GenericArrayData(out)
  }
}
