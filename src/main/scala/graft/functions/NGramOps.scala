package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram construction as ONE kernel call per row — the shared
  * front end of every shingle-based operator (q25/q26/q40/q43/q57/…
  * via `Dedup.shingles`, q197/q198 via `TailStats.gramFreq`). The HOF
  * formulation it replaces —
  * `transform(sequence(1, size(l)−n+1), i → array_join(slice(l,i,n)))`
  * (+ `array_distinct`) — is CodegenFallback: an interpreted
  * expression-tree walk and two array copies per gram (the
  * WinnowOps.fingerprints lesson, measured 4.5× there).
  *
  * Semantics contract (the oracle replays these exactly):
  *  - gram = n tokens joined by one space;
  *  - fewer than n tokens → empty array;
  *  - distinct mode preserves FIRST-occurrence order — the same set
  *    and order `array_distinct` produces, so swapping the kernel in
  *    changes no downstream hash.
  *
  * Token bytes are materialized once per row (one copy per token),
  * then each gram is a single byte-array assembly — no per-gram
  * slice/join expression trees. */
object NGramOps {

  def ngrams(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    // null tokens are skipped (the input type is ARRAY<STRING> with
    // containsNull allowed): compact to the non-null subsequence first —
    // null-free inputs, i.e. every internal call site, are bit-identical
    val rawN = tokens.numElements()
    val tb0 = new Array[Array[Byte]](rawN)
    var tn = 0
    var r = 0
    while (r < rawN) {
      if (!tokens.isNullAt(r)) { tb0(tn) = tokens.getUTF8String(r).getBytes; tn += 1 }
      r += 1
    }
    val m = tn - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val tb = tb0
    var i = 0
    def gram(at: Int): UTF8String = {
      var len = n - 1 // the separating spaces
      var j = 0
      while (j < n) { len += tb(at + j).length; j += 1 }
      val b = new Array[Byte](len)
      var p = 0
      j = 0
      while (j < n) {
        if (j > 0) { b(p) = ' '.toByte; p += 1 }
        val t = tb(at + j)
        System.arraycopy(t, 0, b, p, t.length)
        p += t.length
        j += 1
      }
      UTF8String.fromBytes(b)
    }
    if (!distinct) {
      val out = new Array[Any](m)
      i = 0
      while (i < m) { out(i) = gram(i); i += 1 }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
      i = 0
      while (i < m) { seen.add(gram(i)); i += 1 }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = it.next(); o += 1 }
      new GenericArrayData(out)
    }
  }
}
