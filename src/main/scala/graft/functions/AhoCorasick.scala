package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick, CACM '75) —
  * the blocklist-scan kernel: counts OVERLAPPING occurrences of every
  * literal pattern in one left-to-right pass, O(bytes + matches) per
  * row INDEPENDENT of the pattern count, where P separate
  * `contains`/`locate` scans cost O(P·bytes). Built once at plan time
  * from the literal pattern list and shipped to executors as a codegen
  * reference object (the kernel loop lives in this compiled class; the
  * generated code is one call — the DecDot/WinnowFingerprints idiom,
  * so the expression stays inside whole-stage codegen).
  *
  * Byte-level matching over the UTF-8 encoding: for well-formed UTF-8
  * a byte match of a whole pattern IS a character match (UTF-8 is
  * self-synchronizing — no multi-byte sequence is a substring of a
  * different character's encoding), so byte-level AC is exact for
  * literal patterns while never decoding.
  *
  * Dense goto table: `next(state)(byte)` is total (failure links are
  * resolved at build time, the classic NFA→DFA flattening), so the hot
  * loop is two array reads per input byte plus an output-list walk
  * only on states that complete at least one pattern. */
final class AhoCorasick private[functions] (
    next: Array[Array[Int]],
    outs: Array[Array[Int]],
    val nPatterns: Int) extends Serializable {

  /** Per-pattern overlapping occurrence counts in `s`, as a LongArray. */
  def countsAll(s: UTF8String): ArrayData = {
    val counts = new Array[Long](nPatterns)
    val n = s.numBytes()
    var st = 0
    var i = 0
    while (i < n) {
      st = next(st)(s.getByte(i) & 0xff)
      val o = outs(st)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1; j += 1 }
      i += 1
    }
    ArrayData.toArrayData(counts)
  }
}

object AhoCorasick {

  /** Standard construction: byte trie, BFS failure links, output sets
    * merged down the failure chain, goto flattened to a total DFA. */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "ac_counts needs at least one non-empty pattern")
    val children = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var st = 0
      p.getBytes("UTF-8").foreach { b =>
        val c = b & 0xff
        if (children(st)(c) == -1) {
          children += Array.fill(256)(-1)
          out += Nil
          children(st)(c) = children.size - 1
        }
        st = children(st)(c)
      }
      out(st) = pi :: out(st)
    }
    val n = children.size
    val fail = new Array[Int](n)
    val next = Array.tabulate(n)(i => children(i).clone())
    val outSets: Array[List[Int]] = Array.tabulate(n)(out(_))
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      val s1 = next(0)(c)
      if (s1 == -1) next(0)(c) = 0
      else { fail(s1) = 0; queue += s1 }
      c += 1
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      // BFS order: fail(u) is shallower, already finalized
      outSets(u) = outSets(u) ++ outSets(fail(u))
      var b = 0
      while (b < 256) {
        val v = next(u)(b)
        if (v == -1) next(u)(b) = next(fail(u))(b)
        else { fail(v) = next(fail(u))(b); queue += v }
        b += 1
      }
    }
    new AhoCorasick(next, outSets.map(_.toArray.sorted), patterns.size)
  }
}
