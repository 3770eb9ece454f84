package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helpers shared by the interpreted (`nullSafeEval`) and
  * whole-stage-codegen (`doGenCode`) paths of the custom expressions.
  *
  * Deliberately a plain object with no companion class so the Scala
  * compiler emits static forwarders — generated Java from Janino calls
  * `graft.functions.S3LogParse.tokenize(...)` directly.
  */
object S3LogParse {

  /** The reference's tokenizer regex (s3access/serializer.py:5): a field is
    * a quoted string (delimiters stripped), a bracketed timestamp
    * (delimiters stripped), or a space-free run. */
  private val TokenPattern: Pattern =
    Pattern.compile("(?:\"([^\"]+)\")|(?:\\[([^\\]]+)\\])|([^ ]+)")

  /** Tokenize one access-log line; per match, the single non-null capture
    * group wins (reference s3access/serializer.py:8-10). */
  def tokenize(line: UTF8String): ArrayData = {
    val m = TokenPattern.matcher(line.toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    while (m.find()) {
      val tok =
        if (m.start(1) >= 0) m.group(1)
        else if (m.start(2) >= 0) m.group(2)
        else m.group(3)
      out += UTF8String.fromString(tok)
    }
    new GenericArrayData(out.toArray)
  }

  /** 64-bit polynomial rolling hash of a string's UTF-8 bytes
    * (h = h*1000003 + b, wrapping): the per-document fingerprint primitive —
    * O(n), no allocation, and the polynomial form supports incremental
    * window updates for character-level winnowing. */
  def rollingHash64(s: UTF8String): Long = {
    val n = s.numBytes()
    var h = 1469598103934665603L // FNV offset basis as a non-zero seed
    var i = 0
    while (i < n) {
      h = h * 1000003L + (s.getByte(i) & 0xffL)
      i += 1
    }
    h
  }

  /** Dotted-quad IPv4 → unsigned-32 value as long; -1 when the input is not
    * a valid IPv4 literal (caller maps -1 to NULL or, in strict mode, to an
    * error — SURVEY.md §1.4#5). Allocation-free fast path. */
  def ipv4ToLong(ip: UTF8String): Long = {
    val n = ip.numBytes()
    if (n < 7 || n > 15) return -1L
    var acc = 0L      // current octet
    var digits = 0    // digits in current octet
    var octets = 0    // completed octets
    var value = 0L
    var i = 0
    while (i < n) {
      val b = ip.getByte(i)
      if (b >= '0' && b <= '9') {
        acc = acc * 10 + (b - '0')
        digits += 1
        if (digits > 3 || acc > 255) return -1L
      } else if (b == '.') {
        if (digits == 0 || octets == 3) return -1L
        value = (value << 8) | acc
        acc = 0L; digits = 0; octets += 1
      } else return -1L
      i += 1
    }
    if (digits == 0 || octets != 3) return -1L
    (value << 8) | acc
  }
}
