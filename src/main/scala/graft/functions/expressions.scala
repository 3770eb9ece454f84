package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, array_compact, array_distinct, array_join, lit, sequence, size, slice, transform, when}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the two operations the reference
  * implements in Python and Spark lacks as builtins (SURVEY.md §2.2):
  * the access-log tokenizer and IPv4→int. Both implement `doGenCode` so
  * they stay inside whole-stage codegen — no UDF serialization, no
  * row-at-a-time boxing beyond the unavoidable string work.
  */

/** Splits one S3 access-log line into its fields.
  * Reference: s3access/serializer.py:5-10. Output never contains nulls
  * (absent fields arrive as literal "-" tokens). */
case class TokenizeS3Log(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"tokenize_s3_log requires STRING, got ${child.dataType.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    S3LogParse.tokenize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.S3LogParse.tokenize($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenizeS3Log =
    copy(child = newChild)
  override def prettyName: String = "tokenize_s3_log"
}

/** Dotted-quad IPv4 string → its unsigned 32-bit value as a long.
  * Reference: s3access/normalize.py:70 (`int(ipaddress.IPv4Address(ip))`),
  * where invalid input kills the run (cmd/export.py:109-111). Default mode
  * returns NULL for invalid input (hostile-input-safe at 100 TB scale);
  * `strict = true` reproduces the reference's fail-fast for parity tests. */
case class Ipv4ToLong(child: Expression, strict: Boolean = false) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ipv4_to_long requires STRING, got ${child.dataType.sql}")
  }
  override def nullSafeEval(input: Any): Any = {
    val r = S3LogParse.ipv4ToLong(input.asInstanceOf[UTF8String])
    if (r >= 0L) java.lang.Long.valueOf(r)
    else if (strict) throw new IllegalArgumentException(
      s"ipv4_to_long: not an IPv4 address: $input")
    else null
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val invalid =
        if (strict)
          s"""throw new IllegalArgumentException("ipv4_to_long: not an IPv4 address: " + $c);"""
        else s"${ev.isNull} = true;"
      s"""
         |${ev.value} = graft.functions.S3LogParse.ipv4ToLong($c);
         |if (${ev.value} < 0L) { $invalid }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Ipv4ToLong =
    copy(child = newChild)
  override def prettyName: String = "ipv4_to_long"
}

/** 64-bit polynomial rolling hash of a string (document-fingerprint
  * primitive; see S3LogParse.rollingHash64). Codegen'd; deterministic
  * across partitions/engines-with-this-library. */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash64 requires STRING, got ${child.dataType.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    S3LogParse.rollingHash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.S3LogParse.rollingHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash64"
}

/** Cosine similarity between two `array<float>` columns as a native
  * binary expression: one fused loop computing dot product and both
  * norms with double accumulation — replaces a 3×(zip_with+aggregate)
  * HOF chain in the ANN hot path while producing bit-identical values
  * (same accumulation order; asserted in ParseSpec). */
case class CosineSimilarity(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity requires ARRAY<FLOAT> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosineFloat(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosineFloat($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_similarity"
}

/** Exact integer dot product between two `array<bigint>` columns (the
  * int8-quantization hot path): one fused codegen'd loop. The
  * zip_with+aggregate HOF formulation it replaces is CodegenFallback —
  * interpreted per row, with its whole defining expression tree inlined
  * into any join condition or filter that references it (measured ~1.6 s
  * of flat overhead on q47's verify filter vs ~0 for this expression). */
case class IntDot(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int_dot requires ARRAY<BIGINT> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotLong(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dotLong($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "int_dot"
}

/** Winnowing fingerprint selection (Schleimer SIGMOD'03) over a token
  * array: k-gram md5-prefix hashes + w-window minima + distinct, as ONE
  * codegen'd kernel call per document (WinnowOps scaladoc has the
  * hash/tie contract and the measured win over the HOF chain). k and w
  * are plan-time constants — baked into the generated call site. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    val ok = child.dataType match {
      case ArrayType(StringType, _) => k >= 1 && w >= 1
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires ARRAY<STRING> and k, w >= 1; got ${child.dataType.sql}, k=$k, w=$w")
  }
  override def nullSafeEval(input: Any): Any =
    WinnowOps.fingerprints(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowOps.fingerprints($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprints"
}

/** Exact integer squared L2 distance over two ARRAY<BIGINT> columns as
  * one codegen'd kernel call per row (VectorOps.sqDistLong has the
  * null/padding contract vs the HOF chain it replaces — bit parity in
  * Wave29Spec). The assignment hot path of the grid k-means family:
  * one call per (vector, centroid) pair instead of an interpreted
  * expression-tree fold. */
case class IntSqDist(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int_sqdist requires ARRAY<BIGINT> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sqDistLong(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.sqDistLong($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IntSqDist = copy(left = newLeft, right = newRight)
  override def prettyName: String = "int_sqdist"
}

/** Exact-decimal dot product of two numeric arrays as one codegen'd
  * kernel call per row (DecimalOps scaladoc has the bit contract vs
  * the aggregate/zip_with HOF chain it replaces). The scale is a
  * plan-time constant; each side may be array<float> or array<double>
  * — the getters are baked into the generated call. */
case class DecDot(left: Expression, right: Expression, scale: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def elemOk(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def dataType: DataType = DecimalType(28, scale)
  override def checkInputDataTypes() = {
    if (elemOk(left) && elemOk(right) && scale >= 0 && scale <= 18)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dec_dot requires ARRAY<FLOAT|DOUBLE> inputs and 0 <= scale <= 18; " +
        s"got ${left.dataType.sql}, ${right.dataType.sql}, scale=$scale")
  }
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    DecimalOps.decDot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      scale, elemIsDouble(left), elemIsDouble(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xd = elemIsDouble(left)
    val yd = elemIsDouble(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""${ev.value} = graft.functions.DecimalOps.decDot($a, $b, $scale, $xd, $yd);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DecDot = copy(left = newLeft, right = newRight)
  override def prettyName: String = "dec_dot"
}

/** Per-offset rolling hashes of every length-L character window of a
  * string as one codegen'd kernel call per row (TextWindowOps scaladoc
  * has the semantics and the suffix-array comparison). L is a
  * plan-time constant baked into the generated call site. */
case class SubstrWindowHashes(child: Expression, win: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType && win >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"substr_window_hashes requires STRING and L >= 1; got ${child.dataType.sql}, L=$win")
  }
  override def nullSafeEval(input: Any): Any =
    TextWindowOps.windowHashes(input.asInstanceOf[UTF8String], win)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextWindowOps.windowHashes($c, $win)")
  override protected def withNewChildInternal(newChild: Expression): SubstrWindowHashes =
    copy(child = newChild)
  override def prettyName: String = "substr_window_hashes"
}

/** Word n-grams of a token array as one codegen'd kernel call per row
  * (NGramOps scaladoc has the semantics contract and the measured win
  * over the HOF chain). n and the distinct flag are plan-time
  * constants baked into the generated call site. */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() = {
    val ok = child.dataType match {
      case ArrayType(StringType, _) => n >= 1
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires ARRAY<STRING> and n >= 1; got ${child.dataType.sql}, n=$n")
  }
  override def nullSafeEval(input: Any): Any =
    NGramOps.ngrams(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramOps.ngrams($c, $n, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
  override def prettyName: String = "word_ngrams"
}

/** Per-pattern OVERLAPPING occurrence counts of a literal pattern list
  * as one codegen'd kernel call per row (AhoCorasick scaladoc has the
  * semantics and complexity contract). The pattern list is a plan-time
  * constant; the built automaton ships as a codegen reference object. */
case class AcCounts(child: Expression, patterns: Seq[String])
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType && patterns.nonEmpty && patterns.forall(_.nonEmpty))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ac_counts requires STRING and >= 1 non-empty literal patterns; " +
        s"got ${child.dataType.sql}, ${patterns.size} patterns")
  }
  @transient private lazy val ac = AhoCorasick.build(patterns)
  override def nullSafeEval(input: Any): Any =
    ac.countsAll(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.countsAll($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): AcCounts =
    copy(child = newChild)
  override def prettyName: String = "ac_counts"
}

/** Column-level entry points for the custom expressions. */
object exprs {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def tokenize_s3_log(c: Column): Column = column(TokenizeS3Log(expression(c)))
  def ipv4_to_long(c: Column): Column = column(Ipv4ToLong(expression(c)))
  def ipv4_to_long_strict(c: Column): Column = column(Ipv4ToLong(expression(c), strict = true))
  def cosine_similarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
  def int_dot(a: Column, b: Column): Column =
    column(IntDot(expression(a), expression(b)))
  def rolling_hash64(c: Column): Column = column(RollingHash64(expression(c)))
  def winnow_fingerprints(c: Column, k: Int, w: Int): Column =
    column(WinnowFingerprints(expression(c), k, w))
  def substr_window_hashes(c: Column, win: Int): Column =
    column(SubstrWindowHashes(expression(c), win))
  def ac_counts(c: Column, patterns: Seq[String]): Column =
    column(AcCounts(expression(c), patterns))
  def int_sqdist(a: Column, b: Column): Column =
    // GRAFT_BENCH_HOF_SQDIST=1 swaps back the HOF chain — the pricing
    // knob (call sites add their own outer coalesce, as before)
    if (sys.env.contains("GRAFT_BENCH_HOF_SQDIST")) {
      import org.apache.spark.sql.functions.{aggregate, zip_with, coalesce}
      aggregate(
        zip_with(a, b, (p, q) => coalesce((p - q) * (p - q), lit(0L))),
        lit(0L), (acc, e) => acc + e)
    } else column(IntSqDist(expression(a), expression(b)))
  def dec_dot(a: Column, b: Column, scale: Int): Column =
    // GRAFT_BENCH_HOF_DECDOT=1 swaps back the aggregate/zip_with HOF
    // chain — the kernel-vs-HOF pricing knob (same contract as
    // GRAFT_BENCH_HOF_NGRAMS; bit parity spec-asserted in Wave29Spec)
    if (sys.env.contains("GRAFT_BENCH_HOF_DECDOT")) {
      import org.apache.spark.sql.functions.{aggregate, zip_with}
      aggregate(
        zip_with(a, b, (p, q) =>
          (p.cast("double") * q.cast("double")).cast(s"decimal(28,$scale)")),
        lit(java.math.BigDecimal.ZERO).cast(s"decimal(28,$scale)"),
        (acc, e) => (acc + e).cast(s"decimal(28,$scale)"))
    } else column(DecDot(expression(a), expression(b), scale))
  def word_ngrams(c: Column, n: Int, distinct: Boolean = false): Column =
    // GRAFT_BENCH_HOF_NGRAMS=1 swaps in the HOF formulation the kernel
    // replaced — a plan-construction-time switch (zero runtime cost when
    // unset) kept ONLY so kernel-vs-HOF cost can be re-measured in one
    // host phase (BENCHLOG "WordNGrams per-site pricing"). Bit-parity of
    // the two forms is spec-asserted in Wave20Spec.
    if (sys.env.contains("GRAFT_BENCH_HOF_NGRAMS")) {
      // compact nulls BEFORE windowing, like the kernel — slicing the
      // original positions would shift windows and array_join would drop
      // nulls inside a gram, breaking the bit-parity contract
      val cc = array_compact(c)
      val raw = when(size(cc) >= n,
        transform(sequence(lit(1), size(cc) - (n - 1)),
          i => array_join(slice(cc, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
      if (distinct) array_distinct(raw) else raw
    } else column(WordNGrams(expression(c), n, distinct))
  def cms_sketch(c: Column, depth: Int = 5, width: Int = 2048): Column =
    column(CountMinSketchAgg(expression(c), depth, width).toAggregateExpression())
  def cms_estimate(sketch: Column, item: Column): Column =
    column(CmsEstimate(expression(sketch), expression(item)))
}
