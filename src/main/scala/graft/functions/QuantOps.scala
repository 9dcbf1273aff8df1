package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Quantized-k-means score/argmin kernels as native loop expressions.
  *
  * Why custom: the composable form (`array(k literal dot products)` +
  * an O(k²) `when`-chain argmin) unrolls k·dims multiply-adds into the
  * generated method that CONSUMES them — for the PQ fit that is m·k·subDims
  * terms inlined into `hashAgg_doAggregateWithKeys`, which blows janino's
  * 64 KB per-method bytecode cap and silently drops the hottest loop of the
  * two slowest operators to interpreted eval (round-10 verdict, finding #1).
  * These expressions emit a constant-size nested loop over a plan-constant
  * center table held as a reference object, so generated-code size is
  * independent of k and dims and the whole pipeline stays inside
  * whole-stage codegen.
  *
  * Semantics match the unrolled form on well-formed input — exact integer
  * arithmetic, `|c_p|² − 2·q·c_p` scores, first-index-wins argmin — so the
  * DuckDB oracles that replay the fit relationally keep hash-matching. On
  * MALFORMED vectors the two differ deliberately: a too-short or
  * null-element vector yields SQL NULL here (the old `getItem` chain
  * null-propagated scores and its `when`-chain argmin could fabricate
  * `k-1`); every quantizer path feeds fixed-length non-null vectors, so
  * only the failure mode changed, not fixture results.
  *
  * Lives under org.apache.spark.sql.* because the Column↔Expression bridge
  * (`classic.ExpressionUtils`) is private[sql] in Spark 4.
  */
case class QuantScores(child: Expression, centers: Array[Array[Long]])
    extends UnaryExpression {

  private val k = centers.length
  private val dims = if (k == 0) 0 else centers(0).length

  // flattened row-major center table + per-center |c|² — computed once per
  // plan, shipped to executors as codegen reference objects
  @transient private lazy val flat: Array[Long] = centers.flatten
  @transient private lazy val norms: Array[Long] =
    centers.map(c => c.map(x => x * x).sum)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quant_scores needs array<bigint>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // a malformed (short / null-element) vector yields NULL even when the
  // child column is declared non-null
  override def nullable: Boolean = true

  /** Well-formedness: the kernel reads exactly `dims` long elements; a
    * shorter vector or a null element would be a silent out-of-bounds /
    * garbage read. Such vectors null out (the downstream argmin then also
    * returns NULL) instead of erroring — matching the old composable
    * form's null propagation. */
  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    if (q.numElements() < dims) return null
    var d0 = 0
    while (d0 < dims) { if (q.isNullAt(d0)) return null; d0 += 1 }
    val out = new Array[Long](k)
    var p = 0
    while (p < k) {
      var dot = 0L
      var d = 0
      val base = p * dims
      while (d < dims) { dot += q.getLong(d) * flat(base + d); d += 1 }
      out(p) = norms(p) - 2L * dot
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  // The whole kernel (guards + loop) lives in its OWN generated method via
  // addNewFunction: projection collapse duplicates expression instances into
  // the consuming method (sort/agg bodies), and even a ~40-line inline body
  // times that duplication re-breaches janino's 64 KB per-method cap (the
  // regression the round-12 null guards introduced). A helper returning
  // null-for-malformed keeps the inline footprint at three lines per
  // instance, so consuming-method size is independent of k, dims, AND the
  // collapse factor.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("qsCenters", flat, "long[]")
    val normsRef = ctx.addReferenceObj("qsNorms", norms, "long[]")
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    val funcName = ctx.freshName("quantScores")
    val func = ctx.addNewFunction(funcName,
      s"""
         |private $ad $funcName($ad q) {
         |  if (q.numElements() < $dims) return null;
         |  for (int d0 = 0; d0 < $dims; d0++) {
         |    if (q.isNullAt(d0)) return null;
         |  }
         |  long[] out = new long[$k];
         |  for (int p = 0; p < $k; p++) {
         |    long dot = 0L;
         |    for (int d = 0; d < $dims; d++) {
         |      dot += q.getLong(d) * $flatRef[p * $dims + d];
         |    }
         |    out[p] = $normsRef[p] - 2L * dot;
         |  }
         |  return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(out);
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, q => {
      val tmp = ctx.freshName("qsRes")
      s"""
         |$ad $tmp = $func($q);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): QuantScores =
    copy(child = newChild)
}

/** First index of the minimum of an `array<bigint>` (smallest-index ties),
  * as INT — the argmin over a [[QuantScores]] array. One linear scan with
  * a strict `<`, so the first occurrence of the minimum wins: identical to
  * the `when(sc[p] <= sc[o] ∀ o>p)` chain it replaces, in O(k) generated
  * code instead of O(k²) — including its null discipline: an empty array
  * or any null element yields SQL NULL (never a fabricated index or a
  * task-killing bounds error). */
case class ArgMinLong(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argmin_long needs array<bigint>, got $other")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0 || a.isNullAt(0)) return null
    var best = 0
    var bestV = a.getLong(0)
    var i = 1
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = a.getLong(i)
      if (v < bestV) { best = i; bestV = v }
      i += 1
    }
    best
  }

  // Same addNewFunction split as QuantScores (see the comment there): the
  // scan lives in its own generated method, -1 encodes NULL, and each
  // collapsed instance inlines only a call + branch.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    val funcName = ctx.freshName("argMinLong")
    val func = ctx.addNewFunction(funcName,
      s"""
         |private int $funcName($ad a) {
         |  int n = a.numElements();
         |  if (n == 0 || a.isNullAt(0)) return -1;
         |  int best = 0;
         |  long bestV = a.getLong(0);
         |  for (int i = 1; i < n; i++) {
         |    if (a.isNullAt(i)) return -1;
         |    long v = a.getLong(i);
         |    if (v < bestV) { best = i; bestV = v; }
         |  }
         |  return best;
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("amRes")
      s"""
         |int $r = $func($a);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArgMinLong =
    copy(child = newChild)
}

/** `array<float|double>` → `array<bigint>` fixed-point quantization:
  * element d becomes `round(v[d] * scale)` with Spark `round`'s exact
  * BigDecimal HALF_UP semantics (so DuckDB oracles replaying
  * `CAST(round(v[d] * scale) AS BIGINT)` keep hash-matching — away-from-
  * zero on .5, shortest-decimal double rendering).
  *
  * Why custom: the composable `array(dims × round(getItem·scale).cast)`
  * constructor generates ~60 lines PER ELEMENT (ANSI index checks,
  * overflow-checked casts) — ~4,000 lines per instance at dims=64 — and
  * stages that evaluate it more than once (filter + project + sort-key
  * pipelines) breach janino's 64 KB method cap, dropping the quantizer's
  * feeder to interpreted eval (round-12 regression: `sort_addToSorter_0`
  * at 629 KB of source). This kernel is one generated helper method, size
  * independent of dims.
  *
  * Malformed input follows the [[QuantScores]] discipline: a vector
  * shorter than `dims` or carrying a null element yields SQL NULL (the
  * old constructor raised ANSI invalidArrayIndex on short vectors — a
  * task-killing error where the quantizer contract wants null-out). */
case class QuantizeVec(child: Expression, dims: Int, scale: Long)
    extends UnaryExpression {

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_vec needs array<float|double>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < dims) return null
    val out = new Array[Long](dims)
    var d = 0
    while (d < dims) {
      if (v.isNullAt(d)) return null
      val x = (if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)) * scale
      out(d) = java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      d += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    val get = if (isFloat) "(double) v.getFloat(d)" else "v.getDouble(d)"
    val funcName = ctx.freshName("quantizeVec")
    val func = ctx.addNewFunction(funcName,
      s"""
         |private $ad $funcName($ad v) {
         |  if (v.numElements() < $dims) return null;
         |  long[] out = new long[$dims];
         |  for (int d = 0; d < $dims; d++) {
         |    if (v.isNullAt(d)) return null;
         |    double x = $get * ${scale}L;
         |    out[d] = java.math.BigDecimal.valueOf(x)
         |      .setScale(0, java.math.RoundingMode.HALF_UP).longValue();
         |  }
         |  return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(out);
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, v => {
      val tmp = ctx.freshName("qvRes")
      s"""
         |$ad $tmp = $func($v);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

/** Exact integer squared L2 distance between two `array<bigint>` vectors
  * (over the common prefix, like [[DotProduct]]): `Σ (a_d − b_d)²` as
  * BIGINT — never a float sum, so cross-engine replays are hash-exact.
  * Null elements null the result ([[QuantScores]] discipline). Used by the
  * PQ refine stage: quantized-domain exact re-ranking of an ADC shortlist.
  * Same addNewFunction split as the other kernels; a squared distance is
  * never negative, so −1 encodes NULL at the call site.
  *
  * Overflow discipline: the accumulator only ever grows, so a wrap shows
  * up as a negative value — both the interpreted and the codegen path
  * check after every add and null out (identical answers whichever path
  * runs; consumers must treat NULL as "not rankable", never "closest").
  * The unguardable case is a single `(a_d − b_d)²` wrapping POSITIVE,
  * which needs |diff| > 3·10⁹ — quantized magnitudes > 3,000 at the
  * default 10⁶ scale, far outside any normalized-embedding domain. */
case class L2SqLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"l2sq_long needs two array<bigint>, got $other")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      if (acc < 0L) return null // overflow wrap, same as the codegen path
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    val funcName = ctx.freshName("l2SqLong")
    val func = ctx.addNewFunction(funcName,
      s"""
         |private long $funcName($ad a, $ad b) {
         |  int n = java.lang.Math.min(a.numElements(), b.numElements());
         |  long acc = 0L;
         |  for (int i = 0; i < n; i++) {
         |    if (a.isNullAt(i) || b.isNullAt(i)) return -1L;
         |    long d = a.getLong(i) - b.getLong(i);
         |    acc += d * d;
         |    if (acc < 0L) return -1L; // overflow wrap nulls out
         |  }
         |  return acc;
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("l2Res")
      s"""
         |long $r = $func($a, $b);
         |if ($r < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqLong =
    copy(left = newLeft, right = newRight)
}

object QuantOps {
  /** Fixed-point quantization `round(v[d] * scale)` over the first `dims`
    * elements, as one constant-size generated loop. */
  def quantize(v: Column, dims: Int, scale: Long): Column =
    ExpressionUtils.column(QuantizeVec(ExpressionUtils.expression(v), dims, scale))

  /** Exact integer squared L2 distance between two `array<bigint>`. */
  def l2sq(a: Column, b: Column): Column =
    ExpressionUtils.column(
      L2SqLong(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** k-element `|c_p|² − 2·q·c_p` score array over a quantized vector. */
  def scores(q: Column, centers: Array[Array[Long]]): Column =
    ExpressionUtils.column(QuantScores(ExpressionUtils.expression(q), centers))

  /** Index of the first minimum of an `array<bigint>` (INT). */
  def argmin(sc: Column): Column =
    ExpressionUtils.column(ArgMinLong(ExpressionUtils.expression(sc)))
}
