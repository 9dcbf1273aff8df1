package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("qsCenters", flat, "long[]")
    val normsRef = ctx.addReferenceObj("qsNorms", norms, "long[]")
    nullSafeCodeGen(ctx, ev, q => {
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val d0 = ctx.freshName("d0")
      val dot = ctx.freshName("dot")
      val ok = ctx.freshName("ok")
      s"""
         |boolean $ok = $q.numElements() >= $dims;
         |for (int $d0 = 0; $ok && $d0 < $dims; $d0++) {
         |  if ($q.isNullAt($d0)) { $ok = false; }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$k];
         |  for (int $p = 0; $p < $k; $p++) {
         |    long $dot = 0L;
         |    for (int $d = 0; $d < $dims; $d++) {
         |      $dot += $q.getLong($d) * $flatRef[$p * $dims + $d];
         |    }
         |    $out[$p] = $normsRef[$p] - 2L * $dot;
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val best = ctx.freshName("best")
      val bestV = ctx.freshName("bestV")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0 || $a.isNullAt(0)) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = 0;
         |  long $bestV = $a.getLong(0);
         |  for (int $i = 1; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $v = $a.getLong($i);
         |    if ($v < $bestV) { $best = $i; $bestV = $v; }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $best; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArgMinLong =
    copy(child = newChild)
}

object QuantOps {
  /** k-element `|c_p|² − 2·q·c_p` score array over a quantized vector. */
  def scores(q: Column, centers: Array[Array[Long]]): Column =
    ExpressionUtils.column(QuantScores(ExpressionUtils.expression(q), centers))

  /** Index of the first minimum of an `array<bigint>` (INT). */
  def argmin(sc: Column): Column =
    ExpressionUtils.column(ArgMinLong(ExpressionUtils.expression(sc)))
}
