package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NumericType}

/** Custom Catalyst expression for vector math on embedding columns.
  *
  * Why custom: the composable route (`aggregate(zip_with(a,b,*),0d,+)`)
  * builds three `ArrayAggregate` higher-order functions per cosine, all
  * CodegenFallback — interpreted lambda dispatch per element. For an O(n²)
  * near-dup scan that is the entire runtime. This expression computes the
  * same strict left-fold (identical IEEE result, so the DuckDB oracles keep
  * matching) as one fused whole-stage-codegen loop over the unsafe array
  * data — SURVEY §7.2's "custom Expression beats UDF" rung: null-safe,
  * codegen'd, no boxing, no Row conversion.
  *
  * Lives under org.apache.spark.sql.* because the Column↔Expression bridge
  * (`classic.ExpressionUtils`) is private[sql] in Spark 4.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def elemOk(dt: DataType): Boolean = dt match {
      case ArrayType(_: NumericType, _) => true
      case _ => false
    }
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs numeric arrays, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lt = elemType(left)
    val rt = elemType(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = lt match {
        case FloatType => x.getFloat(i).toDouble
        case DoubleType => x.getDouble(i)
        case other => x.get(i, other).toString.toDouble
      }
      val yv = rt match {
        case FloatType => y.getFloat(i).toDouble
        case DoubleType => y.getDouble(i)
        case other => y.get(i, other).toString.toDouble
      }
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(dt: DataType, arr: String, i: String): String = dt match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case DoubleType => s"$arr.getDouble($i)"
        case _ => s"((Number) $arr.get($i, null)).doubleValue()"
      }
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getter(elemType(left), a, i)} * ${getter(elemType(right), b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Column API: strict-left-fold dot product in double precision. */
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
