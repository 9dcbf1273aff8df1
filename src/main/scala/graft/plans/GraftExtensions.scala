package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.DotProduct

/** Session extension wiring for graft's custom expressions, so SQL users
  * get them without touching the Column API:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * SELECT dot_product(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * (Scan governance deliberately lives in the KAFSQL front-end + Governor —
  * SURVEY §4: pre-flight gates over source statistics, not plan rewrites.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotProductDescriptor)
  }
}

object GraftFunctions {

  val dotProductDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "dot_product takes exactly 2 arguments")
      DotProduct(children.head, children(1))
    })

  /** Imperative registration for sessions built without the extension conf. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = dotProductDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
