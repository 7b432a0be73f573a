package graft

import graft.expressions.DotProductDouble
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native expressions, so they are
  * callable from `spark.sql(...)` text as well as the Scala DSL.
  *
  * Two entry points for the two deployment shapes:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (cluster-wide, the standard SparkSessionExtensions path);
  *  - `GraftExtensions.register(spark)` on an existing session
  *    (notebooks, tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.dotProductDescriptor)
}

object GraftExtensions {
  private val dotProductDescriptor:
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("dot_product_d"),
    new ExpressionInfo(classOf[DotProductDouble].getName, null, "dot_product_d",
      "dot_product_d(a, b) - codegen dot product of two array<double>", ""),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"dot_product_d expects 2 arguments, got ${children.length}")
      DotProductDouble(children.head, children(1))
    })

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      dotProductDescriptor._1, dotProductDescriptor._2, dotProductDescriptor._3)
}
