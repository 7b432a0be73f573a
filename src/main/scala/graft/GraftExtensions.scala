package graft

import graft.expressions.{DotProductDouble, IntersectionSizeString}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Expression, ExpressionInfo, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotProductDescriptor)
    ext.injectOptimizerRule(_ => GraftExtensions.IntersectionSizeRewrite)
  }
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

  /** Optimizer rule: `size(array_intersect(a, b))` over string arrays →
    * [[IntersectionSizeString]] — counts distinct common elements without
    * materializing the intersection array (the hot inner op of similarity
    * verification joins). Only fires under non-legacy size semantics
    * (size(NULL) = NULL), which is what the rewrite preserves. */
  object IntersectionSizeRewrite extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case Size(ai: ArrayIntersect, false)
            if ai.left.dataType.isInstanceOf[ArrayType] &&
               ai.left.dataType.asInstanceOf[ArrayType].elementType == StringType =>
          IntersectionSizeString(ai.left, ai.right)
      }
  }

  /** Register on an already-built session (functions + optimizer rule). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      dotProductDescriptor._1, dotProductDescriptor._2, dotProductDescriptor._3)
    if (!spark.experimental.extraOptimizations.contains(IntersectionSizeRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ IntersectionSizeRewrite
  }

  /** Register the engine's aggregate sketches and scalar text/similarity
    * UDFs for `spark.sql(...)` text — the SQL face of the library surface
    * (runtime-registered UDAFs go through `spark.udf`, not the Catalyst
    * function registry, hence a separate hook from [[register]]). */
  def registerSql(spark: SparkSession): Unit = {
    import graft.functions.{Sketches, Similarity, Text}
    spark.udf.register("graft_cms", Sketches.cms)
    spark.udf.register("graft_fm", Sketches.fm)
    spark.udf.register("graft_bloom", Sketches.bloom)
    spark.udf.register("graft_minhash", Similarity.minhash)
    spark.udf.register("graft_simhash", Similarity.simhash)
    spark.udf.register("graft_cms_estimate",
      (sketch: Array[Long], item: String) => Sketches.cmsEstimate(sketch, item))
    spark.udf.register("graft_bloom_contains",
      (bits: Array[Long], item: String) => Sketches.bloomContains(bits, item))
    spark.udf.register("graft_rolling_hash", (s: String) => Text.rollingHashOf(s))
    spark.udf.register("graft_winnow", (s: String) => Text.winnowOf(s))
    spark.udf.register("graft_lang_guess", (s: String) => Text.langGuessOf(s))
    spark.udf.register("graft_shingles",
      (s: String) => Similarity.shinglesOf(s, 3))
    spark.udf.register("graft_minhash_sig",
      // null-safe like the other *Of helpers: NULL array → NULL signature
      (sh: Seq[String]) =>
        if (sh == null) null.asInstanceOf[Array[Long]]
        else Similarity.minhashSigOf(sh))
  }
}
