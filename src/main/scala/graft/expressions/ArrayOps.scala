package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding hot loop.
  *
  * `functions.aggregate`/`zip_with` evaluate their lambdas interpreted (a
  * `HigherOrderFunction` binds per-element variables outside whole-stage
  * codegen), which costs an allocation + virtual call per element. A kNN
  * scan at 100 TB does billions of dot products, so this is the one place
  * the built-ins genuinely can't express the semantics efficiently
  * (SURVEY.md §7.3 revisited): a fused multiply-add loop over the two
  * `ArrayData`, generated into the enclosing WholeStageCodegen stage.
  *
  * Accumulation order is a left-to-right fold — identical to both the
  * previous HOF formulation and DuckDB's `list_dot_product`, so oracle
  * comparisons stay bit-stable.
  *
  * Null contract: null array → null result; null *elements* are not
  * expected (embeddings are dense) and read as 0.0.
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double sum = 0.0;
         |for (int i = 0; i < n; i++) {
         |  if (!$a.isNullAt(i) && !$b.isNullAt(i)) {
         |    sum += $a.getDouble(i) * $b.getDouble(i);
         |  }
         |}
         |${ev.value} = sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductDouble =
    copy(left = newLeft, right = newRight)
}

object ArrayOps {
  /** Codegen'd dot product of two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductDouble(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
