package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}

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
      // freshName, not fixed locals: two instances of this expression can
      // land in ONE codegen function (e.g. dot(v,c)/l2norm(v) inline), and
      // fixed names made Janino fail with "Redefinition of local variable",
      // silently demoting the whole stage to interpreted fallback
      val n = ctx.freshName("dpN")
      val sum = ctx.freshName("dpSum")
      val i = ctx.freshName("dpI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductDouble =
    copy(left = newLeft, right = newRight)
}

/** Native `size(array_intersect(a, b))` for string arrays — the hot inner
  * operation of every near-dup verification join. The built-in composition
  * materializes the intersection ARRAY (OpenHashSet + result ArrayData per
  * row pair) only to take its length; this expression counts distinct
  * common elements with one hash probe per element and no intermediate
  * array. Semantics are exactly `size(array_intersect(a, b))` under
  * `spark.sql.legacy.sizeOfNull=false` (this repo's setting): distinct
  * elements of `a` present in `b`, a shared null counted once, null input
  * array → null result. Codegen emits a static call so the enclosing
  * WholeStageCodegen stage stays intact. A Catalyst optimizer rule
  * (GraftExtensions) rewrites the built-in composition into this for SQL
  * users; graft's own queries call it directly. */
case class IntersectionSizeString(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersection_size_s"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectionSizeString.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.IntersectionSizeString.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectionSizeString =
    copy(left = newLeft, right = newRight)
}

object IntersectionSizeString {
  /** |distinct elements of a that appear in b| — array_intersect counting
    * semantics without building the result array. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val bSet = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var bHasNull = false
    var i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true else bSet.add(b.getUTF8String(i))
      i += 1
    }
    val counted = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var n = 0
    var nullCounted = false
    i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) {
        if (bHasNull && !nullCounted) { n += 1; nullCounted = true }
      } else {
        val s = a.getUTF8String(i)
        if (bSet.contains(s) && counted.add(s)) n += 1
      }
      i += 1
    }
    n
  }
}

object ArrayOps {
  /** Codegen'd dot product of two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductDouble(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Codegen'd |a ∩ b| of two array<string> columns (no result array). */
  def intersectionSize(a: Column, b: Column): Column =
    GraftSqlBridge.column(IntersectionSizeString(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
