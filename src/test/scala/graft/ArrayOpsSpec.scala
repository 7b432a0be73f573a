package graft

import graft.expressions.ArrayOps
import org.apache.spark.sql.functions._

class ArrayOpsSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("native dot product: value, nulls, length mismatch, codegen parity") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))), // 32.0
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 99.0))),     // shorter wins: 11.0
      (None, Some(Seq(1.0))),                                // null array -> null
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])))    // empty -> 0.0
      .toDF("a", "b")
    val got = df.select(ArrayOps.dotProduct($"a", $"b").as("d")).collect()
    assert(got(0).getDouble(0) == 32.0)
    assert(got(1).getDouble(0) == 11.0)
    assert(got(2).isNullAt(0))
    assert(got(3).getDouble(0) == 0.0)

    // interpreted path (eval) agrees with the codegen'd path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val expr = graft.expressions.DotProductDouble(
      Literal.create(Seq(1.5, -2.0), ArrayType(DoubleType)),
      Literal.create(Seq(2.0, 4.0), ArrayType(DoubleType)))
    assert(expr.eval(null) == (1.5 * 2.0 + -2.0 * 4.0))
  }

  test("dot product participates in whole-stage codegen") {
    val df = SparkSpec.spark.range(10)
      .select(array(col("id").cast("double"), lit(2.0)).as("v"))
      .select(ArrayOps.dotProduct(col("v"), col("v")).as("d"))
    // "*(n)" marks operators inside a WholeStageCodegen stage; the project
    // holding dot_product_d must carry it (i.e., no fallback to interpreted)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("dot_product_d") && l.trim.startsWith("*(")),
      s"dot_product_d not inside a codegen stage:\n$plan")
    assert(df.agg(sum("d")).head().getDouble(0) == (0 until 10).map(i => i * i + 4.0).sum)
  }

  test("type check rejects non-double arrays") {
    val err = intercept[Exception] {
      Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
        .select(ArrayOps.dotProduct($"a", $"b")).collect()
    }
    assert(err.getMessage.contains("dot_product_d") ||
      err.getMessage.toLowerCase.contains("type"))
  }
}
