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

  test("intersection size == size(array_intersect) on randomized arrays") {
    val rnd = new scala.util.Random(1234)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "f", "gg", "hhh")
    def arr(): Option[Seq[Option[String]]] =
      if (rnd.nextInt(20) == 0) None
      else Some(Seq.fill(rnd.nextInt(12))(
        if (rnd.nextInt(15) == 0) None else Some(vocab(rnd.nextInt(vocab.size)))))
    val rows = Seq.fill(300)((arr(), arr()))
    val df = rows.toDF("a", "b")
    val got = df.select(
      ArrayOps.intersectionSize($"a", $"b").as("fast"),
      size(array_intersect($"a", $"b")).as("builtin")).collect()
    got.zipWithIndex.foreach { case (r, i) =>
      if (r.isNullAt(0) || r.isNullAt(1))
        assert(r.isNullAt(0) && r.isNullAt(1), s"row $i null mismatch")
      else assert(r.getInt(0) == r.getInt(1), s"row $i: ${rows(i)}")
    }
  }

  test("intersection size participates in whole-stage codegen") {
    // non-foldable inputs (derived from range) so the expression survives
    // constant folding and lands in the generated stage
    val df = sql.range(3)
      .select(array(concat(lit("x"), $"id"), lit("y")).as("a"),
        array(lit("y"), lit("x1")).as("b"))
      .select(ArrayOps.intersectionSize($"a", $"b").as("n"))
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 1, 2))
    // "*(n)" marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("intersection_size_s") && l.trim.startsWith("*(")),
      s"intersection_size_s not inside a codegen stage:\n$plan")
  }
}
