package graft

class ExtensionsSpec extends SparkSpec {

  test("dot_product_d is callable from SQL text after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT dot_product_d(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(got == 11.0)
    // registration is idempotent
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT dot_product_d(array(2.0d), array(5.0d))")
      .head().getDouble(0) == 10.0)
  }

  test("extensions class wires the same descriptor (constructs cleanly)") {
    // the spark.sql.extensions path needs a fresh session to observe; here
    // we pin that the class instantiates and accepts an extensions object
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
  }

  test("wrong arity raises a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT dot_product_d(array(1.0d))").collect()
    }
    assert(e.getMessage.contains("dot_product_d"))
  }
}
