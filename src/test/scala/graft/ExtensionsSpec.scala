package graft

import org.apache.spark.sql.functions._

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

  test("registerSql exposes sketches and text UDFs to spark.sql text") {
    graft.GraftExtensions.registerSql(spark)
    val sql2 = spark
    import sql2.implicits._
    Seq("dup hash join", "dup scan").toDF("text")
      .createOrReplaceTempView("sqlface_t")
    val est = spark.sql(
      """SELECT graft_cms_estimate(s, 'dup') AS dup_est
         FROM (SELECT graft_cms(tok) AS s
               FROM (SELECT explode(split(text, ' ')) AS tok FROM sqlface_t))""")
      .collect()(0).getAs[Long]("dup_est")
    assert(est == 2L)
    val fm = spark.sql("SELECT graft_fm(text) AS f FROM sqlface_t")
      .collect()(0).getAs[Long]("f")
    assert(fm >= 1L)
    val lang = spark.sql("SELECT graft_lang_guess('the the of') AS l")
      .collect()(0).getAs[String]("l")
    assert(lang == "en")
    val rh = spark.sql("SELECT graft_rolling_hash('ab') AS h")
      .collect()(0).getAs[Long]("h")
    assert(rh == (97L * 31 + 98) % 1000000007L)
  }

  test("optimizer rule rewrites size(array_intersect) over strings") {
    // restore afterwards: a leaked rule would rewrite the built-in branch of
    // ArrayOpsSpec's parity test into the expression under test
    val prevRules = spark.experimental.extraOptimizations
    graft.GraftExtensions.register(spark)
    try {
    val sql3 = spark
    import sql3.implicits._
    // non-foldable inputs so constant folding can't pre-evaluate the plan
    val df = spark.range(3)
      .select(array(concat(lit("a"), $"id"), lit("b")).as("x"),
        array(lit("b"), lit("a1")).as("y"))
      .select(size(array_intersect($"x", $"y")).as("n"))
    assert(df.queryExecution.optimizedPlan.toString.contains("intersection_size_s"))
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 1, 2))
    // double arrays are untouched (rule is string-typed)
    val dd = spark.range(2)
      .select(array($"id".cast("double")).as("x"), array(lit(1.0)).as("y"))
      .select(size(array_intersect($"x", $"y")).as("n"))
    assert(!dd.queryExecution.optimizedPlan.toString.contains("intersection_size_s"))
    assert(dd.collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1))
    } finally spark.experimental.extraOptimizations = prevRules
  }
}
