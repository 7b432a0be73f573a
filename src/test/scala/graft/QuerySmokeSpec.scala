package graft

/** Smoke: every registered query runs at sf0.001 and returns rows with the
  * advertised (sorted) column set; entry() returns rows. The value-level
  * correctness gate is the driver's DuckDB oracle (tools/check.py locally). */
class QuerySmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without a query: $extra")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("asof join semantics: no-prior-view null, >= tie, latest-prior pick") {
    val rows = graft.queries.RelationalQueries.asofJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    // cross-check each purchase against a driver-side reference computation
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "value", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3), r.getString(4)))
    val views = ev.filter(_._5 == "view")
      .groupBy(v => (v._2, v._3)).map { case ((u, t), vs) => (u, t, vs.map(_._4).max) }.toSeq
    val expect = ev.filter(_._5 == "purchase").map { case (id, u, t, _, _) =>
      val prior = views.filter(v => v._1 == u && !v._2.after(t))
      id -> (if (prior.isEmpty) None
             else Some(prior.maxBy(_._2.getTime)._3))
    }.toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val got = if (r.isNullAt(4)) None
        else Some(r.getDouble(4))
      val exp = expect(id).map(v => math.rint(v * 1e6) / 1e6)
      assert(got == exp, s"event $id: got $got expected $exp")
    }
    assert(rows.exists(_.isNullAt(4)), "expected at least one no-prior-view null")
  }

  test("weighted sample is partitioning-independent (same rows at any layout)") {
    val base = graft.queries.PipelineQueries.weightedSample(spark, sf).collect()
      .map(_.getLong(0)).toSeq
    // force a different physical layout: the selection must not move
    val shuffled = graft.sources.Tables.documents(spark, sf).repartition(17)
    shuffled.createOrReplaceTempView("ws_repart_check")
    import org.apache.spark.sql.functions._
    val key = round(pow(
      (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("double") + 1.0) / 4294967297.0,
      lit(1.0) / length(col("text")).cast("double")), 6)
    val alt = shuffled.select(col("doc_id"), key.as("sample_key"))
      .orderBy(col("sample_key").desc, col("doc_id")).limit(50)
      .collect().map(_.getLong(0)).toSeq
    assert(alt == base)
  }
}
