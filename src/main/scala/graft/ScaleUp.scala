package graft

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialize a scaled tier from an existing testdata directory (VERDICT
  * r2 #1: "convert the plan-shape scale argument into a measured one").
  * Each table is replicated `factor`× with per-copy key offsets so every
  * referential join stays consistent, while similarity-bearing payloads are
  * transformed per copy so the source corpus's duplicate STRUCTURE is
  * preserved — multiplied linearly, never quadratically:
  *
  *  - TPC-H keys (custkey / orderkey / partkey / suppkey) shift by
  *    copy · (max+1) on BOTH sides of every join edge; region/nation stay
  *    fixed dimensions, as in TPC-H itself;
  *  - events shift event_id and user_id; timestamps are left unchanged, so
  *    each hour bucket carries factor× the events — the realistic shape of
  *    a busier deployment over the same wall-clock window;
  *  - documents suffix every token with the copy index ("_c<i>") for
  *    copies > 0 — an injective per-copy token rename: within-copy
  *    shingle/Jaccard/edit structure is EXACTLY the source corpus's, while
  *    cross-copy shingle overlap is zero. Near-dup pair density therefore
  *    scales linearly, like ingesting `factor` disjoint crawls (replicating
  *    texts verbatim would instead manufacture a quadratic all-pairs
  *    duplicate blowup no real corpus has);
  *  - embeddings multiply by a deterministic per-(copy, dim) ±1 sign
  *    pattern for copies > 0: norms and within-copy cosines are
  *    bit-identical (sign² = 1 leaves every elementwise product unchanged),
  *    cross-copy cosines scramble toward 0 on isotropic data.
  *
  * The scaled tier is self-consistent by construction: the DuckDB oracle
  * and the Spark queries read the same parquet, so CORRECTNESS at the new
  * tier is a true hash-match sweep, not an extrapolation.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <dstDir> <factor> [tables]
  * `tables` (comma-separated, optional) restricts generation to a subset —
  * the decade-3 probe writes only the heavy families (documents,
  * embeddings) because a full sf100 relational tier (~600M lineitem)
  * exceeds sandbox wall-clock without adding scale signal beyond sf10's.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val (srcDir, dstDir, fStr) = (args(0), args(1), args(2))
    val factor = fStr.toInt
    val tables: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet else Set.empty
    def wanted(t: String): Boolean = tables.isEmpty || tables(t)
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local(defaultCpus = "8")
    import spark.implicits._

    val copies = spark.range(factor).toDF("copy")
    def src(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.repartition(cpus.toInt).write.mode("overwrite")
        .parquet(s"$dstDir/$t.parquet")
    def keyMax(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0)
    // replicate factor× and shift each named int64 key by copy·(max+1):
    // copies never collide, and any two tables shifting the same key by the
    // same offset keep their join edges within-copy
    def shifted(df: DataFrame, keyOffsets: (String, Long)*): DataFrame =
      keyOffsets.foldLeft(df.crossJoin(copies)) { case (d, (c, off)) =>
        d.withColumn(c, col(c) + col("copy") * off)
      }

    // fixed dims — verbatim
    if (wanted("region")) write(src("region"), "region")
    if (wanted("nation")) write(src("nation"), "nation")

    if (Seq("customer", "supplier", "part", "orders", "lineitem")
        .exists(wanted)) {
      val cOff = keyMax(src("customer"), "c_custkey") + 1
      val oOff = keyMax(src("orders"), "o_orderkey") + 1
      val pOff = keyMax(src("part"), "p_partkey") + 1
      val sOff = keyMax(src("supplier"), "s_suppkey") + 1
      if (wanted("customer"))
        write(shifted(src("customer"), "c_custkey" -> cOff).drop("copy"), "customer")
      if (wanted("supplier"))
        write(shifted(src("supplier"), "s_suppkey" -> sOff).drop("copy"), "supplier")
      if (wanted("part"))
        write(shifted(src("part"), "p_partkey" -> pOff).drop("copy"), "part")
      if (wanted("orders"))
        write(shifted(src("orders"),
          "o_orderkey" -> oOff, "o_custkey" -> cOff).drop("copy"), "orders")
      if (wanted("lineitem"))
        write(shifted(src("lineitem"),
          "l_orderkey" -> oOff, "l_partkey" -> pOff, "l_suppkey" -> sOff)
          .drop("copy"), "lineitem")
    }

    if (wanted("events")) {
      // events via Tables.events: the source ts is TIMESTAMP(NANOS), which
      // becomes a plain µs timestamp here — the scaled tier reads natively
      val ev = Tables.events(spark, srcDir)
      val eOff = keyMax(ev, "event_id") + 1
      val uOff = keyMax(ev, "user_id") + 1
      write(shifted(ev, "event_id" -> eOff, "user_id" -> uOff)
        .drop("copy"), "events")
    }

    if (wanted("documents")) {
      val docsSrc = src("documents")
      val dOff = keyMax(docsSrc, "doc_id") + 1
      write(shifted(docsSrc, "doc_id" -> dOff)
        .withColumn("text", when($"copy" === 0, $"text").otherwise(
          regexp_replace($"text", lit("(\\S+)"), concat(lit("$1_c"), $"copy"))))
        .withColumn("n_chars",
          when($"text".isNull, $"n_chars").otherwise(length($"text").cast("long")))
        .drop("copy"), "documents")
    }

    if (wanted("embeddings")) {
      val embSrc = src("embeddings")
      val vOff = keyMax(embSrc, "vec_id") + 1
      write(shifted(embSrc, "vec_id" -> vOff)
        .withColumn("embedding", when($"copy" === 0, $"embedding").otherwise(
          transform($"embedding",
            (x, j) => when(pmod(hash($"copy", j), lit(2)) === 0, x).otherwise(-x))))
        .drop("copy"), "embeddings")
    }

    println(s"[scaleup] wrote $dstDir at factor $factor from $srcDir")
    spark.stop()
  }
}
