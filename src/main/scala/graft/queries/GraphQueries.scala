package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relationships the relational tables imply — the
  * link-graph ring of a web-curation pipeline (PageRank-style authority
  * is a classic document-quality prior: Page et al. 1999; production
  * curation stacks weight crawl domains by exactly this kind of score).
  *
  * Scale posture: the expensive part is building the edge list (a full
  * fact-table aggregation — partial+final, one shuffle on the edge key);
  * the iterations then run on edge-count-sized frames with a
  * node-count-sized rank frame that AQE broadcast-joins. Nothing is ever
  * collected to the driver; `localCheckpoint` truncates per-iteration
  * lineage exactly as the connected-components operator does.
  */
object GraphQueries {

  /** Power-iteration count for [[pagerank]] — enough to differentiate
    * ranks on a 25-node graph while keeping the unrolled oracle finite. */
  val PrIters = 5

  /** Standard damping (Page et al. 1999). */
  val Damping = 0.85

  /** Teleport share per node: (1 − [[Damping]]) / 25 nations, exact. */
  val Teleport = 0.006

  /** Directed, weighted trade graph: customer-nation → supplier-nation,
    * weight = number of lineitems shipped along that pair. One pass over
    * the fact table; joins to the key-sized dimension tables broadcast. */
  def tradeEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_nationkey")), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.supplier(spark, dir)
        .select($"s_suppkey", $"s_nationkey")), $"l_suppkey" === $"s_suppkey")
      .groupBy($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
      .agg(count(lit(1)).as("w"))
      .select($"src", $"dst", $"w")
  }

  /** Weighted PageRank over [[tradeEdges]], [[PrIters]] synchronous
    * iterations from the uniform vector: pr_v ← 0.006 + 0.85 · Σ_u
    * pr_u · w_uv / outw_u (teleport-only mass for dangling nodes — with a
    * complete TPC-H order book every nation has out-edges, so none arise).
    *
    * Determinism doctrine (the sf10/sf100 lesson): each edge contribution
    * is rounded to the 6-dp grid and summed in DECIMAL — exact integer
    * arithmetic under any fold order — and the rank update combines two
    * scalars per node in double, identically per engine. The DuckDB oracle
    * replays all [[PrIters]] iterations as unrolled CTEs.
    *
    * Scale shape: the edge build is the one fact-table shuffle; each
    * iteration shuffles only the edge frame (≤ 625 rows here; ≤ |E| in
    * general) and the 25-row rank frame broadcasts. At 100 TB the same
    * plan holds with |nodes| = crawl domains: the rank frame stays
    * millions of rows — a hash-shuffle join AQE picks automatically when
    * broadcast no longer fits. */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = tradeEdges(spark, dir)
    val outw = edges.groupBy($"src").agg(sum($"w").as("outw"))
    // per-edge propagation fraction; checkpointed so the fact-table scan
    // behind it runs once, not once per iteration
    val ew = edges.join(outw, "src")
      .select($"src", $"dst",
        ($"w".cast("double") / $"outw".cast("double")).as("frac"))
      .localCheckpoint()
    val nodes = Tables.nation(spark, dir)
      .select($"n_nationkey".as("node"), $"n_name")
    var ranks = nodes.select($"node",
      expr("CAST(0.04 AS DECIMAL(18,6))").as("pr"))
    for (_ <- 1 to PrIters) {
      val contrib = ew.join(ranks, ew("src") === ranks("node"))
        .select($"dst",
          round($"pr".cast("double") * $"frac", 6)
            .cast("decimal(28,6)").as("c"))
        .groupBy($"dst").agg(sum($"c").as("insum"))
      ranks = nodes.select($"node")
        .join(contrib, $"node" === $"dst", "left")
        .select($"node",
          round(lit(Teleport) +
            lit(Damping) * coalesce($"insum".cast("double"), lit(0.0)), 6)
            .cast("decimal(18,6)").as("pr"))
        .localCheckpoint()
    }
    ranks.join(nodes, "node")
      .select($"node", $"n_name", $"pr".cast("double").as("pr"))
      .orderBy($"node")
  }
}
