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
    // per-edge propagation fraction. outw as a window sum over the edge
    // frame (r15, guide §2.4): the former groupBy(src)+self-join re-keyed
    // the edge frame twice (agg exchange + join exchange); the window
    // rides ONE exchange on src. w is an exact long count, so the window
    // fold order cannot perturb outw. Checkpointed so the fact-table scan
    // behind it runs once, not once per iteration.
    val ew = edges
      .withColumn("outw", sum($"w").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"src")))
      .select($"src", $"dst",
        ($"w".cast("double") / $"outw".cast("double")).as("frac"))
      .localCheckpoint()
    val nodes = Tables.nation(spark, dir)
      .select($"n_nationkey".as("node"), $"n_name")
    var ranks = nodes.select($"node",
      expr("CAST(0.04 AS DECIMAL(18,6))").as("pr"))
    for (_ <- 1 to PrIters) {
      // rank frame is nation-bounded (25 rows at EVERY scale factor —
      // TPC-H's nation table is fixed-size), so broadcast is pinned by
      // hint (guide §3.1) instead of waiting for AQE to materialize both
      // shuffle sides before converting. No per-iteration localCheckpoint
      // (r15): each rank frame is referenced exactly once by the next
      // round, so lineage is LINEAR in PrIters — the per-round
      // materialize-to-blocks job was pure overhead at every scale.
      val contrib = ew.join(ranks.hint("broadcast"), ew("src") === ranks("node"))
        .select($"dst",
          round($"pr".cast("double") * $"frac", 6)
            .cast("decimal(28,6)").as("c"))
        .groupBy($"dst").agg(sum($"c").as("insum"))
      ranks = nodes.select($"node")
        .join(contrib.hint("broadcast"), $"node" === $"dst", "left")
        .select($"node",
          round(lit(Teleport) +
            lit(Damping) * coalesce($"insum".cast("double"), lit(0.0)), 6)
            .cast("decimal(18,6)").as("pr"))
    }
    ranks.join(nodes, "node")
      .select($"node", $"n_name", $"pr".cast("double").as("pr"))
      .orderBy($"node")
  }

  /** Mutual-reinforcement rounds of [[hits]]. */
  val HitsIters = 3

  /** Weighted HITS hubs & authorities (Kleinberg 1999) over [[tradeEdges]]
    * — the complementary graph signal to [[pagerank]]: authority flows
    * along in-edges (a_v ← Σ w_uv·h_u), hub score along out-edges
    * (h_u ← Σ w_uv·a_v), each L2-normalized per half-round from the exact
    * uniform start (1/√25 = 0.2).
    *
    * Determinism doctrine (same as [[pagerank]] / embedPca): every Σ
    * quantizes its terms to the 6-dp grid and sums in DECIMAL — exact
    * under any fold order — and each normalize is a per-row double divide
    * against the DECIMAL-summed squared norm. The DuckDB oracle unrolls
    * all [[HitsIters]] rounds as CTEs.
    *
    * Scale shape: identical to [[pagerank]] — per round, two edge-frame
    * shuffles keyed on dst/src with the node-sized score frame
    * broadcast-joined (hash join once nodes outgrow broadcast). */
  def hits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ew = tradeEdges(spark, dir).localCheckpoint()
    val nodes = Tables.nation(spark, dir)
      .select($"n_nationkey".as("node"), $"n_name")
    // raw: (node, s DECIMAL) -> unit-L2 (node, v DECIMAL(18,6)).
    // r15: the squared-norm scalar is a window sum over the score frame
    // instead of a separate agg + crossJoin(broadcast) — the crossJoin
    // referenced `raw` TWICE, which compounded 2^(2·HitsIters)-fold once
    // the per-round checkpoints were dropped. The single-partition window
    // is safe at every tier: the score frame is nation-bounded (25 rows).
    // The DECIMAL window sum is fold-order exact, bit-identical to the agg.
    def normalized(raw: DataFrame): DataFrame = raw
      .withColumn("n2",
        sum(round($"s".cast("double") * $"s".cast("double"), 6)
          .cast("decimal(38,6)"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .select($"node",
        round($"s".cast("double") / sqrt($"n2".cast("double")), 6)
          .cast("decimal(18,6)").as("v"))
    var hub = nodes.select($"node", expr("CAST(0.2 AS DECIMAL(18,6))").as("v"))
    var auth: DataFrame = null
    for (_ <- 1 to HitsIters) {
      // r15: no per-round localCheckpoint — with the window-normalize the
      // lineage is linear (each score frame read once by the next
      // half-round), and the node-bounded score frames broadcast by hint
      // (guide §3.1) instead of via AQE's materialize-then-convert.
      val araw = ew.join(hub.hint("broadcast"), ew("src") === hub("node"))
        .select($"dst", round($"w".cast("double") * $"v".cast("double"), 6)
          .cast("decimal(28,6)").as("c"))
        .groupBy($"dst").agg(sum($"c").as("cs"))
      auth = normalized(nodes.select($"node")
        .join(araw.hint("broadcast"), $"node" === $"dst", "left")
        .select($"node", coalesce($"cs", lit(0).cast("decimal(28,6)")).as("s")))
      val hraw = ew.join(auth.hint("broadcast"), ew("dst") === auth("node"))
        .select($"src", round($"w".cast("double") * $"v".cast("double"), 6)
          .cast("decimal(28,6)").as("c"))
        .groupBy($"src").agg(sum($"c").as("cs"))
      hub = normalized(nodes.select($"node")
        .join(hraw.hint("broadcast"), $"node" === $"src", "left")
        .select($"node", coalesce($"cs", lit(0).cast("decimal(28,6)")).as("s")))
    }
    nodes
      .join(hub.select($"node", $"v".cast("double").as("hub")), "node")
      .join(auth.select($"node", $"v".cast("double").as("auth")), "node")
      .select($"node", $"n_name", $"hub", $"auth")
      .orderBy($"node")
  }

  /** Degree-oriented edges over a deduplicated undirected edge list
    * `(a, b)` with `a < b`: each edge points from its lower-rank to its
    * higher-rank endpoint under rank = (degree, id), carrying the
    * destination's rank so wedges can be ordered without a re-join.
    *
    * This is the node-iterator orientation (Schank & Wagner 2005; also
    * Suri & Vassilvitskii's MR-triangle bound): out-degree under degree
    * orientation is O(√|E|) on ANY graph, so the wedge join below
    * generates O(|E|^{3/2}) candidates worst-case instead of the
    * Σ deg(v)² blow-up id-orientation suffers on skewed (power-law)
    * graphs, where one low-id hub fans out quadratically. */
  private[graft] def orientEdges(und: DataFrame): DataFrame = {
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // und has a < b by id, so on equal degrees the (deg, id) tie-break
    // keeps the id orientation — every edge still oriented exactly once
    val aLower = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    und
      .join(deg.select(col("node").as("na"), col("deg").as("da")), col("a") === col("na"))
      .join(deg.select(col("node").as("nb"), col("deg").as("db")), col("b") === col("nb"))
      .select(
        when(aLower, col("a")).otherwise(col("b")).as("u"),
        when(aLower, col("b")).otherwise(col("a")).as("v"),
        when(aLower, col("db")).otherwise(col("da")).as("vdeg"))
  }

  /** Rank-ordered open wedges of the degree-oriented graph: `(a, v, w)`
    * with both `a→v` and `a→w` oriented edges and rank(v) < rank(w) —
    * each candidate triangle generated exactly once, fan-out bounded by
    * the oriented out-degree (≤ O(√|E|)). Exposed for the skew spec. */
  private[graft] def orientedWedges(e: DataFrame): DataFrame = {
    val vLower = col("x.vdeg") < col("y.vdeg") ||
      (col("x.vdeg") === col("y.vdeg") && col("x.v") < col("y.v"))
    e.as("x").join(e.as("y"), col("x.u") === col("y.u") && vLower)
      .select(col("x.u").as("a"), col("x.v").as("v"), col("y.v").as("w"))
  }

  /** Per-node triangle counts over a deduplicated undirected edge list —
    * the degree-oriented core shared by [[triangles]] and the skew spec.
    * A triangle's lowest-rank corner owns its single wedge; the closing
    * edge v–w appears in the oriented list as rank-ascending (v, w), so
    * one equi-join confirms it and each triangle credits its 3 corners. */
  private[graft] def triangleCounts(und: DataFrame): DataFrame = {
    val e = orientEdges(und).localCheckpoint()
    val tri = orientedWedges(e).join(
      e.select(col("u").as("cu"), col("v").as("cv")),
      col("v") === col("cu") && col("w") === col("cv"))
      .select(col("a"), col("v"), col("w"))
    tri.select(explode(array(col("a"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Per-nation triangle participation in the undirected trade graph —
    * the clustering signal (a node in many triangles sits in a densely
    * interconnected trading cluster; zero triangles marks a pure spoke).
    *
    * Scale shape: two shuffle joins over the DEDUPLICATED undirected
    * edge list, wedge fan-out bounded by DEGREE orientation (see
    * [[orientEdges]]) — the plan survives power-law skew, where the
    * previous id-oriented wedge join was quadratic in a hub's degree.
    * All counts exact longs; nations in no triangle surface with 0. */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val und = tradeEdges(spark, dir)
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .filter($"a" =!= $"b").distinct()
    val perNode = triangleCounts(und)
    Tables.nation(spark, dir)
      .select($"n_nationkey".as("node"), $"n_name")
      .join(perNode, Seq("node"), "left")
      .select($"node", $"n_name",
        coalesce($"n_triangles", lit(0L)).as("n_triangles"))
      .orderBy($"node")
  }

  /** h-index iteration rounds for [[coreness]]. The iteration converges to
    * the exact k-core number in at most O(diameter·Δ) rounds (Lü et al.
    * 2016 prove finite convergence); it is stationary afterwards, so a
    * fixed round count is safe — 8 is ample for the 25-node trade graph
    * and keeps the unrolled oracle finite, mirroring [[PrIters]]. */
  val CoreIters = 8

  /** k-core decomposition via distributed h-index iteration (Lü, Zhou,
    * Zhang, Stanley 2016, "The H-index of a network node" — public
    * method): start every node at its degree and repeatedly replace each
    * node's value with the h-index of its neighbors' values (the largest h
    * such that ≥ h neighbors hold ≥ h); the fixpoint is exactly the node's
    * core number. Coreness is the standard "dense sub-community depth"
    * signal — a crawl-graph quality prior one tier stronger than raw
    * degree, which a single hub edge can inflate but a core cannot.
    *
    * Chosen over sequential peeling (Batagelj–Zaveršnik) because peeling
    * is inherently serial in k while h-index iteration is a synchronous
    * per-node update — the same edge-frame-shuffle-per-round shape as
    * [[pagerank]]. Each round: join the adjacency list to the current
    * value frame (node-count-sized, AQE broadcast-picks it), then a
    * row_number window PARTITIONED BY node — per-key state bounded by that
    * node's degree, never global. `max(least(rn, c))` over the descending
    * value sequence is the h-index; it depends only on the sorted value
    * multiset, so tie order among equal values cannot change the result.
    * All values exact longs end-to-end; the DuckDB oracle replays all
    * [[CoreIters]] rounds as unrolled CTEs. */
  def coreness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val und = tradeEdges(spark, dir)
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .filter($"a" =!= $"b").distinct()
    Tables.nation(spark, dir)
      .select($"n_nationkey".as("node"), $"n_name")
      .join(corenessOf(und), Seq("node"), "left")
      .select($"node", $"n_name", coalesce($"c", lit(0L)).as("coreness"))
      .orderBy($"node")
  }

  /** [[CoreIters]] h-index rounds over a deduplicated undirected edge
    * list `(a, b)` — the iterative core shared by [[coreness]] and the
    * synthetic-graph spec. Returns `(node, c)` for every non-isolated
    * node. */
  /** Synchronous rounds for [[labelProp]] — enough to converge the 25-node
    * trade graph while keeping the unrolled oracle finite. */
  val LpaIters = 4

  /** Weighted label propagation communities (Raghavan et al. 2007) over the
    * undirected [[tradeEdges]] volume graph — the trade-bloc detector, and
    * the curation analogue of clustering crawl domains into site families.
    * Fully deterministic variant: [[LpaIters]] SYNCHRONOUS rounds (no
    * random visit order), every node seeded with its own id, each round
    * re-labeling every node with its neighbors' weight-heaviest label
    * (ties → smallest label; self-loops don't vote). Fixed round count
    * makes the output a well-defined function of the graph — no
    * convergence race — and all state is exact integers (node ids, summed
    * long weights): nothing to quantize.
    *
    * Scale shape: identical to [[pagerank]] — the edge build is the one
    * fact-table shuffle; every round shuffles only edge-sized vote frames
    * against a node-sized label frame that AQE broadcast-joins;
    * `localCheckpoint` pins each round's plan constant. The DuckDB oracle
    * unrolls all rounds as CTEs and must agree on every label. */
  def labelProp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = tradeEdges(spark, dir)
    val nodes = Tables.nation(spark, dir)
      .select($"n_nationkey".as("node"), $"n_name")
    labelPropOf(e, nodes.select($"node"))
      .join(nodes, "node")
      .select($"node", $"n_name", $"lab".as("community"))
      .orderBy($"node")
  }

  /** [[LpaIters]] synchronous weighted-LPA rounds over a directed edge list
    * `(src, dst, w)` (symmetrized and self-loop-stripped here) and a node
    * frame `(node)`. Returns `(node, lab)` — the iterative core shared by
    * [[labelProp]] and the synthetic-graph spec. */
  private[graft] def labelPropOf(e: DataFrame, nodes: DataFrame): DataFrame = {
    val und = e.select(col("src").as("u"), col("dst").as("v"), col("w"))
      .unionByName(e.select(col("dst").as("u"), col("src").as("v"), col("w")))
      .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w"))
      .filter(col("u") =!= col("v"))
      .localCheckpoint()
    var labels = nodes.select(col("node"), col("node").as("lab"))
    for (_ <- 1 to LpaIters) {
      // r15: no per-round localCheckpoint (linear lineage — each label
      // frame is read once by the next round over a fixed 4 rounds) and
      // broadcast pinned by hint on the node-bounded label frame
      // (25 nations at every tier for the registered query; guide §3.1).
      // The two-level aggregate (u, lab) → (u) collapses vote rows
      // map-side before its one exchange.
      val votes = und.join(labels.hint("broadcast"), und("v") === labels("node"))
        .groupBy(col("u"), col("lab")).agg(sum(col("w")).as("vw"))
      val next = votes.groupBy(col("u"))
        .agg(max(struct(col("vw"), (-col("lab")).as("nl"))).as("m"))
        .select(col("u").as("node"), (-col("m.nl")).as("lab"))
      labels = nodes.select(col("node"))
        .join(next.hint("broadcast"), Seq("node"), "left")
        .select(col("node"), coalesce(col("lab"), col("node")).as("lab"))
    }
    labels
  }

  private[graft] def corenessOf(und: DataFrame): DataFrame = {
    val adj = und.select(col("a").as("node"), col("b").as("nbr"))
      .union(und.select(col("b").as("node"), col("a").as("nbr")))
      .localCheckpoint()
    var c = adj.groupBy(col("node")).agg(count(lit(1)).as("c"))
    val byVal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("node")).orderBy(col("c").desc)
    for (_ <- 1 to CoreIters) {
      // r15: no per-round localCheckpoint — each value frame is consumed
      // exactly once by the next round (linear lineage over a fixed 8
      // rounds), so the per-round materialize-to-blocks job was pure
      // overhead. The value frame is node-bounded (25 nations at every
      // tier for the registered query), so broadcast is pinned by hint
      // (guide §3.1); the row_number window and the groupBy share ONE
      // exchange on `node` (equal keys — the aggregate reuses the
      // window's hash partitioning).
      c = adj
        .join(c.select(col("node").as("nn"), col("c")).hint("broadcast"),
          col("nbr") === col("nn"))
        .select(col("node"), col("c"))
        .withColumn("rn", row_number().over(byVal).cast("long"))
        .select(col("node"), least(col("rn"), col("c")).as("h"))
        .groupBy(col("node")).agg(max(col("h")).as("c"))
    }
    c
  }
}
