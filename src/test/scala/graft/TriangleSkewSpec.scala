package graft

import graft.queries.GraphQueries

/** Degree-oriented triangle core on adversarial shapes the nation-graph
  * oracle can't exercise: a power-law-style star (the skew case where
  * id-orientation blows up quadratically) and a clique (every wedge
  * closes). Value parity on the real graph stays with the q_triangles
  * DuckDB oracle. */
class TriangleSkewSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("star graph: wedge fan-out stays O(1) under degree orientation") {
    // hub 0 — spokes 1..200, plus the single closing edge (1,2):
    // exactly one triangle (0,1,2). Under id orientation the hub owns all
    // 200 out-edges -> C(200,2) = 19900 wedges; under (degree, id) rank
    // every spoke points AT the hub and only node 1 (out-nbrs {2, 0})
    // forms a wedge.
    val edges = ((1 to 200).map(i => (0L, i.toLong)) :+ ((1L, 2L)))
      .toDF("a", "b")
    val oriented = GraphQueries.orientEdges(edges).localCheckpoint()
    val nWedges = GraphQueries.orientedWedges(oriented).count()
    assert(nWedges == 1, s"degree orientation must emit 1 wedge, got $nWedges")
    val counts = GraphQueries.triangleCounts(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counts == Map(0L -> 1L, 1L -> 1L, 2L -> 1L),
      s"star+chord triangle credit wrong: $counts")
  }

  test("K5 clique: all degrees tie — id tie-break still counts each triangle once") {
    val edges = (for { a <- 0 until 5; b <- a + 1 until 5 }
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val counts = GraphQueries.triangleCounts(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // C(5,3)=10 triangles, each node on C(4,2)=6 of them
    assert(counts.size == 5 && counts.values.forall(_ == 6L),
      s"K5 per-node counts wrong: $counts")
  }
}
