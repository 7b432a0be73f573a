package graft

import graft.queries.{AnalyticQueries, CorpusQueries, GraphQueries}
import org.apache.spark.sql.functions._

/** Round-6 operators: weighted PageRank, SCD2 interval compaction, KS
  * drift, power-iteration PCA, interpolated bigram LM. Value-level parity
  * is the DuckDB oracle (tools/check.py); these pin the semantic
  * invariants the oracle can't phrase. */
class GraphStatsSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("pagerank: one row per nation, mass conserved, teleport floor") {
    val rows = GraphQueries.pagerank(spark, sf).collect()
    assert(rows.length == 25, "one rank per nation")
    val mass = rows.map(_.getDouble(2)).sum
    // no dangling nodes in a complete order book -> total mass stays 1 up
    // to the 6-dp per-node rounding (|err| <= 25e-6 per iteration)
    assert(math.abs(mass - 1.0) < 1e-3, s"rank mass $mass drifted from 1")
    rows.foreach(r => assert(r.getDouble(2) >= GraphQueries.Teleport - 1e-9,
      s"node ${r.get(0)} below the teleport floor"))
  }

  test("scd2Intervals: contiguous versions, alternating types, one current row per user") {
    val runs = AnalyticQueries.scd2Intervals(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), if (r.isNullAt(4)) null else r.getTimestamp(4),
        r.getLong(5), r.getBoolean(6)))
    val nEvents = graft.sources.Tables.events(spark, sf).count()
    assert(runs.map(_._6).sum == nEvents, "version rows must partition the event stream")
    runs.groupBy(_._1).foreach { case (u, rs) =>
      val seq = rs.sortBy(_._2)
      assert(seq.map(_._2).toSeq == (1L to seq.length).toSeq, s"user $u seq gap")
      seq.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 != b._3, s"user $u: adjacent runs share type ${a._3}")
          assert(a._5 == b._4, s"user $u: interval gap at seq ${a._2}")
        case _ =>
      }
      assert(seq.count(_._7) == 1, s"user $u: exactly one current version")
      assert(seq.last._7 && seq.last._5 == null, s"user $u: open tail version")
    }
  }

  test("ksDrift: matches a driver-side exact ECDF replay") {
    val out = AnalyticQueries.ksDrift(spark, sf).collect()
    assert(out.length == 1)
    val (nA, nB, stat, at) = (out(0).getLong(0), out(0).getLong(1),
      out(0).getDouble(2), out(0).getDouble(3))
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"ts", $"value").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getDouble(1)))
    val t0 = ev.map(_._1).min
    val cut = t0 + AnalyticQueries.KsSplitDays * 86400000L
    val a = ev.filter(_._1 < cut).map(_._2)
    val b = ev.filter(_._1 >= cut).map(_._2)
    assert(nA == a.length && nB == b.length)
    val values = ev.map(_._2).distinct.sorted
    def ecdf(xs: Array[Double])(v: Double) = xs.count(_ <= v).toDouble / xs.length
    val gaps = values.map(v => v -> math.abs(ecdf(a)(v) - ecdf(b)(v)))
    val mx = gaps.map(_._2).max
    assert(stat == math.rint(mx * 1e6) / 1e6, s"ks $stat != replay $mx")
    assert(at == gaps.filter(_._2 == mx).map(_._1).min, "leftmost argmax")
    assert(stat > 0.0 && stat <= 1.0)
  }

  test("embedPca: unit loading vector, positive dominant eigenvalue") {
    val rows = CorpusQueries.embedPca(spark, sf).collect()
    assert(rows.length == CorpusQueries.GramDims)
    val norm = math.sqrt(rows.map(r => r.getDouble(1) * r.getDouble(1)).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"loading norm $norm not unit")
    val lambdas = rows.map(_.getDouble(2)).distinct
    assert(lambdas.length == 1 && lambdas(0) > 0.0, "one positive eigenvalue estimate")
  }

  test("funnel: stages shrink monotonically, conversions consistent") {
    val rows = AnalyticQueries.funnel(spark, sf).collect()
    assert(rows.length == AnalyticQueries.FunnelStages.length)
    val n = rows.map(_.getLong(2))
    assert(n.sliding(2).forall { case Array(a, b) => b <= a; case _ => true },
      s"funnel grew: ${n.toSeq}")
    assert(rows(0).isNullAt(3), "stage 1 has no previous stage")
    rows.tail.zipWithIndex.foreach { case (r, i) =>
      val expectPrev = math.rint(n(i + 1).toDouble / n(i).toDouble * 1e6) / 1e6
      val expectFirst = math.rint(n(i + 1).toDouble / n(0).toDouble * 1e6) / 1e6
      assert(r.getDouble(3) == expectPrev && r.getDouble(4) == expectFirst)
    }
  }

  test("cohortRetention: week-0 retention is exactly 1, actives bounded by cohort") {
    val rows = AnalyticQueries.cohortRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    val zeroWeeks = rows.filter(_.getLong(1) == 0L)
    assert(zeroWeeks.nonEmpty, "every cohort is active in its own first week")
    zeroWeeks.foreach { r =>
      assert(r.getLong(2) == r.getLong(3) && r.getDouble(4) == 1.0,
        s"cohort ${r.get(0)}: first-week retention must be 1")
    }
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(3)))
  }

  test("hits: both score vectors unit-L2, nonnegative") {
    val rows = GraphQueries.hits(spark, sf).collect()
    assert(rows.length == 25)
    val hubN = math.sqrt(rows.map(r => r.getDouble(2) * r.getDouble(2)).sum)
    val authN = math.sqrt(rows.map(r => r.getDouble(3) * r.getDouble(3)).sum)
    assert(math.abs(hubN - 1.0) < 1e-4, s"hub norm $hubN")
    assert(math.abs(authN - 1.0) < 1e-4, s"auth norm $authN")
    rows.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(3) >= 0.0))
  }

  test("triangles: matches a driver-side brute-force count") {
    val rows = GraphQueries.triangles(spark, sf).collect()
    assert(rows.length == 25)
    val und = GraphQueries.tradeEdges(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val count = collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } { count(a) += 1; count(b) += 1; count(c) += 1 }
    rows.foreach { r =>
      assert(r.getLong(2) == count(r.getInt(0)),
        s"node ${r.getInt(0)}: ${r.getLong(2)} != ${count(r.getInt(0))}")
    }
    assert(rows.map(_.getLong(2)).sum % 3 == 0)
  }

  test("psiDrift: nonnegative terms, total = term sum, bins within range") {
    val rows = AnalyticQueries.psiDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val termSum = rows.map(r => BigDecimal(r.getDouble(5)).setScale(6)).sum
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < AnalyticQueries.PsiBins)
      assert(r.getLong(1) + r.getLong(2) > 0, "only occupied bins surface")
      // (pa-pb) and ln(pa/pb) always share a sign
      assert(r.getDouble(5) >= 0.0, s"bin ${r.getLong(0)}: negative PSI term")
      assert(math.abs(r.getDouble(6) - termSum.toDouble) < 1e-9,
        "psi_total must be the DECIMAL sum of the per-bin terms")
    }
  }

  test("giniUsers: matches a driver-side exact replay, bounded [0,1)") {
    val out = AnalyticQueries.giniUsers(spark, sf).collect()
    assert(out.length == 1)
    val (n, tot, gini) = (out(0).getLong(0), out(0).getLong(1), out(0).getDouble(2))
    val counts = graft.sources.Tables.events(spark, sf)
      .groupBy($"user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(n == counts.length && tot == counts.map(_._2).sum)
    val xs = counts.sortBy(c => (c._2, c._1)).map(_._2)
    val s1 = xs.zipWithIndex.map { case (x, i0) => BigInt(i0 + 1) * BigInt(x) }.sum
    val expect = (2.0 * s1.toDouble - (n + 1).toDouble * tot.toDouble) /
      (n.toDouble * tot.toDouble)
    assert(gini == math.rint(expect * 1e6) / 1e6, s"gini $gini != replay $expect")
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("plan shapes: one user shuffle for SCD2, partitioned ECDF cumsum, no cartesians") {
    val scd2 = AnalyticQueries.scd2Intervals(spark, sf)
      .queryExecution.executedPlan.toString
    // the window, run-groupBy and valid_to lead all reuse the single
    // user_id hash partition; the only other exchange is the output sort
    val hashEx = "hashpartitioning".r.findAllIn(scd2).length
    assert(!scd2.contains("SinglePartition)"), s"SCD2 collapsed to one partition:\n$scd2")
    assert(hashEx <= 2, s"SCD2 re-shuffles the event stream:\n$scd2")
    val ks = AnalyticQueries.ksDrift(spark, sf)
      .queryExecution.executedPlan.toString
    // the value-ordered cumulative count must run partition-parallel
    // (range partition + per-pid window), never one global window
    assert(ks.contains("rangepartitioning"), s"ECDF lost its range partition:\n$ks")
    assert(ks.contains("hashpartitioning(pid"), s"ECDF cumsum not per-partition:\n$ks")
    val lm = CorpusQueries.bigramLm(spark, sf)
      .queryExecution.executedPlan.toString
    for ((n, p) <- Seq("scd2" -> scd2, "ks" -> ks, "bigramLm" -> lm)) {
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian:\n$p")
    }
  }

  test("bigramLm: n_bigrams = n_tokens - 1, nonnegative xent, short docs NULL") {
    val lm = CorpusQueries.bigramLm(spark, sf)
    val toks = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", size(graft.functions.Text.tokenize($"text")).as("nt"))
    val joined = lm.join(toks, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val nt = r.getInt(4)
      if (nt < 2) {
        assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3),
          s"doc ${r.getLong(0)}: <2 tokens must surface NULL scores")
      } else {
        assert(r.getLong(1) == nt - 1L, s"doc ${r.getLong(0)}: bigram count")
        assert(r.getDouble(2) >= 0.0, "p <= 1 everywhere -> xent >= 0")
        assert(r.getDouble(3) >= 1.0, "ppl = exp(xent) >= 1")
      }
    }
  }

  test("eventTransitions: row-stochastic matrix; pair total = events - users") {
    val m = graft.queries.AnalyticQueries.eventTransitions(sql, sf).collect()
    assert(m.nonEmpty)
    // each source state's outgoing probabilities sum to 1 (6-dp rounding
    // leaves at most |types|/2e6 of slack)
    m.groupBy(_.getString(0)).foreach { case (ft, rows) =>
      val s = rows.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$ft outgoing p sums to $s")
      val tot = rows.map(_.getLong(2)).sum
      rows.foreach { r =>
        assert(math.abs(r.getDouble(3) - r.getLong(2).toDouble / tot) < 1e-6)
      }
    }
    // every user's k-event stream yields exactly k-1 transitions
    val ev = graft.sources.Tables.events(sql, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(m.map(_.getLong(2)).sum == expected)
  }
}
