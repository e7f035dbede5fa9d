package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** PageRank: structural invariants on a hand graph plus a brute-force
  * driver-side replay of the exact iteration discipline (6dp-rounded
  * contributions, decimal sums) — the same math the DuckDB oracle unrolls. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // A -> B, A -> C, B -> C, C -> A (classic 3-node example, weighted 1)
  private def triangle = Seq(
    (0L, 1L, 1L), (0L, 2L, 1L), (1L, 2L, 1L), (2L, 0L, 1L)
  ).toDF("src", "dst", "w")

  /** Driver-side replay with identical rounding at every step. */
  private def bruteRank(edges: Seq[(Long, Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val wout = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum.toDouble }
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val sc = edges
        .groupBy(_._2)
        .map { case (dst, es) =>
          // decimal-exact sum of 6dp-rounded contributions
          dst -> es.map { case (s, _, w) =>
            BigDecimal(r6(pr(s) * w.toDouble / wout(s)))
          }.sum.toDouble
        }
      pr = nodes.map(v => v -> r6((1 - d) / n + d * sc.getOrElse(v, 0.0))).toMap
    }
    pr
  }

  test("pageRank matches the driver-side replay on the triangle graph") {
    val got = Graph.pageRank(triangle, 5, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = bruteRank(Seq((0L, 1L, 1L), (0L, 2L, 1L), (1L, 2L, 1L), (2L, 0L, 1L)), 5, 0.85)
    assert(got === want)
    // B only receives half of A's mass -> strictly lowest rank (the A/C
    // ranks still oscillate around the fixed point at 5 iterations, so
    // their relative order is not a stable invariant); mass is conserved
    // up to rounding (no dangling nodes in this graph)
    assert(got(1L) < got(0L) && got(1L) < got(2L))
    assert(math.abs(got.values.sum - 1.0) < 1e-4)
  }

  test("pageRank respects edge weights") {
    // B gets 9/10 of A's mass, C gets 1/10 -> B must outrank C
    val e = Seq((0L, 1L, 9L), (0L, 2L, 1L), (1L, 0L, 1L), (2L, 0L, 1L))
      .toDF("src", "dst", "w")
    val got = Graph.pageRank(e, 5, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L))
  }

  test("sink nodes keep the floor rank and forward nothing") {
    // 0 -> 1; 1 is a sink: rank(1) grows, rank(0) decays to the floor
    val e = Seq((0L, 1L, 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRank(e, 10, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) === 0.075)
    assert(got(1L) > got(0L))
  }

  test("nation trade graph derivation is a full aggregation") {
    val e = Graph.nationTradeEdges(spark, sf0001)
    val cols = e.columns.toSeq
    assert(cols === Seq("src", "dst", "w"))
    // every edge weight positive; node ids are nation keys
    assert(e.filter(col("w") <= 0).count() === 0)
  }

  test("bfsFrontier matches a driver-side BFS replay on the gate graph") {
    val got = Graph.qFrontier(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent replay: classic queue BFS over the same affine maps
    val expect = scala.collection.mutable.Map(0L -> 0L, 1L -> 0L, 2L -> 0L)
    var frontier = Set(0L, 1L, 2L)
    for (h <- 1L to Graph.FrontierHops.toLong) {
      frontier = frontier.flatMap(n =>
          Seq((n * 31 + 7) % Graph.FrontierNodes, (n * 17 + 3) % Graph.FrontierNodes))
        .filterNot(expect.contains)
      frontier.foreach(n => expect(n) = h)
    }
    assert(got === expect.toMap)
  }

  test("bfsFrontier exits early when the frontier drains") {
    // a 3-cycle reached from a chain: after the cycle closes there is
    // nothing new; hops beyond that must not loop to the cap
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val got = Graph.bfsFrontier(e, seeds, 50).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("HITS separates hubs from authorities on a directed star") {
    // 3 hub nodes all point at node 100; one back-edge keeps every node
    // in both supports. The star center must dominate AUTHORITY while
    // the pointers share HUB mass — the asymmetry PageRank collapses.
    val e = Seq((0L, 100L, 1L), (1L, 100L, 1L), (2L, 100L, 1L), (100L, 0L, 1L))
      .toDF("src", "dst", "w")
    val got = Graph.hits(e, 4).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(100L)._1 > 0.9, s"star center authority ${got(100L)._1}")
    assert(got(100L)._2 < 0.1, s"star center hub ${got(100L)._2}")
    Seq(0L, 1L, 2L).foreach { n =>
      assert(got(n)._2 > 0.2, s"pointer $n hub ${got(n)._2}")
    }
    // L1 normalization: each score vector sums to ~1 (6dp rounding slack)
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-4)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-4)
  }

  test("graph driver fast paths equal the forced-distributed loops bit-for-bit") {
    // weighted multi-component graph exercising sinks, weights and the
    // 6dp rounding grid; driverEdgeBudget = 0 forces the distributed loop
    val e = (0L until 200L).map(i => (i % 23, (i * 7 + 3) % 23, i % 5 + 1))
      .toDF("src", "dst", "w")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("node").collect().map(_.toSeq).toSeq
    assert(rows(Graph.pageRank(e, 5, 0.85)) ===
      rows(Graph.pageRank(e, 5, 0.85, driverEdgeBudget = 0L)))
    assert(rows(Graph.hits(e, 4)) ===
      rows(Graph.hits(e, 4, driverEdgeBudget = 0L)))
    // the real nation trade graph (non-Long-typed node keys ride through)
    val nte = Graph.nationTradeEdges(spark, sf0001).localCheckpoint()
    assert(rows(Graph.pageRank(nte, 5, 0.85)) ===
      rows(Graph.pageRank(nte, 5, 0.85, driverEdgeBudget = 0L)))
    assert(rows(Graph.hits(nte, 4)) ===
      rows(Graph.hits(nte, 4, driverEdgeBudget = 0L)))
    // BFS: chain + cycle + unreachable component, duplicate seed rows
    val be = Seq((0L, 1L), (1L, 2L), (2L, 0L), (5L, 6L)).toDF("src", "dst")
    val seeds = Seq(0L, 0L, 1L).toDF("node")
    def brows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("node", "hop").collect().map(_.toSeq).toSeq
    assert(brows(Graph.bfsFrontier(be, seeds, 4)) ===
      brows(Graph.bfsFrontier(be, seeds, 4, driverEdgeBudget = 0L)))
  }

  test("HITS is a pure function of the edge rows, not the partitioning") {
    val e = (0L until 60L).map(i => (i % 12, (i * 7 + 3) % 12, i % 3 + 1))
      .toDF("src", "dst", "w")
    val a = Graph.hits(e, 4).orderBy("node").collect().map(_.toSeq).toSeq
    val b = Graph.hits(e.repartition(13), 4).orderBy("node").collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(Graph.hits(e.limit(0), 4).count() === 0) // empty-input discipline
  }
}
