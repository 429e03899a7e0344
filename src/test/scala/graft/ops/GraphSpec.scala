package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  /** Independent driver-side PageRank — same fixed-sweep semantics as the
    * operator, but plain Scala maps: the contract the distributed plan
    * must reproduce exactly (after the 9-decimal round). */
  private def refPageRank(
      pairs: Seq[(Long, Long)], iters: Int, d: Double): Map[Long, Double] = {
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = out.keySet
    val n = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / out(u).size }.sum
      }
      r = nodes.map(v => v -> ((1.0 - d) / n + d * contrib.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("pageRank matches the independent reference on a planted graph") {
    import spark.implicits._
    // a 3-clique bridged to a path: distinct degrees, asymmetric ranks
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = Graph.pageRank(pairs.toDF("a_id", "b_id"), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(pairs, 5, 0.85)
    assert(got.keySet == want.keySet)
    for ((k, v) <- want)
      assert(math.abs(got(k) - v) < 1e-9, s"node $k: ${got(k)} vs $v")
    // rank mass is conserved (no dangling nodes in a symmetrized graph)
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
    // the bridge node 3 (degree 3) outranks the clique-only nodes (degree 2)
    assert(got(3L) > got(1L) && got(3L) > got(2L))
  }

  test("pageRank: driver-local dispatch equals the distributed sweeps") {
    import spark.implicits._
    val pairs = (1L to 40L).flatMap(i => Seq((i, i % 40 + 1), (i, (i * 3) % 40 + 1)))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct.toDF("a_id", "b_id")
    val local = Graph.pageRank(pairs) // under the threshold → driver path
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val dist = Graph.pageRank(pairs, localEdgeThreshold = 0L) // forced sweeps
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(local.keySet == dist.keySet)
    for ((k, v) <- local)
      assert(math.abs(dist(k) - v) <= 1e-9, s"node $k: local $v vs dist ${dist(k)}")
  }

  test("pageRank is deterministic across runs") {
    import spark.implicits._
    val pairs = (1L to 30L).flatMap(i => Seq((i, i % 30 + 1), (i, (i * 7) % 30 + 1)))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct
    val df = pairs.toDF("a_id", "b_id")
    val a = Graph.pageRank(df).collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = Graph.pageRank(df).collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b)
  }

  test("personalizedPageRank: mass concentrates near seeds; reference equality") {
    import spark.implicits._
    // a path graph 1-2-3-4-5-6: seed at node 1 → rank decays with
    // distance from the seed
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val seeds = Seq(1L, 99L).toDF("doc_id") // 99 is outside the graph
    val got = Graph.personalizedPageRank(pairs.toDF("a_id", "b_id"), seeds)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent reference with the same recurrence
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes = deg.keySet
    val s = Set(1L)
    var r = nodes.map(v => v -> (if (s(v)) 1.0 / s.size else 0.0)).toMap
    for (_ <- 1 to 5) {
      val contrib = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = nodes.map(v => v ->
        ((if (s(v)) 0.15 / s.size else 0.0) + 0.85 * contrib.getOrElse(v, 0.0))).toMap
    }
    assert(got.keySet == nodes)
    for ((k, v) <- r)
      assert(math.abs(got(k) - v) < 1e-9, s"node $k: ${got(k)} vs $v")
    // coarse proximity: at 5 sweeps a path graph shows parity waves
    // (mass reaches odd/even distances on alternating sweeps), so only
    // the seed-side-vs-far-side ordering is asserted, not per-hop decay
    assert(got(1L) + got(2L) > got(5L) + got(6L),
      "mass must concentrate on the seed side of the path")
    assert(got(2L) > got(6L))
    // an all-outside seed set is an error, not a silent zero vector
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(pairs.toDF("a_id", "b_id"),
        Seq(999L).toDF("doc_id"))
    }
  }

  /** Weighted reference: same recurrence with w/W(u) transitions. */
  private def refWeightedPageRank(
      pairs: Seq[(Long, Long, Double)], iters: Int,
      d: Double): Map[Long, Double] = {
    val edges = pairs.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val wtot = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = wtot.keySet
    val n = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _, w) => r(u) * w / wtot(u) }.sum
      }
      r = nodes.map(v => v -> ((1.0 - d) / n + d * contrib.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("pageRankWeighted: strong links carry more mass; matches the reference") {
    import spark.implicits._
    // node 3 linked to 1 STRONGLY and to 5 weakly; symmetric shape
    // otherwise, so weight is the only asymmetry
    val pairs = Seq((1L, 3L, 0.9), (3L, 5L, 0.1), (1L, 2L, 0.5), (5L, 4L, 0.5))
    val got = Graph.pageRankWeighted(pairs.toDF("a_id", "b_id", "weight"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refWeightedPageRank(pairs, 5, 0.85)
    assert(got.keySet == want.keySet)
    for ((k, v) <- want)
      assert(math.abs(got(k) - v) < 1e-9, s"node $k: ${got(k)} vs $v")
    // the strong-side neighbor of the hub outranks the weak-side one
    assert(got(1L) > got(5L))
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
  }

  test("personalizedPageRank: driver-local dispatch equals the distributed sweeps") {
    import spark.implicits._
    val pairs = (1L to 40L).flatMap(i => Seq((i, i % 40 + 1), (i, (i * 3) % 40 + 1)))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct.toDF("a_id", "b_id")
    val seeds = Seq(1L, 7L, 13L, 999L).toDF("doc_id") // 999 outside the graph
    val local = Graph.personalizedPageRank(pairs, seeds) // under threshold
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val dist = Graph.personalizedPageRank(pairs, seeds, localEdgeThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(local.keySet == dist.keySet)
    for ((k, v) <- local)
      assert(math.abs(dist(k) - v) <= 1e-9, s"node $k: local $v vs dist ${dist(k)}")
    // the all-outside-seed contract holds on BOTH dispatch paths
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(pairs, Seq(999L).toDF("doc_id"))
    }
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(pairs, Seq(999L).toDF("doc_id"),
        localEdgeThreshold = 0L)
    }
  }

  test("pageRankWeighted: driver-local dispatch equals the distributed sweeps") {
    import spark.implicits._
    val rng = new java.util.Random(7)
    val pairs = (1L to 40L).flatMap(i => Seq((i, i % 40 + 1), (i, (i * 3) % 40 + 1)))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct
      .map { case (a, b) => (a, b, 0.05 + rng.nextDouble()) }
      .toDF("a_id", "b_id", "weight")
    val local = Graph.pageRankWeighted(pairs) // under the threshold
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val dist = Graph.pageRankWeighted(pairs, localEdgeThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(local.keySet == dist.keySet)
    for ((k, v) <- local)
      assert(math.abs(dist(k) - v) <= 1e-9, s"node $k: local $v vs dist ${dist(k)}")
  }

  test("pageRankWeighted: null-cast weights are skipped identically on both dispatch paths") {
    import spark.implicits._
    // a NULL weight must not NPE the driver path's getDouble — the
    // distributed sweeps' aggregates silently skip nulls, so the fast
    // path must drop the same edges before collect
    val pairs = Seq(
      (1L, 2L, Some(1.0)), (2L, 3L, Some(2.0)),
      (1L, 3L, None: Option[Double]), (3L, 4L, Some(0.5)))
      .toDF("a_id", "b_id", "weight")
    val local = Graph.pageRankWeighted(pairs) // under the threshold
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val dist = Graph.pageRankWeighted(pairs, localEdgeThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    for ((k, v) <- local)
      assert(math.abs(dist(k) - v) <= 1e-9, s"node $k: local $v vs dist ${dist(k)}")
    assert(local.keySet.subsetOf(dist.keySet))
    assert(local.nonEmpty)
  }

  test("graph operators release their sweep caches (repeated calls don't accumulate blocks)") {
    import spark.implicits._
    val pairs = (1L to 30L).map(i => (i, i % 30 + 1))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct.toDF("a_id", "b_id")
    val weighted = pairs.withColumn("weight", lit(0.5))
    val seeds = Seq(1L, 5L).toDF("doc_id")
    def nBlocks: Int = spark.sparkContext.getPersistentRDDs.size
    // each invocation may legitimately leave ONE persisted RDD behind —
    // the localCheckpointed RESULT (the connectedComponents posture);
    // the sweep-feeding caches (edgesW / seedFlags / e / the input pairs)
    // must all be released. Forced-distributed paths exercised explicitly.
    val calls: Seq[() => Unit] = Seq(
      () => { Graph.pageRank(pairs, localEdgeThreshold = 0L).count(): Unit },
      () => { Graph.personalizedPageRank(pairs, seeds,
        localEdgeThreshold = 0L).count(): Unit },
      () => { Graph.pageRankWeighted(weighted,
        localEdgeThreshold = 0L).count(): Unit },
      () => { Graph.triangleStats(pairs).count(): Unit },
      // local dispatch paths leave nothing at all
      () => { Graph.pageRank(pairs).count(): Unit },
      () => { Graph.personalizedPageRank(pairs, seeds).count(): Unit },
      () => { Graph.pageRankWeighted(weighted).count(): Unit })
    calls.zipWithIndex.foreach { case (call, i) =>
      val before = nBlocks
      call()
      val after = nBlocks
      assert(after - before <= 1,
        s"call #$i leaked ${after - before} persisted RDDs (max 1 — the result)")
    }
    // a CALLER-managed pairs cache must survive the operator (the
    // persistPairs guard): unpersisting it out from under the caller
    // would force recomputation on their next use
    val managed = pairs.persist()
    managed.count()
    Graph.pageRank(managed, localEdgeThreshold = 0L).count()
    Graph.personalizedPageRank(managed, seeds).count()
    assert(managed.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE,
      "operator released a caller-managed cache")
    managed.unpersist(blocking = true)
  }

  test("triangleStats counts planted triangles exactly") {
    import spark.implicits._
    // triangles {1,2,3} and {2,3,4}; node 5 hangs off node 4
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val got = Graph.triangleStats(pairs.toDF("a_id", "b_id"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> (2L, 1L), 2L -> (3L, 2L), 3L -> (3L, 2L),
      4L -> (3L, 1L), 5L -> (1L, 0L)))
  }

  test("triangleStats: triangle-free graph is all zeros, 4-clique is all 3s") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a_id", "b_id")
    assert(Graph.triangleStats(path).filter(col("triangles") =!= 0).count() == 0)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a_id", "b_id")
    val got = Graph.triangleStats(k4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((3L, 3L))) // every node: degree 3, 3 triangles
  }
}
