package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph analytics over similarity edge lists — the layer a corpus-curation
 * pipeline runs AFTER candidate generation: connected components already
 * live in [[Dedup.connectedComponents]]; this module adds the two standard
 * per-node importance/cohesion signals, PageRank and triangle counting.
 * Both take the same `(a_id, b_id)` undirected pair frame the dedup
 * operators emit (`a_id < b_id` by construction), so any of the
 * MinHash/SimHash/PPJoin candidate generators composes directly.
 *
 * Scale notes (100 TB posture):
 *  - both operators run ONLY over the edge-induced subgraph — the frame is
 *    bounded by the pair volume (the duplication rate), never the corpus;
 *  - PageRank is a fixed number of hash-join + partial-agg sweeps over a
 *    cached degree-weighted edge list; no driver-side adjacency, and the
 *    only collect is the member-count scalar;
 *  - triangle counting uses the oriented-edge (a<b<c) double join, the
 *    standard way to cut the enumeration 6× and bound the join fan-out by
 *    the out-degree of the SMALLER endpoint.
 */
object Graph {

  /** True iff every named column is an integral type — the driver fast
    * paths key their adjacency on long ids, so dispatch to them only when
    * the widen-to-long cast is lossless (a string-keyed edge list would
    * cast to null and NPE); non-integral ids take the distributed sweeps,
    * which are id-type-agnostic. */
  private def integralIds(df: DataFrame, cols: String*): Boolean =
    cols.forall(c => df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType
           | org.apache.spark.sql.types.IntegerType
           | org.apache.spark.sql.types.ShortType
           | org.apache.spark.sql.types.ByteType => true
      case _ => false
    })

  /** Round to 9 decimals exactly as Spark's `round(col, 9)` does
    * (HALF_UP over the shortest-decimal repr) — the driver paths and the
    * distributed sweeps must agree bit-for-bit after the final round. */
  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Persist the (typically expensive candidate-join) pair plan ONLY when
    * the caller hasn't already — unpersisting a caller-managed cache out
    * from under them would force recomputation on their next use (the
    * [[Dedup.minhashCandidatePairs]] guard). Returns the frame plus
    * whether THIS operator owns (and must release) the cache. */
  private def persistPairs(pairs: DataFrame): (DataFrame, Boolean) =
    if (pairs.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      (pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK), true)
    else (pairs, false)

  /**
   * PageRank over an undirected pair list, run for a FIXED number of
   * power-iteration sweeps (deterministic — no convergence race, and the
   * result is reproducible across engines and cluster sizes).
   *
   * Semantics: the graph is the edge-induced subgraph (nodes with at least
   * one pair); `N` = member count; ranks start uniform at `1/N`; each sweep
   * computes `r'(v) = (1-d)/N + d * Σ_{u→v} r(u)/deg(u)` over the
   * symmetrized edge list. Symmetrization means every member has in- and
   * out-degree ≥ 1, so there is no dangling-mass term to redistribute.
   *
   * Plan shape: the degree-weighted edge list is computed once and cached
   * (it feeds every sweep); each sweep is one shuffle-join plus one
   * partially-aggregated sum, and ranks are referenced exactly once per
   * sweep, so the composed lazy plan stays LINEAR in `iterations` (contrast
   * [[Dedup.connectedComponents]], whose convergence check forces per-sweep
   * materialization).
   *
   * Output: `(doc_id, pagerank)` with the rank rounded to 9 decimals —
   * ranks are O(1/N), and the final round absorbs the sub-ulp wobble of
   * cross-partition summation order (same argument as the round(·,6)
   * contract on the O(1)-magnitude similarity scores).
   */
  def pageRank(
      pairs: DataFrame, iterations: Int = 5, damping: Double = 0.85,
      localEdgeThreshold: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    // the pair plan is typically an EXPENSIVE candidate join (PPJoin /
    // banded LSH) and is referenced through every branch below (both
    // union arms × degree agg × weighted-edge join — 4 evaluations
    // without a cache, measured 2× the whole query's cost); persist it
    // FIRST, exactly the connectedComponents discipline
    val (p, owned) = persistPairs(pairs)
    // size dispatch, the connectedComponents pattern: a near-dup edge
    // list is tiny even for a huge corpus (it IS the duplication rate),
    // and five distributed sweeps cost ~10 sequential shuffle stages of
    // pure scheduling latency on a frame of a few thousand rows. Below
    // the threshold the power iteration runs on the driver over the
    // bounded collected edge list (1M pairs ≈ 16 MB); the distributed
    // sweeps below remain for adversarial pair volumes.
    if (integralIds(p, "a_id", "b_id") && p.count() <= localEdgeThreshold) {
      val out = localPageRank(p, iterations, damping)
      if (owned) p.unpersist(blocking = true)
      return out
    }
    val edges = p.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(p.select(col("b_id").as("src"), col("a_id").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // one cached frame feeds all sweeps: (src, dst, deg-of-src)
    val edgesW = edges.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the single driver scalar — member count, bounded by 2·|pairs|;
    // this count materializes edgesW, after which the pair cache is dead
    val n = edgesW.select(col("src")).distinct().count().toDouble
    if (owned) p.unpersist(blocking = false)
    val base = lit(1.0 - damping) / lit(n)
    var ranks = edgesW.select(col("src").as("doc_id")).distinct()
      .withColumn("rank", lit(1.0) / lit(n))
    for (_ <- 1 to iterations) {
      ranks = edgesW
        .join(ranks, edgesW("src") === ranks("doc_id"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("contrib"))
        .select(col("dst").as("doc_id"),
          (base + lit(damping) * col("contrib")).as("rank"))
    }
    // materialize-and-release (the connectedComponents posture): the
    // localCheckpoint computes the final ranks into their own persisted
    // blocks, after which the sweep-feeding cache is dead — a caller
    // invoking the operator repeatedly in a long-lived session must not
    // accumulate dead edge blocks until LRU pressure evicts them
    val out = ranks.select(col("doc_id"), round(col("rank"), 9).as("pagerank"))
      .localCheckpoint()
    edgesW.unpersist(blocking = true)
    out
  }

  /** Driver-side power iteration over a bounded collected edge list —
    * the same `r' = (1-d)/N + d·Σ r(u)/deg(u)` recurrence as the
    * distributed sweeps, contributions folded in a canonical
    * (sorted-edge) order; the final round(·,9) makes the two paths and
    * the SQL oracle agree despite different summation orders (ranks are
    * O(1/N) — the documented boundary-risk argument). */
  private def localPageRank(
      pairs: DataFrame, iterations: Int, damping: Double): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // widen-to-long is lossless for the integral id types the dispatch
    // admits; the output doc_id is cast back to the input's id type so
    // both dispatch paths return the same schema
    val idType = pairs.schema("a_id").dataType
    val raw = pairs.select(col("a_id").cast("long"), col("b_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = (raw ++ raw.map(_.swap)).sortBy(identity)
    val deg = edges.groupBy(_._1).view.mapValues(_.length).toMap
    val nodes = deg.keySet.toArray.sorted
    val n = nodes.length.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iterations) {
      val contrib = new scala.collection.mutable.HashMap[Long, Double]()
      edges.foreach { case (u, v) =>
        contrib(v) = contrib.getOrElse(v, 0.0) + r(u) / deg(u)
      }
      r = nodes.map(v =>
        v -> ((1.0 - damping) / n + damping * contrib.getOrElse(v, 0.0))).toMap
    }
    nodes.map(v => (v, round9(r(v))))
      .toSeq.toDF("doc_id", "pagerank")
      .withColumn("doc_id", col("doc_id").cast(idType))
  }

  /**
   * PERSONALIZED PageRank: the restart mass returns to a SEED set
   * instead of spreading uniformly — `r'(v) = (1-dmp)·1[v∈S]/|S| +
   * dmp·Σ_{u→v} r(u)/deg(u)` — so the stationary mass measures
   * proximity TO THE SEEDS through the duplicate graph: "what else is
   * transitively near these documents", the expand-a-cluster /
   * find-related-contamination primitive. Seeds outside the edge-induced
   * subgraph are ignored (they have no edges to carry mass).
   *
   * Same fixed-sweep distributed shape as [[pageRank]] — including the
   * size dispatch: below `localEdgeThreshold` (integral ids) the seeded
   * recurrence runs on the driver over the bounded collected edge list
   * (five sequential shuffle sweeps over a few-thousand-row frame is
   * pure scheduling latency). The distributed path's seed set rides as a
   * broadcast-joined flag frame, and the only driver scalar is
   * |S∩members|.
   */
  def personalizedPageRank(
      pairs: DataFrame, seeds: DataFrame,
      iterations: Int = 5, damping: Double = 0.85,
      localEdgeThreshold: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val (p, owned) = persistPairs(pairs)
    if (integralIds(p, "a_id", "b_id") && integralIds(seeds, "doc_id")
        && p.count() <= localEdgeThreshold) {
      val out = localPersonalizedPageRank(p, seeds, iterations, damping)
      if (owned) p.unpersist(blocking = true)
      return out
    }
    val edges = p.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(p.select(col("b_id").as("src"), col("a_id").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesW = edges.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val members = edgesW.select(col("src").as("doc_id")).distinct()
    val seedFlags = members
      .join(seeds.select(col("doc_id")).distinct(), "doc_id")
      .withColumn("__seed", lit(1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nS = seedFlags.count().toDouble
    if (owned) p.unpersist(blocking = false)
    require(nS > 0, "no seed intersects the edge-induced subgraph")
    val base = lit(1.0 - damping) / lit(nS)
    var ranks = members.join(seedFlags, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__seed").isNotNull, lit(1.0) / lit(nS))
          .otherwise(lit(0.0)).as("rank"))
    for (_ <- 1 to iterations) {
      ranks = edgesW
        .join(ranks, edgesW("src") === ranks("doc_id"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("contrib"))
        .join(seedFlags, col("dst") === seedFlags("doc_id"), "left")
        .select(col("dst").as("doc_id"),
          (when(col("__seed").isNotNull, base).otherwise(lit(0.0))
            + lit(damping) * col("contrib")).as("rank"))
    }
    // materialize-and-release: checkpoint the final ranks, then drop the
    // sweep-feeding caches (see pageRank)
    val out = ranks.select(col("doc_id"), round(col("rank"), 9).as("pagerank"))
      .localCheckpoint()
    edgesW.unpersist(blocking = true)
    seedFlags.unpersist(blocking = true)
    out
  }

  /** Driver-side seeded power iteration — [[localPageRank]]'s shape with
    * the restart mass returned to the seed set. The seed frame is
    * intersected with the bounded member list via a distributed semi-join
    * BEFORE collecting (a caller may pass a corpus-sized seed frame; only
    * the ≤2·|pairs| member intersection ever reaches the driver). */
  private def localPersonalizedPageRank(
      pairs: DataFrame, seeds: DataFrame,
      iterations: Int, damping: Double): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val idType = pairs.schema("a_id").dataType
    val raw = pairs.select(col("a_id").cast("long"), col("b_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = (raw ++ raw.map(_.swap)).sortBy(identity)
    val deg = edges.groupBy(_._1).view.mapValues(_.length).toMap
    val nodes = deg.keySet.toArray.sorted
    val membersDf = nodes.toSeq.toDF("__m")
    val seedIds = seeds.select(col("doc_id").cast("long").as("doc_id"))
      .distinct()
      .join(membersDf, col("doc_id") === col("__m"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    require(seedIds.nonEmpty, "no seed intersects the edge-induced subgraph")
    val nS = seedIds.size.toDouble
    var r = nodes.map(v => v -> (if (seedIds(v)) 1.0 / nS else 0.0)).toMap
    for (_ <- 1 to iterations) {
      val contrib = new scala.collection.mutable.HashMap[Long, Double]()
      edges.foreach { case (u, v) =>
        contrib(v) = contrib.getOrElse(v, 0.0) + r(u) / deg(u)
      }
      r = nodes.map(v => v ->
        ((if (seedIds(v)) (1.0 - damping) / nS else 0.0)
          + damping * contrib.getOrElse(v, 0.0))).toMap
    }
    nodes.map(v => (v, round9(r(v))))
      .toSeq.toDF("doc_id", "pagerank")
      .withColumn("doc_id", col("doc_id").cast(idType))
  }

  /**
   * WEIGHTED PageRank over an undirected pair list carrying an edge
   * weight column (`a_id`, `b_id`, `weight`) — for near-dup graphs the
   * weight is the similarity itself (Jaccard/cosine), so rank mass flows
   * preferentially through STRONG duplicate links: the canonical-document
   * signal weighted by how duplicate the neighbors actually are.
   * Same fixed-sweep recurrence with weighted transition probabilities,
   * `r'(v) = (1-dmp)/N + dmp · Σ_{u→v} r(u)·w(u,v)/W(u)` where `W(u)` is
   * u's total incident weight. Same size dispatch as [[pageRank]]: below
   * `localEdgeThreshold` (integral ids) the weighted recurrence runs on
   * the driver over the bounded collected edge list. Above it, one
   * cached weighted-edge frame feeds all sweeps, plan depth linear,
   * round(·,9) on output.
   *
   * Float caveat shared by both paths (and the SQL oracle): each node's
   * incident-weight total `W(u)` and the per-sweep contribution sums are
   * floating-point folds, so the two paths can differ in summation ORDER
   * — the driver path folds in canonical sorted-edge order precisely so
   * its result is deterministic, and the final round(·,9) on O(1/N)
   * magnitudes absorbs the cross-order ulp wobble (the same documented
   * boundary-risk argument as [[pageRank]]).
   */
  def pageRankWeighted(
      pairs: DataFrame, weightCol: String = "weight",
      iterations: Int = 5, damping: Double = 0.85,
      localEdgeThreshold: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val (p, owned) = persistPairs(pairs)
    if (integralIds(p, "a_id", "b_id") && p.count() <= localEdgeThreshold) {
      val out = localPageRankWeighted(p, weightCol, iterations, damping)
      if (owned) p.unpersist(blocking = true)
      return out
    }
    val edges = p.select(col("a_id").as("src"), col("b_id").as("dst"),
        col(weightCol).cast("double").as("w"))
      .union(p.select(col("b_id").as("src"), col("a_id").as("dst"),
        col(weightCol).cast("double").as("w")))
    val wsum = edges.groupBy("src").agg(sum(col("w")).as("wtot"))
    val edgesW = edges.join(wsum, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = edgesW.select(col("src")).distinct().count().toDouble
    if (owned) p.unpersist(blocking = false)
    val base = lit(1.0 - damping) / lit(n)
    var ranks = edgesW.select(col("src").as("doc_id")).distinct()
      .withColumn("rank", lit(1.0) / lit(n))
    for (_ <- 1 to iterations) {
      ranks = edgesW
        .join(ranks, edgesW("src") === ranks("doc_id"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") * col("w") / col("wtot")).as("contrib"))
        .select(col("dst").as("doc_id"),
          (base + lit(damping) * col("contrib")).as("rank"))
    }
    // materialize-and-release: checkpoint, then drop the sweep cache
    val out = ranks.select(col("doc_id"), round(col("rank"), 9).as("pagerank"))
      .localCheckpoint()
    edgesW.unpersist(blocking = true)
    out
  }

  /** Driver-side weighted power iteration — [[localPageRank]]'s shape
    * with w/W(u) transitions, contributions and incident-weight totals
    * folded in canonical (sorted-edge) order. */
  private def localPageRankWeighted(
      pairs: DataFrame, weightCol: String,
      iterations: Int, damping: Double): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val idType = pairs.schema("a_id").dataType
    val raw = pairs.select(col("a_id").cast("long"), col("b_id").cast("long"),
        col(weightCol).cast("double").as("__w"))
      // drop null-cast weights BEFORE collect: the distributed path's
      // aggregates silently skip nulls, so the driver path must too —
      // without this a non-numeric weightCol NPEs here while the same
      // input above the size threshold quietly null-skips
      .filter(col("__w").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val edges = (raw ++ raw.map(t => (t._2, t._1, t._3))).sortBy(identity)
    val wtot = edges.groupBy(_._1).view
      .mapValues(_.foldLeft(0.0)(_ + _._3)).toMap
    val nodes = wtot.keySet.toArray.sorted
    val n = nodes.length.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iterations) {
      val contrib = new scala.collection.mutable.HashMap[Long, Double]()
      edges.foreach { case (u, v, w) =>
        contrib(v) = contrib.getOrElse(v, 0.0) + r(u) * w / wtot(u)
      }
      r = nodes.map(v =>
        v -> ((1.0 - damping) / n + damping * contrib.getOrElse(v, 0.0))).toMap
    }
    nodes.map(v => (v, round9(r(v))))
      .toSeq.toDF("doc_id", "pagerank")
      .withColumn("doc_id", col("doc_id").cast(idType))
  }

  /**
   * Per-node triangle participation over an undirected pair list, plus the
   * degree — together they give the local clustering coefficient
   * `2T / (deg·(deg-1))`, the standard "is this a dense duplicate clique
   * or a hub artifact?" signal for near-dup graphs.
   *
   * Enumeration is the oriented form: pairs already satisfy `a_id < b_id`,
   * so each triangle `a<b<c` is found exactly once by joining
   * `(a,b)⋈(b,c)` and closing with `(a,c)`. Exact integer output — full
   * SQL oracle, no rounding anywhere.
   *
   * Output: `(doc_id, degree, triangles)` for every node that appears in
   * at least one pair.
   */
  def triangleStats(pairs: DataFrame): DataFrame = {
    // five references below (three triangle-join arms + two degree arms):
    // cache the expensive candidate plan once
    val e = pairs.select(col("a_id"), col("b_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ab = e.select(col("a_id").as("ta"), col("b_id").as("tb"))
    val bc = e.select(col("a_id").as("tb"), col("b_id").as("tc"))
    val ac = e.select(col("a_id").as("ta"), col("b_id").as("tc"))
    val tris = ab.join(bc, "tb").join(ac, Seq("ta", "tc"))
    // each triangle contributes once to each of its three corners
    val perNode = tris.select(col("ta").as("doc_id"))
      .union(tris.select(col("tb").as("doc_id")))
      .union(tris.select(col("tc").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("triangles"))
    val deg = e.select(col("a_id").as("doc_id"))
      .union(e.select(col("b_id").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
    // materialize-and-release: the checkpointed result (node-bounded —
    // ≤ 2·|pairs| rows) owns its blocks; the edge cache is dropped so
    // repeated invocations in a long-lived session never accumulate
    val out = deg.join(perNode, Seq("doc_id"), "left")
      .select(col("doc_id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .localCheckpoint()
    e.unpersist(blocking = true)
    out
  }
}
