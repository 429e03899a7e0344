package graft.ops

import graft.functions.{topk, JaroWinkler}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Entity resolution / record linkage: blocked fuzzy matching over string
 * keys — the classic de-duplication step for names, titles, URLs, and
 * source identifiers that exact hashing can't catch (typos, padding,
 * reordered digits).
 *
 * Scale shape: candidate generation is an EQUI-join on a blocking key
 * (nation, host, sorted-token prefix, …), never an all-pairs scan —
 * exactly the banded-LSH posture of [[Dedup]]. Per-probe ranking uses the
 * bounded [[graft.functions.TopKByScore]] heap, so the shuffle after the
 * block join carries at most k entries per probe per partition and the
 * full candidate set is never sorted. At 100 TB the cost is
 * Σ |block(p)| over probes — controlled by the blocking key's selectivity,
 * with the skew remedies of the sink layer (salting a hot block) applying
 * unchanged.
 */
object EntityResolution {

  /** Native Jaro–Winkler similarity column (see
    * [[graft.functions.JaroWinkler]] — DuckDB-matched semantics, real
    * codegen). */
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  /**
   * Blocked fuzzy top-k linkage. Inputs are pre-shaped to the standard
   * columns (callers `select`/alias):
   *
   *  - `probes`:     (`p_id` long, `p_name` string, `block`)
   *  - `candidates`: (`c_id` long, `c_name` string, `block`)
   *
   * Result: (p_id, c_id, jw_r, rnk) — per probe, the `k` candidates in
   * its block with the highest `round(jaro_winkler, 6)`, ties broken by
   * smaller `c_id`; `rnk` is 1-based. `excludeSelf` drops `p_id == c_id`
   * pairs for self-linkage (in-table dedup).
   *
   * The similarity is rounded to 6 dp BEFORE ranking on both the Spark
   * and the oracle side — ranking therefore never depends on sub-1e-6
   * float noise (the same discipline as every `sim_*` retrieval op).
   */
  def fuzzyLink(
      probes: DataFrame, candidates: DataFrame, k: Int,
      excludeSelf: Boolean = false): DataFrame = {
    val joined = probes.join(candidates, "block")
    val pairs = if (excludeSelf) joined.filter(col("p_id") =!= col("c_id"))
                else joined
    pairs
      .select(col("p_id"), col("c_id"),
        round(jaroWinkler(col("p_name"), col("c_name")), 6).as("jw_r"))
      .groupBy("p_id")
      .agg(topk.top_k_by_score(col("jw_r"), col("c_id"), k).as("top"))
      .select(col("p_id"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("p_id"), col("entry.id").as("c_id"),
        col("entry.score").as("jw_r"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  /**
   * Symmetric fuzzy-duplicate pairs inside one table: every in-block pair
   * (a < b by id) whose Jaro–Winkler similarity meets `threshold`.
   * Emits (a_id, b_id, jw_r). The `a < b` predicate halves the join
   * output and canonicalizes pair order; output volume is governed by the
   * blocking key plus the threshold, not by a global sort or window.
   */
  def fuzzyPairs(
      records: DataFrame, threshold: Double): DataFrame = {
    val a = records.select(col("block"),
      col("p_id").as("a_id"), col("p_name").as("a_name"))
    val b = records.select(col("block"),
      col("p_id").as("b_id"), col("p_name").as("b_name"))
    a.join(b, "block")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(jaroWinkler(col("a_name"), col("b_name")), 6).as("jw_r"))
      .filter(col("jw_r") >= threshold)
  }
}
