package graft

/**
 * Whole-surface scale guardrail: every registered query's physical plan is
 * swept for `CartesianProduct` — the one operator shape that cannot
 * survive a 100× scale-up (all-pairs cost with no bucketing). The ONLY
 * plans allowed to carry one are the explicitly-labeled exact-oracle
 * twins/baselines, whose role is to hash-verify the bucketed variants at
 * small SF (see COVERAGE.md). A new query that accidentally introduces an
 * unbucketed join — or a refactor that drops a join key and silently
 * degrades a hash join into a cartesian — fails here by name.
 *
 * Broadcast nested-loop joins are NOT flagged: a BNLJ's small side is
 * broadcast-bounded by construction (the containment/decontamination
 * pattern: benchmark-side broadcast, the corpus never shuffles), which is
 * exactly the documented 100 TB shape for those operators.
 */
class PlanShapeSweepSpec extends SparkSpec {

  /** Labeled exact twins and baselines — the documented cartesian carriers:
    * brute-force/heap/int8 top-k and exact embedding pairs (COVERAGE.md
    * "labeled exact-scoring baseline" rows). */
  private val cartesianAllowed = Set(
    "sim_topk_bruteforce", "sim_topk_heap", "sim_topk_int8",
    "dedup_embedding_pairs")

  test("no unlabeled CartesianProduct anywhere in the query surface") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if cartesianAllowed(name) => None
      case (name, fn) =>
        try {
          val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct"))
            Some(s"$name plans a CartesianProduct")
          else None
        } catch {
          case e: Throwable =>
            Some(s"$name failed to plan: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the allowlist is tight: each listed twin really is cartesian") {
    // if a twin is later rewritten bucketed, it must leave the allowlist —
    // a stale allowlist would mask a future regression under its name
    cartesianAllowed.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin"),
        s"$name no longer plans all-pairs; remove it from the allowlist")
    }
  }
}
