package graft

import graft.ops.{Dedup, EntityResolution, Relational, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extended relational surface: rollup, as-of join, deterministic
  * sampling, vocabulary top-k, corpus pipeline, cardinality, salted join. */
object RelationalQueries {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ROLLUP grouping sets (priority × status hierarchy + totals).
    "q10_rollup" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          (sum(cents(col("o_totalprice"))) / 100.0).as("total_price"))),

    // As-of join: each event picks up the user's most recent order at or
    // before the event time (union+window formulation — one shuffle).
    "q11_asof_join" -> ((s, dir) => {
      val events = Tables.events(s, dir)
        .select("event_id", "user_id", "ts")
      val w = Window.partitionBy("o_custkey", "o_orderdate")
        .orderBy(col("o_orderkey").desc)
      val uniqOrders = Tables(s, dir, "orders")
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      Relational.asofJoin(events, uniqOrders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        valueCols = Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col("o_orderkey").as("last_orderkey"),
          col("o_totalprice").as("last_totalprice"))
    }),

    // Deterministic md5-bucket sampling (~5.1%), portable across engines.
    "q12_sample" -> ((s, dir) =>
      Relational.deterministicSample(Tables(s, dir, "orders"), "o_orderkey", 13)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    // Vocabulary head: 50 most frequent normalized tokens.
    "q13_top_tokens" -> ((s, dir) =>
      Relational.topTokens(Tables(s, dir, "documents"), "text", 50)),

    // End-to-end corpus pipeline: exact-dedup survivors → language filter
    // → quality filter → clean-corpus projection.
    "q14_corpus_pipeline" -> ((s, dir) => {
      val surv = Dedup.exactSurvivors(Tables(s, dir, "documents"), "doc_id", "text")
      val t = col("text")
      surv
        .withColumn("n_tokens", TextAnalysis.wsTokenCount(t))
        .withColumn("alpha_ratio",
          length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") / length(t))
        .filter(col("lang") === "en" && col("alpha_ratio") >= 0.5
          && col("n_tokens").between(5, 10000))
        .select("doc_id", "lang", "n_tokens")
    }),

    // Exact corpus cardinality (the dedup planning statistic).
    "q15_cardinality" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .agg(countDistinct(col("text")).as("n_unique"),
          count(lit(1)).as("n_rows"))),

    // HLL sketch twin of q15 (no oracle: sketch internals are
    // implementation-defined; ScalaTest bounds the relative error).
    "q16_cardinality_approx" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .agg(approx_count_distinct(col("text"), 0.02).as("n_unique_approx"),
          count(lit(1)).as("n_rows"))),

    // Exact median (interpolating percentile on integer-cents values).
    "q25_median" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg((expr("percentile(cast(round(o_totalprice * 100) as bigint), 0.5)") / 100.0)
          .as("median_price"), count(lit(1)).as("n"))),

    // Correlated aggregate: orders above their customer's average price
    // (window avg over exact integer cents — engine-exact, see scaladoc).
    "q26_above_avg" -> ((s, dir) => {
      val c = cents(col("o_totalprice"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
      Tables(s, dir, "orders")
        .withColumn("__avg", avg(c).over(w))
        .filter(c > col("__avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // Calendar extraction + grouping.
    "q27_dates" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"))),

    // Pivot (conditional-aggregation oracle keeps it engine-portable;
    // na.fill(0) aligns Spark's null-for-empty-cell with SQL count()=0).
    "q21_pivot" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .count().na.fill(0)),

    // Anti join: customers with no orders at all.
    "q22_antijoin" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")),

    // CUBE grouping sets over returnflag × linestatus.
    "q23_cube" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          (sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"))),

    // EXCEPT: customers with an urgent order but no low-priority order.
    "q24_except" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        .except(o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey"))
    }),

    // Explicit GROUPING SETS (priority-only, status-only, grand total) —
    // the general form behind rollup/cube (q10/q23).
    "q28_grouping_sets" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(cents(col("o_totalprice"))) / 100.0).as("total_price"))),

    // Exact discrete percentiles (p25/p50/p75) per priority, computed by
    // explicit rank selection over integer cents — rn = ceil(p·n) with
    // binary-exact p, so the picked rank is engine-reproducible (unlike
    // interpolating quantiles at p∉{0,.5,1}, where the lerp arithmetic
    // differs across engines by an ulp). One window shuffle.
    "q29_percentiles" -> ((s, dir) => {
      val c = cents(col("o_totalprice"))
      val byP = Window.partitionBy("o_orderpriority")
      val ranked = Tables(s, dir, "orders")
        .withColumn("__c", c)
        .withColumn("__rn", row_number().over(
          byP.orderBy(col("__c").asc, col("o_orderkey").asc)))
        .withColumn("__n", count(lit(1)).over(byP))
      def pick(p: Double) =
        max(when(col("__rn") === ceil(col("__n") * p), col("__c"))) / 100.0
      ranked.groupBy("o_orderpriority")
        .agg(pick(0.25).as("p25"), pick(0.5).as("p50"), pick(0.75).as("p75"),
          count(lit(1)).as("n"))
    }),

    // Funnel analysis on the event stream: per user, the deepest
    // view→click→purchase stage reached IN ORDER, each step within 2 days
    // of the previous one (the conversion-window form — unbounded steps
    // degenerate to "did all three ever happen"). Three unbounded
    // min-windows over the same user partition — a single shuffle, no sort
    // (unbounded frames), group size bounded by per-user event count.
    "q30_funnel" -> ((s, dir) => {
      val e = Tables.events(s, dir).select("user_id", "event_type", "ts")
      val w = Window.partitionBy("user_id")
      val step = expr("INTERVAL 2 DAYS")
      val s1 = e.withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      val s2 = s1.withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") > col("t1")
          && col("ts") <= col("t1") + step, col("ts"))).over(w))
      val s3 = s2.withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") > col("t2")
          && col("ts") <= col("t2") + step, col("ts"))).over(w))
      s3.groupBy("user_id")
        .agg(max(when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1).otherwise(0)).as("funnel_stage"))
        .groupBy("funnel_stage").agg(count(lit(1)).as("n_users"))
    }),

    // Weekly cohort retention: cohort = a user's first active epoch-week;
    // n_users = distinct users from that cohort active k weeks later.
    // Integer epoch-week arithmetic end-to-end; two aggregations
    // co-partitioned on user_id plus the final rollup.
    "q31_retention" -> ((s, dir) => {
      val wk = Tables.events(s, dir).select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 604800).cast("long").as("week"))
      val coh = wk.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
      wk.distinct().join(coh, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // Click-to-view attribution: every (click, view) pair by the same user
    // with the view at most 10 minutes before the click. Equi-join on
    // user_id (sort-merge/shuffle-hash — the range condition is a post-join
    // filter, NOT a broadcast-nested-loop) — the batch twin of the
    // streaming interval join in streaming/EventStream.
    "q32_attribution" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      val k = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      k.join(v, Seq("user_id"))
        .filter(col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 10 MINUTES"))
        .select(col("user_id"), col("click_id"), col("view_id"),
          (unix_timestamp(col("click_ts")) - unix_timestamp(col("view_ts")))
            .as("delta_s"))
    }),

    // TPC-H Q5-shaped 5-table star: revenue by region×nation over a date
    // window. The fact chain (lineitem⋈orders⋈customer) shuffles on its
    // keys; the two dimension tables ride along as explicit broadcasts —
    // the canonical large-join topology Catalyst should (and does) plan
    // with the fact side streaming.
    "q36_star5" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate").between("1995-01-01", "1996-12-31"))
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_items"),
          (sum(cents(col("l_extendedprice"))) / 100.0).as("revenue"))
    }),

    // Per-user 3σ outlier detection over event values: one unbounded
    // window for the exact-integer-cents moments (n, Σ, Σ²), then the
    // DIVISION-MINIMAL predicate (x−μ)² > 9·σ² — mean/variance come from
    // one fixed double op sequence over exact integers, no sqrt, so the
    // comparison is engine-exact. Users with < 10 events are skipped
    // (moments too noisy to flag anything).
    "q35_anomalies" -> ((s, dir) => {
      val c = round(col("value") * 100).cast("long")
      val w = Window.partitionBy("user_id")
      val e = Tables.events(s, dir)
        .withColumn("__c", c)
        .withColumn("__n", count(lit(1)).over(w))
        .withColumn("__s", sum(col("__c")).over(w))
        .withColumn("__s2", sum(col("__c") * col("__c")).over(w))
      val mean = col("__s").cast("double") / col("__n")
      val variance = (col("__s2").cast("double") - col("__s").cast("double") * col("__s") / col("__n")) / col("__n")
      val dev = col("__c").cast("double") - mean
      e.filter(col("__n") >= 10 && dev * dev > lit(9.0) * variance)
        .select(col("event_id"), col("user_id"), col("value"))
    }),

    // Rolling 7-day spend per customer: RANGE-frame window over integer
    // epoch-days (peers at the same day share the frame in both engines).
    // One shuffle on the customer key; frame arithmetic is exact cents.
    "q33_rolling" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date")).as("day"),
        cents(col("o_totalprice")).as("__c"))
      val w = Window.partitionBy("o_custkey").orderBy(col("day"))
        .rangeBetween(-6, 0)
      o.withColumn("__roll", sum(col("__c")).over(w))
        .select(col("o_orderkey"), col("o_custkey"), col("day"),
          (col("__roll") / 100.0).as("rolling7"))
    }),

    // Sketch twin of q29 (t-digest/Greenwald-Khanna style approx
    // percentiles). No oracle: sketch internals are implementation-defined;
    // RelationalSpec bounds the rank error against the exact q29 values.
    "q34_percentiles_approx" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          (element_at(percentile_approx(cents(col("o_totalprice")),
            typedlit(Seq(0.25, 0.5, 0.75)), lit(10000)), 1) / 100.0).as("p25_approx"),
          (element_at(percentile_approx(cents(col("o_totalprice")),
            typedlit(Seq(0.25, 0.5, 0.75)), lit(10000)), 2) / 100.0).as("p50_approx"),
          (element_at(percentile_approx(cents(col("o_totalprice")),
            typedlit(Seq(0.25, 0.5, 0.75)), lit(10000)), 3) / 100.0).as("p75_approx"),
          count(lit(1)).as("n"))),

    // Salted join must be result-identical to the plain join (oracle is
    // the plain SQL join) — demonstrates the skew-mitigation path. The
    // salt factor sizes to the skew being split: 4 covers this uniform
    // demo (replication cost is linear in the factor; crank it only for
    // genuinely dominant keys).
    "q17_salted_join" -> ((s, dir) =>
      Relational.saltedJoin(
        Tables(s, dir, "lineitem").select(col("l_orderkey").as("o_orderkey"),
          col("l_quantity")),
        Tables(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        key = "o_orderkey", saltFactor = 4)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          (sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"))),

    // ------------------------------------------------- entity resolution
    // Cross-source record linkage: per probe customer, the best
    // Jaro-Winkler supplier-name match inside its nation BLOCK. Candidate
    // generation is the block equi-join (the ER analogue of LSH banding —
    // never all-pairs), ranking is the bounded top-k heap; the native
    // codegen'd jaro_winkler expression matches DuckDB's semantics
    // exactly, so the full pipeline hash-checks against the SQL oracle.
    "er_link_suppliers" -> ((s, dir) =>
      EntityResolution.fuzzyLink(
        Tables(s, dir, "customer").filter(col("c_custkey") < 100)
          .select(col("c_custkey").as("p_id"), col("c_name").as("p_name"),
            col("c_nationkey").as("block")),
        Tables(s, dir, "supplier")
          .select(col("s_suppkey").as("c_id"), col("s_name").as("c_name"),
            col("s_nationkey").as("block")),
        k = 1)),

    // Edit-distance candidate generation: in-block pairs within
    // Levenshtein distance 2, via the threshold-bounded kernel (banded
    // DP with early abandon — the bound keeps per-pair cost flat at
    // scale). Exact integers: no rounding anywhere in the oracle compare.
    "er_edit_candidates" -> ((s, dir) => {
      val custs = Tables(s, dir, "customer")
        .select(col("c_custkey").as("p_id"), col("c_name").as("p_name"),
          col("c_nationkey").as("block"))
      EntityResolution.editCandidates(
        custs.filter(col("p_id") < 100),
        custs.select(col("p_id").as("c_id"), col("p_name").as("c_name"),
          col("block")),
        maxDist = 2, excludeSelf = true)
    }),

    // Transposition-aware candidates: unrestricted Damerau-Levenshtein
    // prices the commonest keying error (adjacent swap) at 1, so
    // digit-swapped ids survive a threshold plain Levenshtein rejects.
    "er_dl_candidates" -> ((s, dir) => {
      val custs = Tables(s, dir, "customer")
        .select(col("c_custkey").as("p_id"), col("c_name").as("p_name"),
          col("c_nationkey").as("block"))
      EntityResolution.dlCandidates(
        custs.filter(col("p_id") < 100),
        custs.select(col("p_id").as("c_id"), col("p_name").as("c_name"),
          col("block")),
        maxDist = 2, excludeSelf = true)
    }),

    // Robust per-priority price outliers: median/MAD gate over integer
    // cents — every intermediate (half/quarter cents) is binary-exact, so
    // the verdict needs NO rounding on either engine.
    "q38_mad_outliers" -> ((s, dir) =>
      Relational.madOutliers(Tables(s, dir, "orders"), "o_orderpriority",
        cents(col("o_totalprice")), k = 1.8)
        .select("o_orderkey", "o_orderpriority", "o_totalprice",
          "group_median", "group_mad")),

    // Key-skew profile on the event stream's user key: the 50 hottest
    // keys with exact counts and corpus share — the measurement read
    // before salting a join/write on that key (the sink layer's
    // measure-then-rebalance loop as a query).
    "q37_key_skew" -> ((s, dir) =>
      Relational.keySkewProfile(Tables.events(s, dir), "user_id", topN = 50)),

    // Equal-frequency length deciles over documents (exact integer rank
    // transform — the deterministic ntile for length-stratified mixing),
    // reported as per-bin composition stats.
    "q39_length_deciles" -> ((s, dir) =>
      Relational.equalFreqBins(Tables(s, dir, "documents")
        .select("doc_id", "n_chars"), "n_chars", "doc_id", nBins = 10)
        .groupBy("bin").agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))),

    // EXACT per-priority median order price (cents) at sketch cost: a
    // per-group log-bucket rank histogram (exact bucket counts, O(1/ln γ)
    // state) proposes the bucket holding rank ⌈n/2⌉, one exact keyed
    // re-count inside the proposed window returns the true rank value —
    // never per-distinct-value aggregation state (what percentile()
    // builds per group), so the shape survives 100 TB.
    "q40_sketch_median" -> ((s, dir) =>
      Relational.sketchQuantile(
        Tables(s, dir, "orders").select(col("o_orderpriority"),
          cents(col("o_totalprice")).as("price_cents")),
        "o_orderpriority", "price_cents", p = 0.5, outCol = "median_cents")),

    // Same lane at p = 0.9 over a second table/domain (doc lengths per
    // language) — the tail-quantile shape admission filters run.
    "q41_sketch_p90" -> ((s, dir) =>
      Relational.sketchQuantile(
        Tables(s, dir, "documents").select("lang", "n_chars"),
        "lang", "n_chars", p = 0.9, outCol = "p90_chars")),

    // The quantile VECTOR from one sketch build: p25/p50/p95 per priority
    // out of the same two passes q40 spends on a single p — the
    // admission-dashboard shape (several exact tail points per group).
    "q42_sketch_quantiles" -> ((s, dir) =>
      Relational.sketchQuantiles(
        Tables(s, dir, "orders").select(col("o_orderpriority"),
          cents(col("o_totalprice")).as("price_cents")),
        "o_orderpriority", "price_cents", ps = Seq(0.25, 0.5, 0.95))),

    // The PERSISTED-STATE twin of q42: the histogram is maintained across
    // three distributed appends (bucket-add is associative, so the stored
    // state is bit-identical to sketching the union directly — spec-
    // asserted), then the exact read proposes targets from the STATE with
    // no sketch build and verifies over the corpus. Row-identical to q42
    // by construction — shares its oracle.
    "q43_quantiles_state" -> ((s, dir) => {
      val path = java.nio.file.Files
        .createTempDirectory("graft_qstate").toString
      val orders = Tables(s, dir, "orders").select(col("o_orderpriority"),
        cents(col("o_totalprice")).as("price_cents"))
      Relational.writeQuantileState(
        orders.filter(col("price_cents") % 3 === 0),
        "o_orderpriority", "price_cents", path)
      Relational.appendToQuantileState(
        orders.filter(col("price_cents") % 3 === 1), path)
      Relational.appendToQuantileState(
        orders.filter(col("price_cents") % 3 === 2), path)
      Relational.quantilesFromState(orders, path, Seq(0.25, 0.5, 0.95))
    }),

    // WEIGHTED quantiles: the price level below which half / 90% of
    // shipped QUANTITY lies, per return flag — rank over weight mass,
    // the universe mixing/packing decisions live in. Integer quantities
    // keep every cumulative exactly representable.
    "q44_weighted_quantile" -> ((s, dir) =>
      Relational.sketchQuantilesWeighted(
        Tables(s, dir, "lineitem").select(col("l_returnflag"),
          cents(col("l_extendedprice")).as("price_cents"),
          col("l_quantity").cast("long").as("qty")),
        "l_returnflag", "price_cents", "qty", ps = Seq(0.5, 0.9))),

    // Sorted-neighborhood blocking over customer names: each record
    // scored against its 3 successors in global (name, id) sort order —
    // the linear-cost candidate scheme for records sharing no clean
    // blocking key. Global ranks via range-repartition + per-partition
    // offsets (no single-partition sort anywhere).
    "er_sorted_neighborhood" -> ((s, dir) => {
      EntityResolution.sortedNeighborhood(
        Tables(s, dir, "customer")
          .select(col("c_custkey").as("p_id"), col("c_name").as("p_name")),
        window = 3, threshold = 0.9)
    }),

    // Vector-space linkage over part names: token TF-IDF cosine via the
    // inverted token index — catches reordered-token matches the edit
    // family rejects, rare shared tokens dominate. Probe side pruned
    // below the join; one driver scalar (corpus count) only.
    "er_tfidf_candidates" -> ((s, dir) => {
      EntityResolution.tfidfCandidates(
        Tables(s, dir, "part"), "p_partkey", "p_name",
        threshold = 0.7, probePred = col("p_id") < 100)
    }),

    // BLOCKING-FREE edit join (Pass-Join pigeonhole segments): no nation
    // key anywhere — candidates come from the segment-signature equi-join,
    // exact threshold-levenshtein verify makes the result identical to
    // the all-pairs join, which is exactly what the oracle runs.
    "er_edit_join" -> ((s, dir) => {
      val custs = Tables(s, dir, "customer")
        .select(col("c_custkey").as("p_id"), col("c_name").as("p_name"))
      EntityResolution.editJoin(
        custs.filter(col("p_id") < 100),
        custs.select(col("p_id").as("c_id"), col("p_name").as("c_name")),
        maxDist = 2, excludeSelf = true)
    }),

    // In-table fuzzy dedup: top-3 closest same-nation customer names per
    // probe (self excluded) — the name-survivorship candidate list an ER
    // merge step consumes.
    "er_dedup_names" -> ((s, dir) => {
      val custs = Tables(s, dir, "customer")
        .select(col("c_custkey").as("p_id"), col("c_name").as("p_name"),
          col("c_nationkey").as("block"))
      EntityResolution.fuzzyLink(
        custs.filter(col("p_id") < 100),
        custs.select(col("p_id").as("c_id"), col("p_name").as("c_name"),
          col("block")),
        k = 3, excludeSelf = true)
    }),
  )

  private val SketchQuantilesSql =
    """WITH r AS (
      |  SELECT o_orderpriority,
      |    cast(round(o_totalprice * 100, 0) as bigint) AS v,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY cast(round(o_totalprice * 100, 0) as bigint)) AS rn,
      |    count(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM orders),
      |p AS (SELECT unnest([0.25, 0.5, 0.95]) AS p)
      |SELECT r.o_orderpriority, p.p AS p, r.v AS quantile
      |FROM r JOIN p ON r.rn = cast(ceil(r.n * p.p) as bigint)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q10_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
        |  cast(sum(cast(round(o_totalprice * 100, 0) as bigint)) / 100.0 as double) AS total_price
        |FROM orders
        |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin,

    "q11_asof_join" ->
      """WITH ru AS (
        |  SELECT * FROM (
        |    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                         ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT e.event_id, e.user_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |  ru.o_orderkey AS last_orderkey,
        |  ru.o_totalprice AS last_totalprice
        |FROM events e
        |ASOF LEFT JOIN ru
        |  ON e.user_id = ru.o_custkey AND e.ts >= ru.o_orderdate""".stripMargin,

    "q12_sample" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE substr(md5(cast(o_orderkey as varchar)), 1, 2) < '0d'""".stripMargin,

    "q13_top_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents)
        |WHERE token != ''
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 50""".stripMargin,

    "q14_corpus_pipeline" ->
      """WITH surv AS (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |f AS (
        |  SELECT d.doc_id, d.lang,
        |    len(regexp_split_to_array(trim(d.text), '\s+')) AS n_tokens,
        |    cast(length(regexp_replace(d.text, '[^A-Za-z]', '', 'g')) as double)
        |      / length(d.text) AS alpha_ratio
        |  FROM documents d JOIN surv USING (doc_id))
        |SELECT doc_id, lang, n_tokens FROM f
        |WHERE lang = 'en' AND alpha_ratio >= 0.5
        |  AND n_tokens BETWEEN 5 AND 10000""".stripMargin,

    "q15_cardinality" ->
      """SELECT count(DISTINCT text) AS n_unique, count(*) AS n_rows
        |FROM documents""".stripMargin,

    "q25_median" ->
      """SELECT o_orderpriority,
        |  cast(quantile_cont(cast(round(o_totalprice * 100, 0) as bigint), 0.5) / 100.0 as double) AS median_price,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q26_above_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT *, avg(cast(round(o_totalprice * 100, 0) as bigint))
        |    OVER (PARTITION BY o_custkey) AS avgc
        |  FROM orders)
        |WHERE cast(round(o_totalprice * 100, 0) as bigint) > avgc""".stripMargin,

    "q27_dates" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "q21_pivot" ->
      """SELECT o_orderstatus,
        |  count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS "1-URGENT",
        |  count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS "2-HIGH",
        |  count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS "3-MEDIUM",
        |  count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS "4-NOT SPECIFIED",
        |  count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q22_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q23_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  cast(sum(cast(round(l_quantity * 100, 0) as bigint)) / 100.0 as double) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q24_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin,

    "q28_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
        |  cast(sum(cast(round(o_totalprice * 100, 0) as bigint)) / 100.0 as double) AS total_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin,

    // ceil(p·n) with binary-exact p (0.25/0.5/0.75) and exact-integer n is
    // reproducible; DuckDB's n*0.25 is DECIMAL arithmetic (exact), Spark's
    // is double (exact: n < 2^52) — both ceil to the same integer rank
    "q29_percentiles" ->
      """WITH r AS (
        |  SELECT o_orderpriority,
        |    cast(round(o_totalprice * 100, 0) as bigint) AS c,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY cast(round(o_totalprice * 100, 0) as bigint) ASC,
        |               o_orderkey ASC) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority,
        |  cast(max(CASE WHEN rn = cast(ceil(n * 0.25) as bigint) THEN c END) / 100.0 as double) AS p25,
        |  cast(max(CASE WHEN rn = cast(ceil(n * 0.5) as bigint) THEN c END) / 100.0 as double) AS p50,
        |  cast(max(CASE WHEN rn = cast(ceil(n * 0.75) as bigint) THEN c END) / 100.0 as double) AS p75,
        |  cast(count(*) as bigint) AS n
        |FROM r GROUP BY o_orderpriority""".stripMargin,

    "q30_funnel" ->
      """WITH w1 AS (
        |  SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |w2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
        |      AND ts <= t1 + INTERVAL 2 DAY THEN ts END)
        |    OVER (PARTITION BY user_id) AS t2
        |  FROM w1),
        |w3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
        |      AND ts <= t2 + INTERVAL 2 DAY THEN ts END)
        |    OVER (PARTITION BY user_id) AS t3
        |  FROM w2),
        |u AS (
        |  SELECT user_id,
        |    max(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |             WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS funnel_stage
        |  FROM w3 GROUP BY user_id)
        |SELECT funnel_stage, cast(count(*) as bigint) AS n_users
        |FROM u GROUP BY funnel_stage""".stripMargin,

    "q31_retention" ->
      """WITH wk AS (
        |  SELECT user_id,
        |    (floor(epoch(ts))::BIGINT) // 604800 AS week
        |  FROM events),
        |coh AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, week FROM wk)
        |SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
        |  cast(count(*) as bigint) AS n_users
        |FROM act a JOIN coh c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "q36_star5" ->
      """SELECT r_name, n_name, count(*) AS n_items,
        |  cast(sum(cast(round(l_extendedprice * 100, 0) as bigint)) / 100.0 as double) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        |GROUP BY r_name, n_name""".stripMargin,

    // moments are exact-integer window sums; mean/variance/deviation are
    // ONE fixed double op sequence — identical in both engines, and the
    // squared-form predicate avoids sqrt entirely
    "q35_anomalies" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value,
        |    cast(round(value * 100, 0) as bigint) AS c,
        |    count(*) OVER (PARTITION BY user_id) AS n,
        |    cast(sum(cast(round(value * 100, 0) as bigint))
        |      OVER (PARTITION BY user_id) as bigint) AS s,
        |    cast(sum(cast(round(value * 100, 0) as bigint)
        |             * cast(round(value * 100, 0) as bigint))
        |      OVER (PARTITION BY user_id) as bigint) AS s2
        |  FROM events)
        |SELECT event_id, user_id, value FROM e
        |WHERE n >= 10
        |  AND (cast(c as double) - cast(s as double) / n)
        |      * (cast(c as double) - cast(s as double) / n)
        |    > 9.0 * ((cast(s2 as double) - cast(s as double) * s / n) / n)""".stripMargin,

    // RANGE frame peers-at-same-day semantics are SQL-standard; sum is
    // exact integer cents divided once at the end
    "q33_rolling" ->
      """SELECT o_orderkey, o_custkey,
        |  cast(datediff('day', DATE '1970-01-01', o_orderdate) as int) AS day,
        |  cast(sum(cast(round(o_totalprice * 100, 0) as bigint)) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0 as double)
        |    AS rolling7
        |FROM orders""".stripMargin,

    "q32_attribution" ->
      """SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id,
        |  floor(epoch(c.ts))::BIGINT - floor(epoch(v.ts))::BIGINT AS delta_s
        |FROM events c JOIN events v
        |  ON c.user_id = v.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE""".stripMargin,

    "q17_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  cast(sum(cast(round(l_quantity * 100, 0) as bigint)) / 100.0 as double) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    // DuckDB's jaro_winkler_similarity IS the reference for the native
    // expression (semantics pinned empirically — StringSimilarity.scala);
    // sim rounded to 6 dp BEFORE ranking on both sides, ties by c_id.
    "er_link_suppliers" ->
      """WITH p AS (
        |  SELECT c_custkey AS p_id, c_name AS p_name, c_nationkey AS blk
        |  FROM customer WHERE c_custkey < 100),
        |c AS (
        |  SELECT s_suppkey AS c_id, s_name AS c_name, s_nationkey AS blk
        |  FROM supplier),
        |s AS (
        |  SELECT p_id, c_id,
        |    round(jaro_winkler_similarity(p_name, c_name), 6) AS jw_r
        |  FROM p JOIN c ON p.blk = c.blk),
        |r AS (
        |  SELECT p_id, c_id, jw_r,
        |    row_number() OVER (PARTITION BY p_id
        |                       ORDER BY jw_r DESC, c_id ASC) AS rnk
        |  FROM s)
        |SELECT p_id, c_id, jw_r, rnk FROM r WHERE rnk <= 1""".stripMargin,

    "er_dedup_names" ->
      """WITH cu AS (
        |  SELECT c_custkey AS id, c_name AS name, c_nationkey AS blk
        |  FROM customer),
        |s AS (
        |  SELECT a.id AS p_id, b.id AS c_id,
        |    round(jaro_winkler_similarity(a.name, b.name), 6) AS jw_r
        |  FROM cu a JOIN cu b ON a.blk = b.blk AND a.id != b.id
        |  WHERE a.id < 100),
        |r AS (
        |  SELECT p_id, c_id, jw_r,
        |    row_number() OVER (PARTITION BY p_id
        |                       ORDER BY jw_r DESC, c_id ASC) AS rnk
        |  FROM s)
        |SELECT p_id, c_id, jw_r, rnk FROM r WHERE rnk <= 3""".stripMargin,

    "er_edit_candidates" ->
      """WITH cu AS (
        |  SELECT c_custkey AS id, c_name AS name, c_nationkey AS blk
        |  FROM customer)
        |SELECT a.id AS p_id, b.id AS c_id,
        |  cast(levenshtein(a.name, b.name) AS int) AS dist
        |FROM cu a JOIN cu b ON a.blk = b.blk AND a.id != b.id
        |WHERE a.id < 100 AND levenshtein(a.name, b.name) <= 2""".stripMargin,

    // DuckDB's damerau_levenshtein is the UNRESTRICTED variant — pinned
    // by Monte Carlo (StringSimilarity.scala); exact integers, no rounding
    "er_dl_candidates" ->
      """WITH cu AS (
        |  SELECT c_custkey AS id, c_name AS name, c_nationkey AS blk
        |  FROM customer)
        |SELECT a.id AS p_id, b.id AS c_id,
        |  cast(damerau_levenshtein(a.name, b.name) AS int) AS dist
        |FROM cu a JOIN cu b ON a.blk = b.blk AND a.id != b.id
        |WHERE a.id < 100 AND damerau_levenshtein(a.name, b.name) <= 2""".stripMargin,

    // integer-cents medians interpolate to exact halves/quarters — the
    // whole pipeline is binary-exact, no rounding
    "q38_mad_outliers" ->
      """WITH v AS (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice,
        |    cast(round(o_totalprice * 100) AS double) AS vv
        |  FROM orders
        |), med AS (
        |  SELECT o_orderpriority, median(vv) AS med FROM v GROUP BY 1
        |), d AS (
        |  SELECT v.o_orderkey, v.o_orderpriority, v.o_totalprice,
        |    med.med, abs(v.vv - med.med) AS dev
        |  FROM v JOIN med USING (o_orderpriority)
        |), mad AS (
        |  SELECT o_orderpriority, median(dev) AS mad FROM d GROUP BY 1)
        |SELECT d.o_orderkey, d.o_orderpriority, d.o_totalprice,
        |  d.med AS group_median, mad.mad AS group_mad
        |FROM d JOIN mad USING (o_orderpriority)
        |WHERE d.dev > 1.8 * mad.mad""".stripMargin,

    // exact counts, (count desc, key asc) selection, single rounded
    // division for the share
    "q37_key_skew" ->
      """WITH c AS (
        |  SELECT user_id AS key, count(*) AS n_rows FROM events GROUP BY user_id),
        |t AS (SELECT cast(count(*) AS double) AS tot FROM events)
        |SELECT key, n_rows, round(n_rows / (SELECT tot FROM t), 6) AS share_r
        |FROM c ORDER BY n_rows DESC, key ASC LIMIT 50""".stripMargin,

    // bin = ((rank-1)*10) // n + 1 — pure integer arithmetic; the
    // (n_chars, doc_id) total order makes the rank engine-independent
    "q39_length_deciles" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rank
        |  FROM documents),
        |t AS (SELECT count(*) AS n FROM documents),
        |b AS (
        |  SELECT doc_id, n_chars,
        |    cast(((rank - 1) * 10) // (SELECT n FROM t) AS int) + 1 AS bin
        |  FROM r)
        |SELECT bin, count(*) AS n_docs, min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars
        |FROM b GROUP BY bin""".stripMargin,

    // the engine's sketch lane returns the EXACT value at rank ⌈p·n⌉
    // ascending (percentileFilter's rank convention), so the plain
    // window formulation IS the oracle — ties share the value, making
    // the rank-r value well-defined under any tie order
    "q40_sketch_median" ->
      """WITH r AS (
        |  SELECT o_orderpriority,
        |    cast(round(o_totalprice * 100, 0) as bigint) AS v,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY cast(round(o_totalprice * 100, 0) as bigint)) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, v AS median_cents FROM r
        |WHERE rn = cast(ceil(n * 0.5) as bigint)""".stripMargin,

    "q41_sketch_p90" ->
      """WITH r AS (
        |  SELECT lang, cast(n_chars as bigint) AS v,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT lang, v AS p90_chars FROM r
        |WHERE rn = cast(ceil(n * 0.9) as bigint)""".stripMargin,

    // weighted rank: smallest value whose cumulative ascending weight
    // reaches ceil(p*W) — per-distinct-value weight sums first, so ties
    // are well-defined in both engines
    "q44_weighted_quantile" ->
      """WITH d AS (
        |  SELECT l_returnflag,
        |    cast(round(l_extendedprice * 100, 0) as bigint) AS v,
        |    sum(cast(l_quantity as bigint)) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, v, w,
        |    sum(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM d),
        |p AS (SELECT unnest([0.5, 0.9]) AS p)
        |SELECT c.l_returnflag, p.p AS p, c.v AS quantile
        |FROM c JOIN p
        |  ON c.cum >= cast(ceil(c.tot * p.p) as bigint)
        | AND c.cum - c.w < cast(ceil(c.tot * p.p) as bigint)""".stripMargin,

    "q42_sketch_quantiles" -> SketchQuantilesSql,
    // q43 maintains the same histogram incrementally and reads the same
    // exact quantiles — row-identical to q42 by construction
    "q43_quantiles_state" -> SketchQuantilesSql,

    // the global sort rank is engine-independent ((name, id) is a total
    // order), so row_number + rank-distance join IS the oracle
    "er_sorted_neighborhood" ->
      """WITH r AS (
        |  SELECT c_custkey AS id, c_name AS name,
        |    row_number() OVER (ORDER BY c_name, c_custkey) AS rank
        |  FROM customer)
        |SELECT a.id AS a_id, b.id AS b_id,
        |  cast(b.rank - a.rank AS int) AS dist,
        |  round(jaro_winkler_similarity(a.name, b.name), 6) AS jw_r
        |FROM r a JOIN r b ON b.rank - a.rank BETWEEN 1 AND 3
        |WHERE round(jaro_winkler_similarity(a.name, b.name), 6) >= 0.9""".stripMargin,

    // the same tf·ln(N/df) weights and cosine, ln() matching MathLn
    // bit-for-bit (the BM25-verified libm fact); round(·,6) before the
    // threshold on both sides
    "er_tfidf_candidates" ->
      """WITH toks AS (
        |  SELECT p_partkey AS id,
        |    unnest(string_split(
        |      regexp_replace(lower(trim(p_name)), '\s+', ' ', 'g'), ' ')) AS token
        |  FROM part
        |), tf AS (
        |  SELECT id, token, count(*) AS tf FROM toks
        |  WHERE token != '' GROUP BY id, token
        |), dfreq AS (
        |  SELECT token, count(*) AS df FROM tf GROUP BY token
        |), n AS (SELECT cast(count(*) AS double) AS c FROM part
        |), w AS (
        |  SELECT tf.id, tf.token,
        |    tf.tf * ln((SELECT c FROM n) / cast(dfreq.df AS double)) AS w
        |  FROM tf JOIN dfreq ON tf.token = dfreq.token
        |), nrm AS (
        |  SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY id)
        |SELECT a.id AS p_id, b.id AS c_id,
        |  round(sum(a.w * b.w) / (na.nrm * nb.nrm), 6) AS cos_r
        |FROM w a JOIN w b ON a.token = b.token AND a.id != b.id
        |JOIN nrm na ON na.id = a.id
        |JOIN nrm nb ON nb.id = b.id
        |WHERE a.id < 100
        |GROUP BY a.id, b.id, na.nrm, nb.nrm
        |HAVING round(sum(a.w * b.w) / (na.nrm * nb.nrm), 6) >= 0.7""".stripMargin,

    // lossless filter + exact verify ⇒ the brute-force all-pairs SQL is
    // the oracle for the segment-signature plan
    "er_edit_join" ->
      """WITH cu AS (SELECT c_custkey AS id, c_name AS name FROM customer)
        |SELECT a.id AS p_id, b.id AS c_id,
        |  cast(levenshtein(a.name, b.name) AS int) AS dist
        |FROM cu a JOIN cu b ON a.id != b.id
        |WHERE a.id < 100 AND levenshtein(a.name, b.name) <= 2""".stripMargin,
  )
}
