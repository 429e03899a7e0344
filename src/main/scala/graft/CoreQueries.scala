package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Relational query surface. The reference has no query operators of its own
 * (SURVEY.md §2.9) — these exercise the Spark SQL capabilities the engine
 * exposes (scan → filter → join → aggregate → window → top-k) with DuckDB
 * oracle parity.
 *
 * FP determinism rule for oracles: never SUM raw doubles (order-dependent
 * accumulation differs between engines), and never use `round(double, n>0)`
 * cross-engine (Spark rounds the shortest decimal representation via
 * `BigDecimal.valueOf`, DuckDB rounds the true binary value — 2-decimal
 * money products constantly straddle .xx5 boundaries). Instead: money
 * columns carry exactly 2 decimals, so convert to integer cents per row
 * with `round(x*100)` (never near a .5 boundary → both engines agree), do
 * all row arithmetic in exact integers, SUM as long (exact), and divide by
 * the scale at the end — bit-for-bit engine-independent doubles.
 * Helpers: [[cents]] / [[CENTS_SQL]].
 */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Exact integer cents from a 2-decimal money double (deterministic in
    * both engines; see FP determinism rule above). */
  private def cents(c: Column): Column = round(c * 100).cast("long")
  private def centsSql(expr: String) = s"cast(round(($expr) * 100, 0) as bigint)"

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style scan + filter + aggregate (map-side partial agg; the
    // filter and 7-column projection push down to the parquet scan).
    "q1_agg" -> ((s, dir) => {
      val price = cents(col("l_extendedprice"))
      val discPct = lit(100L) - cents(col("l_discount")) // 100*(1-disc)
      val taxPct = lit(100L) + cents(col("l_tax")) // 100*(1+tax)
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"),
          (sum(price) / 100.0).as("sum_base_price"),
          (sum(price * discPct) / 1e4).as("sum_disc_price"),
          (sum(price * discPct * taxPct) / 1e6).as("sum_charge"),
          count(lit(1)).as("count_order"))
    }),

    // Two-join aggregate: orders ⋈ customer (shuffle hash/SMJ on the big
    // sides) ⋈ nation (25 rows — explicitly broadcast). Revenue per nation.
    "q2_join_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          (sum(cents(col("o_totalprice"))) / 100.0).as("total_price"),
          count(lit(1)).as("n_orders"))
    }),

    // Top-k: plans as TakeOrderedAndProject (per-partition heap + driver
    // merge of k rows — no global sort). Deterministic tiebreak on key.
    "q3_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // Window function: top-3 orders per customer by price (rank over
    // partitioned window; single shuffle on o_custkey).
    "q4_window" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 3)
    }),

    // Selective filter + narrow projection: both must reach the parquet
    // scan (PushedFilters + 3-column ReadSchema).
    "q5_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01 00:00:00"))
          && col("l_shipdate") < to_timestamp(lit("1996-01-01 00:00:00"))
          && col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),

    // Event-time tumbling window aggregation (batch form of the streaming
    // surface): per-hour, per-type counts + exact value sums.
    "q6_events_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          (sum(cents(col("value"))) / 100.0).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // Existential subquery as a left-semi join (no row duplication).
    "q7_exists" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders")
        .filter(col("o_totalprice") > 400000.0).select("o_custkey")
      t(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // Set operation: customers holding both an urgent and a low-priority
    // order (INTERSECT = set semantics in both engines).
    "q8_setop" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        .intersect(
          o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey"))
    }),

    // Multi-way join through lineitem with grouped aggregate: supplier
    // revenue by nation (broadcast supplier+nation, shuffle on lineitem).
    "q9_join3" -> ((s, dir) => {
      val price = cents(col("l_extendedprice"))
      val discPct = lit(100L) - cents(col("l_discount"))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "s_name")
        .agg((sum(price * discPct) / 1e4).as("revenue"),
          count(lit(1)).as("n_items"))
    }),
  )

  val oracles: Map[String, String] = {
    val price = centsSql("l_extendedprice")
    val discPct = s"(100 - ${centsSql("l_discount")})"
    val taxPct = s"(100 + ${centsSql("l_tax")})"
    Map(
      "q1_agg" ->
        s"""SELECT l_returnflag, l_linestatus,
          |  cast(sum(${centsSql("l_quantity")}) / 100.0 as double) AS sum_qty,
          |  cast(sum($price) / 100.0 as double) AS sum_base_price,
          |  cast(sum($price * $discPct) / 1e4 as double) AS sum_disc_price,
          |  cast(sum($price * $discPct * $taxPct) / 1e6 as double) AS sum_charge,
          |  count(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus""".stripMargin,

      "q2_join_agg" ->
        s"""SELECT n_name,
          |  cast(sum(${centsSql("o_totalprice")}) / 100.0 as double) AS total_price,
          |  count(*) AS n_orders
          |FROM orders
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name""".stripMargin,

      "q3_topk" ->
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey ASC
          |LIMIT 10""".stripMargin,

      "q4_window" ->
        """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |    rank() OVER (PARTITION BY o_custkey
          |                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
          |  FROM orders)
          |WHERE rnk <= 3""".stripMargin,

      "q5_filter" ->
        """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
          |  AND l_quantity > 45""".stripMargin,

      "q6_events_window" ->
        s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
          |  event_type,
          |  count(*) AS n_events,
          |  cast(sum(${centsSql("value")}) / 100.0 as double) AS sum_value,
          |  count(DISTINCT user_id) AS n_users
          |FROM events
          |GROUP BY 1, 2""".stripMargin,

      "q7_exists" ->
        """SELECT c_custkey, c_name
          |FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders
          |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin,

      "q8_setop" ->
        """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          |INTERSECT
          |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin,

      "q9_join3" ->
        s"""SELECT n_name, s_name,
          |  cast(sum($price * $discPct) / 1e4 as double) AS revenue,
          |  count(*) AS n_items
          |FROM lineitem
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |GROUP BY n_name, s_name""".stripMargin,
    )
  }
}
