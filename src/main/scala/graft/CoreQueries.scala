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
    )
  }
}
