package graft

import graft.ops.{Dedup, Relational, TextAnalysis}
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

    // Salted join must be result-identical to the plain join (oracle is
    // the plain SQL join) — demonstrates the skew-mitigation path.
    "q17_salted_join" -> ((s, dir) =>
      Relational.saltedJoin(
        Tables(s, dir, "lineitem").select(col("l_orderkey").as("o_orderkey"),
          col("l_quantity")),
        Tables(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        key = "o_orderkey", saltFactor = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          (sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"))),
  )

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

    "q17_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  cast(sum(cast(round(l_quantity * 100, 0) as bigint)) / 100.0 as double) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
  )
}
