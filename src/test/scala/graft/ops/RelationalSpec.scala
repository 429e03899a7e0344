package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("asof join: hand-computed latest-at-or-before semantics") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 12:00:00")),
      (3L, 7L, ts("2024-01-01 09:00:00")), // before any right row -> null
      (4L, 8L, ts("2024-01-01 10:00:00")), // key with no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 09:30:00"), 100L),
      (7L, ts("2024-01-01 12:00:00"), 200L), // equal time: inclusive
    ).toDF("k", "rt", "order_id")
    val res = Relational.asofJoin(left, right,
      "user_id", "k", "ts", "rt", Seq("order_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(res == Map(1L -> 100L, 2L -> 200L, 3L -> -1L, 4L -> -1L))
  }

  test("salted join equals plain join") {
    val l = Seq((1L, "a"), (1L, "b"), (2L, "c"), (2L, "d"), (3L, "e"))
      .toDF("k", "lv")
    val r = Seq((1L, "X"), (2L, "Y")).toDF("k", "rv")
    val plain = l.join(r, "k").select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    val salted = Relational.saltedJoin(l, r, "k", saltFactor = 4)
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 4)
  }

  test("AQE splits a skewed sort-merge join at runtime (no manual salting)") {
    // the documented alternative to saltedJoin: one hot key, thresholds
    // lowered to test-data scale, broadcast disabled so the join is a
    // skew-splittable sort-merge join
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      val pad = "x" * 100
      val facts = ((1 to 20000).map(_ => (1L, pad)) ++
        (2L to 500L).map(k => (k, pad))).toDF("k", "pad")
      val dim = (1L to 500L).map(k => (k, s"v$k")).toDF("k", "v")
      val joined = facts.join(dim, "k")
      assert(joined.collect().length == 20000 + 499)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skewed"), s"expected AQE skew split in plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("deterministic sample: stable across runs, plausible fraction, portable rule") {
    val df = spark.range(10000).toDF("id")
    val s1 = Relational.deterministicSample(df, "id", 13).collect().map(_.getLong(0)).toSet
    val s2 = Relational.deterministicSample(df, "id", 13).collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    val frac = s1.size.toDouble / 10000
    assert(frac > 0.03 && frac < 0.08, s"fraction $frac outside expected band")
    // spot-check the rule: md5 of the decimal string, first two hex chars
    val included = s1.head
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(included.toString.getBytes("UTF-8"))
      .take(1).map("%02x".format(_)).mkString
    assert(hex < "0d")
  }

  test("top tokens: counts and deterministic tiebreak") {
    val df = Seq((1L, "b a a"), (2L, "c b A")).toDF("doc_id", "text")
    val top = Relational.topTokens(df, "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq(("a", 3L), ("b", 2L))) // a=3 (case-folded), b=2
  }

  test("approx cardinality within configured error of exact") {
    val docs = graft.Tables(spark, sf0001, "documents")
    val exact = docs.agg(countDistinct(col("text"))).head().getLong(0)
    val approx = docs.agg(approx_count_distinct(col("text"), 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  test("funnel plans as one user shuffle feeding all three windows plus the stage rollup") {
    val plan = graft.RelationalQueries.all("q30_funnel")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // exchange 1: hashpartitioning(user_id) shared by the three unbounded
    // min-windows AND the per-user aggregate; exchange 2: the tiny final
    // rollup on funnel_stage. Anything more means a window re-shuffled.
    assert(plan.split("Exchange").length - 1 == 2,
      s"expected exactly 2 exchanges:\n$plan")
    assert(plan.split("windowspecdefinition\\(user_id").length - 1 == 3)
  }

  test("approx percentile sketch tracks the exact rank-selected percentiles") {
    def collect3(name: String) =
      graft.RelationalQueries.all(name)(spark, sf001)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = collect3("q29_percentiles")
    val approx = collect3("q34_percentiles_approx")
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    exact.foreach { case (k, (e25, e50, e75)) =>
      val (a25, a50, a75) = approx(k)
      Seq((e25, a25), (e50, a50), (e75, a75)).foreach { case (e, a) =>
        assert(math.abs(a - e) <= 0.02 * math.abs(e) + 1.0,
          s"$k: approx $a deviates from exact $e")
      }
    }
  }

  test("keySkewProfile: exact counts, hot key first, shares sum to selection mass") {
    import spark.implicits._
    val df = (Seq.fill(60)(1L) ++ Seq.fill(25)(2L) ++ Seq.fill(10)(3L)
      ++ Seq(4L, 5L, 6L, 7L, 8L)).toDF("k")
    val got = Relational.keySkewProfile(df, "k", topN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((1L, 60L), (2L, 25L), (3L, 10L)))
    assert(got.map(_._3).toSeq == Seq(0.6, 0.25, 0.1))
    // tie region: keys 4..8 all have count 1 — topN=7 must pick 4,5 by key asc
    val ties = Relational.keySkewProfile(df, "k", topN = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(ties == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("keySkewProfile: empty input yields an empty profile, not an NPE") {
    import spark.implicits._
    // skewStream runs this per micro-batch — an empty batch must emit an
    // empty frame (sum over zero rows is null; the coalesce guard)
    val got = Relational.keySkewProfile(
      Seq.empty[Long].toDF("k"), "k", topN = 3)
    assert(got.columns.toSeq == Seq("key", "n_rows", "share_r"))
    assert(got.count() == 0)
  }

  test("globalRank equals a driver sort at any partitioning; bins are ±1-balanced") {
    import spark.implicits._
    val rng = new java.util.Random(23)
    val rows = (1L to 257L).map(i => (i, rng.nextInt(40).toLong))
    val df = rows.toDF("doc_id", "v")
    val want = rows.sortBy { case (id, v) => (v, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    for (np <- Seq(2, 5, 32)) {
      val got = Relational.globalRank(df,
        Seq(col("v").asc, col("doc_id").asc), numPartitions = np)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == want, s"numPartitions=$np")
    }
    // equal-frequency bins: 257 rows into 10 bins → sizes 25 or 26,
    // ordered by value, deterministic
    val bins = Relational.equalFreqBins(df, "v", "doc_id", nBins = 10)
      .groupBy("bin").agg(count(lit(1)).as("n"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(bins.map(_._1).toSeq == (1 to 10))
    assert(bins.forall(b => b._2 == 25L || b._2 == 26L))
    // bin value ranges are non-decreasing
    assert(bins.sliding(2).forall { case Array(a, b) => a._4 <= b._3 + 40 })
    assert(bins.map(_._3).toSeq == bins.map(_._3).sorted.toSeq)
  }

  test("madOutliers: planted extreme rows gate out, uniform bulk survives") {
    import spark.implicits._
    // group a: tight cluster around 1000 plus two extremes; group b: clean
    val rows = (1 to 20).map(i => ("a", i.toLong, 1000L + i))
      .++(Seq(("a", 98L, 10000L), ("a", 99L, -5000L)))
      .++((1 to 20).map(i => ("b", 100L + i, 500L + i)))
    val df = rows.toDF("grp", "id", "cents")
    val out = Relational.madOutliers(df, "grp", col("cents"), k = 5.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(98L, 99L))
    // median/MAD robustness: the two planted extremes must not drag the
    // group median away from the bulk
    val med = Relational.madOutliers(df, "grp", col("cents"), k = 5.0)
      .select("group_median").head().getDouble(0)
    assert(med > 1000 && med < 1025, s"median $med polluted by outliers")
  }
}
