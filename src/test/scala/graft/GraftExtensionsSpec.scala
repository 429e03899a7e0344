package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("GraftExtensions injection installs the SQL functions in a fresh session") {
    val base = spark // materialize the shared context first
    // spark.sql.extensions is STATIC conf — read from the SparkContext at
    // first-session creation, so it cannot be exercised on the suite's
    // shared context. builder.withExtensions drives the exact same
    // injection (GraftExtensions.apply) through the public API; the conf
    // route is the documented production deployment. Never stop s2 — that
    // would kill the shared context.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[8]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(s2 ne base) // genuinely a fresh session, not the shared one
      val r = s2.sql(
        """SELECT word_tokens(' A  B c ') AS toks,
          |  size(word_ngrams('a b c d', 2)) AS n_grams,
          |  simhash64('x y') = simhash64('  x   Y ') AS sim_eq,
          |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
          |  size(minhash_signature('some text', 16, 5)) AS sig_len,
          |  repetition_stats('a b a b c', 2).n_dup AS n_dup,
          |  math_ln(1) AS ln1,
          |  zorder2(3, 5) AS z35
          |""".stripMargin).head()
      assert(r.getSeq[String](0) == Seq("a", "b", "c"))
      assert(r.getInt(1) == 3)
      assert(r.getBoolean(2)) // normalization inside the expression
      assert(r.getDouble(3) == 11.0)
      assert(r.getInt(4) == 16)
      assert(r.getLong(5) == 2L)
      assert(r.getDouble(6) == 0.0)
      // 3=0b11 even positions, 5=0b101 odd positions: 100|01|11 = 0x27
      assert(r.getLong(7) == graft.functions.ZOrder.zorder2Local(3L, 5L))
      assert(r.getLong(7) == 0x27L)
      // packed int8 kernels are on the SQL surface too
      val i8 = s2.sql(
        """SELECT int8_dot(int8_pack(array(127L, -127L)),
          |                int8_pack(array(2L, 3L))) AS d""".stripMargin).head()
      assert(i8.getLong(0) == 127L * 2 - 127L * 3)
      // the bounded-heap top-k aggregate works from SQL GROUP BY
      val tk = s2.sql(
        """SELECT g, top_k_by_score(s, id, 2) AS top FROM VALUES
          |  ('a', 3.0D, 1L), ('a', 9.0D, 2L), ('a', 9.0D, 0L), ('a', 1.0D, 3L),
          |  ('b', 5.0D, 7L) AS t(g, s, id)
          |GROUP BY g ORDER BY g""".stripMargin).collect()
      val topA = tk(0).getSeq[org.apache.spark.sql.Row](1)
        .map(e => (e.getDouble(0), e.getLong(1)))
      assert(topA == Seq((9.0, 0L), (9.0, 2L))) // score desc, id asc tiebreak
      assert(tk(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)) == Seq(7L))
      // the rank-histogram aggregate works from SQL GROUP BY: exact
      // bucket counts, ascending bucket (= ascending value) order
      val ddr = s2.sql(
        """SELECT dd_sketch(v, 1.02D) AS sk FROM VALUES
          |  (0L), (1L), (1L), (-4L), (1000L) AS t(v)""".stripMargin).head()
      val buckets = ddr.getSeq[org.apache.spark.sql.Row](0)
        .map(e => (e.getInt(0), e.getLong(1)))
      val h = new graft.functions.LogHistogram(1.02)
      assert(buckets == Seq(
        (h.enc(-4L), 1L), (0, 1L), (1, 2L), (h.enc(1000L), 1L)))
      assert(buckets.map(_._2).sum == 5L)
      // the natural SQL spelling: a bare fractional literal parses as
      // DecimalType, which the argument reader must accept too
      val ddrDec = s2.sql(
        """SELECT dd_sketch(v, 1.02) AS sk FROM VALUES
          |  (0L), (1L), (1L), (-4L), (1000L) AS t(v)""".stripMargin).head()
      assert(ddrDec.getSeq[org.apache.spark.sql.Row](0)
        .map(e => (e.getInt(0), e.getLong(1))) == buckets)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("metadata table-valued functions: history / snapshot log / partition stats as plain SQL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("tvf_hist").toString
    graft.sink.Snapshots.write(
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "p", "v").coalesce(1),
      root, Seq("p"), statsColumns = Seq("k"))
    graft.sink.Snapshots.write(
      Seq((3L, "a", 3.0)).toDF("k", "p", "v").coalesce(1),
      root, Seq("p"), graft.sink.Snapshots.SnapAppend)
    val esc = root.replace("'", "''")
    // DESCRIBE-HISTORY parity, answered from manifests alone
    val hist = spark.sql(
      s"SELECT snapshot_id, mode, is_current FROM graft_history('$esc')")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getBoolean(2)))
    assert(hist.toSeq == Seq((1, "append", false), (2, "append", true)))
    // the TVF result composes like any relation (joins, filters, aggs);
    // n_rows is the snapshot's total LIVE rows, manifest-answered
    assert(spark.sql(
      s"""SELECT sum(n_rows) AS total FROM graft_snapshot_log('$esc')
         |WHERE snapshot_id = 2""".stripMargin).head().getLong(0) == 3L)
    val parts = spark.sql(
      s"""SELECT partition, n_files, n_rows
         |FROM graft_partition_stats('$esc') ORDER BY partition"""
        .stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(parts.toSeq == Seq(("p=a", 2L, 2L), ("p=b", 1L, 1L)))
    // the TVF equals the Scala API exactly
    assert(spark.sql(s"SELECT * FROM graft_history('$esc')").collect()
      .toSeq == graft.sink.Snapshots.history(spark, root).collect().toSeq)
    // per-live-file inventory (manifest-answered): three one-file writes
    // → three files, each stamped with the snapshot that added it
    val files = spark.sql(
      s"""SELECT partition, added_by, n_rows
         |FROM graft_files('$esc') ORDER BY file""".stripMargin).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(files.length == 3 &&
      files.count(_._1 == "p=a") == 2 && files.count(_._1 == "p=b") == 1)
    assert(files.map(_._3).sum == 3L, s"per-file rows: ${files.toSeq}")
    // one-row DESCRIBE DETAIL: declarations + live totals + ref counts
    val det = spark.sql(
      s"""SELECT snapshot_id, partition_by, stats_columns, n_files,
         |  n_partitions, n_rows, n_delete_files, n_tags
         |FROM graft_detail('$esc')""".stripMargin).head()
    assert(det.getInt(0) == 2 && det.getString(1) == "p" &&
      det.getString(2) == "k" && det.getLong(3) == 3L &&
      det.getLong(4) == 2L && det.getLong(5) == 3L &&
      det.getLong(6) == 0L && det.getLong(7) == 0L, det.toString)
    // a computed (non-literal) root cannot resolve — loud, named error
    def messages(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${messages(t.getCause)}"
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM graft_history(concat('a', 'b'))").collect()
    }
    assert(messages(ex).contains("STRING LITERAL") ||
      messages(ex).toLowerCase.contains("cannot be evaluated"),
      messages(ex))
    assert(spark.range(1).select(col("id")).count() == 1L)

    // TIME TRAVEL in SQL: graft_snapshot(root[, asOf]) is the real
    // distributed scan — current state, a pinned past state, and it
    // composes (joins/filters) like any relation
    assert(spark.sql(s"SELECT k FROM graft_snapshot('$esc')")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(spark.sql(s"SELECT k FROM graft_snapshot('$esc', 1)")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // integral literal TYPES all work (a bigint literal's typeName is
    // "long" — it must match by type, not name)…
    assert(spark.sql(s"SELECT k FROM graft_snapshot('$esc', 1L)")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // …and one past Int range keeps the NAMED argument error shape
    val exBig = intercept[Exception] {
      spark.sql(s"SELECT k FROM graft_snapshot('$esc', 3000000000)")
        .collect()
    }
    assert(messages(exBig).contains("fit an integer"), messages(exBig))
    assert(spark.sql(
      s"""SELECT s1.k FROM graft_snapshot('$esc', 1) s1
         |JOIN graft_snapshot('$esc') s2 ON s1.k = s2.k
         |WHERE s2.p = 'a'""".stripMargin)
      .collect().map(_.getLong(0)).toSet == Set(1L))
    // TIMESTAMP AS OF: a timestamp literal resolves against each
    // manifest's recorded publish instant — the newest snapshot at or
    // before it (session tz is UTC in this suite)
    Thread.sleep(20)
    val midMs = System.currentTimeMillis()
    Thread.sleep(20)
    graft.sink.Snapshots.write(
      Seq((4L, "b", 4.0)).toDF("k", "p", "v").coalesce(1),
      root, Seq("p"), graft.sink.Snapshots.SnapAppend)
    val tsLit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(midMs))
    assert(spark.sql(
      s"SELECT k FROM graft_snapshot('$esc', TIMESTAMP '$tsLit')")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L),
      "the timestamp between s2 and s3 must pin s2")
    val exPast = intercept[Exception] {
      spark.sql(
        s"SELECT k FROM graft_snapshot('$esc', TIMESTAMP '1990-01-01 00:00:00')")
        .collect()
    }
    assert(messages(exPast).contains("no retained snapshot"),
      messages(exPast))
    // a STRING second argument reads a TAG (the release-label pin)
    graft.sink.Snapshots.tagSnapshot(spark, root, "v1", 1)
    assert(spark.sql(s"SELECT k FROM graft_snapshot('$esc', 'v1')")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // CDC bounds as TIMESTAMPs: "what changed since <instant>" — the
    // mid-instant resolves to s2, diffed against the current id
    val chTs = spark.sql(
      s"""SELECT k, change_type
         |FROM graft_changes('$esc', TIMESTAMP '$tsLit', 3, 'k')"""
        .stripMargin).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(chTs.toSeq == Seq((4L, "insert")), chTs.mkString(","))
    // row-level CDC in SQL: graft_changes classifies the diff between
    // two snapshots exactly like the Scala API
    val ch = spark.sql(
      s"""SELECT k, change_type FROM graft_changes('$esc', 1, 2, 'k')
         |ORDER BY k""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(ch.toSeq == Seq((3L, "insert")), ch.mkString(","))
    assert(spark.sql(s"SELECT * FROM graft_changes('$esc', 1, 2, 'k')")
      .columns.toSeq
      == graft.sink.Snapshots.changes(spark, root, 1, 2, Seq("k"))
        .columns.toSeq)
  }
}
