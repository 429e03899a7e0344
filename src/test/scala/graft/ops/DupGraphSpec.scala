package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted duplicate-graph index: stored edges must be EXACTLY the
  * in-memory PPJoin pair set, appends must equal a full rebuild, and
  * min-similarity reads must prune storage directories. */
class DupGraphSpec extends SparkSpec {

  private def docs = graft.Tables(spark, sf0001, "documents")

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Int, Int, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getInt(3), r.getInt(4), r.getDouble(5))).toSet

  test("writeDupGraph stores exactly the in-memory PPJoin edge set") {
    val dir = java.nio.file.Files.createTempDirectory("dupg").toString
    Dedup.writeDupGraph(docs, "doc_id", "text", dir)
    val stored = edgeSet(Dedup.readDupGraph(spark, dir))
    val live = edgeSet(
      Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.8))
    assert(stored == live)
    assert(stored.nonEmpty, "fixture degenerate — no near-dup edges")
    // params sidecar freezes the build geometry
    val p = spark.read.parquet(s"$dir/params").head()
    assert((p.getInt(0), p.getDouble(1)) == ((3, 0.8)))
  }

  test("appendToDupGraph equals a full rebuild (new-new and new-old edges)") {
    val d = docs
    val oldDocs = d.filter(col("doc_id") % 5 =!= 0)
    val newIds = d.filter(col("doc_id") % 5 === 0).select("doc_id")
    val dirOld = java.nio.file.Files.createTempDirectory("dupg_a").toString
    val dirFull = java.nio.file.Files.createTempDirectory("dupg_f").toString
    Dedup.writeDupGraph(oldDocs, "doc_id", "text", dirOld)
    Dedup.appendToDupGraph(d, newIds, dirOld)
    Dedup.writeDupGraph(d, "doc_id", "text", dirFull)
    val appended = edgeSet(Dedup.readDupGraph(spark, dirOld))
    val rebuilt = edgeSet(Dedup.readDupGraph(spark, dirFull))
    assert(appended == rebuilt,
      s"append-vs-rebuild: missing=${(rebuilt -- appended).take(3)} " +
        s"extra=${(appended -- rebuilt).take(3)}")
    // the append must have contributed BOTH kinds of edges for the test
    // to mean anything: at least one new-old and one new-new pair
    val newSet = newIds.collect().map(_.getLong(0)).toSet
    val touchingNew = rebuilt.filter(e => newSet(e._1) || newSet(e._2))
    assert(touchingNew.exists(e => newSet(e._1) ^ newSet(e._2)),
      "fixture has no new-old edge")
    assert(rebuilt.exists(e => !newSet(e._1) && !newSet(e._2)),
      "fixture has no old-old edge (append exactness untested)")
  }

  test("probe-restricted PPJoin emits exactly the probe-touching pairs") {
    val d = docs
    val probeIds = d.filter(col("doc_id") % 7 === 0).select("doc_id")
    val probes = probeIds.collect().map(_.getLong(0)).toSet
    val all = edgeSet(
      Dedup.ngramJaccardPairsPrefix(d, "doc_id", "text", 3, 0.8))
    val got = edgeSet(
      Dedup.prefixFilteredPairs(d, "doc_id", "text", 3, 0.8, Some(probeIds)))
    val want = all.filter(e => probes(e._1) || probes(e._2))
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty && want.size < all.size, "fixture degenerate")
  }

  test("every graph_*_indexed query is row-identical to its in-memory twin") {
    // the indexed lanes SHARE their twins' SQL oracles — this is the
    // assertion that makes the sharing sound: same edge geometry (stored
    // vs derived) in, identical rows out, across all five analytics
    val twins = Seq("graph_components", "graph_pagerank", "graph_ppr",
      "graph_pagerank_weighted", "graph_triangles")
    for (name <- twins) {
      val live = graft.SparkEntry.queries(name)(spark, sf0001)
        .collect().map(_.toSeq).toSet
      val idx = graft.SparkEntry.queries(s"${name}_indexed")(spark, sf0001)
        .collect().map(_.toSeq).toSet
      assert(idx == live,
        s"$name: indexed diverges — missing=${(live -- idx).take(2)} " +
          s"extra=${(idx -- live).take(2)}")
      assert(live.nonEmpty, s"$name fixture degenerate")
    }
  }

  test("appendToDupGraph replay is idempotent — no duplicated edge rows") {
    val d = docs
    val oldDocs = d.filter(col("doc_id") % 5 =!= 0)
    val newIds = d.filter(col("doc_id") % 5 === 0).select("doc_id")
    val dir = java.nio.file.Files.createTempDirectory("dupg_r").toString
    Dedup.writeDupGraph(oldDocs, "doc_id", "text", dir)
    Dedup.appendToDupGraph(d, newIds, dir)
    val once = Dedup.readDupGraph(spark, dir).collect()
    Dedup.appendToDupGraph(d, newIds, dir) // the re-delivered batch
    val twice = Dedup.readDupGraph(spark, dir).collect()
    assert(twice.length == once.length,
      s"replay duplicated ${twice.length - once.length} edge rows")
    assert(edgeSet(Dedup.readDupGraph(spark, dir)) ==
      once.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4), r.getDouble(5))).toSet)
  }

  test("dupGraphStream folds a new-doc micro-batch into the stored graph") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val d = docs
    val oldDocs = d.filter(col("doc_id") % 5 =!= 0)
    val newRows = d.filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val dir = java.nio.file.Files.createTempDirectory("dupg_s").toString
    Dedup.writeDupGraph(oldDocs, "doc_id", "text", dir)
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.EventStream.dupGraphStream(
      input.toDF().toDF("doc_id", "text"),
      oldDocs.select("doc_id", "text"), dir)
    try {
      input.addData(newRows.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = edgeSet(Dedup.readDupGraph(spark, dir))
    val dirFull = java.nio.file.Files.createTempDirectory("dupg_sf").toString
    Dedup.writeDupGraph(d, "doc_id", "text", dirFull)
    assert(streamed == edgeSet(Dedup.readDupGraph(spark, dirFull)))
  }

  test("minJaccard = 1.0 read returns exact-duplicate edges (band floor capped at 9)") {
    import spark.implicits._
    // planted exact duplicates: identical texts have jac == 1.0 and live in
    // jband=9 (the writer caps at least(floor(jac*10), 9)); an uncapped
    // ⌊1.0·10⌋ = 10 read filter would silently return zero rows
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    val d = Seq((1L, t), (2L, t),
      (3L, "wholly different words about another topic entirely here"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("dupg_x").toString
    Dedup.writeDupGraph(d, "doc_id", "text", dir)
    val exact = edgeSet(Dedup.readDupGraph(spark, dir, minJaccard = 1.0))
    assert(exact.map(e => (e._1, e._2)) == Set((1L, 2L)),
      s"exact-dup read lost the jband=9 edge: $exact")
    assert(exact.forall(_._6 == 1.0))
  }

  test("appendToDupGraph resolves a multi-column newIds frame by idCol name") {
    val d = docs
    val oldDocs = d.filter(col("doc_id") % 5 =!= 0)
    val newDocs = d.filter(col("doc_id") % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("dupg_mc").toString
    Dedup.writeDupGraph(oldDocs, "doc_id", "text", dir)
    // id is NOT the first column — a positional columns.head grab would
    // probe on text values and silently emit an empty set
    Dedup.appendToDupGraph(d, newDocs.select("text", "doc_id"), dir)
    val dirFull = java.nio.file.Files.createTempDirectory("dupg_mcf").toString
    Dedup.writeDupGraph(d, "doc_id", "text", dirFull)
    assert(edgeSet(Dedup.readDupGraph(spark, dir)) ==
      edgeSet(Dedup.readDupGraph(spark, dirFull)))
    // a multi-column frame WITHOUT the id column fails loudly
    val bad = intercept[IllegalArgumentException] {
      Dedup.prefixFilteredPairs(d, "doc_id", "text", 3, 0.8,
        Some(newDocs.select(col("text"), col("n_chars")))).collect()
    }
    assert(bad.getMessage.contains("doc_id"))
  }

  test("dupGraphStream converges when the corpus refresh already folded the batch in") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val d = docs
    val oldDocs = d.filter(col("doc_id") % 5 =!= 0)
    val newRows = d.filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val dir = java.nio.file.Files.createTempDirectory("dupg_rf").toString
    Dedup.writeDupGraph(oldDocs, "doc_id", "text", dir)
    // the corpus handed to the stream is the FULL table — the out-of-band
    // refresh has already folded the batch in (or the batch is a replay
    // after a refresh). Without the pre-union anti-join those docs appear
    // twice: duplicated gram rows fan out the verify join and identical
    // edge rows land twice (the stored-pair anti-join only blocks
    // already-stored pairs, not within-batch duplicate output rows).
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.EventStream.dupGraphStream(
      input.toDF().toDF("doc_id", "text"),
      d.select("doc_id", "text"), dir)
    try {
      input.addData(newRows.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = Dedup.readDupGraph(spark, dir).collect()
    val dirFull = java.nio.file.Files.createTempDirectory("dupg_rff").toString
    Dedup.writeDupGraph(d, "doc_id", "text", dirFull)
    val want = edgeSet(Dedup.readDupGraph(spark, dirFull))
    assert(streamed.length == want.size,
      s"refresh-raced batch duplicated ${streamed.length - want.size} edge rows")
    assert(streamed.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getInt(3), r.getInt(4), r.getDouble(5))).toSet == want)
  }

  test("dupGraphHealth: per-decile counts match the stored edges, shares sum to 1") {
    val dir = java.nio.file.Files.createTempDirectory("dupg_h").toString
    Dedup.writeDupGraph(docs, "doc_id", "text", dir)
    val edges = Dedup.readDupGraph(spark, dir).collect()
    val want = edges.groupBy(e => math.min((e.getDouble(5) * 10).toInt, 9))
      .view.mapValues(_.length.toLong).toMap
    val got = Dedup.dupGraphHealth(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(g => g._1 -> g._2).toMap == want)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-4, "shares must sum to 1")
    assert(got.sortBy(_._1).sameElements(got), "ordered by decile")
  }

  test("minJaccard read is directory-pruned and exact") {
    val dir = java.nio.file.Files.createTempDirectory("dupg_p").toString
    Dedup.writeDupGraph(docs, "doc_id", "text", dir)
    val full = edgeSet(Dedup.readDupGraph(spark, dir))
    val strong = Dedup.readDupGraph(spark, dir, minJaccard = 0.9)
    assert(edgeSet(strong) == full.filter(_._6 >= 0.9))
    // the decile filter must reach the scan as a PARTITION filter —
    // unprobed jband directories are never read from storage
    val plan = strong.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("jband"),
      s"jband not pruned at the scan:\n$plan")
    // and the full read has distinct jband directories to prune
    assert(full.map(e => math.min((e._6 * 10).toInt, 9)).size >= 1)
  }
}
