package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental connected components: folding an edge batch into a stored
  * labeling must equal a full recompute, late merges must relabel whole
  * components, and the persisted labels tree must publish generations. */
class IncrementalComponentsSpec extends SparkSpec {

  private def docs = graft.Tables(spark, sf0001, "documents")

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  import spark.implicits._

  test("appendToComponents equals full recompute on the near-dup graph") {
    val d = docs
    val pairs = Dedup.ngramJaccardPairsPrefix(d, "doc_id", "text", 3, 0.8)
      .select(col("a_id"), col("b_id"))
    val oldDocs = d.filter(col("doc_id") % 4 =!= 0).select("doc_id")
    val newDocs = d.filter(col("doc_id") % 4 === 0).select("doc_id")
    val oldEdges = pairs.filter(
      col("a_id") % 4 =!= 0 && col("b_id") % 4 =!= 0)
    val newEdges = pairs.filter(
      col("a_id") % 4 === 0 || col("b_id") % 4 === 0)
    val stored = Dedup.connectedComponents(oldDocs, oldEdges)
    val merged = Dedup.appendToComponents(stored, newDocs, newEdges)
    val full = Dedup.connectedComponents(d.select("doc_id"), pairs)
    assert(labelSet(merged) == labelSet(full))
    // fixture strength: the batch must actually contain new-old edges,
    // otherwise the contraction path is untested
    val newSet = newDocs.collect().map(_.getLong(0)).toSet
    val e = newEdges.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(e.exists(p => newSet(p._1) ^ newSet(p._2)),
      "fixture has no new-old edge")
    assert(e.exists(p => newSet(p._1) && newSet(p._2)),
      "fixture has no new-new edge")
  }

  test("late old-old edge merges two stored components end to end") {
    // stored: {1,2}→1, {5,6}→5, singleton 9
    val stored = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (9L, 9L))
      .toDF("doc_id", "cluster_id")
    // batch: an old-old bridge (2,5) + a NEW node 7 linking to old 9 —
    // 7 < 9 exercises the min-label flowing FROM the new node
    val newEdges = Seq((2L, 5L), (7L, 9L)).toDF("a_id", "b_id")
    val out = labelSet(Dedup.appendToComponents(
      stored, spark.emptyDataset[Long].toDF("doc_id"), newEdges))
    assert(out == Set((1L, 1L), (2L, 1L), (5L, 1L), (6L, 1L),
      (7L, 7L), (9L, 7L)))
  }

  test("edgeless new nodes become singletons; re-delivery is idempotent") {
    val stored = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_id")
    val newNodes = Seq(10L, 11L).toDF("doc_id")
    val newEdges = Seq((10L, 2L)).toDF("a_id", "b_id")
    val once = Dedup.appendToComponents(stored, newNodes, newEdges)
    assert(labelSet(once) == Set((1L, 1L), (2L, 1L), (10L, 1L), (11L, 11L)))
    // folding the SAME batch into the updated labeling changes nothing
    val twice = Dedup.appendToComponents(once, newNodes, newEdges)
    assert(labelSet(twice) == labelSet(once))
  }

  test("components index: versioned publish, append step, manifest flip") {
    val d = docs
    val pairs = Dedup.ngramJaccardPairsPrefix(d, "doc_id", "text", 3, 0.8)
      .select(col("a_id"), col("b_id"))
    val oldDocs = d.filter(col("doc_id") % 4 =!= 0).select("doc_id")
    val newDocs = d.filter(col("doc_id") % 4 === 0).select("doc_id")
    val oldEdges = pairs.filter(
      col("a_id") % 4 =!= 0 && col("b_id") % 4 =!= 0)
    val newEdges = pairs.filter(
      col("a_id") % 4 === 0 || col("b_id") % 4 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_idx").toString
    Dedup.writeComponentsIndex(
      Dedup.connectedComponents(oldDocs, oldEdges), dir)
    Dedup.appendToComponentsIndex(dir, newDocs, newEdges)
    val full = Dedup.connectedComponents(d.select("doc_id"), pairs)
    assert(labelSet(Dedup.readComponentsIndex(spark, dir)) == labelSet(full))
    // two publishes → MANIFEST points at v2, both generations complete
    val (hfs, root) = graft.sink.FsOps.fs(spark, dir)
    assert(graft.sink.FsOps.readManifest(hfs, root).contains("v2"))
  }

  test("live pipeline: dup-graph appends stream into the labels tree as edges") {
    // the composition the two maintenance lanes exist for: new documents
    // fold into the persisted dup graph (probe-restricted append), and
    // the graph's OWN edges/ tree doubles as a file-stream source whose
    // new files drive the component labeling — no custom feed between the
    // two indexes, the storage layout IS the contract
    val d = docs
    val oldDocs = d.filter(col("doc_id") % 5 =!= 0)
    val newIds = d.filter(col("doc_id") % 5 === 0).select("doc_id")
    val gDir = java.nio.file.Files.createTempDirectory("cc_live_g").toString
    val lDir = java.nio.file.Files.createTempDirectory("cc_live_l").toString
    Dedup.writeDupGraph(oldDocs, "doc_id", "text", gDir)
    // labels bootstrapped from the stored old-corpus edges
    Dedup.writeComponentsIndex(
      Dedup.connectedComponents(oldDocs.select("doc_id"),
        Dedup.readDupGraph(spark, gDir).select("a_id", "b_id")), lDir)
    val edgeSchema = spark.read.parquet(s"$gDir/edges").schema
    val feed = spark.readStream.schema(edgeSchema)
      .option("basePath", s"$gDir/edges").parquet(s"$gDir/edges/jband=*")
    val q = graft.streaming.EventStream.componentsStream(feed, lDir)
    try {
      q.processAllAvailable() // drain the pre-existing files
      Dedup.appendToDupGraph(d, newIds, gDir)
      q.processAllAvailable() // the appended files become the next batch
    } finally q.stop()
    // labels must now equal a full recompute over the full corpus' edges
    // for the docs that participate in edges (the stream never sees
    // edgeless new docs — fold those via newNodes when they matter)
    val fullPairs = Dedup.ngramJaccardPairsPrefix(d, "doc_id", "text", 3, 0.8)
      .select(col("a_id"), col("b_id"))
    val full = labelSet(Dedup.connectedComponents(d.select("doc_id"), fullPairs))
    val live = labelSet(Dedup.readComponentsIndex(spark, lDir))
    val memberIds = fullPairs.select(col("a_id").as("doc_id"))
      .union(fullPairs.select(col("b_id").as("doc_id")))
      .distinct().collect().map(_.getLong(0)).toSet
    val oldIds = oldDocs.select("doc_id").collect().map(_.getLong(0)).toSet
    val covered = full.filter(e => memberIds(e._1) || oldIds(e._1))
    assert(live.filter(e => memberIds(e._1) || oldIds(e._1)) == covered)
    assert(covered.nonEmpty, "fixture degenerate")
  }

  test("componentsStream folds edge micro-batches into the labels tree") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_stream").toString
    Dedup.writeComponentsIndex(
      Seq((1L, 1L), (2L, 1L), (5L, 5L)).toDF("doc_id", "cluster_id"), dir)
    val input = MemoryStream[(Long, Long)]
    val q = graft.streaming.EventStream.componentsStream(
      input.toDF().toDF("a_id", "b_id"), dir)
    try {
      input.addData((2L, 5L))          // old-old merge
      q.processAllAvailable()
      assert(labelSet(Dedup.readComponentsIndex(spark, dir)) ==
        Set((1L, 1L), (2L, 1L), (5L, 1L)))
      input.addData((7L, 5L), (8L, 7L)) // new chain attaching to the merged comp
      q.processAllAvailable()
      assert(labelSet(Dedup.readComponentsIndex(spark, dir)) ==
        Set((1L, 1L), (2L, 1L), (5L, 1L), (7L, 1L), (8L, 1L)))
    } finally q.stop()
  }
}
