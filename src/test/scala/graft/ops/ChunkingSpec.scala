package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunking: boundaries, overlap, trailing partial chunk") {
    // 10 tokens, chunk 4, overlap 1 -> step 3 -> starts 0,3,6,9
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val chunks = Chunking.chunk(df, "doc_id", "text", chunkTokens = 4, overlap = 1)
      .collect().sortBy(_.getAs[Int]("chunk_idx"))
      .map(r => (r.getAs[Int]("chunk_idx"), r.getAs[String]("chunk_text")))
    assert(chunks.toSeq == Seq(
      (0, "t0 t1 t2 t3"), (1, "t3 t4 t5 t6"), (2, "t6 t7 t8 t9"), (3, "t9")))
  }

  test("chunking: short doc is a single chunk; invalid params rejected") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = Chunking.chunk(df, "doc_id", "text", 64, 8).collect()
    assert(out.length == 1 && out.head.getAs[String]("chunk_text") == "a b c")
    intercept[IllegalArgumentException] {
      Chunking.chunk(df, "doc_id", "text", 4, 4)
    }
  }

  test("repeated-passage removal drops boilerplate chunks, keeps order, empties pure-boilerplate docs") {
    val boiler = "this site uses cookies please accept terms conditions" // 8 tokens
    val df = Seq(
      (1L, s"$boiler unique content one about spark catalyst rules ok"),
      (2L, s"$boiler unique content two about shuffle partition skew no"),
      (3L, s"$boiler unique content three about broadcast join hints yes"),
      (4L, boiler), // pure boilerplate
      (5L, "fully original document with no shared passages at all here"),
    ).toDF("doc_id", "text")
    val out = Chunking.removeRepeatedPassages(df, "doc_id", "text",
      chunkTokens = 8, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // the shared 8-token chunk (df=4 > 2) is gone; each doc's unique tail
    // survives in order
    assert(out(1L) == ("unique content one about spark catalyst rules ok", 1L))
    assert(out(2L)._1.startsWith("unique content two"))
    assert(out(4L) == ("", 0L)) // pure boilerplate -> empty, still present
    assert(out(5L)._1.nonEmpty && out(5L)._2 == 2L) // 10 tokens -> 2 chunks kept
    // multi-chunk order: both kept chunks of doc 5 in original order
    assert(out(5L)._1 == "fully original document with no shared passages at all here")
  }

  test("redaction replaces emails and phone-like runs") {
    val df = Seq(
      (1L, "contact me at john.doe+x@example.com or call +1 (555) 123-4567 now"))
      .toDF("doc_id", "text")
    val out = df.select(Chunking.redact(col("text"))).head().getString(0)
    assert(out == "contact me at [EMAIL] or call +[NUM] now"
      || out.contains("[EMAIL]") && out.contains("[NUM]")
        && !out.contains("example.com") && !out.contains("555"))
  }

  test("stratified sample: per-group cap, deterministic") {
    val df = (1L to 100L).map(i => (i, s"g${i % 4}")).toDF("id", "grp")
    val s1 = Chunking.stratifiedSample(df, "grp", "id", 5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.groupBy(_._2).forall(_._2.length == 5))
    val s2 = Chunking.stratifiedSample(df, "grp", "id", 5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.sortBy(_._1).sameElements(s2.sortBy(_._1)))
  }

  test("SQL registration: minhash_signature/simhash64 callable from SQL") {
    graft.functions.hashes.registerSql(spark)
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("sqldocs")
    val rows = spark.sql(
      """SELECT doc_id, minhash_signature(text, 16, 5) AS sig,
        |  simhash64(text) AS sh FROM sqldocs""".stripMargin).collect()
    assert(rows(0).getSeq[Long](1).length == 16)
    assert(rows(0).getSeq[Long](1) == rows(1).getSeq[Long](1))
    assert(rows(0).getLong(2) == rows(1).getLong(2))
  }

  test("sequence packing: per-shard prefix sums and span boundaries") {
    import spark.implicits._
    def words(n: Int) = (0 until n).map(i => s"w$i").mkString(" ")
    // shard = id % 2: shard 0 gets ids 0 (6 tok), 2 (8 tok), 4 (3 tok);
    // shard 1 gets id 1 (12 tok)
    val df = Seq(0L -> words(6), 1L -> words(12), 2L -> words(8), 4L -> words(3))
      .toDF("doc_id", "text")
    val out = Chunking.packSequences(df, "doc_id", "text", seqLen = 10, nShards = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("shard"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("start_seq"), r.getAs[Long]("start_off"),
          r.getAs[Long]("end_seq"))).toMap
    assert(out(0L) == (0, 6L, 0L, 0L, 0L))        // tokens [0,6) of shard 0
    assert(out(2L) == (0, 8L, 0L, 6L, 1L))        // [6,14) crosses seq 0→1
    assert(out(4L) == (0, 3L, 1L, 4L, 1L))        // [14,17) inside seq 1
    assert(out(1L) == (1, 12L, 0L, 0L, 1L))       // own shard: [0,12)
    // spans tile each shard exactly: next start_off = (prev off + n) % 10
    intercept[IllegalArgumentException] {
      Chunking.packSequences(df, "doc_id", "text", 0, 2)
    }
    // one prefix-sum window per shard → exactly one shuffle in the plan
    val plan = Chunking.packSequences(df, "doc_id", "text", 10, 2)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"packing must be a single per-shard window shuffle:\n$plan")
  }

  test("materialized sequences tile each shard stream exactly") {
    import spark.implicits._
    def words(n: Int) = (0 until n).map(i => s"w$i").mkString(" ")
    // shard 0 stream: doc0 (6) ++ doc2 (8) ++ doc4 (3) = 17 tokens;
    // shard 1 stream: doc1 (12)
    val df = Seq(0L -> words(6), 1L -> words(12), 2L -> words(8), 4L -> words(3))
      .toDF("doc_id", "text")
    val rows = Chunking.packedSequenceRows(df, "doc_id", "text", 10, 2)
      .collect().map(r => (r.getAs[Int]("shard"), r.getAs[Long]("seq_id")) ->
        (r.getAs[String]("seq_text"), r.getAs[Long]("n_tokens"))).toMap
    assert(rows.keySet == Set((0, 0L), (0, 1L), (1, 0L), (1, 1L)))
    // every non-final sequence holds exactly seqLen tokens; tails carry the rest
    assert(rows((0, 0L))._2 == 10L && rows((0, 1L))._2 == 7L)
    assert(rows((1, 0L))._2 == 10L && rows((1, 1L))._2 == 2L)
    // order: doc0's 6 tokens then doc2's first 4 fill shard 0 / seq 0
    assert(rows((0, 0L))._1 ==
      "w0 w1 w2 w3 w4 w5 w0 w1 w2 w3")
    // doc boundaries are invisible to the split (concat-and-split layout)
    assert(rows((0, 1L))._1 == "w4 w5 w6 w7 w0 w1 w2")
  }

  test("token-budget sample: exact md5-order prefix, edges, no single-partition window") {
    val docs = graft.Tables(spark, sf0001, "documents").select("doc_id", "text")
    val total = docs.select(sum(TextAnalysis.wsTokenCount(col("text"))
      .cast("long"))).head().getLong(0)
    val budget = total / 2
    val got = Chunking.tokenBudgetSample(docs, "doc_id", "text", budget)
    // equals the naive single-window formulation exactly (rows AND cumsums)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(md5(col("doc_id").cast("string").cast("binary")).asc)
      .rowsBetween(Long.MinValue, 0)
    val naive = docs.select(col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_tokens", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(got) == rows(naive))
    // prefix is maximal: the kept max cum fits, adding any dropped doc's
    // count to it would not necessarily — but the BOUNDARY doc must not fit
    val kept = rows(got)
    assert(kept.nonEmpty && kept.map(_._3).max <= budget)
    // edges: zero budget -> empty; full budget -> whole corpus, last cum = total
    assert(Chunking.tokenBudgetSample(docs, "doc_id", "text", 0L).count() == 0)
    val all = Chunking.tokenBudgetSample(docs, "doc_id", "text", total)
    assert(all.count() == docs.count())
    assert(all.agg(max(col("cum_tokens"))).head().getLong(0) == total)
    // scale guard: the two-level cumsum must not plan the naive global
    // window's Exchange SinglePartition
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"token-budget sample must not global-sort:\n$plan")
    // property: two-level == naive at deterministic budgets spread across
    // the whole range, including bucket-boundary-adjacent values (the
    // driver prefix-sum's off-by-one habitat)
    val naiveAll = docs.select(col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
    val cums = naiveAll.select("cum_tokens").collect().map(_.getLong(0)).sorted
    val probes = Seq(1L, total / 7, total / 3, 2 * total / 3, total - 1) ++
      Seq(cums(cums.length / 2) - 1, cums(cums.length / 2), cums(cums.length / 2) + 1)
    probes.filter(b => b >= 0 && b <= total).foreach { b =>
      assert(rows(Chunking.tokenBudgetSample(docs, "doc_id", "text", b)) ==
        rows(naiveAll.filter(col("cum_tokens") <= b)),
        s"two-level != naive at budget $b")
    }
  }

  test("temperature mix upweights small sources and is deterministic") {
    // skewed corpus: big 2000 docs, small 40 docs
    val df = ((1L to 2000L).map(i => (i, "big")) ++
      (5001L to 5040L).map(i => (i, "small"))).toDF("doc_id", "source")
    val kept = Chunking.temperatureMix(df, "source", "doc_id", keepFraction = 0.3)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fracBig = kept.getOrElse("big", 0L).toDouble / 2000
    val fracSmall = kept.getOrElse("small", 0L).toDouble / 40
    // alpha=0.5: expected per-source keep ratio scales with 1/sqrt(n), so
    // the small source's kept FRACTION must exceed the big one's by ~sqrt(50)
    assert(fracSmall > fracBig * 3,
      s"small=$fracSmall big=$fracBig — temperature upweighting missing")
    // overall volume lands near the requested keepFraction
    val total = kept.values.sum.toDouble / 2040
    assert(total > 0.15 && total < 0.45, s"total kept fraction $total")
    // deterministic: identical result on re-run
    val again = Chunking.temperatureMix(df, "source", "doc_id", keepFraction = 0.3)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
  }

  test("DSIR weights: target-domain docs score above off-domain docs") {
    // disjoint vocabularies: target (en) talks fruit, source-only docs
    // talk metal; a held-out fruit doc must outrank every metal doc
    val df = Seq(
      (0L, "apple banana apple cherry", "en"),
      (1L, "banana cherry apple", "en"),
      (2L, "apple cherry banana banana", "en"),
      (3L, "iron copper zinc zinc", "de"),
      (4L, "copper iron zinc", "de"),
      (5L, "apple banana cherry apple", "fr"), // fruit text, non-en label
      (6L, "iron zinc copper copper", "fr"))
      .toDF("doc_id", "text", "lang")
    val w = Chunking.dsirWeights(df, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(w.size == 7)
    assert(w(0L)._1 == 4 && w(0L)._3 && !w(5L)._3)
    // fruit-vocabulary docs (target-like) must all outweigh metal docs,
    // regardless of their own label
    val fruit = Seq(0L, 1L, 2L, 5L).map(w(_)._2)
    val metal = Seq(3L, 4L, 6L).map(w(_)._2)
    assert(fruit.min > metal.max,
      s"fruit $fruit must outrank metal $metal")
    // deterministic across evaluations
    val again = Chunking.dsirWeights(df, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.map { case (k, v) => k -> v._2 } == again)
  }

  test("hashSplit: total coverage, id-only determinism, weight ranges honored") {
    val df = graft.Tables(spark, sf0001, "documents")
    val splits = Seq(("train", 98), ("val", 1), ("test", 1))
    val a = Chunking.hashSplit(df, "doc_id", splits)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.size == df.count(), "every doc gets exactly one split")
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // id-only: the same ids through a reshuffled, re-derived frame land
    // in the same split (order/partitioning independence)
    val b = Chunking.hashSplit(df.repartition(7).filter(col("doc_id") >= 0),
      "doc_id", splits)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // assignment matches the bucket arithmetic exactly
    val buckets = df.select(col("doc_id"),
      (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
        16, 10).cast("long") % 100).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { case (id, s) =>
      val expect =
        if (buckets(id) < 98) "train" else if (buckets(id) < 99) "val" else "test"
      assert(s == expect, s"doc $id bucket ${buckets(id)} got $s")
    }
  }

  test("weightedSample: selection equals the brute-force A-ES reference") {
    val df = graft.Tables(spark, sf0001, "documents")
    val k = 20
    val got = Chunking.weightedSample(df, "doc_id", "n_chars", k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // independent reference: recompute every key on the driver and take
    // the top-k by (key desc, id asc)
    val keys = df.select(col("doc_id"),
      ((conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
        16, 10).cast("long") + lit(1L)).cast("double") / 4294967296.0).as("u"),
      col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .filter(_._3 > 0)
      .map { case (id, u, w) => (id, Math.log(u) / w) }
    val want = keys.sortBy { case (id, key) => (-key, id) }.take(k).map(_._1).toSet
    assert(got == want)
    assert(got.size == k)
  }

  test("weightedSample: non-positive weights never drawn; k over corpus returns all positive") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 0L), (3L, -5L), (4L, 100L))
      .toDF("doc_id", "n_chars")
    val got = Chunking.weightedSample(df, "doc_id", "n_chars", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
  }

  test("weightedSample: heavier docs are drawn more often across disjoint id universes") {
    import spark.implicits._
    // 500 light docs (w=10) + 500 heavy docs (w=1000): a weight-correct
    // sampler's draw must be dominated by heavy docs
    val df = (1L to 500L).map(i => (i, 10L))
      .++((501L to 1000L).map(i => (i, 1000L))).toDF("doc_id", "n_chars")
    val got = Chunking.weightedSample(df, "doc_id", "n_chars", 100)
      .select("doc_id").collect().map(_.getLong(0))
    val heavy = got.count(_ > 500L)
    assert(heavy > 80, s"only $heavy/100 draws were heavy docs")
  }
}
