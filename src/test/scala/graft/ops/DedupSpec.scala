package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog again and AGAIN "), // case/ws variant
    (4L, "completely different content about spark catalyst optimizer rules"),
    (5L, "the quick brown fox jumps over the lazy dog again and also more"), // near dup of 1
    (6L, "another unrelated document mentioning shuffle partitions and skew"),
  ).toDF("doc_id", "text")

  test("exact dedup collapses identical text, keeps min id") {
    val res = Dedup.exact(docs, "doc_id", "text").collect()
    assert(res.length == 5) // 1&2 collapse; 3 differs (case/trailing ws)
    val dup = res.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 1L) // keep_id = min
    assert(Dedup.exactSurvivors(docs, "doc_id", "text").count() == 5)
  }

  test("minhash signatures: deterministic, fixed length, identical for identical text") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs.values.forall(_.length == 64))
    assert(sigs(1L) == sigs(2L))
    // normalization: case/whitespace variant has identical signature too
    assert(sigs(1L) == sigs(3L))
    // near dup shares most lanes; unrelated shares almost none
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count(p => p._1 == p._2)
    assert(agree(sigs(1L), sigs(5L)) > 32)
    assert(agree(sigs(1L), sigs(4L)) < 8)
  }

  test("minhash candidate pairs find planted near-dups, not unrelated docs") {
    val pairs = Dedup.minhashCandidatePairs(
      Dedup.minhashSignatures(docs, "doc_id", "text"), 64, 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash dedup clusters transitively") {
    val clusters = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L)
    assert(clusters(4L) == 4L && clusters(6L) == 6L)
  }

  test("connected components: chain merges to min label") {
    val nodes = Seq(10L, 20L, 30L, 40L, 99L).toDF("doc_id")
    val pairs = Seq((10L, 20L), (20L, 30L), (30L, 40L)).toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L, 99L -> 99L))
  }

  test("simhash: identical text -> identical hash; near dup -> small hamming") {
    val sims = Dedup.simhash64(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(2L) && sims(1L) == sims(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(5L)) < 16)
    assert(ham(sims(1L), sims(4L)) > 16)
    val pairs = Dedup.simhashPairs(Dedup.simhash64(docs, "doc_id", "text"), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("minhash est_jaccard within measured bounds of EXACT shingle jaccard at sf0.01") {
    // converts the xxhash no_oracle family from "plausible" to "measured":
    // for every banded candidate pair over the real sf0.01 corpus (threshold
    // 0 — the worst case, low-similarity pairs carry the largest estimator
    // error), |est_jaccard − exact jaccard over the SAME character-5-gram
    // shingle sets (HashExpressions.MinHashSignature:78-96 semantics)| is
    // bounded by 4σ of the 64-lane estimator (σ = √(J(1−J)/64) ≤ 0.0625).
    val docs = graft.Tables(spark, sf001, "documents")
    // pre-project normalization to a bound column: an inline HOF lambda
    // would re-normalize the full text once per shingle
    val normed = docs.select(col("doc_id"), Dedup.normalize(col("text")).as("t"))
    val t = col("t")
    val sh = normed.select(col("doc_id"), explode(array_distinct(transform(
        sequence(lit(0), greatest(length(t) - 5, lit(0))),
        i => t.substr(i + 1, lit(5))))).as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val cands = Dedup.minhashCandidatePairs(
      Dedup.minhashSignatures(docs, "doc_id", "text"), 64, 16, threshold = 0.0)
    val common = cands
      .join(sh.select(col("doc_id").as("a_id"), col("sh")), Seq("a_id"))
      .join(sh.select(col("doc_id").as("b_id"), col("sh")), Seq("b_id", "sh"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("common"))
    val errs = cands.join(common, Seq("a_id", "b_id"), "left")
      .na.fill(0L, Seq("common"))
      .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("la")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("lb")), Seq("b_id"))
      .select(abs(col("est_jaccard") - col("common").cast("double") /
        (col("la") + col("lb") - col("common")).cast("double")).as("err"))
      .collect().map(_.getDouble(0))
    assert(errs.length >= 20, s"expected a meaningful candidate sample, got ${errs.length}")
    assert(errs.max <= 0.25, f"max |est-exact| = ${errs.max}%.3f exceeds 4 sigma")
    assert(errs.sum / errs.length <= 0.08,
      f"mean |est-exact| = ${errs.sum / errs.length}%.3f exceeds 0.08")
  }

  test("simhash skew guard: hot block is split, results unchanged") {
    // 2000 docs planted into ONE (quarter 0) block: every simhash shares the
    // low 16 bits, so the unguarded self-join would put all ~2M candidate
    // pairs in a single task. High 48 bits come from a deterministic hash so
    // almost all pairs fail the hamming check; three planted near-dups must
    // survive: 0≡1 (hamming 0) and 0~2 (hamming 1).
    val n = 2000
    val rows = (0 until n).map { i =>
      val high =
        if (i <= 1) 0L // docs 0 and 1: identical simhash
        else if (i == 2) 1L << 20 // doc 2: hamming 1 from doc 0
        else scala.util.hashing.MurmurHash3.stringHash(s"doc$i").toLong << 16
      (i.toLong, (high & ~0xFFFFL) | 0x1234L)
    }
    val sigs = rows.toDF("doc_id", "simhash")
    // cardinality: the planted block must be split into ceil(2000/100)=20
    // sub-buckets and no sub-bucket may go quadratic (≤2× the cap even with
    // hash-assignment imbalance)
    val split = Dedup.simhashBlockSplits(sigs, blockCap = 100)
    val hotSplits = split.filter(col("quarter") === 0 && col("block") === 0x1234L)
    assert(hotSplits.select(max("nsplits")).head().getInt(0) == 20)
    val maxBucket = hotSplits.groupBy("sub").count()
      .select(max("count")).head().getLong(0)
    assert(maxBucket <= 200, s"sub-bucket of $maxBucket rows exceeds 2x cap")
    // correctness: guarded result is EXACTLY the unguarded result
    def pairSet(blockCap: Int) =
      Dedup.simhashPairs(sigs, maxHamming = 3, blockCap = blockCap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val guarded = pairSet(100)
    assert(guarded == pairSet(Int.MaxValue))
    assert(guarded.contains((0L, 1L, 0)) && guarded.contains((0L, 2L, 1))
      && guarded.contains((1L, 2L, 1)))
  }

  test("ngram jaccard: exact value for hand-computed pair") {
    val two = Seq(
      (1L, "a b c d e"), // 3-grams: {a b c, b c d, c d e}
      (2L, "a b c d x"), // 3-grams: {a b c, b c d, c d x} -> common 2, union 4
    ).toDF("doc_id", "text")
    val rows = Dedup.ngramJaccardPairs(two, "doc_id", "text", n = 3, threshold = 0.0)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("common") == 2 && r.getAs[Int]("la") == 3
      && r.getAs[Int]("lb") == 3)
    assert(math.abs(r.getAs[Double]("jac") - 0.5) < 1e-15)
  }

  test("prefix-filtered ngram jaccard is EXACTLY equal to the naive inverted index") {
    val docs500 = graft.Tables(spark, sf0001, "documents")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Long]("common"),
        r.getAs[Double]("jac"))
    // 0.5 is exactly representable; 0.8 is NOT (1-0.8 = 0.1999...96) — the
    // second threshold regression-tests the FP-epsilon prefix-length guard
    for (t <- Seq(0.5, 0.8)) {
      val naive = Dedup.ngramJaccardPairs(docs500, "doc_id", "text", 3, t)
        .collect().map(key).toSet
      val prefix = Dedup.ngramJaccardPairsPrefix(docs500, "doc_id", "text", 3, t)
        .collect().map(key).toSet
      assert(naive == prefix, s"threshold $t: ${naive.size} vs ${prefix.size}")
      assert(naive.nonEmpty)
    }
  }

  test("containment catches short-doc-embedded-in-long that jaccard misses") {
    val two = Seq(
      (1L, "alpha beta gamma delta"), // 2 3-grams, fully inside doc 2
      (2L, "intro words here alpha beta gamma delta and then a much longer tail " +
        "with many extra tokens that dilute the jaccard similarity a lot more"),
    ).toDF("doc_id", "text")
    val jac = Dedup.ngramJaccardPairs(two, "doc_id", "text", 3, 0.5).collect()
    assert(jac.isEmpty) // symmetric jaccard is tiny
    val cont = Dedup.ngramContainmentPairs(two, "doc_id", "text", 3, 0.9).collect()
    assert(cont.length == 1)
    assert(cont.head.getAs[Double]("cont_a") == 1.0) // doc 1 fully contained
  }

  test("decontamination report flags a benchmark item embedded in a corpus doc") {
    val corpus = Seq(
      (1L, "intro words here alpha beta gamma delta epsilon and then a long tail"),
      (2L, "nothing related to the benchmark content at all in this document"),
    ).toDF("doc_id", "text")
    val benchmark = Seq(
      (100L, "alpha beta gamma delta epsilon"), // fully inside doc 1
    ).toDF("doc_id", "text")
    val hits = Dedup.decontaminationReport(corpus, benchmark, "doc_id", "text",
      n = 3, threshold = 0.8).collect()
    assert(hits.length == 1)
    val h = hits.head
    assert(h.getAs[Long]("doc_id") == 1L && h.getAs[Long]("ref_id") == 100L)
    assert(h.getAs[Double]("containment") == 1.0)
    // the benchmark side is broadcast — the corpus side must not shuffle
    val plan = Dedup.decontaminationReport(corpus, benchmark, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("decontamination size guard: shuffle-join fallback equals the broadcast path") {
    val corpus = graft.Tables(spark, sf0001, "documents")
    val benchmark = corpus.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id") + 100000, col("text")).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Long]("ref_id"), r.getAs[Long]("common"),
        r.getAs[Double]("containment"))
    val small = Dedup.decontaminationReport(corpus, benchmark, "doc_id", "text")
    val large = Dedup.decontaminationReport(corpus, benchmark, "doc_id", "text",
      maxBroadcastGramRows = 0L) // force the over-ceiling fallback
    // the dispatch decision is ours (the hint); join strategy is the
    // planner's — below the ceiling we force a broadcast, above it we must
    // NOT (a forced broadcast of an over-ceiling index OOMs the driver)
    assert(small.queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(!large.queryExecution.analyzed.toString.contains("ResolvedHint"))
    val a = small.collect().map(key).toSet
    val b = large.collect().map(key).toSet
    assert(a == b && a.nonEmpty, s"${a.size} vs ${b.size}")
  }

  test("incremental minhash matches new-batch dups against a pre-signed corpus") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about spark catalyst optimizer rules"),
    ).toDF("doc_id", "text")
    val newBatch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 1
      (101L, "entirely novel text that matches nothing in the historical set"),
    ).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text")
    val matches = Dedup.incrementalMinhashMatches(
      newBatch, "doc_id", "text", sigs, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(matches.toSeq == Seq((100L, 1L)))
  }

  test("bloom incremental dedup is exact: equals the text anti-join, planted dups dropped") {
    val all = graft.Tables(spark, sf0001, "documents")
    val corpus = all.filter(col("doc_id") % 10 =!= 0)
    val newBatch = all.filter(col("doc_id") % 10 === 0)
    val novel = Dedup.bloomNovelDocs(newBatch, "doc_id", "text", corpus)
    val expected = newBatch.join(corpus.select(col("text")),
      Seq("text"), "left_anti")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    // exact despite the approximate sketch: verify join kills false positives
    assert(ids(novel) == ids(expected) && ids(novel).nonEmpty)
    // planted duplicate of a corpus doc is rejected; fresh text is accepted
    import spark.implicits._
    val corpusText = corpus.select("text").head().getString(0)
    val planted = Seq((900001L, corpusText),
      (900002L, "genuinely novel text never seen in any corpus document"))
      .toDF("doc_id", "text")
    assert(ids(Dedup.bloomNovelDocs(planted, "doc_id", "text", corpus)) == Set(900002L))
    // the sketch is evaluated as a native might_contain filter (map-side
    // pruning), not a join against the corpus for the definite-miss path
    val plan = novel.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected bloom filter in plan:\n$plan")
  }

  test("gram doc frequency plans as aggregate+join — no gram-partitioned window") {
    val docs500 = graft.Tables(spark, sf0001, "documents")
    // the df-capped path exercises withGramDocFreq in an inspectable plan
    val plan = Dedup.ngramJaccardPairs(docs500, "doc_id", "text",
      n = 3, threshold = 0.5, maxDocFreq = 100)
      .queryExecution.executedPlan.toString
    // a stop-gram's posting list in one window partition is an
    // unsplittable straggler; the capped path must contain NO window at all
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
    assert(plan.contains("HashAggregate"), "expected two-level aggregate")
  }

  test("auto-dispatched jaccard equals both explicit paths") {
    val docs500 = graft.Tables(spark, sf0001, "documents")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Long]("common"))
    val naiveSide = Dedup.ngramJaccardPairsAuto(docs500, "doc_id", "text",
      3, 0.8, prefixFilterMinDocs = Long.MaxValue).collect().map(key).toSet
    val prefixSide = Dedup.ngramJaccardPairsAuto(docs500, "doc_id", "text",
      3, 0.8, prefixFilterMinDocs = 1L).collect().map(key).toSet
    assert(naiveSide == prefixSide && naiveSide.nonEmpty)
  }

  test("containment: naive and prefix-filtered paths produce identical results") {
    val docs500 = graft.Tables(spark, sf0001, "documents")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Long]("common"),
        r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b"))
    for (t <- Seq(0.5, 0.9)) { // exact and FP-inexact thresholds
      val naive = Dedup.ngramContainmentPairs(docs500, "doc_id", "text", 3, t,
        prefixFilterMinDocs = Long.MaxValue).collect().map(key).toSet
      val prefix = Dedup.ngramContainmentPairs(docs500, "doc_id", "text", 3, t,
        prefixFilterMinDocs = 1L).collect().map(key).toSet
      assert(naive == prefix, s"threshold $t: ${naive.size} vs ${prefix.size}")
      assert(naive.nonEmpty)
    }
  }

  test("distributed clustering releases its caches: storage is O(1) in sweeps") {
    import spark.implicits._
    val before = spark.sparkContext.getRDDStorageInfo.length
    // a 9-hop chain forces 9 label-propagation sweeps; localEdgeThreshold=0
    // forces the distributed path (the default would solve this locally)
    val ids = (0 to 9).map(i => i * 10L)
    val nodes = ids.toDF("doc_id")
    val chain = ids.zip(ids.tail).toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(nodes, chain, localEdgeThreshold = 0L)
    assert(cc.collect().forall(_.getLong(1) == 0L))
    val after = spark.sparkContext.getRDDStorageInfo.length
    // everything except the final sweep's materialized labels is
    // unpersisted — NOT O(#sweeps) leftover label/edge caches
    assert(after - before <= 1, s"leaked cached RDDs: before=$before after=$after")
  }

  test("local union-find path equals the distributed propagation") {
    import spark.implicits._
    val ids = (0 to 9).map(i => i * 10L) ++ Seq(777L)
    val nodes = ids.toDF("doc_id")
    val chain = (0 to 9).map(i => i * 10L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("a_id", "b_id")
    def run(threshold: Long) =
      Dedup.connectedComponents(nodes, chain, localEdgeThreshold = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(Long.MaxValue) == run(0L))
    assert(run(Long.MaxValue)(777L) == 777L) // singleton preserved either way
  }

  test("unconverged distributed propagation throws instead of splitting clusters") {
    import spark.implicits._
    val ids = (0 to 9).map(i => i * 10L)
    val nodes = ids.toDF("doc_id")
    val chain = ids.zip(ids.tail).toDF("a_id", "b_id")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(nodes, chain,
        maxIterations = 3, localEdgeThreshold = 0L).collect()
    }
  }

  test("ngram jaccard maxDocFreq cap drops stop-gram-only pairs but keeps near-dups") {
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5, maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((1L, 2L)) && capped.contains((1L, 3L)))
  }

  test("repeated spans: cross-doc k-gram repeats merge to maximal spans; strip excises them") {
    import spark.implicits._
    // docs 1 and 2 share a 7-token run (3 overlapping 5-grams each -> one
    // merged span per doc); doc 3 is clean; doc 4 repeats a 5-gram WITHIN
    // itself at positions 0 and 6 (gap 6 > k -> two separate spans)
    val shared = "the quick brown fox jumps over fences"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"$shared epsilon zeta eta theta iota"),
      (3L, "one two three four five six seven eight nine"),
      (4L, "a b c d e x a b c d e")).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    // doc 1: shared run spans tokens 2..8 (3 grams); doc 2: tokens 0..6
    assert(spans.filter(_._1 == 1L).toSeq == Seq((1L, 2, 8, 3L)), s"${spans.toSeq}")
    assert(spans.filter(_._1 == 2L).toSeq == Seq((2L, 0, 6, 3L)), s"${spans.toSeq}")
    assert(!spans.exists(_._1 == 3L), "clean doc must have no spans")
    // doc 4: 'a b c d e' at 0..4 and 6..10 — gap 6 > k keeps them apart
    assert(spans.filter(_._1 == 4L).toSeq == Seq((4L, 0, 4, 1L), (4L, 6, 10, 1L)),
      s"${spans.toSeq}")
    val clean = Dedup.stripRepeatedSpans(docs, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(clean(1L) == ("alpha beta gamma delta", 7))
    assert(clean(2L) == ("epsilon zeta eta theta iota", 7))
    assert(clean(3L) == ("one two three four five six seven eight nine", 0))
    assert(clean(4L) == ("x", 10))
  }

  test("benchmark span contamination flags only corpus spans matching benchmark grams") {
    import spark.implicits._
    val bench = Seq((100L, "what is the capital of france paris is")).toDF("doc_id", "text")
    val corpus = Seq(
      // leaks the benchmark's first 6 tokens at positions 2..7
      (1L, s"intro text what is the capital of france and more trailing words"),
      (2L, "completely unrelated content about other topics entirely here")
    ).toDF("doc_id", "text")
    val spans = Dedup.benchmarkSpanContamination(corpus, bench,
      "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // 'what is the capital of france' = 6 tokens -> two 5-grams at corpus
    // positions 2 and 3 -> one merged span tokens 2..7
    assert(spans.toSeq == Seq((1L, 2, 7, 2L)), s"${spans.toSeq}")
    // the plan must not shuffle the corpus for membership: broadcast semi-join
    val plan = Dedup.benchmarkSpanContamination(corpus, bench, "doc_id", "text", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"benchmark membership must be a broadcast semi-join:\n$plan")
  }

  test("keepBest keeps the highest-quality cluster member, min id on ties") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L))
      .toDF("doc_id", "cluster_id")
    def kept(scores: org.apache.spark.sql.DataFrame) =
      Dedup.keepBest(clusters, scores, "doc_id", "cluster_id", "quality_score")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    // quality beats min-id survivorship: 2 outscores 1 in cluster 1
    assert(kept(Seq((1L, 0.2), (2L, 0.9), (3L, 0.5))
      .toDF("doc_id", "quality_score")) == Set(2L, 3L))
    // exact tie falls back to the smallest id
    assert(kept(Seq((1L, 0.9), (2L, 0.9), (3L, 0.5))
      .toDF("doc_id", "quality_score")) == Set(1L, 3L))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged by content hash") {
    import spark.implicits._
    val oldSnap = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val newSnap = Seq((2L, "beta"), (3L, "gamma v2"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("lshTuningCurve: S-curve rises with t; more rows/band sharpens it") {
    val rows = Dedup.lshTuningCurve(spark,
      Seq((16, 4), (8, 8)), (1 to 19).map(_ * 0.05))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 38)
    assert(rows.forall { case (_, _, _, p) => p >= 0.0 && p <= 1.0 })
    // monotone nondecreasing in t per layout
    Seq((16, 4), (8, 8)).foreach { case (b, r) =>
      val ps = rows.filter(x => x._1 == b && x._2 == r).sortBy(_._3).map(_._4)
      assert(ps.zip(ps.tail).forall { case (a, c) => c >= a })
    }
    // 8x8 (more rows per band) admits fewer low-similarity pairs than
    // 16x4 at t=0.3, and both layouts nearly always catch t=0.9 pairs
    def p(b: Int, r: Int, t: Double) =
      rows.find(x => x._1 == b && x._2 == r && math.abs(x._3 - t) < 1e-9).get._4
    assert(p(8, 8, 0.3) < p(16, 4, 0.3))
    assert(p(16, 4, 0.9) > 0.99 && p(8, 8, 0.9) > 0.96)
  }
}
