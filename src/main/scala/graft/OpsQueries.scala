package graft

import graft.ops.{Dedup, Graph, Pca, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Extension-surface queries (SURVEY.md §7.5 + the training-data-pipeline
 * operators): dedup, similarity search, text analysis. Oracle SQL is
 * provided wherever DuckDB can express the exact same computation
 * (md5/set/jaccard/cosine); hash-based operators (xxhash64 signatures) have
 * no DuckDB twin and get the driver's rows-only check, with their
 * correctness asserted structurally in ScalaTest instead.
 */
object OpsQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  /** One persisted IVF index per corpus dir per JVM (see
    * `sim_topk_ivf_indexed` — build amortization is the semantics). The
    * shutdown hook reclaims the temp trees: without it every bench/verify
    * JVM would leak a full on-disk index copy of the corpus into /tmp. */
  private val ivfIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** Temp text-index trees (bm25), reclaimed by the same shutdown hook. */
  private val textIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** Temp duplicate-graph index trees ([[Dedup.writeDupGraph]]), reclaimed
    * by the same shutdown hook — the PPJoin edge derivation is the
    * expensive pass shared by every `graph_*_indexed` analytic, built once
    * per corpus dir per JVM (the [[cachedIndex]] amortization argument:
    * at 100 TB the edge list is computed once per corpus snapshot and
    * every graph query reads stored edges). */
  private val dupGraphCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** One fitted PCA model per corpus dir per JVM — the [[cachedIndex]]
    * amortization argument: the moments pass + eigensolve is TRAINING,
    * reused across the projection/retrieval queries (and kept identical
    * to the side-exported copy the oracle reads). Driver-held doubles
    * only (d² + k·d), nothing on disk to reclaim. */
  private val pcaModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, Pca.PcaModel]()

  /** Fit-once accessor for the per-corpus PCA model, which ALSO
    * side-exports the components (+offsets) and the mean — every
    * pca-consuming oracle reads exactly the model this JVM fitted,
    * regardless of which query runs first. */
  private def cachedPcaModel(
      s: SparkSession, dir: String,
      e: org.apache.spark.sql.DataFrame): Pca.PcaModel = {
    val model = pcaModelCache.computeIfAbsent(dir, _ => Pca.fit(e, 8))
    sideExport("pca_model", dir) {
      import s.implicits._
      val offs = model.offsets
      (for {
        c <- model.components.indices
        i <- 0 until model.dim
      } yield (c, i, model.components(c)(i), offs(c)))
        .toDF("comp", "idx", "coef", "off")
    }
    sideExport("pca_mean", dir) {
      import s.implicits._
      model.mean.toIndexedSeq.zipWithIndex.map { case (m, i) => (i, m) }
        .toDF("idx", "mu")
    }
    model
  }

  /** One trained unigram piece table per corpus dir per JVM — the
    * cachedPcaModel fit-once pattern: the EM rounds are TRAINING, shared
    * by the train-table query and the encode query instead of re-run
    * per invocation (review finding). Driver rows only (vocab-sized). */
  private val unigramModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, String, Long, Double)]]()

  private def cachedUnigramModel(
      s: SparkSession, dir: String): Seq[(Int, String, Long, Double)] =
    unigramModelCache.computeIfAbsent(dir, _ =>
      TextAnalysis.unigramFit(docs(s, dir), "text", vocabSize = 120))

  /** One FULL-RANK (dim×dim) rotation per corpus dir — the OPQ basis.
    * Separate cache from the 8-component projection model: same fit
    * machinery, different rank; side-exported so the OPQ oracle replays
    * the identical rotation. */
  private val opqModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, Pca.PcaModel]()

  private def cachedOpqModel(
      s: SparkSession, dir: String,
      e: org.apache.spark.sql.DataFrame): Pca.PcaModel = {
    val model = opqModelCache.computeIfAbsent(dir, _ => {
      val d = e.select(size(col("embedding"))).head().getInt(0)
      Pca.fit(e, d)
    })
    sideExport("opq_model", dir) {
      import s.implicits._
      (for {
        c <- model.components.indices
        i <- 0 until model.dim
      } yield (c, i, model.components(c)(i))).toDF("comp", "idx", "coef")
    }
    model
  }

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    Seq(ivfIndexCache, textIndexCache, dupGraphCache).foreach(_.values.forEach { p =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(p))
    })))

  /** Export-once parquet SIDE INPUTS for the policy-layer oracles: the
    * xxhash64-derived layer (minhash signatures, simhashes, LSH buckets,
    * cluster assignments) has no SQL twin, but every layer ABOVE it —
    * banding, estimators, Hamming verification, survivorship, ranking —
    * is pure SQL over a fixed assignment. The export path is rooted at a
    * PER-JVM run token and keyed by (export name, corpus basename); the
    * oracle SQL carries `__SIDEROOT__`/`__SFBASE__` placeholders that
    * `SparkEntry.oracleSqlFor` resolves against this JVM's token and the
    * requested SF — so the DuckDB compare always reads exactly the export
    * its own Verify run wrote (no cross-JVM clobbering, no stale exports
    * from earlier code versions, and selfcheck is meaningful at every
    * SF, not just the driver's sf0.01). Built once per (export, corpus)
    * per JVM so warm bench iterations price the operator, not the
    * verification artifact. NOT reclaimed by the shutdown hook — DuckDB
    * reads them after this JVM exits; all tiny (≤ corpus-row
    * scalars/signatures). */
  private[graft] val sideRoot: String = {
    // best-effort sweep of PRIOR runs' export roots (> 6 h old — far past
    // any run's Verify→DuckDB window) so the per-run layout stays bounded
    // on a long-lived host instead of accreting one tree per JVM forever
    val base = new java.io.File("/tmp/graft_side")
    val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
    Option(base.listFiles()).foreach(_.filter(_.lastModified() < cutoff)
      .foreach { old =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(old)
      })
    s"/tmp/graft_side/${java.util.UUID.randomUUID().toString.take(8)}"
  }
  private val sideExports =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def sideExport(name: String, dir: String)(build: => DataFrame): String =
    sideExports.computeIfAbsent(s"$name@$dir", _ => {
      val p = s"$sideRoot/$name/${new java.io.File(dir).getName}"
      build.coalesce(1).write.mode("overwrite").parquet(p)
      p
    })

  /** Build-once accessor for the persisted IVF index over a corpus dir
    * (shared by the three `sim_*_indexed*`/`sim_index_health` queries). */
  private def cachedIndex(s: SparkSession, dir: String): String =
    ivfIndexCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
      Similarity.writeIvfIndex(emb(s, dir), p, nCells = 16)
      p
    })

  /** Build-once accessor for the persisted duplicate-graph index (the
    * [[cachedIndex]] amortization semantics; n=3, threshold=0.8 — the
    * exact geometry every in-memory graph_* lane derives, so the indexed
    * twins share their oracles verbatim). */
  private def cachedDupGraph(s: SparkSession, dir: String): String =
    dupGraphCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft_dup_graph").toString
      Dedup.writeDupGraph(docs(s, dir), "doc_id", "text", p,
        n = 3, threshold = 0.8)
      p
    })

  /** Build-once accessor for the persisted BM25 text index (same
    * amortization semantics as [[cachedIndex]]). */
  private def cachedTextIndex(s: SparkSession, dir: String): String =
    textIndexCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft_text_idx").toString
      TextAnalysis.writeTextIndex(docs(s, dir), "doc_id", "text", p)
      p
    })

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------------------- dedup
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir), "doc_id", "text")),

    // exact variant capped to 1000 docs (covers every row at the sf0.01
    // oracle scale; bounds the inverted-index fan-out at bench scale —
    // the tiny synthetic vocabulary makes every 3-gram a stop-gram)
    "dedup_ngram_pairs" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir).filter(col("doc_id") < 1000),
        "doc_id", "text", n = 3, threshold = 0.8)),

    // scale variant: EXACT prefix-filtered join (PPJoin-style) over the
    // uncapped corpus — same result as the naive inverted index, candidate
    // volume shrunk ~(1-t)²; oracle-checked against the full-corpus SQL
    "dedup_ngram_pairs_filtered" -> ((s, dir) =>
      Dedup.ngramJaccardPairsPrefix(docs(s, dir), "doc_id", "text",
        n = 3, threshold = 0.8)),

    // exact substring dedup (the repeated-span detector of the
    // "deduplicating training data" line): every token k-gram occurring
    // more than once corpus-wide, merged per doc into maximal spans —
    // linear tokenize + one gram-key aggregate + per-doc island windows,
    // no all-pairs stage
    "dedup_repeated_spans" -> ((s, dir) =>
      Dedup.repeatedSpans(docs(s, dir), "doc_id", "text", k = 5)),

    // the excision composition: tokens inside any repeated span dropped,
    // survivors re-joined (boilerplate/contamination strip semantics)
    "dedup_strip_spans" -> ((s, dir) =>
      Dedup.stripRepeatedSpans(docs(s, dir), "doc_id", "text", k = 5)),

    // the doc-level FILTER signal derived from the span detector: fraction
    // of each document's tokens covered by some cross-corpus repeated
    // 5-gram span (the Gopher-style duplicate-text ratio) — merged spans
    // are disjoint so coverage is a straight span-length sum per doc
    "text_dup_span_fraction" -> ((s, dir) => {
      val d = docs(s, dir)
      val spans = Dedup.repeatedSpans(d, "doc_id", "text", k = 5)
        .groupBy("doc_id")
        .agg(sum(col("span_end") - col("span_start") + 1).as("dup_tokens"))
      d.select(col("doc_id"),
          // the span detector's own tokenization (trim + regex split),
          // NOT word_tokens (which lowercases) — the ratio must be over
          // the same token stream the spans index into
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
        .join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
            greatest(col("n_tokens"), lit(1L)), 6).as("dup_fraction_r"))
    }),

    // snapshot-to-snapshot change census (incremental-crawl planning):
    // old = all but every 19th doc, new = all but every 23rd with every
    // 7th doc's text amended — both sides reduce to (id, md5) before the
    // full-outer join, so only fingerprints shuffle
    "corpus_diff" -> ((s, dir) => {
      val d = docs(s, dir)
      val oldSnap = d.filter(col("doc_id") % 19 =!= 0)
      val newSnap = d.filter(col("doc_id") % 23 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
    }),

    // connected components as a FIRST-CLASS operator (not just the
    // minhash-cluster internal): min-label components over the bucketed
    // PPJoin edge set, every doc labeled (singletons self-labeled via the
    // lazy anti-join branch). Full SQL oracle: same edges + recursive
    // transitive closure — no side input, no cartesian carrier.
    "graph_components" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.ngramJaccardPairsPrefix(d, "doc_id", "text",
        n = 3, threshold = 0.8).select(col("a_id"), col("b_id"))
      Dedup.connectedComponents(d.select(col("doc_id")), pairs)
    }),

    // PageRank over the same near-dup edge set — the per-node importance
    // signal for "which document is the canonical one in this duplicate
    // neighborhood". Fixed 5 power-iteration sweeps over the symmetrized
    // degree-weighted edges; full SQL oracle (iterations unrolled as
    // chained CTEs, double-forced damping literals).
    "graph_pagerank" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.ngramJaccardPairsPrefix(d, "doc_id", "text",
        n = 3, threshold = 0.8).select(col("a_id"), col("b_id"))
      Graph.pageRank(pairs, iterations = 5, damping = 0.85)
    }),

    // PERSONALIZED PageRank from a seed set: restart mass returns to the
    // seeds, so the stationary mass is graph-proximity TO the seeds —
    // the "what else is transitively near these documents" expansion
    // primitive (contamination neighborhoods, cluster growing)
    "graph_ppr" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.ngramJaccardPairsPrefix(d, "doc_id", "text",
        n = 3, threshold = 0.8).select(col("a_id"), col("b_id"))
      Graph.personalizedPageRank(pairs,
        d.select(col("doc_id")).filter(col("doc_id") < 50))
    }),

    // WEIGHTED PageRank: rank mass flows through the similarity weights
    // themselves (the PPJoin jaccard), so a doc bound by STRONG duplicate
    // links outranks one with many weak ones — the canonical-document
    // signal weighted by how duplicate the neighborhood actually is
    "graph_pagerank_weighted" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.ngramJaccardPairsPrefix(d, "doc_id", "text",
        n = 3, threshold = 0.8)
        .select(col("a_id"), col("b_id"), col("jac").as("weight"))
      Graph.pageRankWeighted(pairs, "weight")
    }),

    // per-node triangle participation + degree on the same edge set — the
    // local-clustering signal separating dense duplicate cliques from hub
    // artifacts (a template string matching many unrelated docs). Oriented
    // a<b<c enumeration, exact integers, full SQL oracle.
    "graph_triangles" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.ngramJaccardPairsPrefix(d, "doc_id", "text",
        n = 3, threshold = 0.8).select(col("a_id"), col("b_id"))
      Graph.triangleStats(pairs)
    }),

    // ----- PERSISTED-INDEX graph lanes: every analytic below reads the
    // stored edge list ([[Dedup.writeDupGraph]], built once per corpus —
    // the sim_topk_ivf_indexed posture) instead of re-deriving the PPJoin
    // candidate join per query. Row-identical to the in-memory twins by
    // construction, so each SHARES its twin's full SQL oracle.
    "graph_components_indexed" -> ((s, dir) => {
      val edges = Dedup.readDupGraph(s, cachedDupGraph(s, dir))
        .select(col("a_id"), col("b_id"))
      Dedup.connectedComponents(docs(s, dir).select(col("doc_id")), edges)
    }),

    "graph_pagerank_indexed" -> ((s, dir) =>
      Graph.pageRank(Dedup.readDupGraph(s, cachedDupGraph(s, dir))
        .select(col("a_id"), col("b_id")))),

    "graph_ppr_indexed" -> ((s, dir) =>
      Graph.personalizedPageRank(
        Dedup.readDupGraph(s, cachedDupGraph(s, dir))
          .select(col("a_id"), col("b_id")),
        docs(s, dir).select(col("doc_id")).filter(col("doc_id") < 50))),

    "graph_pagerank_weighted_indexed" -> ((s, dir) =>
      Graph.pageRankWeighted(
        Dedup.readDupGraph(s, cachedDupGraph(s, dir))
          .select(col("a_id"), col("b_id"), col("jac").as("weight")),
        "weight")),

    "graph_triangles_indexed" -> ((s, dir) =>
      Graph.triangleStats(Dedup.readDupGraph(s, cachedDupGraph(s, dir))
        .select(col("a_id"), col("b_id")))),

    // the dup-graph's index-health read (the ivfIndexHealth /
    // postingsHealth symmetry): per-decile edge volume + share from the
    // stored tree — the partition column is the grouping key, so the
    // aggregate reads file metadata, never edge payload bytes
    "dedup_graph_health" -> ((s, dir) =>
      Dedup.dupGraphHealth(s, cachedDupGraph(s, dir))),

    // STRONG-edge components through the index's pruning dimension: the
    // jband partition column turns `minJaccard = 0.9` into a
    // directory-pruned read (deciles 8 of 10 never open), and the exact
    // per-row refine keeps it lossless — the "cluster at 0.9 after
    // building at 0.8" re-analysis that motivates the decile layout,
    // exercised end-to-end under its own full SQL oracle.
    "graph_components_strong" -> ((s, dir) => {
      val edges = Dedup.readDupGraph(s, cachedDupGraph(s, dir),
        minJaccard = 0.9).select(col("a_id"), col("b_id"))
      Dedup.connectedComponents(docs(s, dir).select(col("doc_id")), edges)
    }),

    // INCREMENTAL components over the indexed edges: an "old" corpus
    // labeling ([[Dedup.connectedComponents]]) plus one
    // [[Dedup.appendToComponents]] batch fold of the "new" quarter —
    // new-new, new-old, and the singleton lanes all exercised. The final
    // labeling equals the full recompute by the contraction argument, so
    // it SHARES graph_components' full SQL oracle.
    "graph_components_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val edges = Dedup.readDupGraph(s, cachedDupGraph(s, dir))
        .select(col("a_id"), col("b_id"))
      val stored = Dedup.connectedComponents(
        d.select(col("doc_id")).filter(col("doc_id") % 4 =!= 0),
        edges.filter(col("a_id") % 4 =!= 0 && col("b_id") % 4 =!= 0))
      Dedup.appendToComponents(stored,
        d.select(col("doc_id")).filter(col("doc_id") % 4 === 0),
        edges.filter(col("a_id") % 4 === 0 || col("b_id") % 4 === 0))
    }),

    // the minhash design table itself as a first-class query: detection
    // probability 1-(1-t^r)^b for the layouts this codebase ships (64
    // hashes as 16x4 / 8x8 / 32x2), on a 5%-step similarity grid —
    // chained-multiply powers, bit-identical in any IEEE engine
    "lsh_tuning_curve" -> ((s, dir) =>
      Dedup.lshTuningCurve(s, Seq((16, 4), (8, 8), (32, 2)),
        (1 to 19).map(_ * 0.05))),

    // span-level decontamination (the GPT-3-style long-n-gram filter):
    // corpus positions whose 8-gram appears anywhere in the benchmark
    // stand-in (every 37th doc), merged to contaminated spans — benchmark
    // grams broadcast, corpus probes by semi-join and never shuffles for
    // membership
    "dedup_decontaminate_spans" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.benchmarkSpanContamination(
        d.filter(col("doc_id") % 37 =!= 0), d.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", k = 8)
    }),

    // decontamination: containment-dominant pairs (short-in-long leakage)
    "dedup_containment" -> ((s, dir) =>
      Dedup.ngramContainmentPairs(docs(s, dir).filter(col("doc_id") < 1000),
        "doc_id", "text", n = 3, threshold = 0.9)),

    // decontamination report: every 37th doc stands in as the "benchmark
    // set" (small side, broadcast); exact duplicates of those docs in the
    // corpus surface as containment-1.0 leaks
    "dedup_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.decontaminationReport(
        d, d.filter(col("doc_id") % 37 === 0), "doc_id", "text",
        n = 3, threshold = 0.8)
    }),

    // production shape: dedup a "new batch" (last 10% of ids) against the
    // pre-signed historical corpus (first 90%). The corpus side reads the
    // EXPORTED signature table — both the production posture (signatures
    // persisted from prior runs) and the oracle's side input
    "dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val stats = d.agg(max(col("doc_id"))).head().getLong(0)
      val cut = (stats * 9) / 10
      val side = sideExport("minhash_sigs", dir)(
        Dedup.minhashSignatures(d, "doc_id", "text"))
      Dedup.incrementalMinhashMatches(
        d.filter(col("doc_id") > cut), "doc_id", "text",
        s.read.parquet(side).filter(col("doc_id") <= cut))
    }),

    // bloom-sketch incremental exact dedup: same new-batch/corpus split as
    // dedup_incremental, but via the compact-sketch path — the corpus is
    // one BloomFilterAggregate pass, the batch filters map-side, and only
    // might-contain rows pay the exact verification anti-join. Result is
    // exact (novel docs), so it gets a full anti-join oracle.
    "dedup_bloom_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val cut = (d.agg(max(col("doc_id"))).head().getLong(0) * 9) / 10
      Dedup.bloomNovelDocs(d.filter(col("doc_id") > cut), "doc_id", "text",
        d.filter(col("doc_id") <= cut))
    }),

    // signatures exported as the oracle's side input: the xxhash lanes
    // themselves have no SQL twin, but banding (full-band slice
    // equality), the lane-agreement estimator, and the threshold are
    // pure SQL over the exported table — the policy layer hash-verifies
    "dedup_minhash_pairs" -> ((s, dir) => {
      val side = sideExport("minhash_sigs", dir)(
        Dedup.minhashSignatures(docs(s, dir), "doc_id", "text"))
      Dedup.minhashCandidatePairs(s.read.parquet(side),
        numHashes = 64, bands = 16, threshold = 0.7)
        .select(col("a_id"), col("b_id"), col("est_jaccard"))
    }),

    // the same exported-signature side input as dedup_minhash_pairs; the
    // oracle re-derives the banded edge set in SQL and solves connected
    // components with a recursive transitive closure — min-id labeling
    // is pure policy over the exported layer
    "dedup_minhash_clusters" -> ((s, dir) => {
      sideExport("minhash_sigs", dir)(
        Dedup.minhashSignatures(docs(s, dir), "doc_id", "text"))
      Dedup.minhashDedup(docs(s, dir), "doc_id", "text")
        .filter(col("doc_id") =!= col("cluster_id")) // only non-singletons
    }),

    // simhash values exported for the oracle; the blocking is EXACT by
    // pigeonhole, so the oracle is simply the full pairwise Hamming join
    // over the exported hashes — a complete-result check
    "dedup_simhash_pairs" -> ((s, dir) => {
      val side = sideExport("simhash", dir)(
        Dedup.simhash64(docs(s, dir), "doc_id", "text"))
      Dedup.simhashPairs(s.read.parquet(side), maxHamming = 3)
    }),

    // quality-weighted survivorship: per minhash cluster keep the
    // highest-quality member (id-capped like the other quadratic-bounded
    // exact baselines; the cap covers every row at the sf0.01 oracle scale).
    // The xxhash64 minhash CLUSTERING has no SQL twin, but the survivorship
    // POLICY over a fixed assignment is pure SQL — so the Spark-computed
    // assignment is exported to KeepBestSideDir and the oracle re-applies
    // the policy (max score, min-id tie) to exactly those clusters,
    // hash-verifying the policy end-to-end. keepBest consumes the
    // READ-BACK side input, so the oracle sees byte-identical clusters.
    "dedup_keep_best" -> ((s, dir) => {
      val d = docs(s, dir).filter(col("doc_id") < 1000)
      val side = sideExport("keep_best_clusters", dir)(
        Dedup.minhashDedup(d, "doc_id", "text"))
      Dedup.keepBest(
        s.read.parquet(side),
        graft.ops.TextAnalysis.qualityScore(d, "doc_id", "text")
          .select("doc_id", "quality_score"),
        "doc_id", "cluster_id", "quality_score")
    }),

    // cap ids so bench scale (sf0.1, 5k vectors) stays quadratic-bounded;
    // the cap covers every row at the sf0.01 oracle scale.
    "dedup_embedding_pairs" -> ((s, dir) =>
      Similarity.nearDupPairsExact(
        emb(s, dir).filter(col("vec_id") < 1000), threshold = 0.4)),

    // hyperplane buckets exported for the oracle: the seeded-Gaussian
    // planes have no SQL twin, but collision (multi-probe over 1-bit
    // flips ⇒ Hamming(bucket_a, bucket_b) ≤ 1), exact cosine scoring,
    // and thresholding are pure SQL over the exported bucket table
    // threshold 0.3 (not the exact twin's 0.4): at the sf0.01 oracle scale
    // the hottest bucket-colliding pair sits at cosine 0.385, so 0.4 made
    // the oracle pass VACUOUSLY on 0=0 rows — 0.3 keeps a ~20-pair
    // non-empty result that actually exercises the collision policy,
    // threshold, and orientation handling end-to-end
    "dedup_embedding_pairs_lsh" -> ((s, dir) => {
      sideExport("lsh_buckets", dir)(emb(s, dir).select(col("vec_id"),
        Similarity.lshBucket(
          Similarity.toDouble(col("embedding")), 64, 12).as("bucket")))
      Similarity.nearDupPairs(
        emb(s, dir).filter(col("vec_id") < 1000), dim = 64, threshold = 0.3)
    }),

    // SemDeDup-style semantic dedup: IVF-cell-local greedy eps-dedup over
    // the embedding space (keep min-id per near-dup group within a cell)
    "dedup_semantic" -> ((s, dir) =>
      Similarity.semanticDedup(emb(s, dir), threshold = 0.4, nCells = 16)),

    // -------------------------------------------------------- similarity
    // int8 max-abs quantization, verified through scalar summaries of the
    // code arrays (sum/min/max are exact integer math)
    "sim_quantize_int8" -> ((s, dir) =>
      Similarity.quantizeInt8(emb(s, dir), "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          aggregate(col("qvec"), lit(0L), (a, v) => a + v).as("q_sum"),
          array_min(col("qvec")).as("q_min"),
          array_max(col("qvec")).as("q_max"))),

    // heap-aggregate twin of sim_topk_bruteforce: identical rows, O(k)
    // state per key instead of a full per-key sort (shares the window
    // formulation's oracle — the strongest equivalence check available)
    "sim_topk_heap" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceTopKHeap(e.filter(col("vec_id") < 10), e, k = 5)
    }),

    // the int8 codes driving retrieval: integer dots, dequantized scores
    "sim_topk_int8" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.quantizedTopK(e.filter(col("vec_id") < 10), e, k = 5)
    }),

    "sim_topk_bruteforce" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, k = 5)
    }),

    // same exported-bucket oracle pattern as dedup_embedding_pairs_lsh:
    // candidates = bucket-Hamming ≤ 1, then exact cosine ranking
    "sim_topk_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      sideExport("lsh_buckets", dir)(e.select(col("vec_id"),
        Similarity.lshBucket(
          Similarity.toDouble(col("embedding")), 64, 12).as("bucket")))
      Similarity.lshTopK(e.filter(col("vec_id") < 10), e, k = 5, dim = 64)
    }),

    "sim_topk_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfTopK(e.filter(col("vec_id") < 10), e, k = 5,
        nCells = 16, nProbe = 4)
    }),

    // hard-negative mining for contrastive training: per query, the top-5
    // most-similar DIFFERENT-label vectors, candidates from IVF probe
    // cells (bucketed join, label filter inside the probe, bounded heap)
    "mine_hard_negatives" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.hardNegatives(e.filter(col("vec_id") < 10), e, k = 5,
        nCells = 16, nProbe = 4)
    }),

    // one driver-side Lloyd iteration over a 256-vector md5-ordered sample
    // refines the centroid seed — better-balanced cells, same determinism
    "sim_topk_ivf_refined" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfTopK(e.filter(col("vec_id") < 10), e, k = 5,
        nCells = 16, nProbe = 4, refineIters = 1, sampleSize = 256)
    }),

    // int8 codes scored INSIDE IVF probe cells, ranked by the bounded
    // heap — quantized retrieval's scale path (no cross join, no window)
    "sim_topk_ivf_int8" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfQuantizedTopK(e.filter(col("vec_id") < 10), e, k = 5,
        nCells = 16, nProbe = 4)
    }),

    // IVF-PQ/ADC: 4-bit product-quantization codes (one packed long per
    // vector) scored through per-subspace lookup tables inside probe
    // cells — the memory rung below int8 SQ; md5-deterministic codebooks
    // keep the full algorithm oracle-reproducible
    "sim_topk_ivf_pq" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfPqTopK(e.filter(col("vec_id") < 10), e, k = 5,
        nCells = 16, nProbe = 4, m = 8, kSub = 16)
    }),

    // OPQ-style rotated IVF-PQ: the same 4-bit ADC machinery run in the
    // corpus's full-rank PCA eigenbasis (Ge et al.'s non-parametric OPQ
    // init) — the rotation preserves exact inner products but
    // decorrelates coordinates so the m contiguous subspaces each carry
    // a coherent variance slice; rotation side-exported for the oracle
    "sim_topk_ivf_opq" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfPqOpqTopK(e.filter(col("vec_id") < 10), e, k = 5,
        rotation = cachedOpqModel(s, dir, e),
        nCells = 16, nProbe = 4, m = 8, kSub = 16)
    }),

    // the standard IVF-PQ deployment: 4-bit ADC candidates (kCand=20) →
    // exact float rerank of only those survivors — ADC is the candidate
    // GENERATOR (bandwidth), the floats do the final ranking (quality)
    "sim_topk_ivf_pq_rerank" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfPqTopKRerank(e.filter(col("vec_id") < 10), e, k = 5,
        kCand = 20, nCells = 16, nProbe = 4, m = 8, kSub = 16)
    }),

    // residual IVF-PQ: codes quantize x − centroid[cell] instead of raw x
    // (the classic recall improvement at the same 4-bit budget — the
    // codebook only covers within-cell displacements); scoring decomposes
    // q·x = q·centroid + ADC(q·residual). The codebook is the
    // OFFSET md5 sample (rows nCells..nCells+kSub) residualized against
    // its nearest centroid — deterministic, so the full algorithm keeps a
    // DuckDB oracle
    "sim_topk_ivf_pq_residual" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfPqResidualTopK(e.filter(col("vec_id") < 10), e, k = 5,
        nCells = 16, nProbe = 4, m = 8, kSub = 16)
    }),

    // distributed PCA, step 1 surfaced as a query: the one-pass mergeable
    // moments aggregate (one O(d²) buffer per task, ONE driver row) →
    // upper-triangle covariance rows. The d²-blowup declarative twin IS
    // the oracle — DuckDB pays the explode, the engine never does.
    "sim_pca_covariance" -> ((s, dir) =>
      Pca.covarianceDf(s, emb(s, dir))),

    // the persisted-moments MAINTENANCE loop surfaced as a query: state
    // written from the even-id half, the odd-id half APPENDED (one pass
    // over the batch + an O(d²) elementwise add — the historical corpus
    // is never re-scanned), covariance re-derived from the merged
    // statistics. The oracle is the full-corpus covariance SQL: merged
    // moments ARE the corpus moments (sum associativity; the changed fp
    // accumulation order sits under the same round-6 guard).
    "sim_pca_covariance_incremental" -> ((s, dir) => {
      val e = emb(s, dir)
      val st = java.nio.file.Files.createTempDirectory("graft_pca_state").toString
      Pca.writeMomentsState(e.filter(col("vec_id") % 2 === 0), st)
      Pca.appendMomentsState(s, st, e.filter(col("vec_id") % 2 === 1))
      val out = Pca.covarianceDfFromState(s, st)
      // covariance rows are driver-materialized by construction; the
      // O(d²)-byte state dir is reclaimable immediately
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(st))
      out
    }),

    // reduce-then-rank retrieval in PCA space (the data-adaptive sibling
    // of sim_topk_jl): fit is cached per corpus (training); the projected
    // corpus ranks under exact cosine in 8 dims. The fitted components
    // are side-exported so the oracle replays projection + ranking in SQL
    // over the exact model this JVM fitted.
    "sim_topk_pca" -> ((s, dir) => {
      val e = emb(s, dir)
      val model = cachedPcaModel(s, dir, e)
      Pca.pcaTopK(e.filter(col("vec_id") < 10), e, k = 5,
        nComponents = 8, precomputed = Some(model))
    }),

    // the PCA model's third consumer: per-vector low-rank residual — the
    // off-manifold outlier score for embedding curation (corrupt vectors,
    // encoder drift). Row-local after the cached fit; the side-exported
    // model + mean let the oracle replay the identical centered-dot folds.
    "sim_pca_recon" -> ((s, dir) => {
      val e = emb(s, dir)
      Pca.reconstructionError(e, cachedPcaModel(s, dir, e))
    }),

    // PQ over the PERSISTED index: stored pq_code longs (4 bytes/vector)
    // ADC-scored inside directory-pruned probe cells — row-identical to
    // sim_topk_ivf_pq by construction (same sidecar geometry), so the
    // oracle is shared (the int8 indexed-path precedent)
    "sim_topk_ivf_pq_indexed" -> ((s, dir) => {
      Similarity.ivfPqTopKIndexed(cachedIndex(s, dir),
        emb(s, dir).filter(col("vec_id") < 10), k = 5, nProbe = 4)
    }),

    // the persisted-index path: cells as parquet partition directories,
    // probe pruning = directory pruning; results identical to
    // sim_topk_ivf_int8 by construction (same centroids, same codes).
    // The index is built ONCE per corpus dir and reused across calls —
    // deliberately: amortizing the build over query batches is the
    // point of a persisted index, so bench warm iterations measure the
    // query-only cost (iteration 1 carries the build, like a first
    // deployment would)
    "sim_topk_ivf_indexed" -> ((s, dir) => {
      Similarity.ivfQuantizedTopKIndexed(cachedIndex(s, dir),
        emb(s, dir).filter(col("vec_id") < 10), k = 5, nProbe = 4)
    }),

    // the indexed path's rerank flavor: int8 candidates to kCand=20 from
    // the SAME pruned cell directories, exact float rescoring against the
    // vectors STORED IN THE INDEX — no second corpus pass, the rerank
    // read is still partition-pruned to the probed cells
    "sim_topk_ivf_indexed_rerank" -> ((s, dir) => {
      Similarity.ivfQuantizedTopKIndexed(cachedIndex(s, dir),
        emb(s, dir).filter(col("vec_id") < 10), k = 5, nProbe = 4, kCand = 20)
    }),

    // index health surface: per-cell occupancy + the global skew verdict
    // driving the documented rebuild threshold (one footer-count agg over
    // the partition column — no vector bytes read)
    "sim_index_health" -> ((s, dir) =>
      Similarity.ivfIndexHealth(s, cachedIndex(s, dir))),

    // JL random projection + IVF in the projected space: the
    // reduce-then-index recipe (64→16 dims cuts every downstream dot and
    // scan 4×); deterministic md5-sign Rademacher matrix keeps the whole
    // composition oracle-reproducible
    "sim_topk_jl" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.jlTopK(e.filter(col("vec_id") < 10), e, k = 5,
        outDim = 16, nCells = 16, nProbe = 4)
    }),

    // retrieval EVALUATION as a query: recall@5 of the JL-projected
    // retrieval against exact ground truth — ground truth comes from
    // FULL-PROBE IVF (nProbe = nCells covers every cell, so it equals
    // the brute-force ranking through the bucketed cell join — no
    // cartesian enters this plan)
    "sim_recall_jl" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
      Similarity.recallAtK(
        Similarity.jlTopK(q, e, k = 5, outDim = 16, nCells = 16, nProbe = 4),
        Similarity.ivfTopK(q, e, k = 5, nCells = 16, nProbe = 16))
    }),

    // -------------------------------------------------------- clustering
    // k-means assignments as a curation output (md5-sample seed + 2
    // driver-side sample-Lloyd iterations, bit-reproducible; one
    // zero-shuffle argmin pass over the corpus)
    "cluster_kmeans" -> ((s, dir) =>
      Similarity.kmeansAssign(emb(s, dir), k = 16, iters = 2,
        sampleSize = 256)),

    // per-cluster occupancy + exact-integer micro-inertia (the
    // measure-then-act input: skewed/diffuse clusters are the rebalance
    // and deeper-dedup candidates)
    "cluster_stats" -> ((s, dir) =>
      Similarity.kmeansStats(Similarity.kmeansAssign(emb(s, dir),
        k = 16, iters = 2, sampleSize = 256))),

    // diversity-preserving selection: 10 members per cluster in md5
    // order — cluster-balanced data pruning's sampling step
    "cluster_balanced_sample" -> ((s, dir) =>
      Similarity.clusterBalancedSample(emb(s, dir), perCluster = 10,
        k = 16, iters = 2, sampleSize = 256)),

    // + the standard rerank stage: 4k int8 candidates, exact float
    // rescoring of only those survivors (broadcast-bounded id join)
    "sim_topk_int8_rerank" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfQuantizedTopKRerank(e.filter(col("vec_id") < 10), e,
        k = 5, kCand = 20, nCells = 16, nProbe = 4)
    }),

    // ------------------------------------------------------------- text
    "text_tokens" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("n_ws_tokens"),
        TextAnalysis.regexTokenCount(col("text")).as("n_re_tokens"))),

    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityFeatures(docs(s, dir), "doc_id", "text")),

    "text_quality_score" -> ((s, dir) =>
      TextAnalysis.qualityScore(docs(s, dir), "doc_id", "text")
        .select("doc_id", "quality_score")),

    "text_langid" -> ((s, dir) =>
      TextAnalysis.languageId(docs(s, dir), "doc_id", "text")),

    // TRAINED multinomial Naive Bayes classifier (the fastText-filtering
    // role): fit add-1-smoothed token likelihoods + priors on the 80%
    // doc_id split, score every document against every class in one
    // zero-shuffle native pass, argmax with class tiebreak. is_train as
    // int — cross-engine boolean hashing is not guaranteed stable
    "text_classify_nb" -> ((s, dir) =>
      TextAnalysis.naiveBayesClassify(docs(s, dir), "doc_id", "text",
        "lang", col("doc_id") % 10 < 8, vocabSize = 1000)
        .withColumn("is_train", col("is_train").cast("int"))),

    "text_sentences" -> ((s, dir) =>
      TextAnalysis.sentences(docs(s, dir), "doc_id", "text")),

    // zlib compressibility as a boilerplate signal (no SQL deflate exists
    // → no_oracle; planted repetitive-vs-prose contract in ScalaTest)
    "text_compression_ratio" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        graft.functions.hashes.compression_ratio(col("text")).as("comp_ratio"))),

    // per-language bottom-quartile gate on doc length (exact discrete
    // quantile, value-threshold semantics — ties survive)
    "text_quality_gate" -> ((s, dir) =>
      TextAnalysis.percentileFilter(Tables(s, dir, "documents"),
        "lang", "n_chars", "doc_id", p = 0.25)
        .groupBy("lang").agg(count(lit(1)).as("n_kept"),
          min("n_chars").as("min_chars"))),

    "text_search" -> ((s, dir) =>
      TextAnalysis.termSearch(docs(s, dir), "doc_id", "text",
        Seq("spark", "table", "query"), k = 20)),

    "text_bm25" -> ((s, dir) =>
      TextAnalysis.bm25Search(docs(s, dir), "doc_id", "text",
        Seq("spark", "table", "query"), k = 20)),

    // the persisted-inverted-index path: query terms' md5 buckets become
    // a PARTITION FILTER on the postings scan; row-identical to
    // text_bm25 by construction (shared oracle), build amortized
    "text_bm25_indexed" -> ((s, dir) =>
      TextAnalysis.bm25SearchIndexed(s, cachedTextIndex(s, dir),
        Seq("spark", "table", "query"), k = 20)),

    // stop-gram report over the postings table: top terms by document
    // frequency + corpus share (the text-index health surface; feeds
    // maxDocFreq caps and stop-term lists)
    "text_index_topdf" -> ((s, dir) =>
      TextAnalysis.textIndexTopDf(s, cachedTextIndex(s, dir), k = 50)),

    // Hybrid retrieval: BM25 ∪ embedding-cosine top lists fused by
    // Reciprocal Rank Fusion (rank-only arithmetic — engine-exact)
    "text_hybrid_search" -> ((s, dir) =>
      TextAnalysis.hybridSearch(docs(s, dir), emb(s, dir), "doc_id", "text",
        Seq("spark", "table", "query"), queryVecId = 0L, k = 20)),

    // OOV scoring against the corpus-head vocabulary (top-100 tokens):
    // one broadcast membership join over the exploded token stream
    "text_vocab_coverage" -> ((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.vocabCoverage(d, "doc_id", "text",
        graft.ops.Relational.topTokens(d, "text", 100).select("token"))
    }),

    // PMI collocations: top bigram phrases by pointwise mutual information
    // (multi-word-entity discovery), min count 5
    "text_collocations" -> ((s, dir) =>
      TextAnalysis.collocations(docs(s, dir), "text", minCount = 5, k = 50)),

    // Frequent tokens by the Misra-Gries sketch + exact-recount path:
    // EXACTLY the tokens above 1% corpus share (the sketch's n/(k+1)
    // guarantee with k=199 makes the candidate set a superset of every
    // qualifying token; the bounded recount makes the output exact, so
    // the oracle is the plain HAVING formulation)
    "text_heavy_hitters" -> ((s, dir) =>
      TextAnalysis.heavyHitters(docs(s, dir), "text",
        minShare = 0.01, sketchK = 199)),

    // The PERSISTED-STATE twin: the MG counters built on a third of the
    // corpus and folded forward batch-by-batch (O(k)-byte state, no
    // corpus re-scan per append), then the on-demand exact recount — the
    // mergeable-summaries bound keeps the candidate set a superset of
    // every 1% token across any append sequence, so the output is
    // row-identical to the direct path (shared oracle)
    "text_heavy_hitters_state" -> ((s, dir) => {
      val d = docs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft_hh_state").toString
      TextAnalysis.writeHhState(
        d.filter(col("doc_id") % 3 === 0), "text", path, k = 199)
      TextAnalysis.appendToHhState(d.filter(col("doc_id") % 3 === 1), "text", path)
      TextAnalysis.appendToHhState(d.filter(col("doc_id") % 3 === 2), "text", path)
      TextAnalysis.heavyHittersFromState(d, "text", path, minShare = 0.01)
    }),

    // BPE merge-pair statistics (the counting step of byte-pair-encoding
    // tokenizer induction): most frequent adjacent character pairs inside
    // words, corpus-wide. Explode → partial-agg count → TakeOrdered —
    // the exact-top-k shape at any scale.
    "text_bpe_pairs" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(graft.functions.hashes.word_tokens(col("text"))).as("w"))
        .filter(length(col("w")) >= 2)
        .select(explode(transform(
          sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(20)),

    // BPE induction, second iteration: apply the corpus-top merge pair and
    // re-count adjacent symbol pairs — the statistics the NEXT merge
    // decision would rank (exact integer counting, oracle-matched)
    "text_bpe_merge" -> ((s, dir) =>
      graft.ops.TextAnalysis.bpeMergeRound(docs(s, dir), "text", k = 20)),

    // full tokenizer induction: 4 real merge rounds, each one distributed
    // count pass with all prior merges applied (no_oracle — the greedy
    // priority-order apply is not portable SQL; exact-equality contract
    // vs a driver-side reference trainer in TextAnalysisSpec)
    "text_bpe_train" -> ((s, dir) =>
      graft.ops.TextAnalysis.bpeTrain(docs(s, dir), "text", nMerges = 4)),

    // tokenizer APPLICATION: train 4 merges, then encode every document
    // with them (train-once-encode-corpus deployment shape; same
    // no-SQL-oracle status as training — greedy apply — pinned by the
    // reference-encoder contract in TextAnalysisSpec)
    "text_bpe_encode" -> ((s, dir) => {
      val merges = TextAnalysis.bpeTrain(docs(s, dir), "text", nMerges = 4)
        .orderBy(col("merge_rank").asc)
        .collect().map(_.getString(1)).toIndexedSeq
      TextAnalysis.bpeEncode(docs(s, dir), "doc_id", "text", merges)
    }),

    // unigram-LM tokenizer induction (SentencePiece family — the
    // subtractive counterpart of BPE's additive merges): substring seed
    // inventory → hard-EM Viterbi rounds → vocab cut. Sequential DP ⇒
    // no portable SQL oracle; pinned by the independent-trainer
    // exact-equality contract in TextAnalysisSpec
    "text_unigram_train" -> ((s, dir) => {
      import s.implicits._
      cachedUnigramModel(s, dir).toDF("rank", "piece", "n_uses", "logp_r")
    }),

    // unigram tokenizer APPLICATION: the fit-once cached 120-piece
    // table, Viterbi-encoding every document (train-once-encode-corpus
    // shape; same contract-test status as training)
    "text_unigram_encode" -> ((s, dir) => {
      val pieces = cachedUnigramModel(s, dir)
        .map { case (_, p, _, lp) => (p, lp) }
      TextAnalysis.unigramEncode(docs(s, dir), "doc_id", "text", pieces)
    }),

    // Unigram-LM cross-entropy (KenLM-perplexity proxy): corpus unigram
    // table → bounded top-1000 vocab literal → zero-shuffle scoring pass
    "text_perplexity" -> ((s, dir) =>
      TextAnalysis.unigramSurprisal(docs(s, dir), "doc_id", "text",
        vocabSize = 1000)),

    // conditional (bigram) cross-entropy: scrambled/templated text keeps
    // plausible unigrams but implausible transitions — bounded top-K
    // vocab literals + one zero-shuffle native scoring pass
    "text_bigram_perplexity" -> ((s, dir) =>
      TextAnalysis.bigramSurprisal(docs(s, dir), "doc_id", "text")),

    // KenLM-shaped interpolated trigram LM (½/⅜/⅛ dyadic mix of the
    // three orders) — the smooth-backoff filter signal; final round(6)
    // carries the ln ulp guard
    "text_trigram_perplexity" -> ((s, dir) =>
      TextAnalysis.trigramSurprisal(docs(s, dir), "doc_id", "text")),

    // Gopher-style repetition signals over word bigrams (dup fraction +
    // top-gram share — degenerate/templated-document detection)
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(docs(s, dir), "doc_id", "text", n = 2)),

    // character-distribution Shannon entropy (nats): the gibberish axis —
    // base64/hex blobs rank high, templated text low; row-local native
    // pass. The registered projection rounds to 6 decimals: the fold
    // order is fixed on both sides, but each -p·ln p term goes through
    // libm, and JVM Math.log vs glibc ln disagree by 1 ulp on rare
    // inputs (observed: p = 24/325 at sf0.1 doc 3568 — one doc in 5000).
    // At O(1) magnitudes round(x, 6) absorbs a 1-ulp wobble with
    // boundary risk ~1e-9/doc (the round(sim,6) argument); the raw-nats
    // API (char_entropy) stays unrounded.
    "text_char_entropy" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        round(graft.functions.hashes.char_entropy(col("text")), 6)
          .as("char_entropy"))),

    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.contentFingerprint(col("text")).as("fingerprint"))),

    "text_rolling_fingerprint" -> ((s, dir) =>
      TextAnalysis.rollingFingerprint(docs(s, dir), "doc_id", "text", k = 5)),
  )

  /** Shared CTE prefix of the three cluster_* oracles: centroids after
    * the md5-sample seed + TWO sample-Lloyd iterations (the
    * sim_topk_ivf_refined recurrence applied twice — empty cells keep
    * their previous centroid via the coalesce), then the full-corpus
    * argmin assignment carrying the ranking key d, from which
    * dist_r = round(‖v‖² + 2d, 6) exactly as the Spark side computes it. */
  private val KmeansAssignSql: String =
    """WITH v AS (
      |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e FROM embeddings
      |), samp AS (
      |  SELECT md5(cast(vec_id as varchar)) AS h, e
      |  FROM v ORDER BY h LIMIT 256
      |), cent0 AS (
      |  SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e
      |  FROM samp ORDER BY h LIMIT 16
      |), sa1 AS (
      |  SELECT h, e, cell FROM (
      |    SELECT s.h, s.e, c.cell,
      |      row_number() OVER (PARTITION BY s.h
      |        ORDER BY -(list_inner_product(s.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
      |                 c.cell ASC) AS r
      |    FROM samp s CROSS JOIN cent0 c) WHERE r = 1
      |), cm1 AS (
      |  SELECT cell,
      |    list_transform(range(1, len(members[1]) + 1),
      |      i -> list_sum(list_transform(members, m -> m[i])) / len(members)) AS e
      |  FROM (SELECT cell, list(e ORDER BY h) AS members FROM sa1 GROUP BY cell)
      |), cent1 AS (
      |  SELECT c0.cell, coalesce(cm.e, c0.e) AS e
      |  FROM cent0 c0 LEFT JOIN cm1 cm ON c0.cell = cm.cell
      |), sa2 AS (
      |  SELECT h, e, cell FROM (
      |    SELECT s.h, s.e, c.cell,
      |      row_number() OVER (PARTITION BY s.h
      |        ORDER BY -(list_inner_product(s.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
      |                 c.cell ASC) AS r
      |    FROM samp s CROSS JOIN cent1 c) WHERE r = 1
      |), cm2 AS (
      |  SELECT cell,
      |    list_transform(range(1, len(members[1]) + 1),
      |      i -> list_sum(list_transform(members, m -> m[i])) / len(members)) AS e
      |  FROM (SELECT cell, list(e ORDER BY h) AS members FROM sa2 GROUP BY cell)
      |), cent AS (
      |  SELECT c1.cell, coalesce(cm.e, c1.e) AS e
      |  FROM cent1 c1 LEFT JOIN cm2 cm ON c1.cell = cm.cell
      |), cassign AS (
      |  SELECT vec_id, e, cell, d FROM (
      |    SELECT n.vec_id, n.e, c.cell,
      |      -(list_inner_product(n.e, c.e) - list_inner_product(c.e, c.e)/2) AS d,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY -(list_inner_product(n.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
      |                 c.cell ASC) AS r
      |    FROM v n CROSS JOIN cent c) WHERE r = 1
      |), adist AS (
      |  SELECT vec_id, cell AS cluster,
      |    round(list_inner_product(e, e) + 2 * d, 6) AS dist_r
      |  FROM cassign)""".stripMargin

  /** Shared CTE prefix of the sim_topk_jl / sim_recall_jl oracles: the
    * md5-parity ±1 Rademacher matrix, the per-vector projection (same
    * sequential inner product as the native dot), and the projected-space
    * IVF ranking into `ranked` (mirrors sim_topk_ivf with p for v). */
  /** Full-corpus covariance — shared by `sim_pca_covariance` (one-pass
    * moments aggregate) and `sim_pca_covariance_incremental` (persisted
    * half-corpus state + batch append): both reduce to the same corpus
    * moments, so one SQL oracles both plans. */
  private val PcaCovSql: String =
    """WITH v AS (
      |  SELECT vec_id, unnest(cast(embedding AS DOUBLE[])) AS x,
      |         unnest(range(len(embedding))) AS i
      |  FROM embeddings),
      |nn AS (SELECT cast(count(*) AS DOUBLE) AS n FROM embeddings),
      |s AS (SELECT i, sum(x) AS si FROM v GROUP BY i),
      |p AS (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sij
      |      FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.i <= b.i
      |      GROUP BY a.i, b.i)
      |SELECT cast(p.i AS int) AS i, cast(p.j AS int) AS j,
      |  round((sij - sa.si * sb.si / nn.n) / nn.n, 6) + 0.0 AS cov_r
      |FROM p
      |JOIN s sa ON sa.i = p.i
      |JOIN s sb ON sb.i = p.j
      |CROSS JOIN nn""".stripMargin

  private val JlRankedSql: String =
    """WITH v AS (
      |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e FROM embeddings
      |), coef AS (
      |  SELECT j, list(CASE WHEN
      |      ('0x' || substr(md5(cast(i as varchar) || ':' || cast(j as varchar)), 1, 8))::bigint % 2 = 0
      |      THEN 1.0 ELSE -1.0 END ORDER BY i) AS c
      |  FROM range(0, 64) t(i) CROSS JOIN range(0, 16) u(j)
      |  GROUP BY j
      |), px AS (
      |  SELECT v.vec_id, cf.j, list_inner_product(v.e, cf.c) AS x
      |  FROM v CROSS JOIN coef cf
      |), p AS (
      |  SELECT vec_id, list(x ORDER BY j) AS e FROM px GROUP BY vec_id
      |), cent AS (
      |  SELECT row_number() OVER (ORDER BY md5(cast(vec_id as varchar))) - 1 AS cell, e
      |  FROM p ORDER BY md5(cast(vec_id as varchar)) LIMIT 16
      |), cassign AS (
      |  SELECT vec_id, e, cell FROM (
      |    SELECT n.vec_id, n.e, c.cell,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY -(list_inner_product(n.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
      |                 c.cell ASC) AS r
      |    FROM p n CROSS JOIN cent c) WHERE r = 1
      |), qprobe AS (
      |  SELECT vec_id AS q_id, e AS qe, cell FROM (
      |    SELECT q.vec_id, q.e, c.cell,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY -(list_inner_product(q.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
      |                 c.cell ASC) AS r
      |    FROM p q CROSS JOIN cent c WHERE q.vec_id < 10) WHERE r <= 4
      |), sims AS (
      |  SELECT pb.q_id, a.vec_id AS n_id, list_cosine_similarity(pb.qe, a.e) AS sim
      |  FROM qprobe pb JOIN cassign a USING (cell)
      |  WHERE pb.q_id != a.vec_id
      |), ranked AS (
      |  SELECT q_id, n_id, round(sim, 6) AS sim_r,
      |    row_number() OVER (PARTITION BY q_id
      |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
      |  FROM sims)""".stripMargin

  /** Shared by `sim_topk_ivf_int8` (in-memory) and `sim_topk_ivf_indexed`
    * (persisted index) — the two paths are row-identical by construction. */
  /** Shared by the direct (`text_heavy_hitters`) and persisted-state
    * (`text_heavy_hitters_state`) flavors — identical rows by the MG
    * guarantee + identical exact recount. */
  private val HeavyHittersSql: String =
    """WITH t AS (
      |  SELECT unnest(string_split(
      |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS token
      |  FROM documents
      |), tok AS (SELECT token FROM t WHERE token != ''),
      |n AS (SELECT count(*) AS total FROM tok)
      |SELECT token, count(*) AS cnt,
      |  cast(count(*) as double) / cast((SELECT total FROM n) as double) AS share
      |FROM tok GROUP BY token
      |HAVING cast(count(*) as double) >
      |  0.01 * cast((SELECT total FROM n) as double)
      |ORDER BY cnt DESC, token ASC""".stripMargin

  private val IvfInt8Sql: String =
    """WITH v AS (
      |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e FROM embeddings
      |), cent AS (
      |  SELECT row_number() OVER (ORDER BY md5(cast(vec_id as varchar))) - 1 AS cell, e
      |  FROM v ORDER BY md5(cast(vec_id as varchar)) LIMIT 16
      |), sc AS (
      |  SELECT vec_id, e,
      |    list_max(list_transform(e, x -> abs(x))) AS scale
      |  FROM v
      |), qz AS (
      |  SELECT vec_id, e, scale,
      |    CASE WHEN scale = 0.0
      |      THEN list_transform(e, x -> CAST(0 AS DOUBLE))
      |      ELSE list_transform(e, x -> floor((x * 127.0) / scale + 0.5))
      |    END AS qv
      |  FROM sc
      |), cassign AS (
      |  SELECT vec_id, scale, qv, cell FROM (
      |    SELECT n.vec_id, n.scale, n.qv, c.cell,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY -(list_inner_product(n.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
      |                 c.cell ASC) AS r
      |    FROM qz n CROSS JOIN cent c) WHERE r = 1
      |), qprobe AS (
      |  SELECT vec_id AS q_id, scale AS q_scale, qv AS q_qv, cell FROM (
      |    SELECT q.vec_id, q.scale, q.qv, c.cell,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY -(list_inner_product(q.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
      |                 c.cell ASC) AS r
      |    FROM qz q CROSS JOIN cent c WHERE q.vec_id < 10) WHERE r <= 4
      |), sims AS (
      |  SELECT p.q_id, a.vec_id AS n_id,
      |    ((list_dot_product(p.q_qv, a.qv) * p.q_scale) * a.scale) / 16129.0 AS sim
      |  FROM qprobe p JOIN cassign a USING (cell)
      |  WHERE p.q_id != a.vec_id
      |), ranked AS (
      |  SELECT q_id, n_id, round(sim, 6) AS sim_r,
      |    row_number() OVER (PARTITION BY q_id
      |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
      |  FROM sims)
      |SELECT q_id, n_id, sim_r, rnk FROM ranked WHERE rnk <= 5""".stripMargin

  /** IVF-PQ/ADC oracle — mirrors `Similarity.ivfPqTopK` op-for-op: cent
    * doubles as cell centroids AND per-subspace PQ codebook (both are the
    * md5-ordered 16-vector sample), sub-code assignment reuses the shared
    * `-(x·c - |c|²/2)` ranking on 8-element slices, and the ADC score
    * folds the 8 subspace inner products in ascending j order (list_sum
    * over an ORDER BY j list = the Scala left-to-right reduce). */
  private val IvfPqSql: String =
    """WITH v AS (
      |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e FROM embeddings
      |), cent AS (
      |  SELECT row_number() OVER (ORDER BY md5(cast(vec_id as varchar))) - 1 AS c, e
      |  FROM v ORDER BY md5(cast(vec_id as varchar)) LIMIT 16
      |), cassign AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT n.vec_id, ct.c AS cell,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY -(list_inner_product(n.e, ct.e) - list_inner_product(ct.e, ct.e)/2) ASC,
      |                 ct.c ASC) AS r
      |    FROM v n CROSS JOIN cent ct) WHERE r = 1
      |), qprobe AS (
      |  SELECT vec_id AS q_id, e AS qe, cell FROM (
      |    SELECT q.vec_id, q.e, ct.c AS cell,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY -(list_inner_product(q.e, ct.e) - list_inner_product(ct.e, ct.e)/2) ASC,
      |                 ct.c ASC) AS r
      |    FROM v q CROSS JOIN cent ct WHERE q.vec_id < 10) WHERE r <= 4
      |), codes AS (
      |  SELECT vec_id, j, code FROM (
      |    SELECT n.vec_id, t.j, s.c AS code,
      |      row_number() OVER (PARTITION BY n.vec_id, t.j
      |        ORDER BY -(list_inner_product(n.e[t.j*8+1 : t.j*8+8], s.e[t.j*8+1 : t.j*8+8])
      |                   - list_inner_product(s.e[t.j*8+1 : t.j*8+8], s.e[t.j*8+1 : t.j*8+8])/2) ASC,
      |                 s.c ASC) AS r
      |    FROM v n CROSS JOIN range(0, 8) t(j) CROSS JOIN cent s) WHERE r = 1
      |), sims AS (
      |  SELECT p.q_id, a.vec_id AS n_id,
      |    list_sum(list(
      |      list_inner_product(p.qe[c.j*8+1 : c.j*8+8], s.e[c.j*8+1 : c.j*8+8])
      |      ORDER BY c.j)) AS sim
      |  FROM qprobe p
      |  JOIN cassign a USING (cell)
      |  JOIN codes c ON c.vec_id = a.vec_id
      |  JOIN cent s ON s.c = c.code
      |  WHERE p.q_id != a.vec_id
      |  GROUP BY p.q_id, a.vec_id
      |), ranked AS (
      |  SELECT q_id, n_id, round(sim, 6) AS sim_r,
      |    row_number() OVER (PARTITION BY q_id
      |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
      |  FROM sims)
      |SELECT q_id, n_id, sim_r, rnk FROM ranked WHERE rnk <= 5""".stripMargin

  /** Residual IVF-PQ — mirrors `Similarity.ivfPqResidualTopK`: centroids
    * are md5-sample rows 0..15, the residual codebook is rows 16..31
    * residualized against their nearest centroid (the shared ranking +
    * tie-break), corpus codes quantize per-vector residuals, and the score
    * folds the q·centroid term first, then the 8 ADC subspace terms in j
    * order. */
  private val IvfPqResidualSql: String =
    """WITH v AS (
      |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e FROM embeddings
      |), samp AS (
      |  SELECT row_number() OVER (ORDER BY md5(cast(vec_id as varchar))) - 1 AS rn, e
      |  FROM v ORDER BY md5(cast(vec_id as varchar)) LIMIT 32
      |), cent AS (
      |  SELECT rn AS c, e FROM samp WHERE rn < 16
      |), rcb AS (
      |  SELECT rn - 16 AS c,
      |    list_transform(range(1, 65), i -> se[i] - ce[i]) AS e
      |  FROM (
      |    SELECT s.rn, s.e AS se, ct.e AS ce,
      |      row_number() OVER (PARTITION BY s.rn
      |        ORDER BY -(list_inner_product(s.e, ct.e) - list_inner_product(ct.e, ct.e)/2) ASC,
      |                 ct.c ASC) AS r
      |    FROM samp s CROSS JOIN cent ct WHERE s.rn >= 16) WHERE r = 1
      |), cassign AS (
      |  SELECT vec_id, cell, ce FROM (
      |    SELECT n.vec_id, ct.c AS cell, ct.e AS ce,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY -(list_inner_product(n.e, ct.e) - list_inner_product(ct.e, ct.e)/2) ASC,
      |                 ct.c ASC) AS r
      |    FROM v n CROSS JOIN cent ct) WHERE r = 1
      |), res AS (
      |  SELECT a.vec_id, a.cell,
      |    list_transform(range(1, 65), i -> n.e[i] - a.ce[i]) AS re
      |  FROM cassign a JOIN v n USING (vec_id)
      |), qprobe AS (
      |  SELECT vec_id AS q_id, e AS qe, cell, coff FROM (
      |    SELECT q.vec_id, q.e, ct.c AS cell,
      |      list_inner_product(q.e, ct.e) AS coff,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY -(list_inner_product(q.e, ct.e) - list_inner_product(ct.e, ct.e)/2) ASC,
      |                 ct.c ASC) AS r
      |    FROM v q CROSS JOIN cent ct WHERE q.vec_id < 10) WHERE r <= 4
      |), codes AS (
      |  SELECT vec_id, j, code FROM (
      |    SELECT n.vec_id, t.j, s.c AS code,
      |      row_number() OVER (PARTITION BY n.vec_id, t.j
      |        ORDER BY -(list_inner_product(n.re[t.j*8+1 : t.j*8+8], s.e[t.j*8+1 : t.j*8+8])
      |                   - list_inner_product(s.e[t.j*8+1 : t.j*8+8], s.e[t.j*8+1 : t.j*8+8])/2) ASC,
      |                 s.c ASC) AS r
      |    FROM res n CROSS JOIN range(0, 8) t(j) CROSS JOIN rcb s) WHERE r = 1
      |), sims AS (
      |  SELECT p.q_id, a.vec_id AS n_id,
      |    p.coff + list_sum(list(
      |      list_inner_product(p.qe[c.j*8+1 : c.j*8+8], s.e[c.j*8+1 : c.j*8+8])
      |      ORDER BY c.j)) AS sim
      |  FROM qprobe p
      |  JOIN cassign a USING (cell)
      |  JOIN codes c ON c.vec_id = a.vec_id
      |  JOIN rcb s ON s.c = c.code
      |  WHERE p.q_id != a.vec_id
      |  GROUP BY p.q_id, a.vec_id, p.coff
      |), ranked AS (
      |  SELECT q_id, n_id, round(sim, 6) AS sim_r,
      |    row_number() OVER (PARTITION BY q_id
      |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
      |  FROM sims)
      |SELECT q_id, n_id, sim_r, rnk FROM ranked WHERE rnk <= 5""".stripMargin

  /** IVF-PQ candidates (kCand=20 from the same CTE chain) → exact-cosine
    * rerank — mirrors `Similarity.ivfPqTopKRerank`. */
  private val IvfPqRerankSql: String = {
    val core = IvfPqSql.substring(0, IvfPqSql.indexOf("), ranked AS ("))
    core +
      """), cand AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id,
        |      row_number() OVER (PARTITION BY q_id
        |                         ORDER BY round(sim, 6) DESC, n_id ASC) AS crnk
        |    FROM sims) WHERE crnk <= 20
        |), rsims AS (
        |  SELECT c.q_id, c.n_id, list_cosine_similarity(vq.e, vn.e) AS sim
        |  FROM cand c
        |  JOIN v vq ON vq.vec_id = c.q_id
        |  JOIN v vn ON vn.vec_id = c.n_id
        |), ranked AS (
        |  SELECT q_id, n_id, round(sim, 6) AS sim_r,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
        |  FROM rsims)
        |SELECT q_id, n_id, sim_r, rnk FROM ranked WHERE rnk <= 5""".stripMargin
  }

  /** OPQ oracle: [[IvfPqSql]] verbatim, with the base vector CTE `v`
    * replaced by the side-exported full-rank rotation applied row-wise —
    * `rot_c = list_inner_product(e, component_c)` in component order
    * (the list_inner_product ≡ sequential-native-dot parity that pins
    * `sim_topk_pca`). Everything downstream — md5 centroid sample, cell
    * assignment, sub-code argmin, fixed-order ADC fold — is the shared
    * PQ machinery, now over rotated coordinates. */
  private val IvfPqOpqSql: String = {
    val rotatedV =
      """WITH mdl AS (
        |  SELECT comp, list(coef ORDER BY idx) AS ev
        |  FROM read_parquet('__SIDEROOT__/opq_model/__SFBASE__/*.parquet')
        |  GROUP BY comp
        |), raw AS (
        |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e0 FROM embeddings
        |), v AS MATERIALIZED (
        |  SELECT r.vec_id,
        |    list(list_inner_product(r.e0, m.ev) ORDER BY m.comp) AS e
        |  FROM raw r CROSS JOIN mdl m GROUP BY r.vec_id
        |)""".stripMargin
    val base =
      """WITH v AS (
        |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e FROM embeddings
        |)""".stripMargin
    require(IvfPqSql.startsWith(base), "IvfPqSql base CTE changed — fix IvfPqOpqSql")
    rotatedV + IvfPqSql.substring(base.length)
  }

  /** Shared oracle prelude: the PPJoin 3-gram Jaccard edge set over
    * `documents` (same derivation as the `graph_components` oracle), as
    * plain chained CTEs — `e0` is the oriented (a<b) pair list, `edges`
    * its symmetrization. The consumers reference `edges` once per unrolled
    * sweep, and DuckDB inlines plain CTEs per reference — re-running the
    * all-pairs gram join 6×; `AS MATERIALIZED` pins one evaluation
    * (measured 33 s → 4.7 s at sf0.01). Appended to by the
    * graph-analytics oracles. */
  private val ngramEdgeSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
      |  FROM documents
      |), grams AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
      |  FROM toks WHERE len(w) >= 3
      |), e0 AS MATERIALIZED (
      |  SELECT a_id, b_id, jac FROM (
      |    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |      cast(len(list_intersect(a.g, b.g)) as double)
      |        / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS jac
      |    FROM grams a JOIN grams b ON a.doc_id < b.doc_id)
      |  WHERE jac >= 0.8
      |), edges AS MATERIALIZED (
      |  SELECT a_id AS u, b_id AS v FROM e0
      |  UNION ALL SELECT b_id, a_id FROM e0
      |)""".stripMargin

  private val oraclesHead: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "dedup_ngram_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents WHERE doc_id < 1000
        |), grams AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
        |  FROM toks WHERE len(w) >= 3
        |)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  len(list_intersect(a.g, b.g)) AS common,
        |  len(a.g) AS la, len(b.g) AS lb,
        |  cast(len(list_intersect(a.g, b.g)) as double)
        |    / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS jac
        |FROM grams a JOIN grams b ON a.doc_id < b.doc_id
        |WHERE cast(len(list_intersect(a.g, b.g)) as double)
        |    / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.8""".stripMargin,

    "dedup_containment" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents WHERE doc_id < 1000
        |), grams AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
        |  FROM toks WHERE len(w) >= 3
        |)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  len(list_intersect(a.g, b.g)) AS common,
        |  len(a.g) AS la, len(b.g) AS lb,
        |  cast(len(list_intersect(a.g, b.g)) as double) / len(a.g) AS cont_a,
        |  cast(len(list_intersect(a.g, b.g)) as double) / len(b.g) AS cont_b
        |FROM grams a JOIN grams b ON a.doc_id < b.doc_id
        |WHERE greatest(
        |    cast(len(list_intersect(a.g, b.g)) as double) / len(a.g),
        |    cast(len(list_intersect(a.g, b.g)) as double) / len(b.g)) >= 0.9""".stripMargin,

    // mirrors Dedup.repeatedSpans: \s+-split tokens (NOT lowercased — the
    // operator detects exact repeats), md5 gram keys, global occurrence
    // count > 1, per-doc gaps-and-islands merge with the overlap-or-abut
    // rule (new span when the position gap exceeds k)
    "dedup_repeated_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents
        |), occ AS (
        |  SELECT doc_id, p, md5(array_to_string(w[p+1:p+5], ' ')) AS g
        |  FROM toks, unnest(range(0, len(w) - 4)) t(p)
        |  WHERE len(w) >= 5
        |), c AS (
        |  SELECT g, count(*) AS n FROM occ GROUP BY g
        |), dup AS (
        |  SELECT o.doc_id, o.p FROM occ o JOIN c USING (g) WHERE c.n > 1
        |), flag AS (
        |  SELECT doc_id, p,
        |    CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 5
        |         THEN 0 ELSE 1 END AS is_new
        |  FROM dup
        |), isl AS (
        |  SELECT doc_id, p,
        |    sum(is_new) OVER (PARTITION BY doc_id ORDER BY p
        |                      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM flag)
        |SELECT doc_id, min(p) AS span_start, max(p) + 4 AS span_end,
        |  count(*) AS n_grams
        |FROM isl GROUP BY doc_id, island""".stripMargin,

    "dedup_decontaminate_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents
        |), occ AS (
        |  SELECT doc_id, p, md5(array_to_string(w[p+1:p+8], ' ')) AS g
        |  FROM toks, unnest(range(0, len(w) - 7)) t(p)
        |  WHERE len(w) >= 8
        |), bench AS (
        |  SELECT DISTINCT g FROM occ WHERE doc_id % 37 = 0
        |), dup AS (
        |  SELECT o.doc_id, o.p FROM occ o JOIN bench USING (g)
        |  WHERE o.doc_id % 37 != 0
        |), flag AS (
        |  SELECT doc_id, p,
        |    CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 8
        |         THEN 0 ELSE 1 END AS is_new
        |  FROM dup
        |), isl AS (
        |  SELECT doc_id, p,
        |    sum(is_new) OVER (PARTITION BY doc_id ORDER BY p
        |                      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM flag)
        |SELECT doc_id, min(p) AS span_start, max(p) + 7 AS span_end,
        |  count(*) AS n_grams
        |FROM isl GROUP BY doc_id, island""".stripMargin,

    "dedup_strip_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents
        |), occ AS (
        |  SELECT doc_id, p, md5(array_to_string(w[p+1:p+5], ' ')) AS g
        |  FROM toks, unnest(range(0, len(w) - 4)) t(p)
        |  WHERE len(w) >= 5
        |), c AS (
        |  SELECT g, count(*) AS n FROM occ GROUP BY g
        |), dup AS (
        |  SELECT o.doc_id, o.p FROM occ o JOIN c USING (g) WHERE c.n > 1
        |), flag AS (
        |  SELECT doc_id, p,
        |    CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 5
        |         THEN 0 ELSE 1 END AS is_new
        |  FROM dup
        |), isl AS (
        |  SELECT doc_id, p,
        |    sum(is_new) OVER (PARTITION BY doc_id ORDER BY p
        |                      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM flag
        |), spans AS (
        |  SELECT doc_id, min(p) AS s, max(p) + 4 AS e
        |  FROM isl GROUP BY doc_id, island
        |), tok AS (
        |  SELECT doc_id, i - 1 AS ti, w[i] AS t
        |  FROM toks, unnest(range(1, len(w) + 1)) u(i)
        |), kept AS (
        |  SELECT tk.doc_id, tk.ti, tk.t
        |  FROM tok tk
        |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
        |    WHERE sp.doc_id = tk.doc_id AND tk.ti BETWEEN sp.s AND sp.e)
        |)
        |SELECT t.doc_id,
        |  coalesce((SELECT string_agg(k.t, ' ' ORDER BY k.ti)
        |            FROM kept k WHERE k.doc_id = t.doc_id), '') AS clean_text,
        |  len(t.w) - coalesce((SELECT count(*) FROM kept k
        |                       WHERE k.doc_id = t.doc_id), 0) AS n_tokens_removed
        |FROM toks t""".stripMargin,

    "dedup_ngram_pairs_filtered" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
        |  FROM toks WHERE len(w) >= 3
        |)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  len(list_intersect(a.g, b.g)) AS common,
        |  len(a.g) AS la, len(b.g) AS lb,
        |  cast(len(list_intersect(a.g, b.g)) as double)
        |    / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS jac
        |FROM grams a JOIN grams b ON a.doc_id < b.doc_id
        |WHERE cast(len(list_intersect(a.g, b.g)) as double)
        |    / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.8""".stripMargin,

    "dedup_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
        |  FROM toks WHERE len(w) >= 3
        |)
        |SELECT c.doc_id AS doc_id, r.doc_id AS ref_id,
        |  len(list_intersect(c.g, r.g)) AS common,
        |  len(r.g) AS r_grams,
        |  cast(len(list_intersect(c.g, r.g)) as double) / len(r.g) AS containment
        |FROM grams c JOIN grams r
        |  ON r.doc_id % 37 = 0 AND c.doc_id != r.doc_id
        |WHERE cast(len(list_intersect(c.g, r.g)) as double) / len(r.g) >= 0.8""".stripMargin,

    "dedup_bloom_incremental" ->
      """WITH cut AS (SELECT (max(doc_id) * 9) // 10 AS c FROM documents)
        |SELECT n.doc_id, n.text, n.lang, n.source, n.n_chars
        |FROM documents n, cut
        |WHERE n.doc_id > cut.c AND NOT EXISTS (
        |  SELECT 1 FROM documents h
        |  WHERE h.doc_id <= cut.c AND h.text = n.text)""".stripMargin,

    // policy-only oracle over the EXPORTED cluster assignment (see the
    // query registration: the xxhash64 clustering itself has no SQL twin;
    // the side input makes the survivorship policy hash-verifiable).
    // quality_score CTE = the text_quality_score oracle, id-capped.
    "dedup_keep_best" ->
      """WITH clusters AS (
        |  SELECT doc_id, cluster_id
        |  FROM read_parquet('__SIDEROOT__/keep_best_clusters/__SFBASE__/*.parquet')
        |), f AS (
        |  SELECT doc_id,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |    cast(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) as double)
        |      / length(text) AS alpha_ratio,
        |    cast(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g')) as double)
        |      / length(text) AS punct_ratio,
        |    cast(length(text) as double)
        |      / len(regexp_split_to_array(trim(text), '\s+')) AS mean_token_len
        |  FROM documents WHERE doc_id < 1000
        |), q AS (
        |  SELECT doc_id,
        |    (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END * 2
        |     + CASE WHEN alpha_ratio >= 0.6 THEN 1.0 ELSE alpha_ratio / 0.6 END * 4
        |     + CASE WHEN punct_ratio <= 0.2 THEN 1.0
        |         ELSE greatest(0.0, 1.0 - (punct_ratio - 0.2) * 5) END * 2
        |     + CASE WHEN mean_token_len BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END * 2)
        |    / 10.0 AS quality_score
        |  FROM f
        |), j AS (
        |  SELECT c.doc_id, c.cluster_id, q.quality_score,
        |    row_number() OVER (PARTITION BY c.cluster_id
        |                       ORDER BY q.quality_score DESC, c.doc_id ASC) AS rn
        |  FROM clusters c JOIN q USING (doc_id))
        |SELECT doc_id, cluster_id, quality_score FROM j WHERE rn = 1""".stripMargin,

    "dedup_embedding_pairs" ->
      """WITH v AS (
        |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e
        |  FROM embeddings WHERE vec_id < 1000)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_cosine_similarity(a.e, b.e), 6) AS sim_r
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.e, b.e) >= 0.4""".stripMargin,

    // policy oracle over the EXPORTED hyperplane buckets: the probe list
    // is the bucket plus its 1-bit flips, so collision in either
    // orientation ⇔ bucket Hamming ≤ 1; cosines and the threshold are
    // exact SQL over the embeddings table
    "dedup_embedding_pairs_lsh" ->
      """WITH v AS (
        |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e
        |  FROM embeddings WHERE vec_id < 1000
        |), bk AS (
        |  SELECT vec_id, bucket
        |  FROM read_parquet('__SIDEROOT__/lsh_buckets/__SFBASE__/*.parquet')
        |  WHERE vec_id < 1000)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  list_cosine_similarity(va.e, vb.e) AS sim
        |FROM bk a
        |JOIN bk b ON a.vec_id < b.vec_id
        |  AND bit_count(xor(a.bucket, b.bucket)) <= 1
        |JOIN v va ON va.vec_id = a.vec_id
        |JOIN v vb ON vb.vec_id = b.vec_id
        |WHERE list_cosine_similarity(va.e, vb.e) >= 0.3""".stripMargin,

    "sim_topk_lsh" ->
      """WITH v AS (
        |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e FROM embeddings
        |), bk AS (
        |  SELECT vec_id, bucket
        |  FROM read_parquet('__SIDEROOT__/lsh_buckets/__SFBASE__/*.parquet')
        |), cand AS (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id
        |  FROM bk q JOIN bk n
        |    ON bit_count(xor(q.bucket, n.bucket)) <= 1
        |    AND q.vec_id != n.vec_id
        |  WHERE q.vec_id < 10
        |), sims AS (
        |  SELECT c.q_id, c.n_id, list_cosine_similarity(vq.e, vn.e) AS sim
        |  FROM cand c
        |  JOIN v vq ON vq.vec_id = c.q_id
        |  JOIN v vn ON vn.vec_id = c.n_id
        |), ranked AS (
        |  SELECT q_id, n_id, round(sim, 6) AS sim_r,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
        |  FROM sims)
        |SELECT q_id, n_id, sim_r, rnk FROM ranked WHERE rnk <= 5""".stripMargin,

    // policy oracle over the EXPORTED signatures: banding = full-band
    // slice equality at the same band index, estimator = lane-agreement
    // fraction — the xxhash lanes are the side input, everything above
    // them re-derives in SQL
    "dedup_minhash_pairs" ->
      """WITH s AS (
        |  SELECT doc_id, sig
        |  FROM read_parquet('__SIDEROOT__/minhash_sigs/__SFBASE__/*.parquet')
        |), p AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    cast(len(list_filter(range(1, 65), i -> a.sig[i] = b.sig[i])) as double)
        |      / 64.0 AS est_jaccard
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE len(list_filter(range(0, 16),
        |    bnd -> a.sig[bnd*4+1 : bnd*4+4] = b.sig[bnd*4+1 : bnd*4+4])) > 0)
        |SELECT a_id, b_id, est_jaccard FROM p WHERE est_jaccard >= 0.7""".stripMargin,

    "dedup_incremental" ->
      """WITH s AS (
        |  SELECT doc_id, sig
        |  FROM read_parquet('__SIDEROOT__/minhash_sigs/__SFBASE__/*.parquet')
        |), cut AS (SELECT (max(doc_id) * 9) // 10 AS c FROM documents),
        |p AS (
        |  SELECT n.doc_id AS new_id, o.doc_id AS old_id,
        |    cast(len(list_filter(range(1, 65), i -> n.sig[i] = o.sig[i])) as double)
        |      / 64.0 AS est_jaccard
        |  FROM s n, s o, cut
        |  WHERE n.doc_id > cut.c AND o.doc_id <= cut.c
        |    AND len(list_filter(range(0, 16),
        |      bnd -> n.sig[bnd*4+1 : bnd*4+4] = o.sig[bnd*4+1 : bnd*4+4])) > 0)
        |SELECT new_id, old_id, est_jaccard FROM p WHERE est_jaccard >= 0.7""".stripMargin,

    // components via recursive transitive closure over the banded edge
    // set (same side input and edge derivation as dedup_minhash_pairs);
    // cluster representative = smallest reachable id, non-singletons only
    "dedup_minhash_clusters" ->
      """WITH RECURSIVE
        |s AS (
        |  SELECT doc_id, sig
        |  FROM read_parquet('__SIDEROOT__/minhash_sigs/__SFBASE__/*.parquet')
        |), e0 AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE len(list_filter(range(0, 16),
        |      bnd -> a.sig[bnd*4+1 : bnd*4+4] = b.sig[bnd*4+1 : bnd*4+4])) > 0
        |    AND cast(len(list_filter(range(1, 65), i -> a.sig[i] = b.sig[i])) as double)
        |      / 64.0 >= 0.7
        |), edges AS (
        |  SELECT a_id AS u, b_id AS v FROM e0
        |  UNION ALL SELECT b_id, a_id FROM e0
        |), reach(u, v) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
        |), cl AS (
        |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
        |  FROM reach GROUP BY u)
        |SELECT doc_id, cluster_id FROM cl WHERE doc_id != cluster_id""".stripMargin,

    // the quarter-blocking is EXACT by pigeonhole (Hamming ≤ 3 forces
    // agreement on one 16-bit quarter), so the oracle over the exported
    // hashes is the complete pairwise-Hamming result, not a sample
    "dedup_simhash_pairs" ->
      """WITH s AS (
        |  SELECT doc_id, simhash
        |  FROM read_parquet('__SIDEROOT__/simhash/__SFBASE__/*.parquet'))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  cast(bit_count(xor(a.simhash, b.simhash)) as int) AS hamming
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,

    // IVF is APPROXIMATE but fully DETERMINISTIC (md5-ordered centroid
    // sample, argmin cell assignment, fixed probe ranking) — so the oracle
    // replicates the whole algorithm, not just its contract. Distances and
    // cosines are sequential double folds, bit-identical to DuckDB's
    // list_inner_product/list_cosine_similarity on DOUBLE[].
    "sim_topk_ivf" ->
      """WITH v AS (
        |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e FROM embeddings
        |), cent AS (
        |  SELECT row_number() OVER (ORDER BY md5(cast(vec_id as varchar))) - 1 AS cell, e
        |  FROM v ORDER BY md5(cast(vec_id as varchar)) LIMIT 16
        |), cassign AS (
        |  SELECT vec_id, e, cell FROM (
        |    SELECT n.vec_id, n.e, c.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY -(list_inner_product(n.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
        |                 c.cell ASC) AS r
        |    FROM v n CROSS JOIN cent c) WHERE r = 1
        |), qprobe AS (
        |  SELECT vec_id AS q_id, e AS qe, cell FROM (
        |    SELECT q.vec_id, q.e, c.cell,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY -(list_inner_product(q.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
        |                 c.cell ASC) AS r
        |    FROM v q CROSS JOIN cent c WHERE q.vec_id < 10) WHERE r <= 4
        |), sims AS (
        |  SELECT p.q_id, a.vec_id AS n_id, list_cosine_similarity(p.qe, a.e) AS sim
        |  FROM qprobe p JOIN cassign a USING (cell)
        |  WHERE p.q_id != a.vec_id
        |), ranked AS (
        |  SELECT q_id, n_id, round(sim, 6) AS sim_r,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
        |  FROM sims)
        |SELECT q_id, n_id, sim_r, rnk FROM ranked WHERE rnk <= 5""".stripMargin,

    // sim_topk_ivf's oracle with the label carried through and the
    // mismatch filter inside the probe join — the mined negative set is
    // the IVF candidate set minus same-label rows, exactly as the
    // operator computes it
    "mine_hard_negatives" ->
      """WITH v AS (
        |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e, label
        |  FROM embeddings
        |), cent AS (
        |  SELECT row_number() OVER (ORDER BY md5(cast(vec_id as varchar))) - 1 AS cell, e
        |  FROM v ORDER BY md5(cast(vec_id as varchar)) LIMIT 16
        |), cassign AS (
        |  SELECT vec_id, e, label, cell FROM (
        |    SELECT n.vec_id, n.e, n.label, c.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY -(list_inner_product(n.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
        |                 c.cell ASC) AS r
        |    FROM v n CROSS JOIN cent c) WHERE r = 1
        |), qprobe AS (
        |  SELECT vec_id AS q_id, e AS qe, label AS q_label, cell FROM (
        |    SELECT q.vec_id, q.e, q.label, c.cell,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY -(list_inner_product(q.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
        |                 c.cell ASC) AS r
        |    FROM v q CROSS JOIN cent c WHERE q.vec_id < 10) WHERE r <= 4
        |), sims AS (
        |  SELECT p.q_id, a.vec_id AS n_id, list_cosine_similarity(p.qe, a.e) AS sim
        |  FROM qprobe p JOIN cassign a USING (cell)
        |  WHERE p.q_id != a.vec_id AND p.q_label != a.label
        |), ranked AS (
        |  SELECT q_id, n_id, round(sim, 6) AS sim_r,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
        |  FROM sims)
        |SELECT q_id, n_id, sim_r, rnk FROM ranked WHERE rnk <= 5""".stripMargin,

    // the refined variant's oracle also replicates the Lloyd step: members
    // are summed per dimension IN md5 ORDER (list built with ORDER BY h),
    // matching the driver-side sequential accumulation bit-for-bit
    // JL re-derivation: the ±1 coefficient signs come from the same
    // md5("i:j") parity, projection is the same sequential inner product,
    // and the projected-space IVF mirrors sim_topk_ivf with p for v
    "sim_topk_jl" ->
      s"""$JlRankedSql
        |SELECT q_id, n_id, sim_r, rnk FROM ranked WHERE rnk <= 5""".stripMargin,

    // recall@5 of the JL retrieval vs exact ground truth: the approx
    // side is the shared JL ranking, the exact side the brute-force
    // cosine ranking (what full-probe IVF equals by construction);
    // exact-integer hit counts + one final division
    "sim_recall_jl" ->
      s"""$JlRankedSql
        |, approx AS (SELECT q_id, n_id FROM ranked WHERE rnk <= 5
        |), esims AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    list_cosine_similarity(q.e, c.e) AS sim
        |  FROM v q JOIN v c ON q.vec_id != c.vec_id
        |  WHERE q.vec_id < 10
        |), eranked AS (
        |  SELECT q_id, n_id,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
        |  FROM esims
        |), exact AS (SELECT q_id, n_id FROM eranked WHERE rnk <= 5
        |), rec AS (
        |  SELECT e.q_id, count(*) AS n_exact,
        |    sum(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        |  FROM exact e LEFT JOIN approx a
        |    ON a.q_id = e.q_id AND a.n_id = e.n_id
        |  GROUP BY e.q_id)
        |SELECT q_id, cast(n_exact as bigint) AS n_exact,
        |  cast(n_hit as bigint) AS n_hit,
        |  cast(n_hit as double) / n_exact AS recall
        |FROM rec""".stripMargin,

    "cluster_kmeans" ->
      s"""$KmeansAssignSql
        |SELECT vec_id, cluster, dist_r FROM adist""".stripMargin,

    // exact-integer micro-inertia: Σ round(dist_r·10⁶) as bigint — the
    // order-independent accumulation (integer-cents discipline)
    "cluster_stats" ->
      s"""$KmeansAssignSql
        |SELECT cluster, count(*) AS n_members,
        |  cast(sum(cast(round(dist_r * 1e6) as bigint)) as bigint) AS inertia_micro
        |FROM adist GROUP BY cluster""".stripMargin,

    "cluster_balanced_sample" ->
      s"""$KmeansAssignSql
        |SELECT vec_id, cluster FROM (
        |  SELECT vec_id, cluster,
        |    row_number() OVER (PARTITION BY cluster
        |      ORDER BY md5(cast(vec_id as varchar)) ASC, vec_id ASC) AS rn
        |  FROM adist)
        |WHERE rn <= 10""".stripMargin,

    "sim_topk_ivf_refined" ->
      """WITH v AS (
        |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e FROM embeddings
        |), samp AS (
        |  SELECT md5(cast(vec_id as varchar)) AS h, e
        |  FROM v ORDER BY h LIMIT 256
        |), cent0 AS (
        |  SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e
        |  FROM samp ORDER BY h LIMIT 16
        |), sassign AS (
        |  SELECT h, e, cell FROM (
        |    SELECT s.h, s.e, c.cell,
        |      row_number() OVER (PARTITION BY s.h
        |        ORDER BY -(list_inner_product(s.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
        |                 c.cell ASC) AS r
        |    FROM samp s CROSS JOIN cent0 c) WHERE r = 1
        |), cmean AS (
        |  SELECT cell,
        |    list_transform(range(1, len(members[1]) + 1),
        |      i -> list_sum(list_transform(members, m -> m[i])) / len(members)) AS e
        |  FROM (SELECT cell, list(e ORDER BY h) AS members FROM sassign GROUP BY cell)
        |), cent AS (
        |  SELECT c0.cell, coalesce(cm.e, c0.e) AS e
        |  FROM cent0 c0 LEFT JOIN cmean cm ON c0.cell = cm.cell
        |), cassign AS (
        |  SELECT vec_id, e, cell FROM (
        |    SELECT n.vec_id, n.e, c.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY -(list_inner_product(n.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
        |                 c.cell ASC) AS r
        |    FROM v n CROSS JOIN cent c) WHERE r = 1
        |), qprobe AS (
        |  SELECT vec_id AS q_id, e AS qe, cell FROM (
        |    SELECT q.vec_id, q.e, c.cell,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY -(list_inner_product(q.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
        |                 c.cell ASC) AS r
        |    FROM v q CROSS JOIN cent c WHERE q.vec_id < 10) WHERE r <= 4
        |), sims AS (
        |  SELECT p.q_id, a.vec_id AS n_id, list_cosine_similarity(p.qe, a.e) AS sim
        |  FROM qprobe p JOIN cassign a USING (cell)
        |  WHERE p.q_id != a.vec_id
        |), ranked AS (
        |  SELECT q_id, n_id, round(sim, 6) AS sim_r,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
        |  FROM sims)
        |SELECT q_id, n_id, sim_r, rnk FROM ranked WHERE rnk <= 5""".stripMargin,

    // the persisted-index path returns EXACTLY the in-memory composition's
    // rows (same deterministic centroids, same codes) — same oracle
    "sim_topk_ivf_indexed" -> IvfInt8Sql,

    // the quantized-IVF composition: same md5-ordered centroids and argmin
    // cell assignment as sim_topk_ivf, same exact integer-dot scoring as
    // sim_topk_int8 — every stage deterministic, so the full approximate
    // path hash-verifies
    "sim_topk_ivf_int8" -> IvfInt8Sql,
    "sim_topk_ivf_pq" -> IvfPqSql,
    "sim_topk_ivf_pq_residual" -> IvfPqResidualSql,

    // the engine folds moments in one mergeable pass; the oracle pays the
    // d²-per-row explode DuckDB-side. Identical exact-shape covariance
    // expression ((Sij − si·sj/n)/n) both sides; accumulation-order noise
    // ~1e-12 absorbed by round 6. SHARED by the incremental-state flavor:
    // merged half-corpus moments are the corpus moments.
    "sim_pca_covariance" -> PcaCovSql,
    "sim_pca_covariance_incremental" -> PcaCovSql,

    // replay projection + projected-space IVF ranking over the side-
    // exported model this JVM fitted (the eigensolve itself is not SQL;
    // everything distributed — projection dots, centroid sample, cell
    // assignment, probe ranking — is re-derived, mirroring sim_topk_jl
    // with the exported components in place of the md5 Rademacher
    // matrix). list_inner_product is sequential like the native dot, so
    // projections are bit-identical and the unrounded cell-assignment
    // order is safe (the sim_topk_ivf precedent).
    "sim_topk_pca" ->
      """WITH m AS (
        |  SELECT comp, idx, coef, off
        |  FROM read_parquet('__SIDEROOT__/pca_model/__SFBASE__/*.parquet')),
        |v AS (
        |  SELECT vec_id, cast(embedding AS DOUBLE[]) AS e FROM embeddings),
        |mc AS (
        |  SELECT comp, list(coef ORDER BY idx) AS c, any_value(off) AS off
        |  FROM m GROUP BY comp),
        |px AS (
        |  SELECT v.vec_id, mc.comp,
        |    list_inner_product(v.e, mc.c) - mc.off AS pv
        |  FROM v CROSS JOIN mc),
        |p AS (SELECT vec_id, list(pv ORDER BY comp) AS e FROM px GROUP BY vec_id),
        |cent AS (
        |  SELECT row_number() OVER (ORDER BY md5(cast(vec_id as varchar))) - 1 AS cell, e
        |  FROM p ORDER BY md5(cast(vec_id as varchar)) LIMIT 16),
        |cassign AS (
        |  SELECT vec_id, e, cell FROM (
        |    SELECT n.vec_id, n.e, c.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY -(list_inner_product(n.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
        |                 c.cell ASC) AS r
        |    FROM p n CROSS JOIN cent c) WHERE r = 1),
        |qprobe AS (
        |  SELECT vec_id AS q_id, e AS qe, cell FROM (
        |    SELECT q.vec_id, q.e, c.cell,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY -(list_inner_product(q.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
        |                 c.cell ASC) AS r
        |    FROM p q CROSS JOIN cent c WHERE q.vec_id < 10) WHERE r <= 4),
        |sims AS (
        |  SELECT pb.q_id, a.vec_id AS n_id, list_cosine_similarity(pb.qe, a.e) AS sim
        |  FROM qprobe pb JOIN cassign a USING (cell)
        |  WHERE pb.q_id != a.vec_id),
        |ranked AS (
        |  SELECT q_id, n_id, round(sim, 6) AS sim_r,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
        |  FROM sims)
        |SELECT q_id, n_id, sim_r, rnk FROM ranked WHERE rnk <= 5""".stripMargin,

    // same centered-dot fold shapes as the engine: elementwise centering,
    // sequential inner products, ord-sorted list_sum over the squared
    // projections — round 6 + (−0.0 → +0.0) both sides
    "sim_pca_recon" ->
      """WITH m AS (
        |  SELECT comp, idx, coef
        |  FROM read_parquet('__SIDEROOT__/pca_model/__SFBASE__/*.parquet')),
        |mu AS (
        |  SELECT idx, mu
        |  FROM read_parquet('__SIDEROOT__/pca_mean/__SFBASE__/*.parquet')),
        |v AS (
        |  SELECT vec_id, unnest(cast(embedding AS DOUBLE[])) AS x,
        |         unnest(range(len(embedding))) AS i
        |  FROM embeddings),
        |cv AS (
        |  SELECT vec_id, list(x - mu.mu ORDER BY i) AS c
        |  FROM v JOIN mu ON v.i = mu.idx GROUP BY vec_id),
        |mc AS (SELECT comp, list(coef ORDER BY idx) AS ec FROM m GROUP BY comp),
        |pj AS (
        |  SELECT cv.vec_id, mc.comp,
        |    list_inner_product(cv.c, mc.ec) AS pv
        |  FROM cv CROSS JOIN mc),
        |ps AS (
        |  SELECT vec_id, list_sum(list(pv * pv ORDER BY comp)) AS p2
        |  FROM pj GROUP BY vec_id)
        |SELECT cv.vec_id,
        |  round(list_inner_product(cv.c, cv.c) - ps.p2, 6) + 0.0 AS err_r
        |FROM cv JOIN ps ON cv.vec_id = ps.vec_id""".stripMargin,

    "sim_topk_ivf_pq_rerank" -> IvfPqRerankSql,
    "sim_topk_ivf_opq" -> IvfPqOpqSql,
    "sim_topk_ivf_pq_indexed" -> IvfPqSql,

    // the rerank composition: int8-IVF candidates to kCand=20 (same CTEs
    // as sim_topk_ivf_int8), then exact float cosines over ONLY those
    // survivors — deterministic end-to-end, so the oracle replicates the
    // full two-stage algorithm. Shared with the indexed flavor: the
    // persisted-index rerank rescores against the vectors stored in the
    // pruned cell directories, which are by construction the same rows.
    "sim_topk_int8_rerank" -> IvfInt8RerankSql,
    "sim_topk_ivf_indexed_rerank" -> IvfInt8RerankSql,

    // index health: the oracle re-derives the per-cell occupancy from the
    // embeddings table with the same md5-ordered centroids and argmin
    // assignment the index build used — a full-algorithm oracle for the
    // health report (the LEFT JOIN keeps drift-emptied cells at 0)
    "sim_index_health" ->
      """WITH v AS (
        |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e FROM embeddings
        |), cent AS (
        |  SELECT row_number() OVER (ORDER BY md5(cast(vec_id as varchar))) - 1 AS cell, e
        |  FROM v ORDER BY md5(cast(vec_id as varchar)) LIMIT 16
        |), cassign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT n.vec_id, c.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY -(list_inner_product(n.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
        |                 c.cell ASC) AS r
        |    FROM v n CROSS JOIN cent c) WHERE r = 1
        |), occ AS (
        |  SELECT c.cell, count(a.vec_id) AS n_rows
        |  FROM cent c LEFT JOIN cassign a ON a.cell = c.cell
        |  GROUP BY c.cell
        |), stats AS (
        |  SELECT cell, n_rows,
        |    CAST(sum(n_rows) OVER () AS DOUBLE) / CAST(count(*) OVER () AS DOUBLE) AS mean_rows,
        |    CAST(max(n_rows) OVER () AS DOUBLE) AS max_rows
        |  FROM occ)
        |SELECT CAST(cell AS INTEGER) AS cell, n_rows,
        |  CAST(n_rows AS DOUBLE) / mean_rows AS occupancy_ratio,
        |  max_rows / mean_rows AS skew_ratio,
        |  (max_rows / mean_rows) >= 4.0 AS rebuild_recommended
        |FROM stats""".stripMargin,
  )

  /** The two-stage int8-candidates→exact-rerank oracle, shared by the
    * in-memory (`sim_topk_int8_rerank`) and persisted-index
    * (`sim_topk_ivf_indexed_rerank`) flavors — identical rows by
    * construction (same centroids, same codes, candidates confined to
    * probed cells either way). */
  // lazy: referenced from oraclesHead, which precedes this definition in
  // the object's initializer order
  private lazy val IvfInt8RerankSql: String =
      """WITH v AS (
        |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e FROM embeddings
        |), cent AS (
        |  SELECT row_number() OVER (ORDER BY md5(cast(vec_id as varchar))) - 1 AS cell, e
        |  FROM v ORDER BY md5(cast(vec_id as varchar)) LIMIT 16
        |), sc AS (
        |  SELECT vec_id, e,
        |    list_max(list_transform(e, x -> abs(x))) AS scale
        |  FROM v
        |), qz AS (
        |  SELECT vec_id, e, scale,
        |    CASE WHEN scale = 0.0
        |      THEN list_transform(e, x -> CAST(0 AS DOUBLE))
        |      ELSE list_transform(e, x -> floor((x * 127.0) / scale + 0.5))
        |    END AS qv
        |  FROM sc
        |), cassign AS (
        |  SELECT vec_id, scale, qv, cell FROM (
        |    SELECT n.vec_id, n.scale, n.qv, c.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY -(list_inner_product(n.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
        |                 c.cell ASC) AS r
        |    FROM qz n CROSS JOIN cent c) WHERE r = 1
        |), qprobe AS (
        |  SELECT vec_id AS q_id, scale AS q_scale, qv AS q_qv, cell FROM (
        |    SELECT q.vec_id, q.scale, q.qv, c.cell,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY -(list_inner_product(q.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
        |                 c.cell ASC) AS r
        |    FROM qz q CROSS JOIN cent c WHERE q.vec_id < 10) WHERE r <= 4
        |), csims AS (
        |  SELECT p.q_id, a.vec_id AS n_id,
        |    ((list_dot_product(p.q_qv, a.qv) * p.q_scale) * a.scale) / 16129.0 AS sim
        |  FROM qprobe p JOIN cassign a USING (cell)
        |  WHERE p.q_id != a.vec_id
        |), cand AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id,
        |      row_number() OVER (PARTITION BY q_id
        |                         ORDER BY round(sim, 6) DESC, n_id ASC) AS crnk
        |    FROM csims) WHERE crnk <= 20
        |), rsims AS (
        |  SELECT c.q_id, c.n_id, list_cosine_similarity(vq.e, vn.e) AS sim
        |  FROM cand c
        |  JOIN v vq ON vq.vec_id = c.q_id
        |  JOIN v vn ON vn.vec_id = c.n_id
        |), ranked AS (
        |  SELECT q_id, n_id, round(sim, 6) AS sim_r,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
        |  FROM rsims)
        |SELECT q_id, n_id, sim_r, rnk FROM ranked WHERE rnk <= 5""".stripMargin

  /** The BM25 oracle, shared by the stats-pass (`text_bm25`) and
    * persisted-inverted-index (`text_bm25_indexed`) flavors. */
  private val TextBm25Sql: String =
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), base AS (
        |  SELECT doc_id, len(w) AS dl,
        |    len(list_filter(w, t -> t = 'spark')) AS tf0,
        |    len(list_filter(w, t -> t = 'table')) AS tf1,
        |    len(list_filter(w, t -> t = 'query')) AS tf2
        |  FROM toks
        |), stats AS (
        |  SELECT count(*) AS n, cast(sum(dl) as bigint) AS sum_dl,
        |    cast(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) as bigint) AS df0,
        |    cast(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) as bigint) AS df1,
        |    cast(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) as bigint) AS df2
        |  FROM base
        |), scored AS (
        |  SELECT b.doc_id,
        |    ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
        |      * (tf0 * (CAST(1.2 AS DOUBLE) + 1.0))
        |      / (tf0 + CAST(1.2 AS DOUBLE) * ((1.0 - 0.75) + 0.75 * (dl / (cast(sum_dl as double) / n))))
        |    + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
        |      * (tf1 * (CAST(1.2 AS DOUBLE) + 1.0))
        |      / (tf1 + CAST(1.2 AS DOUBLE) * ((1.0 - 0.75) + 0.75 * (dl / (cast(sum_dl as double) / n))))
        |    + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
        |      * (tf2 * (CAST(1.2 AS DOUBLE) + 1.0))
        |      / (tf2 + CAST(1.2 AS DOUBLE) * ((1.0 - 0.75) + 0.75 * (dl / (cast(sum_dl as double) / n))))
        |    AS bm25
        |  FROM base b CROSS JOIN stats
        |  WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0)
        |SELECT doc_id, bm25 FROM scored
        |ORDER BY bm25 DESC, doc_id ASC LIMIT 20""".stripMargin

  private val oraclesTail: Map[String, String] = Map(
    // repeated-spans CTE (same as dedup_repeated_spans) extended with the
    // per-doc coverage sum over the doc's own token count; docs with no
    // duplicated span report 0
    "text_dup_span_fraction" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents
        |), occ AS (
        |  SELECT doc_id, p, md5(array_to_string(w[p+1:p+5], ' ')) AS g
        |  FROM toks, unnest(range(0, len(w) - 4)) t(p)
        |  WHERE len(w) >= 5
        |), c AS (
        |  SELECT g, count(*) AS n FROM occ GROUP BY g
        |), dup AS (
        |  SELECT o.doc_id, o.p FROM occ o JOIN c USING (g) WHERE c.n > 1
        |), flag AS (
        |  SELECT doc_id, p,
        |    CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 5
        |         THEN 0 ELSE 1 END AS is_new
        |  FROM dup
        |), isl AS (
        |  SELECT doc_id, p,
        |    sum(is_new) OVER (PARTITION BY doc_id ORDER BY p
        |                      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM flag
        |), spans AS (
        |  SELECT doc_id, min(p) AS s, max(p) + 4 AS e
        |  FROM isl GROUP BY doc_id, island
        |), cov AS (
        |  SELECT doc_id, sum(e - s + 1) AS dup_tokens FROM spans GROUP BY doc_id
        |)
        |SELECT t.doc_id, cast(len(t.w) as bigint) AS n_tokens,
        |  cast(coalesce(cov.dup_tokens, 0) as bigint) AS dup_tokens,
        |  round(cast(coalesce(cov.dup_tokens, 0) as double)
        |    / greatest(len(t.w), 1), 6) AS dup_fraction_r
        |FROM toks t LEFT JOIN cov USING (doc_id)""".stripMargin,

    // both snapshots reduce to (id, fingerprint); the status CASE mirrors
    // Dedup.snapshotDiff exactly
    "corpus_diff" ->
      """WITH o AS (
        |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 19 != 0
        |), n AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS h
        |  FROM documents WHERE doc_id % 23 != 0
        |)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.h IS NULL THEN 'added'
        |       WHEN n.h IS NULL THEN 'removed'
        |       WHEN o.h != n.h THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,

    // the PPJoin edge set (same CTE as dedup_ngram_pairs_filtered) closed
    // under recursive reachability; docs outside any edge self-label
    "graph_components" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
        |  FROM toks WHERE len(w) >= 3
        |), e0 AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
        |  WHERE cast(len(list_intersect(a.g, b.g)) as double)
        |      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.8
        |), edges AS (
        |  SELECT a_id AS u, b_id AS v FROM e0
        |  UNION ALL SELECT b_id, a_id FROM e0
        |), reach(u, v) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
        |), cl AS (
        |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
        |  FROM reach GROUP BY u)
        |SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
        |FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id""".stripMargin,

    // the stored tree's decile histogram re-derived from the raw pairs;
    // share_r is q37's proven count/count round-6 pattern
    "dedup_graph_health" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
        |  FROM toks WHERE len(w) >= 3
        |), e0 AS (
        |  SELECT cast(len(list_intersect(a.g, b.g)) as double)
        |      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS jac
        |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
        |  WHERE cast(len(list_intersect(a.g, b.g)) as double)
        |      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.8
        |), h AS (
        |  SELECT cast(least(floor(jac * 10), 9) AS int) AS jband,
        |    count(*) AS n_edges
        |  FROM e0 GROUP BY 1
        |), t AS (SELECT cast(sum(n_edges) AS double) AS tot FROM h)
        |SELECT jband, n_edges,
        |  round(n_edges / (SELECT tot FROM t), 6) AS share_r
        |FROM h ORDER BY jband""".stripMargin,

    // graph_components at the STRONG threshold: identical pair CTE with
    // the 0.9 floor — the Spark side reads the 0.8-built index pruned to
    // jac >= 0.9, which is exactly the fresh 0.9 pair set (both engines
    // compute the same common/(la+lb-common) double, so the floor
    // comparison agrees pairwise)
    "graph_components_strong" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
        |  FROM toks WHERE len(w) >= 3
        |), e0 AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
        |  WHERE cast(len(list_intersect(a.g, b.g)) as double)
        |      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.9
        |), edges AS (
        |  SELECT a_id AS u, b_id AS v FROM e0
        |  UNION ALL SELECT b_id, a_id FROM e0
        |), reach(u, v) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
        |), cl AS (
        |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
        |  FROM reach GROUP BY u)
        |SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
        |FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id""".stripMargin,

    // Graph.pageRank's five power-iteration sweeps unrolled as chained
    // CTEs over the shared edge prelude. Damping literals are FORCED to
    // double on the DuckDB side (`1 - cast(0.85 AS double)`) because a
    // bare `0.15` parses as DECIMAL — a different value than the Scala
    // double `1.0 - 0.85` the Spark side folds. round(·,9) absorbs
    // summation-order wobble at the O(1/N) rank magnitude.
    "graph_pagerank" ->
      (ngramEdgeSql +
        """, deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u
          |), nn AS (SELECT cast(count(*) AS double) AS c FROM deg
          |), p0 AS (SELECT u, 1 / (SELECT c FROM nn) AS r FROM deg
          |), p1 AS (
          |  SELECT e.v AS u, (1 - cast(0.85 AS double)) / (SELECT c FROM nn)
          |      + cast(0.85 AS double) * sum(p.r / d.d) AS r
          |  FROM p0 p JOIN edges e ON e.u = p.u JOIN deg d ON d.u = p.u
          |  GROUP BY e.v
          |), p2 AS (
          |  SELECT e.v AS u, (1 - cast(0.85 AS double)) / (SELECT c FROM nn)
          |      + cast(0.85 AS double) * sum(p.r / d.d) AS r
          |  FROM p1 p JOIN edges e ON e.u = p.u JOIN deg d ON d.u = p.u
          |  GROUP BY e.v
          |), p3 AS (
          |  SELECT e.v AS u, (1 - cast(0.85 AS double)) / (SELECT c FROM nn)
          |      + cast(0.85 AS double) * sum(p.r / d.d) AS r
          |  FROM p2 p JOIN edges e ON e.u = p.u JOIN deg d ON d.u = p.u
          |  GROUP BY e.v
          |), p4 AS (
          |  SELECT e.v AS u, (1 - cast(0.85 AS double)) / (SELECT c FROM nn)
          |      + cast(0.85 AS double) * sum(p.r / d.d) AS r
          |  FROM p3 p JOIN edges e ON e.u = p.u JOIN deg d ON d.u = p.u
          |  GROUP BY e.v
          |), p5 AS (
          |  SELECT e.v AS u, (1 - cast(0.85 AS double)) / (SELECT c FROM nn)
          |      + cast(0.85 AS double) * sum(p.r / d.d) AS r
          |  FROM p4 p JOIN edges e ON e.u = p.u JOIN deg d ON d.u = p.u
          |  GROUP BY e.v)
          |SELECT u AS doc_id, round(r, 9) AS pagerank FROM p5""".stripMargin),

    // Graph.personalizedPageRank: the restart term is CASE-gated to the
    // seed membership (seeds ∩ subgraph members), everything else the
    // shared unrolled-sweep machinery
    "graph_ppr" ->
      (ngramEdgeSql +
        """, deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u
          |), sds AS (SELECT u FROM deg WHERE u < 50
          |), ns AS (SELECT cast(count(*) AS double) AS c FROM sds
          |), p0 AS (
          |  SELECT d.u, CASE WHEN s.u IS NOT NULL
          |    THEN 1 / (SELECT c FROM ns) ELSE cast(0 AS double) END AS r
          |  FROM deg d LEFT JOIN sds s ON s.u = d.u
          |), p1 AS (
          |  SELECT e.v AS u,
          |    (CASE WHEN sv.u IS NOT NULL THEN (1 - cast(0.85 AS double))
          |        / (SELECT c FROM ns) ELSE cast(0 AS double) END)
          |      + cast(0.85 AS double) * sum(p.r / d.d) AS r
          |  FROM p0 p JOIN edges e ON e.u = p.u JOIN deg d ON d.u = p.u
          |  LEFT JOIN sds sv ON sv.u = e.v
          |  GROUP BY e.v, sv.u
          |), p2 AS (
          |  SELECT e.v AS u,
          |    (CASE WHEN sv.u IS NOT NULL THEN (1 - cast(0.85 AS double))
          |        / (SELECT c FROM ns) ELSE cast(0 AS double) END)
          |      + cast(0.85 AS double) * sum(p.r / d.d) AS r
          |  FROM p1 p JOIN edges e ON e.u = p.u JOIN deg d ON d.u = p.u
          |  LEFT JOIN sds sv ON sv.u = e.v
          |  GROUP BY e.v, sv.u
          |), p3 AS (
          |  SELECT e.v AS u,
          |    (CASE WHEN sv.u IS NOT NULL THEN (1 - cast(0.85 AS double))
          |        / (SELECT c FROM ns) ELSE cast(0 AS double) END)
          |      + cast(0.85 AS double) * sum(p.r / d.d) AS r
          |  FROM p2 p JOIN edges e ON e.u = p.u JOIN deg d ON d.u = p.u
          |  LEFT JOIN sds sv ON sv.u = e.v
          |  GROUP BY e.v, sv.u
          |), p4 AS (
          |  SELECT e.v AS u,
          |    (CASE WHEN sv.u IS NOT NULL THEN (1 - cast(0.85 AS double))
          |        / (SELECT c FROM ns) ELSE cast(0 AS double) END)
          |      + cast(0.85 AS double) * sum(p.r / d.d) AS r
          |  FROM p3 p JOIN edges e ON e.u = p.u JOIN deg d ON d.u = p.u
          |  LEFT JOIN sds sv ON sv.u = e.v
          |  GROUP BY e.v, sv.u
          |), p5 AS (
          |  SELECT e.v AS u,
          |    (CASE WHEN sv.u IS NOT NULL THEN (1 - cast(0.85 AS double))
          |        / (SELECT c FROM ns) ELSE cast(0 AS double) END)
          |      + cast(0.85 AS double) * sum(p.r / d.d) AS r
          |  FROM p4 p JOIN edges e ON e.u = p.u JOIN deg d ON d.u = p.u
          |  LEFT JOIN sds sv ON sv.u = e.v
          |  GROUP BY e.v, sv.u)
          |SELECT u AS doc_id, round(r, 9) AS pagerank FROM p5""".stripMargin),

    // Graph.pageRankWeighted: same unrolled sweeps with the PPJoin
    // jaccard as transition weight — w/W(u) replaces 1/deg(u); the jac
    // division is the identical exact-int expression both engines fold
    "graph_pagerank_weighted" ->
      (ngramEdgeSql +
        """, wedges AS MATERIALIZED (
          |  SELECT a_id AS u, b_id AS v, jac AS w FROM e0
          |  UNION ALL SELECT b_id, a_id, jac FROM e0
          |), wsum AS (SELECT u, sum(w) AS wt FROM wedges GROUP BY u
          |), nn AS (SELECT cast(count(*) AS double) AS c FROM wsum
          |), p0 AS (SELECT u, 1 / (SELECT c FROM nn) AS r FROM wsum
          |), p1 AS (
          |  SELECT e.v AS u, (1 - cast(0.85 AS double)) / (SELECT c FROM nn)
          |      + cast(0.85 AS double) * sum(p.r * e.w / s.wt) AS r
          |  FROM p0 p JOIN wedges e ON e.u = p.u JOIN wsum s ON s.u = p.u
          |  GROUP BY e.v
          |), p2 AS (
          |  SELECT e.v AS u, (1 - cast(0.85 AS double)) / (SELECT c FROM nn)
          |      + cast(0.85 AS double) * sum(p.r * e.w / s.wt) AS r
          |  FROM p1 p JOIN wedges e ON e.u = p.u JOIN wsum s ON s.u = p.u
          |  GROUP BY e.v
          |), p3 AS (
          |  SELECT e.v AS u, (1 - cast(0.85 AS double)) / (SELECT c FROM nn)
          |      + cast(0.85 AS double) * sum(p.r * e.w / s.wt) AS r
          |  FROM p2 p JOIN wedges e ON e.u = p.u JOIN wsum s ON s.u = p.u
          |  GROUP BY e.v
          |), p4 AS (
          |  SELECT e.v AS u, (1 - cast(0.85 AS double)) / (SELECT c FROM nn)
          |      + cast(0.85 AS double) * sum(p.r * e.w / s.wt) AS r
          |  FROM p3 p JOIN wedges e ON e.u = p.u JOIN wsum s ON s.u = p.u
          |  GROUP BY e.v
          |), p5 AS (
          |  SELECT e.v AS u, (1 - cast(0.85 AS double)) / (SELECT c FROM nn)
          |      + cast(0.85 AS double) * sum(p.r * e.w / s.wt) AS r
          |  FROM p4 p JOIN wedges e ON e.u = p.u JOIN wsum s ON s.u = p.u
          |  GROUP BY e.v)
          |SELECT u AS doc_id, round(r, 9) AS pagerank FROM p5""".stripMargin),

    // Graph.triangleStats: oriented a<b<c enumeration over e0, each
    // triangle credited to all three corners; degree from the unoriented
    // endpoint multiset. Exact integers, no rounding.
    "graph_triangles" ->
      (ngramEdgeSql +
        """, tri AS (
          |  SELECT e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
          |  FROM e0 e1 JOIN e0 e2 ON e2.a_id = e1.b_id
          |  JOIN e0 e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id
          |), tc AS (
          |  SELECT doc_id, count(*) AS triangles FROM (
          |    SELECT a AS doc_id FROM tri
          |    UNION ALL SELECT b FROM tri
          |    UNION ALL SELECT c FROM tri)
          |  GROUP BY doc_id
          |), dg AS (
          |  SELECT doc_id, count(*) AS degree FROM (
          |    SELECT a_id AS doc_id FROM e0
          |    UNION ALL SELECT b_id FROM e0)
          |  GROUP BY doc_id)
          |SELECT dg.doc_id, dg.degree, coalesce(tc.triangles, 0) AS triangles
          |FROM dg LEFT JOIN tc ON tc.doc_id = dg.doc_id""".stripMargin),

    // the exact multiply chains of Dedup.lshTuningCurve, spelled out
    // left-associated per layout — identical IEEE operation order, so no
    // rounding is needed on either side; the grid is generated as i*0.05
    // on BOTH sides (a '0.15' literal parses to a DIFFERENT double than
    // 3*0.05 computes)
    "lsh_tuning_curve" ->
      """WITH g AS (
        |  SELECT i * CAST(0.05 AS DOUBLE) AS t FROM range(1, 20) r(i)),
        |one AS (SELECT CAST(1.0 AS DOUBLE) AS o),
        |a AS (SELECT t, o - (o*t*t*t*t) AS u, o FROM g, one),
        |b AS (SELECT t, o - (o*t*t*t*t*t*t*t*t) AS u, o FROM g, one),
        |c AS (SELECT t, o - (o*t*t) AS u, o FROM g, one)
        |SELECT 16 AS bands, 4 AS rows_per_band, t AS threshold,
        |  o - (o*u*u*u*u*u*u*u*u*u*u*u*u*u*u*u*u) AS p_detect FROM a
        |UNION ALL
        |SELECT 8, 8, t, o - (o*u*u*u*u*u*u*u*u) FROM b
        |UNION ALL
        |SELECT 32, 2, t,
        |  o - (o*u*u*u*u*u*u*u*u*u*u*u*u*u*u*u*u
        |       *u*u*u*u*u*u*u*u*u*u*u*u*u*u*u*u) FROM c""".stripMargin,

    // mirrors Similarity.quantizeInt8: exact float->double widening, one
    // fixed-shape double expression, integer code summaries
    "sim_quantize_int8" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, scale,
        |    CASE WHEN scale = 0.0
        |      THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(embedding, x ->
        |        CAST(floor((CAST(x AS DOUBLE) * 127.0) / scale + 0.5) AS BIGINT))
        |    END AS qv
        |  FROM s)
        |SELECT vec_id, scale,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_min(qv) AS BIGINT) AS q_min,
        |  CAST(list_max(qv) AS BIGINT) AS q_max
        |FROM q""".stripMargin,

    // the heap aggregate must reproduce the WINDOW formulation exactly —
    // same oracle as sim_topk_bruteforce
    "sim_topk_heap" ->
      """WITH v AS (
        |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e FROM embeddings),
        |sims AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    list_cosine_similarity(q.e, c.e) AS sim
        |  FROM v q JOIN v c ON q.vec_id != c.vec_id
        |  WHERE q.vec_id < 10),
        |ranked AS (
        |  SELECT q_id, n_id, round(sim, 6) AS sim_r,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
        |  FROM sims)
        |SELECT q_id, n_id, sim_r, rnk FROM ranked WHERE rnk <= 5""".stripMargin,

    // integer dot products are exact in both engines, so even the
    // APPROXIMATE scoring path is hash-verifiable end-to-end
    "sim_topk_int8" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS scale
        |  FROM embeddings),
        |qz AS (
        |  SELECT vec_id, scale,
        |    CASE WHEN scale = 0.0
        |      THEN list_transform(embedding, x -> CAST(0 AS DOUBLE))
        |      ELSE list_transform(embedding, x ->
        |        floor((CAST(x AS DOUBLE) * 127.0) / scale + 0.5))
        |    END AS qv
        |  FROM s),
        |sims0 AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS qdot,
        |    q.scale AS qs, c.scale AS cs
        |  FROM qz q JOIN qz c ON q.vec_id != c.vec_id
        |  WHERE q.vec_id < 10),
        |sims AS (
        |  SELECT q_id, n_id, qdot,
        |    ((CAST(qdot AS DOUBLE) * qs) * cs) / 16129.0 AS score
        |  FROM sims0),
        |ranked AS (
        |  SELECT q_id, n_id, qdot, score,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY score DESC, n_id ASC) AS rnk
        |  FROM sims)
        |SELECT q_id, n_id, qdot, score, rnk FROM ranked WHERE rnk <= 5""".stripMargin,

    "sim_topk_bruteforce" ->
      """WITH v AS (
        |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e FROM embeddings),
        |sims AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |    list_cosine_similarity(q.e, c.e) AS sim
        |  FROM v q JOIN v c ON q.vec_id != c.vec_id
        |  WHERE q.vec_id < 10),
        |ranked AS (
        |  SELECT q_id, n_id, round(sim, 6) AS sim_r,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(sim, 6) DESC, n_id ASC) AS rnk
        |  FROM sims)
        |SELECT q_id, n_id, sim_r, rnk FROM ranked WHERE rnk <= 5""".stripMargin,

    // 1.0 - int/int division: exact-integer operands, one division, one
    // subtraction — bit-identical cross-engine (DuckDB's 1.0 DECIMAL
    // literal promotes to the exact double 1.0)
    "text_vocab_coverage" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |wne AS (SELECT * FROM w WHERE token != ''),
        |vocab AS (
        |  SELECT token FROM wne GROUP BY token
        |  ORDER BY count(*) DESC, token ASC LIMIT 100)
        |SELECT doc_id,
        |  cast(count(*) as bigint) AS n_tokens,
        |  cast(sum(CASE WHEN token IN (SELECT token FROM vocab)
        |    THEN 1 ELSE 0 END) as bigint) AS n_invocab,
        |  1.0 - cast(sum(CASE WHEN token IN (SELECT token FROM vocab)
        |    THEN 1 ELSE 0 END) as double) / count(*) AS oov_ratio
        |FROM wne GROUP BY doc_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_re_tokens
        |FROM documents""".stripMargin,

    "text_quality" ->
      """SELECT doc_id,
        |  length(text) AS n_chars,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |  cast(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) as double)
        |    / length(text) AS alpha_ratio,
        |  cast(length(regexp_replace(text, '[^0-9]', '', 'g')) as double)
        |    / length(text) AS digit_ratio,
        |  cast(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g')) as double)
        |    / length(text) AS punct_ratio,
        |  cast(length(regexp_replace(text, '[^ \t\n]', '', 'g')) as double)
        |    / length(text) AS ws_ratio,
        |  cast(length(text) as double)
        |    / len(regexp_split_to_array(trim(text), '\s+')) AS mean_token_len
        |FROM documents""".stripMargin,

    // score components are CASE-gated exact-integer ratios with a fixed op
    // mirrors TextAnalysis.sentences: same RE2/Java-agreeing pattern,
    // trim -> drop empties -> positional explode
    "text_sentences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(
        |      regexp_split_to_array(text, '[.!?]+\s*'), s -> trim(s)),
        |      s -> len(s) > 0) AS sents
        |  FROM documents),
        |u AS (
        |  SELECT doc_id,
        |    CAST(generate_subscripts(sents, 1) - 1 AS INT) AS sent_idx,
        |    unnest(sents) AS sentence
        |  FROM t)
        |SELECT doc_id, sent_idx, sentence, len(sentence) AS n_chars
        |FROM u""".stripMargin,

    // mirrors TextAnalysis.percentileFilter: rank ceil(p*n) ascending by
    // (score, id), keep score >= that value — integer-exact
    "text_quality_gate" ->
      """WITH r AS (
        |  SELECT lang, n_chars, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars ASC, doc_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents),
        |thr AS (SELECT lang, n_chars AS t FROM r
        |        WHERE rn = cast(ceil(n * 0.25) as bigint))
        |SELECT d.lang, count(*) AS n_kept, min(d.n_chars) AS min_chars
        |FROM documents d JOIN thr ON d.lang = thr.lang
        |WHERE d.n_chars >= thr.t
        |GROUP BY d.lang""".stripMargin,

    // sequence — bit-identical doubles in any engine (emitted unrounded;
    // see TextAnalysis.qualityScore)
    "text_quality_score" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |    cast(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) as double)
        |      / length(text) AS alpha_ratio,
        |    cast(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g')) as double)
        |      / length(text) AS punct_ratio,
        |    cast(length(text) as double)
        |      / len(regexp_split_to_array(trim(text), '\s+')) AS mean_token_len
        |  FROM documents)
        |SELECT doc_id,
        |  (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END * 2
        |   + CASE WHEN alpha_ratio >= 0.6 THEN 1.0 ELSE alpha_ratio / 0.6 END * 4
        |   + CASE WHEN punct_ratio <= 0.2 THEN 1.0
        |       ELSE greatest(0.0, 1.0 - (punct_ratio - 0.2) * 5) END * 2
        |   + CASE WHEN mean_token_len BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END * 2)
        |  / 10.0 AS quality_score
        |FROM f""".stripMargin,

    // stopword-profile argmax with (score desc, lang asc) tiebreak; lang
    // codes checked in alphabetical order so the first equal-to-max wins
    "text_langid" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, len(w) AS n,
        |    len(list_filter(w, t -> list_contains(['der','die','und','das','ist','nicht','von','mit','den','ein'], t))) AS h_de,
        |    len(list_filter(w, t -> list_contains(['the','and','of','to','in','is','that','it','was','for'], t))) AS h_en,
        |    len(list_filter(w, t -> list_contains(['el','la','de','que','los','las','es','un','una','por'], t))) AS h_es,
        |    len(list_filter(w, t -> list_contains(['le','la','et','les','des','est','un','une','du','que'], t))) AS h_fr,
        |    len(list_filter(w, t -> list_contains(['il','la','di','che','e','un','una','per','non','sono'], t))) AS h_it
        |  FROM toks
        |), sc AS (
        |  SELECT doc_id,
        |    cast(h_de as double) / n AS s_de, cast(h_en as double) / n AS s_en,
        |    cast(h_es as double) / n AS s_es, cast(h_fr as double) / n AS s_fr,
        |    cast(h_it as double) / n AS s_it
        |  FROM s
        |), m AS (
        |  SELECT doc_id, s_de, s_en, s_es, s_fr, s_it,
        |    greatest(s_de, s_en, s_es, s_fr, s_it) AS ms
        |  FROM sc)
        |SELECT doc_id,
        |  CASE WHEN ms > 0 THEN
        |    CASE WHEN s_de = ms THEN 'de' WHEN s_en = ms THEN 'en'
        |         WHEN s_es = ms THEN 'es' WHEN s_fr = ms THEN 'fr'
        |         ELSE 'it' END
        |  ELSE 'und' END AS lang_pred,
        |  ms AS lang_score
        |FROM m""".stripMargin,

    // NB re-derivation: same bounded top-1000 vocab cut, add-1 class
    // likelihoods over vocab slots, ln-prior + ord-sorted list_sum fold
    // (the text_perplexity fold discipline), argmax by (round(score,6)
    // desc, class asc). Zero-token docs keep their prior-only score via
    // the LEFT JOIN + coalesce(fold, 0)
    "text_classify_nb" ->
      """WITH w AS (
        |  SELECT doc_id, lang,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents
        |), wne AS (
        |  SELECT doc_id, lang, i AS ord, toks[i] AS token
        |  FROM w, unnest(range(1, len(toks) + 1)) AS u(i)
        |  WHERE toks[i] != ''
        |), tr AS (SELECT * FROM wne WHERE doc_id % 10 < 8),
        |vocab AS (
        |  SELECT token FROM tr GROUP BY token
        |  ORDER BY count(*) DESC, token ASC LIMIT 1000),
        |ccnt AS (
        |  SELECT lang AS cls, token, count(*) AS n FROM tr
        |  WHERE token IN (SELECT token FROM vocab) GROUP BY lang, token),
        |prior AS (
        |  SELECT lang AS cls, count(*) AS nd FROM documents
        |  WHERE doc_id % 10 < 8 GROUP BY lang),
        |-- anchored on prior, not ccnt: a class whose train tokens all
        |-- miss the vocab cut still has total = 0 + V (the Spark side's
        |-- empty-map case), not a missing row
        |ctot AS (
        |  SELECT p.cls,
        |    cast(coalesce(sum(c.n), 0) as bigint)
        |      + (SELECT count(*) FROM vocab) AS total
        |  FROM prior p LEFT JOIN ccnt c ON c.cls = p.cls
        |  GROUP BY p.cls),
        |ptot AS (SELECT cast(sum(nd) as bigint) AS n FROM prior),
        |term AS (
        |  SELECT wne.doc_id, ct.cls, wne.ord,
        |    ln(cast(coalesce(cc.n, 0) + 1 as double) / ct.total) AS lp
        |  FROM wne CROSS JOIN ctot ct
        |  LEFT JOIN ccnt cc ON cc.cls = ct.cls AND cc.token = wne.token
        |), folds AS (
        |  SELECT doc_id, cls, list_sum(list(lp ORDER BY ord)) AS s
        |  FROM term GROUP BY doc_id, cls
        |), allscore AS (
        |  SELECT d.doc_id, d.lang AS actual, p.cls,
        |    round(ln(cast(p.nd as double) / (SELECT n FROM ptot))
        |          + coalesce(f.s, 0.0), 6) AS score
        |  FROM documents d CROSS JOIN prior p
        |  LEFT JOIN folds f ON f.doc_id = d.doc_id AND f.cls = p.cls
        |), best AS (
        |  SELECT doc_id, actual, cls, score,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY score DESC, cls ASC) AS r
        |  FROM allscore)
        |SELECT doc_id, actual, cls AS pred, score AS score_r,
        |  cast(doc_id % 10 < 8 as int) AS is_train
        |FROM best WHERE r = 1""".stripMargin,

    "text_search" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), scored AS (
        |  SELECT doc_id,
        |    len(list_filter(w, t -> t = 'spark'))
        |      + len(list_filter(w, t -> t = 'table'))
        |      + len(list_filter(w, t -> t = 'query')) AS n_hits,
        |    len(w) AS n_tokens
        |  FROM toks)
        |SELECT doc_id, n_hits, n_tokens,
        |  cast(n_hits as double) / n_tokens AS score
        |FROM scored WHERE n_hits > 0
        |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin,

    // BM25: corpus stats are exact integers, avgdl/idf mirror the driver's
    // double op sequence term-for-term ((1.2 + 1), (1 - 0.75) written out,
    // NOT 2.2/0.25 — the pre-added literals can round differently), and ln
    // is bit-identical across JVM and DuckDB libm (verified). Shared with
    // the persisted-inverted-index flavor, row-identical by construction.
    "text_bm25" -> TextBm25Sql,
    "text_bm25_indexed" -> TextBm25Sql,

    // stop-gram report: df re-derived from the corpus as DISTINCT
    // (doc, term) pairs — exactly what one posting row represents
    "text_index_topdf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), td AS (
        |  SELECT DISTINCT doc_id, t.term
        |  FROM toks, unnest(w) AS t(term) WHERE t.term != ''
        |), n AS (SELECT count(*) AS n FROM documents),
        |dfq AS (SELECT term, count(*) AS df FROM td GROUP BY term)
        |SELECT term, df, cast(df as double) / cast(n as double) AS df_share
        |FROM dfq, n
        |ORDER BY df DESC, term ASC LIMIT 50""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents""".stripMargin,

    // per-char counts are exact integers; the -p·ln p terms fold in
    // ascending char order via list(... ORDER BY c) — the same
    // fixed-order list_sum discipline as text_perplexity. round(6) on
    // both sides absorbs the rare 1-ulp JVM-vs-glibc libm divergence
    // (see the query registration comment)
    "text_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c
        |  FROM documents
        |), cnt AS (
        |  SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c
        |), tot AS (
        |  SELECT doc_id, cast(sum(k) as double) AS n FROM cnt GROUP BY doc_id
        |), terms AS (
        |  SELECT cnt.doc_id,
        |    list_sum(list(
        |      -((cast(k as double) / n) * ln(cast(k as double) / n))
        |      ORDER BY c)) AS ent
        |  FROM cnt JOIN tot USING (doc_id) GROUP BY cnt.doc_id)
        |SELECT d.doc_id, round(cast(coalesce(t.ent, 0.0) as double), 6) AS char_entropy
        |FROM documents d LEFT JOIN terms t USING (doc_id)""".stripMargin,

    // RRF fusion: only integer RANKS enter the score (sum of two exact
    // reciprocals, fixed order) — the BM25 doubles and cosine rounding
    // decide order exactly as in their own verified oracles
    "text_hybrid_search" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), base AS (
        |  SELECT doc_id, len(w) AS dl,
        |    len(list_filter(w, t -> t = 'spark')) AS tf0,
        |    len(list_filter(w, t -> t = 'table')) AS tf1,
        |    len(list_filter(w, t -> t = 'query')) AS tf2
        |  FROM toks
        |), stats AS (
        |  SELECT count(*) AS n, cast(sum(dl) as bigint) AS sum_dl,
        |    cast(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) as bigint) AS df0,
        |    cast(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) as bigint) AS df1,
        |    cast(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) as bigint) AS df2
        |  FROM base
        |), bmall AS (
        |  SELECT b.doc_id,
        |    ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
        |      * (tf0 * (CAST(1.2 AS DOUBLE) + 1.0))
        |      / (tf0 + CAST(1.2 AS DOUBLE) * ((1.0 - 0.75) + 0.75 * (dl / (cast(sum_dl as double) / n))))
        |    + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
        |      * (tf1 * (CAST(1.2 AS DOUBLE) + 1.0))
        |      / (tf1 + CAST(1.2 AS DOUBLE) * ((1.0 - 0.75) + 0.75 * (dl / (cast(sum_dl as double) / n))))
        |    + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
        |      * (tf2 * (CAST(1.2 AS DOUBLE) + 1.0))
        |      / (tf2 + CAST(1.2 AS DOUBLE) * ((1.0 - 0.75) + 0.75 * (dl / (cast(sum_dl as double) / n))))
        |    AS bm25
        |  FROM base b CROSS JOIN stats
        |  WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0
        |), bmtop AS (
        |  SELECT doc_id, rank_b FROM (
        |    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank_b
        |    FROM bmall) WHERE rank_b <= 100
        |), v AS (SELECT vec_id, cast(embedding as DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
        |vtop AS (
        |  SELECT doc_id, rank_v FROM (
        |    SELECT v.vec_id AS doc_id,
        |      row_number() OVER (ORDER BY round(list_cosine_similarity(v.e, q.qe), 6) DESC,
        |                         v.vec_id ASC) AS rank_v
        |    FROM v CROSS JOIN q) WHERE rank_v <= 100
        |)
        |SELECT coalesce(b.doc_id, t.doc_id) AS doc_id,
        |  coalesce(CAST(1.0 AS DOUBLE) / (60 + b.rank_b), 0.0)
        |    + coalesce(CAST(1.0 AS DOUBLE) / (60 + t.rank_v), 0.0) AS rrf,
        |  cast(b.rank_b as int) AS rank_b, cast(t.rank_v as int) AS rank_v
        |FROM bmtop b FULL OUTER JOIN vtop t ON b.doc_id = t.doc_id
        |ORDER BY rrf DESC, doc_id ASC LIMIT 20""".stripMargin,

    // lift (ln's argument) is one FIXED op sequence over exact-int factors
    // (each cast to double explicitly, left-associated) — bit-identical in
    // both engines; emitting ln itself is ulp-fragile (glibc vs JVM
    // intrinsic differ on some inputs), and ln is monotone so the ranking
    // is unchanged
    // share = cnt/total is one double division of exact longs and the
    // threshold compare multiplies the same exact longs as doubles —
    // bit-identical in both engines (no round(double, n) anywhere)
    "text_heavy_hitters" -> HeavyHittersSql,
    // the persisted-state twin is row-identical by the maintained MG
    // guarantee (candidate superset + identical exact recount) — shared
    // oracle, pinned by the equality test in TextAnalysisSpec
    "text_heavy_hitters_state" -> HeavyHittersSql,

    "text_collocations" ->
      """WITH t AS (
        |  SELECT string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), pr AS (
        |  SELECT w[i] AS a, w[i + 1] AS b
        |  FROM t, unnest(range(1, greatest(len(w) - 2, 0) + 2)) AS u(i)
        |  WHERE w[i] != '' AND w[i + 1] != ''
        |), uni AS (
        |  SELECT t2.tok, count(*) AS ct FROM (
        |    SELECT unnest(w) AS tok FROM t) t2
        |  WHERE t2.tok != '' GROUP BY t2.tok
        |), biall AS (SELECT a, b, count(*) AS cab FROM pr GROUP BY a, b),
        |tot AS (
        |  SELECT (SELECT cast(sum(ct) as bigint) FROM uni) AS nuni,
        |         (SELECT cast(sum(cab) as bigint) FROM biall) AS nbi
        |)
        |SELECT bi.a, bi.b, bi.cab,
        |  (cast(bi.cab as double) * cast(tot.nuni as double) * cast(tot.nuni as double))
        |     / (cast(tot.nbi as double) * cast(ua.ct as double) * cast(ub.ct as double)) AS lift
        |FROM biall bi
        |JOIN uni ua ON bi.a = ua.tok
        |JOIN uni ub ON bi.b = ub.tok
        |CROSS JOIN tot
        |WHERE bi.cab >= 5
        |ORDER BY lift DESC, bi.a ASC, bi.b ASC LIMIT 50""".stripMargin,

    "text_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        |  FROM documents
        |), w2 AS (SELECT w FROM w WHERE length(w) >= 2),
        |p AS (
        |  SELECT unnest([w[i:i+1] for i in range(1, length(w))]) AS pair
        |  FROM w2)
        |SELECT pair, count(*) AS n FROM p
        |GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin,

    // round-2 BPE stats: the top distinct-char pair is selected INSIDE the
    // SQL (count desc, pair asc — deterministic at ties, same tie-break as
    // the Spark side), merged position-wise, and re-counted. Merged-pair
    // symbols join with ' ' (cannot appear inside word tokens).
    "text_bpe_merge" ->
      """WITH w AS (
        |  SELECT unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        |  FROM documents
        |), w2 AS (SELECT w FROM w WHERE length(w) >= 2),
        |p1 AS (
        |  SELECT unnest([w[i:i+1] for i in range(1, length(w))]) AS pair
        |  FROM w2),
        |top1 AS (
        |  SELECT pair FROM p1 WHERE pair[1:1] != pair[2:2]
        |  GROUP BY pair ORDER BY count(*) DESC, pair ASC LIMIT 1),
        |sym AS (
        |  SELECT [CASE WHEN w[i:i+1] = t.pair THEN t.pair ELSE w[i:i] END
        |          for i in range(1, length(w) + 1)
        |          if i = 1 OR w[i-1:i] != t.pair] AS s
        |  FROM w2 CROSS JOIN top1 t),
        |p2 AS (
        |  SELECT unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS pair
        |  FROM sym WHERE len(s) >= 2)
        |SELECT pair, count(*) AS n FROM p2
        |GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin,

    // per-token ln(cnt/total) summed IN TOKEN ORDER on both engines:
    // Spark folds sequentially inside the native expression; DuckDB folds
    // list(lp ORDER BY ord) via list_sum (sequential — the ivf_refined
    // precedent). ln is bit-identical across JVM/DuckDB libm (BM25
    // precedent). Vocabulary cut (count desc, token asc, limit 1000) is
    // deterministic at ties.
    "text_perplexity" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents
        |), wne AS (
        |  SELECT doc_id, i AS ord, toks[i] AS token
        |  FROM w, unnest(range(1, len(toks) + 1)) AS u(i)
        |  WHERE toks[i] != ''),
        |cnts AS (SELECT token, count(*) AS n FROM wne GROUP BY token),
        |tot AS (SELECT cast(sum(n) as bigint) AS total FROM cnts),
        |vocab AS (
        |  SELECT token, n FROM cnts ORDER BY n DESC, token ASC LIMIT 1000),
        |term AS (
        |  SELECT wne.doc_id, wne.ord,
        |    ln(cast(coalesce(v.n, 1) as double) / tot.total) AS lp
        |  FROM wne LEFT JOIN vocab v USING (token) CROSS JOIN tot)
        |SELECT doc_id,
        |  cast(count(*) as bigint) AS n_tokens,
        |  -(list_sum(list(lp ORDER BY ord)) / count(*)) AS cross_entropy
        |FROM term GROUP BY doc_id""".stripMargin,

    // bigram surprisal: the same ord-sorted list_sum fold as
    // text_perplexity; numerator/denominator floors and the ≤1 clamp
    // (greatest) mirror BigramLogProb's documented proxy rule exactly
    "text_bigram_perplexity" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents
        |), pr AS (
        |  SELECT doc_id, i AS ord, toks[i] AS w1, toks[i+1] AS w2
        |  FROM w, unnest(range(1, len(toks))) AS u(i)
        |  WHERE toks[i] != '' AND toks[i+1] != ''
        |), tok AS (
        |  SELECT toks[i] AS token
        |  FROM w, unnest(range(1, len(toks) + 1)) AS u(i)
        |  WHERE toks[i] != ''
        |), ucnt AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
        |uvocab AS (SELECT token, n FROM ucnt ORDER BY n DESC, token ASC LIMIT 1000),
        |bcnt AS (SELECT w1 || ' ' || w2 AS pair, count(*) AS n FROM pr GROUP BY 1),
        |bvocab AS (SELECT pair, n FROM bcnt ORDER BY n DESC, pair ASC LIMIT 4000),
        |term AS (
        |  SELECT pr.doc_id, pr.ord,
        |    ln(cast(coalesce(bv.n, 1) as double)
        |       / cast(greatest(coalesce(uv.n, 1), coalesce(bv.n, 1)) as double)) AS lp
        |  FROM pr
        |  LEFT JOIN bvocab bv ON bv.pair = pr.w1 || ' ' || pr.w2
        |  LEFT JOIN uvocab uv ON uv.token = pr.w1)
        |SELECT doc_id,
        |  cast(count(*) as bigint) AS n_pairs,
        |  -(list_sum(list(lp ORDER BY ord)) / count(*)) AS cross_entropy
        |FROM term GROUP BY doc_id""".stripMargin,

    // interpolated trigram: identical fixed-shape arithmetic into ln on
    // both sides (dyadic λ, greatest-guarded denominators, exact-int
    // counts), ord-sorted list_sum fold, final round(6) = the ln ulp guard
    "text_trigram_perplexity" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents
        |), tok AS (
        |  SELECT toks[i] AS token
        |  FROM w, unnest(range(1, len(toks) + 1)) AS u(i)
        |  WHERE toks[i] != ''
        |), tot AS (SELECT cast(count(*) AS DOUBLE) AS t FROM tok),
        |ucnt AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
        |uvocab AS (SELECT token, n FROM ucnt ORDER BY n DESC, token ASC LIMIT 1000),
        |prb AS (
        |  SELECT toks[i] AS w1, toks[i+1] AS w2
        |  FROM w, unnest(range(1, len(toks))) AS u(i)
        |  WHERE toks[i] != '' AND toks[i+1] != ''
        |), bcnt AS (SELECT w1 || ' ' || w2 AS pair, count(*) AS n FROM prb GROUP BY 1),
        |bvocab AS (SELECT pair, n FROM bcnt ORDER BY n DESC, pair ASC LIMIT 4000),
        |prt AS (
        |  SELECT doc_id, i AS ord, toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3
        |  FROM w, unnest(range(1, len(toks) - 1)) AS u(i)
        |  WHERE toks[i] != '' AND toks[i+1] != '' AND toks[i+2] != ''
        |), tcnt AS (
        |  SELECT w1 || ' ' || w2 || ' ' || w3 AS tripl, count(*) AS n
        |  FROM prt GROUP BY 1
        |), tvocab AS (SELECT tripl, n FROM tcnt ORDER BY n DESC, tripl ASC LIMIT 8000),
        |term AS (
        |  SELECT prt.doc_id, prt.ord,
        |    ln(0.5 * (cast(coalesce(tv.n, 0) AS DOUBLE)
        |         / cast(greatest(coalesce(bv12.n, 0), coalesce(tv.n, 0), 1) AS DOUBLE))
        |     + 0.375 * (cast(coalesce(bv23.n, 0) AS DOUBLE)
        |         / cast(greatest(coalesce(uv2.n, 0), coalesce(bv23.n, 0), 1) AS DOUBLE))
        |     + 0.125 * (cast(greatest(coalesce(uv3.n, 1), 1) AS DOUBLE) / tot.t)) AS lp
        |  FROM prt
        |  LEFT JOIN tvocab tv ON tv.tripl = prt.w1 || ' ' || prt.w2 || ' ' || prt.w3
        |  LEFT JOIN bvocab bv12 ON bv12.pair = prt.w1 || ' ' || prt.w2
        |  LEFT JOIN bvocab bv23 ON bv23.pair = prt.w2 || ' ' || prt.w3
        |  LEFT JOIN uvocab uv2 ON uv2.token = prt.w2
        |  LEFT JOIN uvocab uv3 ON uv3.token = prt.w3
        |  CROSS JOIN tot)
        |SELECT doc_id,
        |  cast(count(*) AS bigint) AS n_triples,
        |  round(-(list_sum(list(lp ORDER BY ord)) / count(*)), 6) AS cross_entropy_r
        |FROM term GROUP BY doc_id""".stripMargin,

    // ratios are single divisions of exact integer counts; top-gram pick is
    // (count desc, gram asc) row_number — both engine-deterministic
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(
        |    [array_to_string(w[i:i+1], ' ') for i in range(1, greatest(len(w) - 2, 0) + 2)]) AS gram
        |  FROM t
        |), gne AS (SELECT * FROM g WHERE gram != ''),
        |c AS (SELECT doc_id, gram, count(*) AS cnt FROM gne GROUP BY 1, 2),
        |r AS (
        |  SELECT doc_id, gram, cnt,
        |    cast(sum(cnt) OVER (PARTITION BY doc_id) as bigint) AS n_grams,
        |    cast(count(*) OVER (PARTITION BY doc_id) as bigint) AS n_distinct,
        |    cast(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)
        |      OVER (PARTITION BY doc_id) as bigint) AS n_dup,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY cnt DESC, gram ASC) AS rn
        |  FROM c)
        |SELECT doc_id, n_grams, n_distinct, n_dup,
        |  cast(n_dup as double) / n_grams AS dup_fraction,
        |  gram AS top_gram,
        |  cast(cnt as double) / n_grams AS top_fraction
        |FROM r WHERE rn = 1""".stripMargin,

    // replicates the full algorithm like sim_topk_ivf: md5-ordered centroid
    // pick, argmin cell assignment (same tiebreak), unrounded cosine
    // threshold (bit-identical sequential folds), min-id greedy keep
    "dedup_semantic" ->
      """WITH v AS (
        |  SELECT vec_id, cast(embedding as DOUBLE[]) AS e FROM embeddings
        |), cent AS (
        |  SELECT row_number() OVER (ORDER BY md5(cast(vec_id as varchar))) - 1 AS cell, e
        |  FROM v ORDER BY md5(cast(vec_id as varchar)) LIMIT 16
        |), cassign AS (
        |  SELECT vec_id, e, cell FROM (
        |    SELECT n.vec_id, n.e, c.cell,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY -(list_inner_product(n.e, c.e) - list_inner_product(c.e, c.e)/2) ASC,
        |                 c.cell ASC) AS r
        |    FROM v n CROSS JOIN cent c) WHERE r = 1
        |), dom AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM cassign a JOIN cassign b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.e, b.e) >= 0.4)
        |SELECT c.vec_id, cast(c.cell as int) AS cell
        |FROM cassign c WHERE c.vec_id NOT IN (SELECT vec_id FROM dom)""".stripMargin,
  )

  /** Head/tail split exists only because the shared rerank SQL literal
    * sits between them; the surface is the one concatenated map. */
  val oracles: Map[String, String] = {
    val base = oraclesHead ++ oraclesTail
    // the indexed graph lanes are row-identical to their in-memory twins
    // (same edge geometry, stored vs derived) and share the oracles
    base ++ Seq("graph_components", "graph_pagerank", "graph_ppr",
      "graph_pagerank_weighted", "graph_triangles")
      .map(n => s"${n}_indexed" -> base(n)) +
      // the incremental fold lands on the identical final labeling
      ("graph_components_incremental" -> base("graph_components"))
  }
}
