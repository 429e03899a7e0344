package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and regex tokenizers") {
    val df = Seq((1L, "Hello, world! 42 times"), (2L, "one  two   three"))
      .toDF("doc_id", "text")
    val res = df.select(col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).as("ws"),
      TextAnalysis.regexTokenCount(col("text")).as("re"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(res(1L)._1 == 4) // Hello, world! 42 times
    assert(res(1L)._2 == 6) // Hello , world ! 42 times
    assert(res(2L)._1 == 3) // runs of spaces collapse
  }

  test("native word_tokens is value-identical to declarative split(normalize)") {
    // edge cases: empty, whitespace-only (both yield [""]), case, tabs,
    // run-of-whitespace collapse, leading/trailing whitespace
    val crafted = Seq((1L, ""), (2L, "   "), (3L, "\t\n "), (4L, "One"),
      (5L, "  Mixed   CASE\ttext \n with everything  "), (6L, "a b c"))
      .toDF("doc_id", "text")
    val corpus = graft.Tables(spark, sf0001, "documents")
    for (df <- Seq(crafted, corpus)) {
      val mismatches = df.select(
        graft.functions.hashes.word_tokens(col("text")).as("native"),
        split(Dedup.normalize(col("text")), " ").as("declarative"))
        .filter(not(col("native") <=> col("declarative")))
        .count()
      assert(mismatches == 0)
    }
  }

  test("misra_gries sketch: guarantee, merge, and exact heavy-hitter equality") {
    import spark.implicits._
    // planted skew: "hot" is 30% of a 1000-item stream — with k=9 the
    // n/(k+1) = 10% bound guarantees it survives any partitioning
    val items = (Seq.fill(300)("hot") ++
      (1 to 700).map(i => s"cold${i % 350}"))
    val rng = new scala.util.Random(42)
    val shuffled = rng.shuffle(items)
    for (parts <- Seq(1, 7)) {
      val df = shuffled.toDF("item").repartition(parts)
      val sk = df.agg(graft.functions.mg.misra_gries($"item", 9).as("s"))
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1)))
      assert(sk.length <= 9, s"buffer overflow at parts=$parts: ${sk.length}")
      val hot = sk.find(_._1 == "hot")
      assert(hot.isDefined, s"30% item lost from the sketch at parts=$parts")
      // stored counts are lower bounds within n/(k+1) of the truth
      assert(hot.get._2 <= 300 && hot.get._2 >= 300 - 100)
    }
    // heavyHitters output is EXACTLY the full-groupBy formulation
    val docs = graft.Tables(spark, sf0001, "documents")
    val got = TextAnalysis.heavyHitters(docs, "text", minShare = 0.01,
        sketchK = 199)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val toks = docs.select(explode(
        graft.functions.hashes.word_tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val total = toks.count()
    val want = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") > lit(0.01) * lit(total.toDouble))
      .orderBy(col("cnt").desc, col("token").asc)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(1).toDouble / total.toDouble))
    assert(got.toSeq == want.toSeq,
      s"sketch path diverged from exact: got=${got.take(3).toSeq} want=${want.take(3).toSeq}")
    assert(got.nonEmpty, "fixture degenerate — no 1% tokens")
    // the guard that keeps the guarantee honest
    intercept[IllegalArgumentException] {
      TextAnalysis.heavyHitters(docs, "text", minShare = 0.01, sketchK = 50)
    }
  }

  test("persisted heavy-hitter state: fold-forward equals direct, replays skip, stream lands") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.Tables(spark, sf0001, "documents")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val direct = rows(TextAnalysis.heavyHitters(docs, "text", 0.01, 199))
    // build on a third, fold the other two thirds forward — the exact
    // recount over the maintained candidates must equal the direct path
    val path = java.nio.file.Files.createTempDirectory("hh_state").toString
    TextAnalysis.writeHhState(docs.filter(col("doc_id") % 3 === 0), "text", path)
    TextAnalysis.appendToHhState(docs.filter(col("doc_id") % 3 === 1), "text", path)
    TextAnalysis.appendToHhState(docs.filter(col("doc_id") % 3 === 2), "text", path)
    assert(rows(TextAnalysis.heavyHittersFromState(docs, "text", path)) == direct)
    // health read: lower-bound weights, every direct heavy hitter among
    // the candidates
    val cands = TextAnalysis.hhStateCandidates(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(direct.forall { case (tok, cnt, _) =>
      cands.contains(tok) && cands(tok) <= cnt })
    // replayed batch id is skipped whole — the state is unchanged
    TextAnalysis.appendToHhState(docs.limit(50), "text", path, batchId = Some(7L))
    val withBatch = rows(TextAnalysis.hhStateCandidates(spark, path))
    TextAnalysis.appendToHhState(docs.limit(50), "text", path, batchId = Some(7L))
    assert(rows(TextAnalysis.hhStateCandidates(spark, path)) == withBatch)
    // streaming maintenance: micro-batches fold in with their batch ids
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val sPath = java.nio.file.Files.createTempDirectory("hh_stream").toString
    TextAnalysis.writeHhState(docs.filter(col("doc_id") % 3 === 0), "text", sPath)
    val rest = docs.filter(col("doc_id") % 3 =!= 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = rest.splitAt(rest.length / 2)
    val input = MemoryStream[(Long, String)]
    val q = TextAnalysis.hhStream(
      input.toDF().toDF("doc_id", "text"), "text", sPath)
    try {
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    assert(rows(TextAnalysis.heavyHittersFromState(docs, "text", sPath)) == direct)
  }

  test("quality features on crafted text") {
    val df = Seq((1L, "abcde 12345")).toDF("doc_id", "text") // 11 chars
    val r = TextAnalysis.qualityFeatures(df, "doc_id", "text").collect().head
    assert(r.getAs[Int]("n_chars") == 11)
    assert(r.getAs[Int]("n_tokens") == 2)
    assert(math.abs(r.getAs[Double]("alpha_ratio") - 5.0 / 11) < 1e-15)
    assert(math.abs(r.getAs[Double]("digit_ratio") - 5.0 / 11) < 1e-15)
    assert(math.abs(r.getAs[Double]("ws_ratio") - 1.0 / 11) < 1e-15)
  }

  test("quality score is in [0,1] and penalizes garbage") {
    val df = Seq(
      (1L, "This is a perfectly reasonable English sentence with normal words in it."),
      (2L, "!!! ??? ;;; ::: ,,, ... ###"),
    ).toDF("doc_id", "text")
    val scores = TextAnalysis.qualityScore(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    assert(scores.values.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(1L) > scores(2L))
  }

  test("language id recognizes major languages by stopwords") {
    val df = Seq(
      (1L, "the cat sat on the mat and it was happy for a while"),
      (2L, "der Hund ist nicht mit der Katze und das ist ein Problem"),
      (3L, "le chat est sur la table et les enfants sont dans le jardin"),
      (4L, "el perro es un animal que vive en la casa por los campos"),
      (5L, "zzz qqq xxx www"),
    ).toDF("doc_id", "text")
    val langs = TextAnalysis.languageId(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(langs(1L) == "en")
    assert(langs(2L) == "de")
    assert(langs(3L) == "fr")
    assert(langs(4L) == "es")
    assert(langs(5L) == "und")
  }

  test("term search ranks by exact term frequency with id tiebreak") {
    val df = Seq(
      (1L, "spark spark spark runs"), // 3/4
      (2L, "spark is a query engine for big data work"), // 2/9
      (3L, "nothing relevant here at all"), // filtered out
      (4L, "spark spark spark runs")) // tie with 1 -> id order
      .toDF("doc_id", "text")
    val res = TextAnalysis.termSearch(df, "doc_id", "text",
      Seq("spark", "query"), k = 10).collect()
    assert(res.map(_.getLong(0)).toSeq == Seq(1L, 4L, 2L))
    assert(res.head.getAs[Int]("n_hits") == 3)
    assert(math.abs(res.head.getAs[Double]("score") - 0.75) < 1e-15)
  }

  test("bm25 ranks rare-term hits above common-term hits, deterministic") {
    val df = Seq(
      (1L, "rareword alpha beta gamma delta"),        // 1 hit of the rare term
      (2L, "common common common alpha beta gamma"),  // 3 hits of the common term
      (3L, "common alpha beta gamma delta epsilon"),
      (4L, "common beta gamma delta epsilon zeta"),
      (5L, "nothing matching at all here now"),
    ).toDF("doc_id", "text")
    val ranked = TextAnalysis.bm25Search(df, "doc_id", "text",
      Seq("rareword", "common"), k = 10).collect()
    // df(rareword)=1 vs df(common)=3 → the idf gap outranks raw tf
    assert(ranked.head.getAs[Long]("doc_id") == 1L)
    assert(!ranked.map(_.getAs[Long]("doc_id")).contains(5L))
    val again = TextAnalysis.bm25Search(df, "doc_id", "text",
      Seq("rareword", "common"), k = 10).collect()
    assert(ranked.map(_.toSeq).sameElements(again.map(_.toSeq)))
  }

  test("persisted text index: row-identical to bm25Search; postings scan is partition-pruned") {
    val docs = graft.Tables(spark, sf0001, "documents").select("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft_text_idx_spec").toString
    TextAnalysis.writeTextIndex(docs, "doc_id", "text", idx)
    val terms = Seq("spark", "table", "query")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val direct = rows(TextAnalysis.bm25Search(docs, "doc_id", "text", terms, k = 20))
    val indexed = rows(TextAnalysis.bm25SearchIndexed(spark, idx, terms, k = 20))
    // same rows, same order, BIT-identical scores (same exact-integer
    // stats, same driver idf literals, same term-order floating fold)
    assert(indexed == direct,
      s"indexed BM25 must reproduce the stats-pass exactly:\n$direct\nvs\n$indexed")
    // absent term: idf computed from df=0 in both paths
    val withGhost = terms :+ "zzznotaword"
    assert(rows(TextAnalysis.bm25SearchIndexed(spark, idx, withGhost, k = 20)) ==
      rows(TextAnalysis.bm25Search(docs, "doc_id", "text", withGhost, k = 20)))
    // the query terms' md5 buckets must reach the postings scan as a
    // PARTITION filter (directory pruning — the layout's whole point)
    val plan = TextAnalysis.bm25SearchIndexed(spark, idx, terms, k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected a bucket-pruned postings scan:\n$plan")
    // layout really is one dir per term bucket
    val dirs = new java.io.File(s"$idx/postings").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.matches("bucket=[0-9a-f]{2}")))
    // stop-gram report: df-desc/term-asc order, shares exact df/n, df ≤ n
    val n = docs.count()
    val top = TextAnalysis.textIndexTopDf(spark, idx, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(top.nonEmpty && top.length <= 10)
    assert(top.sliding(2).forall { case Array((ta, da, _), (tb, db, _)) =>
      da > db || (da == db && ta < tb); case _ => true })
    assert(top.forall { case (_, df, share) =>
      df <= n && share == df.toDouble / n.toDouble })
  }

  test("text index append: equals a fresh build over the union; stream append lands") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.Tables(spark, sf0001, "documents").select("doc_id", "text")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val terms = Seq("spark", "table", "query")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // batch append: build on half, append the rest — must EQUAL both the
    // fresh full build and the direct stats-pass search (df is counted at
    // query time and buckets are content-addressed, so an appended index
    // is indistinguishable from a rebuild; no IVF-style frozen geometry)
    val idxApp = java.nio.file.Files.createTempDirectory("graft_text_idx_app").toString
    TextAnalysis.writeTextIndex(half1, "doc_id", "text", idxApp)
    TextAnalysis.appendToTextIndex(half2, "doc_id", "text", idxApp)
    val idxFull = java.nio.file.Files.createTempDirectory("graft_text_idx_full").toString
    TextAnalysis.writeTextIndex(docs, "doc_id", "text", idxFull)
    val appended = rows(TextAnalysis.bm25SearchIndexed(spark, idxApp, terms, k = 20))
    assert(appended == rows(TextAnalysis.bm25SearchIndexed(spark, idxFull, terms, k = 20)))
    assert(appended == rows(TextAnalysis.bm25Search(docs, "doc_id", "text", terms, k = 20)))
    // replay idempotency: re-delivering the same batch must not
    // double-count doc lengths or tf rows
    TextAnalysis.appendToTextIndex(half2, "doc_id", "text", idxApp)
    assert(rows(TextAnalysis.bm25SearchIndexed(spark, idxApp, terms, k = 20))
      == appended, "replayed append changed the index")
    assert(spark.read.parquet(s"$idxApp/doclen").count() == docs.count(),
      "replayed append duplicated doclen rows")
    // crash healing: a failure BETWEEN the doclen and postings appends
    // leaves docs with doclen rows but no postings — the replay must heal
    // the postings tree rather than skip those docs forever (each tree
    // anti-joins against its OWN stored ids, not a shared doclen marker)
    val idxCrash = java.nio.file.Files.createTempDirectory("graft_text_idx_crash").toString
    TextAnalysis.writeTextIndex(half1, "doc_id", "text", idxCrash)
    half2.select(col("doc_id"),
        size(graft.functions.hashes.word_tokens(col("text"))).cast("long").as("dl"))
      .write.mode("append").parquet(s"$idxCrash/doclen") // the partial append
    TextAnalysis.appendToTextIndex(half2, "doc_id", "text", idxCrash)
    assert(rows(TextAnalysis.bm25SearchIndexed(spark, idxCrash, terms, k = 20))
      == appended, "replay after a doclen-only crash left postings missing")
    assert(spark.read.parquet(s"$idxCrash/doclen").count() == docs.count(),
      "replay after a doclen-only crash duplicated doclen rows")
    // streaming maintenance: micro-batched docs land and become searchable
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idxStream = java.nio.file.Files.createTempDirectory("graft_text_idx_stream").toString
    TextAnalysis.writeTextIndex(half1, "doc_id", "text", idxStream)
    val half2Rows = half2.collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    input.addData(half2Rows.take(half2Rows.length / 2).toSeq)
    input.addData(half2Rows.drop(half2Rows.length / 2).toSeq)
    val sq = TextAnalysis.appendStreamToTextIndex(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", idxStream)
    sq.awaitTermination(60000)
    assert(rows(TextAnalysis.bm25SearchIndexed(spark, idxStream, terms, k = 20)) == appended)
  }

  test("bigram surprisal: hand-computed conditional cross-entropy, rare-transition penalty") {
    val df = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"),
    ).toDF("doc_id", "text")
    // corpus: c(a)=3, c(b)=2, c(c)=1; c("a b")=2, c("a c")=1
    // doc1/doc2: p(b|a) = 2/max(3,2) -> ce = -ln(2/3)
    // doc3:      p(c|a) = 1/max(3,1) -> ce = -ln(1/3) = ln 3
    val got = TextAnalysis.bigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == 1L && got(3L)._1 == 1L)
    assert(got(1L)._2 == -Math.log(2.0 / 3.0))
    assert(got(2L)._2 == got(1L)._2)
    assert(got(3L)._2 == Math.log(3.0))
    // the rare transition costs more than the common one
    assert(got(3L)._2 > got(1L)._2)
    // single-token and empty docs drop (no pairs)
    val edge = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    assert(TextAnalysis.bigramSurprisal(edge, "doc_id", "text").count() == 0)
  }

  test("trigram surprisal: hand-computed interpolated cross-entropy, smooth backoff") {
    val df = Seq(
      (1L, "a b c a b c"), (2L, "a b x"),
    ).toDF("doc_id", "text")
    // corpus: T=9; uni a:3 b:3 c:2 x:1; bi "a b":3 "b c":2 "c a":1 "b x":1;
    // tri "a b c":2 "b c a":1 "c a b":1 "a b x":1
    val got = TextAnalysis.trigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == 4L && got(2L)._1 == 1L)
    // doc2's (a,b,x): p3 = 1/max(3,1) = 1/3; p2 = c("b x")/max(c(b),1) = 1/3;
    // p1 = c(x)/T = 1/9 → p = ½·⅓ + ⅜·⅓ + ⅛·⅑
    val p2doc = 0.5 * (1.0 / 3) + 0.375 * (1.0 / 3) + 0.125 * (1.0 / 9)
    assert(math.abs(got(2L)._2 -
      BigDecimal(-Math.log(p2doc)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    // doc1's triples are corpus-typical → lower cross-entropy than doc2
    assert(got(1L)._2 < got(2L)._2)
    // interpolation backs off smoothly: even the OOV-heavy doc is finite
    assert(got(2L)._2.isFinite)
    // docs with < 3 tokens drop
    val edge = Seq((1L, "just two"), (2L, "")).toDF("doc_id", "text")
    assert(TextAnalysis.trigramSurprisal(edge, "doc_id", "text").count() == 0)
  }

  test("char entropy: hand-computed values, gibberish-vs-template separation, SQL surface") {
    val df = Seq(
      (1L, "aaaa"),                 // single symbol -> 0 nats
      (2L, "abab"),                 // two equiprobable symbols -> ln 2
      (3L, ""),                     // empty -> 0 by convention
      (4L, "a8Zq3!kP0wXy$rT9"),     // near-uniform (gibberish-like)
      (5L, "spam spam spam spam"),  // templated
    ).toDF("doc_id", "text")
    val e = df.select(col("doc_id"),
      graft.functions.hashes.char_entropy(col("text")).as("ent"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(e(1L) == 0.0 && e(3L) == 0.0)
    assert(math.abs(e(2L) - math.log(2.0)) < 1e-15)
    // 16 distinct chars over 16 positions -> exactly ln 16
    assert(math.abs(e(4L) - math.log(16.0)) < 1e-12)
    assert(e(4L) > e(5L) + 1.0, s"gibberish ${e(4L)} vs template ${e(5L)}")
    // deterministic and available from SQL (both installation paths)
    graft.functions.hashes.registerSql(spark)
    val viaSql = df.selectExpr("char_entropy(text) AS ent")
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(viaSql == e.values.toSeq.sorted)
  }

  test("vocab coverage: exact OOV counts against an explicit vocabulary") {
    val df = Seq(
      (1L, "alpha beta gamma alpha"), // 4 tokens, 3 in vocab (alpha x2, beta)
      (2L, "delta epsilon zeta"),     // 0 in vocab
      (3L, "Alpha BETA"),             // normalization: both in vocab
    ).toDF("doc_id", "text")
    val vocab = Seq("alpha", "beta").toDF("token")
    val out = TextAnalysis.vocabCoverage(df, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((4L, 3L, 1.0 - 3.0 / 4)))
    assert(out(2L) == ((3L, 0L, 1.0)))
    assert(out(3L) == ((2L, 2L, 0.0)))
    // the membership join broadcasts the vocabulary — the token stream
    // must not shuffle for the join itself
    val plan = TextAnalysis.vocabCoverage(df, "doc_id", "text", vocab)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("bpe merge round: top pair applied, round-2 symbol pairs hand-computed") {
    // corpus: "aba abab ba" ×3 docs. In-word char pairs: ab(×3/doc... )
    // per doc: "aba"→{ab,ba}, "abab"→{ab,ba,ab}, "ba"→{ba} ⇒ ab:3, ba:3
    // per doc; tie at 9 corpus-wide → pair ASC picks "ab".
    // Merge "ab": "aba"→[ab,a], "abab"→[ab,ab], "ba"→[b,a]
    // round-2 pairs per doc: "ab a", "ab ab", "b a" ⇒ each ×3 corpus-wide
    val docs = Seq.tabulate(3)(i => (i.toLong, "aba abab ba"))
      .toDF("doc_id", "text")
    val res = TextAnalysis.bpeMergeRound(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res == Map("ab a" -> 3L, "ab ab" -> 3L, "b a" -> 3L))
  }

  test("bpe train: exact equality with a driver-side reference over the real corpus") {
    // the greedy priority-order apply is not SQL-expressible, so the
    // contract is EXACT EQUALITY of the full merge table against an
    // independent reference implementation run on the same tokenization
    def refTrain(words: Seq[String], n: Int): Seq[(String, Long)] = {
      var merges = Vector.empty[(String, String)]
      def applySyms(w: String): Vector[String] = {
        var syms = w.codePoints.toArray
          .map(cp => new String(Character.toChars(cp))).toVector
        merges.foreach { case (a, b) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
              out += a + b; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
        }
        syms
      }
      (1 to n).map { _ =>
        val counts = scala.collection.mutable.Map.empty[String, Long]
        words.foreach { w =>
          val syms = applySyms(w)
          var j = 0
          while (j < syms.length - 1) {
            val p = syms(j) + " " + syms(j + 1)
            counts(p) = counts.getOrElse(p, 0L) + 1L
            j += 1
          }
        }
        val (pair, cnt) = counts.toSeq.minBy { case (p, c) => (-c, p) }
        val i = pair.indexOf(' ')
        merges :+= ((pair.substring(0, i), pair.substring(i + 1)))
        (pair, cnt)
      }
    }
    val docs = graft.Tables(spark, sf0001, "documents")
    // the SAME tokenization the trainer uses
    val words = docs
      .select(explode(graft.functions.hashes.word_tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2).collect().map(_.getString(0)).toSeq
    val expected = refTrain(words, 6)
    val got = TextAnalysis.bpeTrain(docs, "text", nMerges = 6)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == expected, s"merge tables differ:\n got=$got\n exp=$expected")
    // multi-character symbols: later merges can combine earlier ones
    val tiny = Seq((1L, "abab abab abab")).toDF("doc_id", "text")
    val tinyMerges = TextAnalysis.bpeTrain(tiny, "text", nMerges = 2)
      .orderBy("merge_rank").collect().map(_.getString(1)).toSeq
    // "abab": round 1 pairs {a b:2, b a:1} → "a b"; round 2 symbols
    // [ab, ab] → pair "ab ab"
    assert(tinyMerges == Seq("a b", "ab ab"))
  }

  test("bpe encode: exact equality with a driver-side reference encoder") {
    // independent reference apply (the refTrain loop's applySyms, run
    // against the operator's own trained merges)
    def refEncode(word: String, merges: Seq[(String, String)]): Vector[String] = {
      var syms = word.codePoints.toArray
        .map(cp => new String(Character.toChars(cp))).toVector
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
      syms
    }
    val docs = graft.Tables(spark, sf0001, "documents")
    val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 4)
      .orderBy("merge_rank").collect().map(_.getString(1)).toIndexedSeq
    val parsed = merges.map { m =>
      val i = m.indexOf(' '); (m.substring(0, i), m.substring(i + 1))
    }
    val got = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // recompute every document's symbol stream with the reference encoder
    val texts = docs.select(col("doc_id"),
      graft.functions.hashes.word_tokens(col("text")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    texts.foreach { case (id, toks) =>
      val words = toks.filter(_.nonEmpty)
      val stream = toks.flatMap(refEncode(_, parsed))
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(stream.mkString(" ").getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      assert(got(id) == ((words.size.toLong, stream.size.toLong, digest)),
        s"encode mismatch doc $id")
    }
    // merged symbols really appear: total tokens < total codepoints
    val totalTokens = got.values.map(_._2).sum
    val totalChars = texts.map(_._2.map(_.length).sum).sum
    assert(totalTokens < totalChars, "merges must compress the symbol stream")
  }

  test("content fingerprint is whitespace/case insensitive") {
    val df = Seq(
      (1L, "Hello   World"), (2L, "  hello world "), (3L, "hello worlds"))
      .toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
      TextAnalysis.contentFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("rolling fingerprint: identical docs share min_hash; window count correct") {
    val df = Seq(
      (1L, "a b c d e f g"), // 7 tokens -> 3 windows of 5
      (2L, "a b c d e f g"),
      (3L, "x y z w v u t"))
      .toDF("doc_id", "text")
    val res = TextAnalysis.rollingFingerprint(df, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(res(1L) == res(2L))
    assert(res(1L)._2 == 3)
    assert(res(1L)._1 != res(3L)._1)
  }

  test("null and degenerate text rows drop cleanly from repetition and surprisal") {
    import spark.implicits._
    val df = Seq((1L, "a b a"), (2L, null.asInstanceOf[String]), (3L, "   "))
      .toDF("doc_id", "text")
    val rep = TextAnalysis.repetitionSignals(df, "doc_id", "text", 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rep == Set(1L)) // null and whitespace-only rows excluded, no crash
    val sup = TextAnalysis.unigramSurprisal(df, "doc_id", "text", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sup == Set(1L))
  }

  test("unigram surprisal: exact hand-computed cross-entropy, OOV add-one floor") {
    import spark.implicits._
    // corpus counts: a:3, b:1, c:1, total 5; vocabSize=2 keeps {a, b}
    // (count desc, token asc at the b/c tie) — c scores with the floor 1
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(df, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("cross_entropy"))).toMap
    val e1 = -((math.log(3.0 / 5) + math.log(3.0 / 5) + math.log(1.0 / 5)) / 3)
    val e2 = -((math.log(3.0 / 5) + math.log(1.0 / 5)) / 2)
    assert(out(1L) == ((3L, e1))) // bit-exact: same sequential op order
    assert(out(2L) == ((2L, e2)))
    // scoring pass is row-local: garbled docs rank above plain ones
    assert(out(2L)._2 > out(1L)._2)
  }

  test("repetition signals are zero-shuffle: no Exchange in the plan") {
    import spark.implicits._
    val df = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.repetitionSignals(df, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition must stay row-local:\n$plan")
  }

  test("repetition signals: exact dup fraction, deterministic top-gram tiebreak") {
    import spark.implicits._
    // doc 1 bigrams: "a b","b a","a b","b c" → counts {a b:2, b a:1, b c:1}
    // doc 2 bigrams: all distinct
    val df = Seq((1L, "a b a b c"), (2L, "x y z w")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(df, "doc_id", "text", n = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_grams") == 4 && r1.getAs[Long]("n_distinct") == 3)
    assert(r1.getAs[Long]("n_dup") == 2)
    assert(r1.getAs[Double]("dup_fraction") == 0.5)
    assert(r1.getAs[String]("top_gram") == "a b")
    assert(r1.getAs[Double]("top_fraction") == 0.5)
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_dup") == 0 && r2.getAs[Long]("n_grams") == 3)
    // tie on count → lexicographically smallest gram wins
    assert(r2.getAs[String]("top_gram") == "x y")
  }

  test("repetition signals keep the trailing-empty-token gram (string_split parity)") {
    import spark.implicits._
    // "a b\n" normalizes to "a b " (trim strips only 0x20): tokens are
    // ['a','b',''] — grams {"a b", "b "} — NOT just {"a b"}. A tokenizer
    // dropping trailing empty fields loses the second gram and diverges
    // from the DuckDB oracle's string_split semantics.
    val df = Seq((1L, "a b\n")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(df, "doc_id", "text", 2)
      .collect().head
    assert(r.getAs[Long]("n_grams") == 2)
    assert(r.getAs[Long]("n_distinct") == 2)
    assert(r.getAs[String]("top_gram") == "a b") // "a b" < "b " on count tie
  }

  test("sentence segmentation: punctuation runs, trimming, empties dropped") {
    val df = Seq(
      (1L, "One two. Three!  Four? End"),
      (2L, "..."),
      (3L, "no punct")).toDF("doc_id", "text")
    val rows = TextAnalysis.sentences(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(rows.filter(_._1 == 1L).sortBy(_._2).map(t => (t._3, t._4)).toSeq ==
      Seq(("One two", 7), ("Three", 5), ("Four", 4), ("End", 3)))
    assert(!rows.exists(_._1 == 2L)) // pure punctuation → no sentences
    assert(rows.filter(_._1 == 3L).map(_._3).toSeq == Seq("no punct"))
  }

  test("compression ratio separates repetitive text from prose; edge cases") {
    import graft.functions.hashes.compression_ratio
    val df = Seq(
      (1L, "ab" * 500),
      (2L, "The quick brown fox jumps over the lazy dog while seventeen " +
        "magistrates deliberated obscure fiscal amendments near Lake Bled."),
      (3L, "")).toDF("doc_id", "text")
    val r = df.select(col("doc_id"), compression_ratio(col("text")).as("cr"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) < 0.05, s"repetitive text must crush: ${r(1L)}")
    assert(r(2L) > 0.5, s"varied prose must not: ${r(2L)}")
    assert(r(3L) == 1.0) // empty input convention
    // deterministic across evaluations
    val again = df.select(compression_ratio(col("text")))
      .collect().map(_.getDouble(0)).toSeq
    assert(again == Seq(r(1L), r(2L), r(3L)))
    // SQL surface
    graft.functions.hashes.registerSql(spark)
    assert(spark.sql("SELECT compression_ratio('aaaaaaaaaaaaaaaaaaaa') < 0.5")
      .head().getBoolean(0))
  }

  test("plan shapes: sentences has no exchange; gate and mix broadcast, never window twice") {
    val df = Seq((1L, "a. b", "en", 4L), (2L, "c", "en", 1L))
      .toDF("doc_id", "text", "lang", "n_chars")
    // sentence segmentation is row-local — nothing may shuffle
    val sentPlan = TextAnalysis.sentences(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!sentPlan.contains("Exchange"), s"sentences must not shuffle:\n$sentPlan")
    // percentile gate: thresholds come back via a broadcast join (one
    // group-partitioned window is inherent; the join must not shuffle)
    val gatePlan = TextAnalysis.percentileFilter(df, "lang", "n_chars", "doc_id", 0.25)
      .queryExecution.executedPlan.toString
    assert(gatePlan.contains("BroadcastHashJoin"), s"expected broadcast:\n$gatePlan")
    // temperature mix: no window anywhere, cutoffs broadcast
    val mixPlan = graft.ops.Chunking.temperatureMix(df, "lang", "doc_id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!mixPlan.contains("Window"), s"mix must not window:\n$mixPlan")
    assert(mixPlan.contains("BroadcastHashJoin") ||
      mixPlan.contains("BroadcastNestedLoopJoin"), s"expected broadcast:\n$mixPlan")
  }

  test("percentileFilter: exact discrete quantile, threshold ties survive") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L), (4L, "a", 30L),
      (5L, "a", 40L), (6L, "a", 50L), (7L, "a", 60L), (8L, "a", 70L),
      (9L, "b", 5L)).toDF("doc_id", "g", "score")
    val kept = TextAnalysis.percentileFilter(df, "g", "score", "doc_id", 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // group a: n=8, rank ceil(2)=2 of sorted scores (10,20,20,...) -> thr=20;
    // BOTH rows scoring 20 survive (value semantics), only the 10 drops.
    // group b: n=1, rank 1 -> its single row is its own threshold and stays.
    assert(kept == Set(2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
  }

  test("naive Bayes: separable classes recovered on held-out docs") {
    // disjoint class vocabularies; ids 0-7 train (doc_id % 10 < 8),
    // ids 8,9 are held-out and must classify by their tokens
    val df = Seq(
      (0L, "apple banana apple", "fruit"), (1L, "banana cherry", "fruit"),
      (2L, "apple apple cherry", "fruit"), (3L, "banana banana", "fruit"),
      (4L, "iron copper zinc", "metal"), (5L, "copper copper iron", "metal"),
      (6L, "zinc iron", "metal"), (7L, "iron zinc copper", "metal"),
      (8L, "apple banana cherry", "fruit"), (9L, "copper zinc zinc", "metal"))
      .toDF("doc_id", "text", "label")
    val out = TextAnalysis.naiveBayesClassify(
      df, "doc_id", "text", "label", col("doc_id") % 10 < 8)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getBoolean(4))).toMap
    assert(out.size == 10)
    // every prediction correct (vocabularies are disjoint), including the
    // two held-out documents
    out.foreach { case (id, (actual, pred, _)) =>
      assert(pred == actual, s"doc $id predicted $pred, actual $actual") }
    assert(!out(8L)._3 && !out(9L)._3 && out(0L)._3)
  }

  test("naive Bayes: hand-computed add-1 scores and prior tiebreak") {
    // one-token classes; doc 4's token is out-of-vocab for both classes,
    // so both scores reduce to ln(prior) + ln(1/(count_c + V)) and the
    // class-name tiebreak must pick "a"
    val df = Seq(
      (0L, "x", "a"), (1L, "x x", "a"), (2L, "y", "b"), (3L, "y y", "b"),
      (4L, "zzz", "a"))
      .toDF("doc_id", "text", "label")
    val out = TextAnalysis.naiveBayesClassify(
      df, "doc_id", "text", "label", col("doc_id") < 4)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getDouble(3))).toMap
    // vocab = {x, y} (V=2); class a: count_x=3 -> P(x|a)=(3+1)/(3+2)=0.8;
    // class b: count_y=3, same by symmetry; priors 2/4 each
    val expect0 = BigDecimal(Math.log(0.5) + Math.log(4.0 / 5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L)._1 == "a" && math.abs(out(0L)._2 - expect0) < 1e-9)
    assert(out(2L)._1 == "b")
    // OOV-only doc: equal scores, alphabetical class tiebreak
    assert(out(4L)._1 == "a")
  }

  // ---------------------------------------------- unigram-LM tokenizer

  /** Independent Viterbi (top-down memo — different structure from the
    * kernel's bottom-up loop) following the documented tie rule:
    * shortest-first, strictly-greater wins. */
  private def refViterbi(word: String, pieces: Map[String, Double],
      maxLen: Int, unk: Double): List[String] = {
    val memo = scala.collection.mutable.Map.empty[Int, (Double, List[String])]
    def solve(i: Int): (Double, List[String]) = {
      if (i == 0) return (0.0, Nil)
      memo.getOrElseUpdate(i, {
        var best = (Double.NegativeInfinity, List.empty[String])
        for (l <- 1 to math.min(maxLen, i)) {
          val p = word.substring(i - l, i)
          val lp = pieces.get(p).orElse(if (l == 1) Some(unk) else None)
          lp.foreach { v =>
            val (s0, seq0) = solve(i - l)
            val s = s0 + v
            if (s > best._1) best = (s, p :: seq0)
          }
        }
        best
      })
    }
    solve(word.length)._2.reverse
  }

  test("unigram viterbi kernel: planted segmentations, tie rule, unk floor") {
    import graft.functions.UnigramViterbiJvm
    val t = UnigramViterbiJvm.buildMap(Seq(
      ("abc", -2.5), ("ab", -1.0), ("c", -2.0), ("a", -3.0), ("b", -3.0)))
    assert(UnigramViterbiJvm.segment("abc", t, 4, -20.0).toSeq == Seq("abc"))
    // tie: [a b] = -2.0 equals [ab] = -2.0 → shortest-first keeps [a, b]
    val tie = UnigramViterbiJvm.buildMap(Seq(("ab", -2.0), ("a", -1.0), ("b", -1.0)))
    assert(UnigramViterbiJvm.segment("ab", tie, 4, -20.0).toSeq == Seq("a", "b"))
    // unknown char: floor keeps decoding alive as single-char pieces
    assert(UnigramViterbiJvm.segment("axb", tie, 4, -20.0).toSeq == Seq("a", "x", "b"))
    // kernel ≡ independent reference on random words over a planted vocab
    val pieces = Seq(("th", -1.2), ("he", -1.4), ("the", -1.1), ("t", -2.0),
      ("h", -2.1), ("e", -1.9), ("r", -2.2), ("re", -1.6))
    val tb = UnigramViterbiJvm.buildMap(pieces)
    val rng = new java.util.Random(7)
    val alpha = "ther"
    for (_ <- 1 to 200) {
      val word = (1 to (1 + rng.nextInt(8)))
        .map(_ => alpha(rng.nextInt(alpha.length))).mkString
      assert(UnigramViterbiJvm.segment(word, tb, 3, -20.0).toSeq ==
        refViterbi(word, pieces.toMap, 3, -20.0), s"word $word")
    }
  }

  /** Independent reference trainer — plain Scala collections, same
    * documented algorithm (seed → hard-EM → cut). */
  private def refUnigramTrain(wordCounts: Map[String, Long], vocabSize: Int,
      maxLen: Int, emRounds: Int, seedSize: Int): Seq[(Int, String, Long, Double)] = {
    val freq = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- wordCounts; i <- 0 until w.length;
         l <- 1 to maxLen if i + l <= w.length) {
      val p = w.substring(i, i + l)
      freq(p) = freq.getOrElse(p, 0L) + c
    }
    val head = freq.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, f) => (-f, p) }.take(seedSize)
    val singles = freq.toSeq.filter(_._1.length == 1)
    var inv: Seq[(String, Long)] = (singles ++ head).sortBy { case (p, f) => (-f, p) }
    for (_ <- 1 to emRounds) {
      val total = inv.map(_._2).sum.toDouble
      val lp = inv.map { case (p, f) => (p, Math.log(f / total)) }.toMap
      val used = scala.collection.mutable.Map.empty[String, Long]
      for ((w, c) <- wordCounts; p <- refViterbi(w, lp, maxLen, -20.0))
        used(p) = used.getOrElse(p, 0L) + c
      inv = used.toSeq.sortBy { case (p, f) => (-f, p) }
    }
    val (sing, multi) = inv.partition(_._1.length == 1)
    val kept = (sing ++ multi.take(math.max(0, vocabSize - sing.size)))
      .sortBy { case (p, f) => (-f, p) }
    val total = kept.map(_._2).sum.toDouble
    kept.zipWithIndex.map { case ((p, f), i) =>
      (i + 1, p, f, BigDecimal(Math.log(f / total))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("unigram train: exact equality with the independent trainer on the real corpus") {
    val docs = graft.Tables(spark, sf0001, "documents")
    val wc = docs
      .select(explode(graft.functions.hashes.word_tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = refUnigramTrain(wc, vocabSize = 120, maxLen = 4,
      emRounds = 2, seedSize = 600)
    val got = TextAnalysis.unigramTrain(docs, "text", vocabSize = 120)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.size == expected.size,
      s"vocab sizes differ: ${got.size} vs ${expected.size}")
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(t => t._1 != t._2)}")
    // multi-char pieces actually won slots (the tokenizer learned units)
    assert(got.count(_._2.length > 1) > 10)
  }

  test("unigram encode: digest equality with reference segmentation") {
    val docs = graft.Tables(spark, sf0001, "documents").limit(50)
    val pieces = TextAnalysis.unigramTrain(
      graft.Tables(spark, sf0001, "documents"), "text", vocabSize = 120)
      .collect().map(r => (r.getString(1), r.getDouble(3))).toIndexedSeq
    val lp = pieces.toMap
    val got = TextAnalysis.unigramEncode(docs, "doc_id", "text", pieces)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    val texts = docs.select(col("doc_id"),
      graft.functions.hashes.word_tokens(col("text")).as("ws"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    for ((id, ws) <- texts) {
      val words = ws.filter(_.nonEmpty)
      val toks = ws.flatMap(w => refViterbi(w, lp, 4, -20.0))
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(toks.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(got(id)._1 == words.size, s"doc $id word count")
      assert(got(id)._2 == toks.size, s"doc $id token count")
      assert(got(id)._3 == digest, s"doc $id digest")
    }
  }
}
