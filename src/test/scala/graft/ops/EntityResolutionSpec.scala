package graft.ops

import graft.SparkSpec
import graft.functions.StringKernels
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {

  // ------------------------------------------------------ kernel semantics

  test("jaroWinkler kernel matches the textbook/DuckDB reference values") {
    val cases = Seq(
      // (a, b, expected) — classic record-linkage literature pairs, values
      // verified against DuckDB's jaro_winkler_similarity
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("CRATE", "TRACE", 0.7333333333333334), // no common prefix → no bonus
      ("abc", "abc", 1.0),
      ("a", "a", 1.0))
    for ((a, b, exp) <- cases) {
      assert(math.abs(StringKernels.jaroWinkler(a, b) - exp) < 1e-12,
        s"$a/$b")
      // symmetry
      assert(StringKernels.jaroWinkler(a, b) == StringKernels.jaroWinkler(b, a))
    }
  }

  test("jaroWinkler edge semantics: empties, boost threshold, prefix cap") {
    // DuckDB returns 0.0 when EITHER side is empty — including both
    assert(StringKernels.jaroWinkler("", "") == 0.0)
    assert(StringKernels.jaroWinkler("", "abc") == 0.0)
    assert(StringKernels.jaroWinkler("abc", "") == 0.0)
    // jaro = 0.6 ≤ 0.7 → Winkler prefix bonus suppressed despite the
    // 4-char common prefix (DuckDB-verified value)
    assert(math.abs(StringKernels.jaroWinkler("abcdxxxxxx", "abcdyyyyyy") - 0.6) < 1e-12)
    // prefix bonus caps at 4 even with a longer common prefix:
    // jw = jaro + min(l,4)·0.1·(1−jaro)
    val j = StringKernels.jaroWinkler("abcdefgh", "abcdefxy")
    val jaro = (6.0 / 8 + 6.0 / 8 + 1.0) / 3
    assert(math.abs(j - (jaro + 4 * 0.1 * (1 - jaro))) < 1e-12)
    // no matches at all → 0.0
    assert(StringKernels.jaroWinkler("aaaa", "bbbb") == 0.0)
  }

  test("jaroWinkler transposition count uses integer division (DuckDB parity)") {
    // even-mismatch case: abcdef/badcfe — all 6 match within window 2,
    // 6 mismatched positions → t = 3
    val v = StringKernels.jaroWinkler("abcdef", "badcfe")
    val jaro = (1.0 + 1.0 + (6.0 - 3) / 6) / 3
    assert(math.abs(v - jaro) < 1e-12)
    // ODD-mismatch pair (from the 8000-pair DuckDB Monte Carlo pin):
    // floor-division gives DuckDB's 0.611111…; float division would give
    // 0.583333… — this is the case that separates the two variants
    assert(math.abs(
      StringKernels.jaroWinkler("c1#1cbb0c", "#c10ab###11b")
        - 0.611111111111111) < 1e-12)
  }

  test("jaro_winkler expression: codegen path equals kernel, null-safe, SQL-registered") {
    val df = spark.createDataFrame(Seq(
      (1L, "MARTHA", "MARHTA"),
      (2L, "DIXON", "DICKSONX"),
      (3L, null.asInstanceOf[String], "x"))).toDF("id", "a", "b")
    graft.functions.hashes.registerSql(spark)
    val rows = df.select(col("id"),
      EntityResolution.jaroWinkler(col("a"), col("b")).as("jw"),
      expr("jaro_winkler(a, b)").as("jw_sql"))
      .orderBy("id").collect()
    assert(math.abs(rows(0).getDouble(1) - 0.9611111111111111) < 1e-12)
    assert(rows(0).getDouble(1) == rows(0).getDouble(2))
    assert(math.abs(rows(1).getDouble(1) - 0.8133333333333332) < 1e-12)
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  // ---------------------------------------------------------- fuzzy linkage

  test("fuzzyLink: block-bounded candidates, heap ranking equals window ranking") {
    import spark.implicits._
    val probes = Seq(
      (1L, "Customer#000000001", 0),
      (2L, "Customer#000000042", 1))
      .toDF("p_id", "p_name", "block")
    val cands = Seq(
      (10L, "Customer#000000001", 0), // exact twin, block 0
      (11L, "Customer#000000011", 0),
      (12L, "Customer#000000041", 1),
      (13L, "Customer#000000042", 1), // exact twin, block 1
      (14L, "Customer#000000942", 1),
      (99L, "Customer#000000001", 9)) // right name, WRONG block — unreachable
      .toDF("c_id", "c_name", "block")
    val out = EntityResolution.fuzzyLink(probes, cands, k = 2)
      .orderBy("p_id", "rnk").collect()
    // probe 1: twin first (jw=1.0), then the in-block alternative; the
    // identical name in block 9 must NOT appear
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq ==
      Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 13L, 1), (2L, 12L, 2)))
    assert(out(0).getDouble(2) == 1.0)
    assert(out(2).getDouble(2) == 1.0)
    // rnk-2 of probe 2: 12 ("...041") beats 14 ("...942") on jw
    assert(out(3).getLong(1) == 12L)
  }

  test("fuzzyLink excludeSelf drops the identity pair; ties break by smaller c_id") {
    import spark.implicits._
    val recs = Seq(
      (1L, "alpha", 0), (2L, "alpha", 0), (3L, "alpha", 0))
      .toDF("p_id", "p_name", "block")
    val out = EntityResolution.fuzzyLink(
      recs, recs.select(col("p_id").as("c_id"), col("p_name").as("c_name"),
        col("block")), k = 2, excludeSelf = true)
      .orderBy("p_id", "rnk").collect()
    // every pair has jw=1.0 → order purely by c_id asc, self excluded
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 2L)))
  }

  test("fuzzyPairs: canonical a<b pairs, threshold-gated, blocked") {
    import spark.implicits._
    val recs = Seq(
      (1L, "Supplier#0001", 0), (2L, "Supplier#0002", 0),
      (3L, "Zebra", 0), (4L, "Supplier#0001", 1))
      .toDF("p_id", "p_name", "block")
    val out = EntityResolution.fuzzyPairs(recs, threshold = 0.9)
      .orderBy("a_id", "b_id").collect()
    // only (1,2) survives: same block, jw high; Zebra fails threshold;
    // record 4 shares a name with 1 but sits in another block
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("editCandidates: exact distances, threshold gate, block confinement") {
    import spark.implicits._
    val recs = Seq(
      (1L, "abcd", 0), (2L, "abce", 0), // dist 1
      (3L, "azce", 0),                  // dist(1,3)=2, dist(2,3)=1
      (4L, "zzzzzz", 0),                // far from everything
      (5L, "abcd", 1))                  // twin of 1, WRONG block
      .toDF("p_id", "p_name", "block")
    val out = EntityResolution.editCandidates(
      recs, recs.select(col("p_id").as("c_id"), col("p_name").as("c_name"),
        col("block")), maxDist = 2, excludeSelf = true)
      .orderBy("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq(
      (1L, 2L, 1), (1L, 3L, 2), (2L, 1L, 1), (2L, 3L, 1),
      (3L, 1L, 2), (3L, 2L, 1)))
  }

  test("damerauLevenshtein kernel: DuckDB-pinned values, unrestricted variant") {
    import graft.functions.DamerauKernel
    val pinned = Seq(
      // values read from DuckDB damerau_levenshtein this session
      ("CA", "ABC", 2), // THE separator: OSA says 3, unrestricted says 2
      ("abcdef", "abcfed", 2),
      ("kitten", "sitting", 3),
      ("ab", "ba", 1),
      ("abc", "", 3),
      ("Customer#000000123", "Customer#000000213", 1),
      ("acbd", "abcd", 1),
      ("aabb", "bbaa", 3),
      ("abcde", "baedc", 3),
      ("xy", "yx", 1))
    for ((a, b, exp) <- pinned) {
      assert(DamerauKernel.dist(a, b) == exp, s"$a/$b")
      assert(DamerauKernel.dist(b, a) == exp, s"symmetry $a/$b")
    }
    // transposition beats substitution-only pricing
    assert(DamerauKernel.dist("abcd", "abdc") == 1)
    assert(DamerauKernel.dist("", "") == 0)
  }

  test("dlCandidates: transposed ids survive the threshold plain levenshtein rejects") {
    import spark.implicits._
    val recs = Seq(
      (1L, "id-1234", 0), (2L, "id-1243", 0), // one adjacent swap: DL 1, Lev 2
      (3L, "id-4321", 0),                     // far under both
      (4L, "id-2134", 0))                     // swap at digits 1-2: DL 1
      .toDF("p_id", "p_name", "block")
    val cands = recs.select(col("p_id").as("c_id"), col("p_name").as("c_name"),
      col("block"))
    val dl = EntityResolution.dlCandidates(recs, cands, maxDist = 1,
      excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(dl.contains((1L, 2L, 1)) && dl.contains((1L, 4L, 1)))
    assert(!dl.exists(p => p._1 == 3L || p._2 == 3L))
    // plain levenshtein at the same threshold finds nothing
    val lev = EntityResolution.editCandidates(recs, cands, maxDist = 1,
      excludeSelf = true).count()
    assert(lev == 0L)
  }

  test("tfidfCandidates: reordered tokens match, rare tokens dominate, self excluded") {
    import spark.implicits._
    val df = Seq(
      (1L, "lavender spring chocolate"),
      (2L, "chocolate lavender spring"), // exact token-set reorder of 1
      (3L, "goldenrod spring lace"),
      (4L, "goldenrod navy lace"),       // shares rare goldenrod+lace with 3
      (5L, "spring spring spring"))      // frequent-token-only doc
      .toDF("id", "name")
    val got = EntityResolution.tfidfCandidates(df, "id", "name",
      threshold = 0.0000010, probePred = col("p_id") <= 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // reordered token sets are cosine-identical (1.0)
    assert(got((1L, 2L)) == 1.0 && got((2L, 1L)) == 1.0)
    assert(!got.contains((1L, 1L)), "self pair must be excluded")
    // 3-4 share two RARE tokens; 1-3 share only the frequent 'spring':
    // the rare-token pair must score far higher
    assert(got((3L, 4L)) > got.getOrElse((1L, 3L), 0.0) + 0.3,
      s"rare-token pair ${got((3L, 4L))} vs frequent-token ${got.get((1L, 3L))}")
    // symmetry of the score
    for (((a, b), v) <- got if got.contains((b, a)))
      assert(got((b, a)) == v, s"asymmetric score for ($a,$b)")
  }

  test("sortedNeighborhood: pairs equal the driver-sorted window reference, any partitioning") {
    import spark.implicits._
    val rng = new java.util.Random(41)
    val recs = (1L to 300L).map { i =>
      (i, f"rec-${rng.nextInt(100)}%03d-${('a' + rng.nextInt(4)).toChar}")
    }
    val df = recs.toDF("p_id", "p_name")
    // brute-force reference: global (name, id) sort, pairs within window
    val sorted = recs.sortBy { case (id, n) => (n, id) }
    val want = (for {
      i <- sorted.indices; o <- 1 to 3 if i + o < sorted.size
      a = sorted(i); b = sorted(i + o)
      jw = BigDecimal(graft.functions.StringKernels.jaroWinkler(a._2, b._2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jw >= 0.9
    } yield (a._1, b._1, o, jw)).toSet
    for (np <- Seq(2, 7, 32)) {
      val got = EntityResolution.sortedNeighborhood(df, window = 3,
        threshold = 0.9, numPartitions = np)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3))).toSet
      assert(got == want, s"numPartitions=$np: ${got.size} vs ${want.size}")
    }
  }

  test("editJoin equals brute force on random strings (lossless filter + exact verify)") {
    import spark.implicits._
    val rng = new java.util.Random(17)
    val alpha = "abcd"
    // lengths 1..12: the short tail exercises the probe-only exclusion
    // contract — sub-segmentable CANDIDATES must still pair with longer
    // probes exactly as the all-pairs join would
    val names = Seq.tabulate(250)(i =>
      (i.toLong, Seq.fill(1 + rng.nextInt(12))(alpha(rng.nextInt(alpha.length))).mkString))
    val probes = names.take(40).toDF("p_id", "p_name")
    val cands = names.toDF("c_id", "c_name")
    for (tau <- Seq(1, 2)) {
      val got = EntityResolution.editJoin(probes, cands, tau, excludeSelf = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // driver-side brute force over the same contract: PROBES shorter
      // than tau+1 excluded (cannot be segmented), candidates unfiltered
      val want = (for {
        (pid, pn) <- names.take(40) if pn.length >= tau + 1
        (cid, cn) <- names if cid != pid
        d = levenshteinRef(pn, cn) if d <= tau
      } yield (pid, cid, d)).toSet
      assert(names.exists(_._2.length <= tau),
        s"tau=$tau fixture must contain sub-segmentable candidates")
      assert(got == want, s"tau=$tau: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.nonEmpty, s"tau=$tau fixture degenerate")
    }
  }

  test("editJoin: planted distances, short-string contract, self-exclusion") {
    import spark.implicits._
    val probes = Seq((1L, "abcdef"), (2L, "ab"), (3L, "abc"))
      .toDF("p_id", "p_name")
    val cands = Seq(
      (1L, "abcdef"),   // self — excluded
      (10L, "abcdef"),  // dist 0
      (11L, "abcdxf"),  // dist 1 (substitution)
      (12L, "abcdefgh"),// dist 2 (two inserts)
      (13L, "abcdefghi"), // dist 3 — out
      (20L, "ab"),      // short probe 2's twin — probe excluded by contract;
                        //   as CANDIDATE it pairs with probe 3 (dist 1)
      (21L, "a"))       // 1-char candidate within threshold of probe 3 —
                        //   emitted (candidates are not length-excluded)
      .toDF("c_id", "c_name")
    val out = EntityResolution.editJoin(probes, cands, maxDist = 2,
      excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((1L, 10L, 0), (1L, 11L, 1), (1L, 12L, 2),
      (3L, 20L, 1), (3L, 21L, 2)))
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val t = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    d(a.length)
  }

  test("er queries run against sf0.001 with bounded shapes") {
    for (q <- Seq("er_link_suppliers", "er_dedup_names")) {
      val df = SparkEntryAccess.query(q)(spark, sf0001)
      val n = df.count()
      assert(n > 0, q)
      // one row per probe per rank — bounded by probes × k by construction
      assert(n <= 300, q)
    }
  }
}

/** Small indirection so ops-package specs can reach the query map without
  * importing the root package object explicitly. */
object SparkEntryAccess {
  def query(name: String): (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame =
    graft.SparkEntry.queries(name)
}
