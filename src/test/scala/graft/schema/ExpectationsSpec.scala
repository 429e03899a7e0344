package graft.schema

import graft.SparkSpec
import graft.schema.Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame, exps: Seq[Expectation]) =
    Expectations.check(df, exps).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(4))).toSeq

  test("clean frame passes every check with exact zero-violation rows") {
    val df = Seq((1L, "en", 100L), (2L, "de", 200L), (3L, "fr", 300L))
      .toDF("id", "lang", "n")
    val got = report(df, Seq(
      NotNull("lang"), InRange("n", Some(1), Some(1000)),
      InSet("lang", Seq("en", "de", "fr")), MatchesRegex("lang", "^[a-z]{2}$"),
      Unique(Seq("id")), NonEmpty(2)))
    assert(got.forall(_._4 == true))
    assert(got.forall(r => r._2 == 0L && r._3 == 3L))
  }

  test("null-ratio threshold: at the bound passes, above fails; counts exact") {
    val df = (Seq.fill(3)(Option.empty[String]) ++ Seq.fill(7)(Some("x")))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "s")
    val got = report(df,
      Seq(NotNull("s", maxNullRatio = 0.3), NotNull("s", maxNullRatio = 0.2)))
    assert(got(0) == (("not_null(s)", 3L, 10L, true)))
    assert(got(1) == (("not_null(s)", 3L, 10L, false)))
  }

  test("range violations exclude nulls; one-sided bounds work") {
    val df = Seq(Some(-5L), Some(10L), Some(2000L), None)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "n")
    val got = report(df, Seq(
      InRange("n", min = Some(0)),
      InRange("n", max = Some(100)),
      InRange("n", Some(0), Some(100)),
      NotNull("n")))
    assert(got.map(_._2) == Seq(1L, 1L, 2L, 1L),
      s"violation counts: ${got.map(_._2)}")
  }

  test("uniqueness counts rows beyond the first per key, incl. multi-column keys") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (1L, "a"))
      .toDF("k1", "k2")
    val got = report(df, Seq(Unique(Seq("k1")), Unique(Seq("k1", "k2"))))
    // k1 distinct {1,2} -> 5-2=3 dups; (k1,k2) distinct 3 -> 2 dups
    assert(got.map(_._2) == Seq(3L, 2L))
    assert(got.map(_._4) == Seq(false, false))
  }

  test("empty frame passes row checks but fails NonEmpty with the shortfall") {
    val df = Seq.empty[(Long, String)].toDF("id", "s")
    val got = report(df, Seq(NotNull("s"), Unique(Seq("id")), NonEmpty(5)))
    assert(got.map(_._4) == Seq(true, true, false))
    assert(got(2)._2 == 5L, "violations = row shortfall")
  }

  test("requireClean lists EVERY failed expectation, not just the first") {
    val df = Seq((1L, null.asInstanceOf[String]), (1L, "x")).toDF("id", "s")
    val e = intercept[IllegalStateException] {
      Expectations.requireClean(df, Seq(
        NotNull("s"), Unique(Seq("id")), NonEmpty(1)))
    }
    assert(e.getMessage.contains("not_null(s)"))
    assert(e.getMessage.contains("unique(id)"))
    assert(!e.getMessage.contains("non_empty"))
  }
}
