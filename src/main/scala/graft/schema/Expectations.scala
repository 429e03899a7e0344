package graft.schema

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Declarative data-quality expectations — the AUDIT step of the snapshot
 * layer's write–audit–publish lane ([[graft.sink.Snapshots.stageWrite]]),
 * and a standalone admission gate for any batch. The design constraint is
 * the same one the whole sink surface carries: verdicts must come from
 * ONE aggregation pass over the audited frame (conditional counts — no
 * per-expectation scans), so auditing a staged 100 TB write costs one
 * scan regardless of how many expectations are declared. Uniqueness is
 * the one exception by nature (it needs a distinct count); it rides the
 * SAME aggregate via `count_distinct`, which Catalyst plans as one
 * Expand — still a single pass over the data.
 *
 * Deterministic by construction: every metric is an exact long count
 * (never a sampled estimate), and the one emitted ratio is a single IEEE
 * division of two longs — engine-reproducible, which is what lets the
 * report itself be oracle-checked against plain SQL.
 */
object Expectations {

  sealed trait Expectation { def label: String }

  /** At most `maxNullRatio` of rows may hold NULL in `column` (0.0 =
    * forbid nulls outright). */
  case class NotNull(column: String, maxNullRatio: Double = 0.0)
    extends Expectation { def label = s"not_null($column)" }

  /** Non-null values must fall in [min, max] (either bound optional);
    * at most `maxViolationRatio` of rows may escape. Nulls are
    * [[NotNull]]'s business, never range violations. */
  case class InRange(
      column: String, min: Option[Double] = None, max: Option[Double] = None,
      maxViolationRatio: Double = 0.0)
    extends Expectation {
    require(min.isDefined || max.isDefined, "InRange needs at least one bound")
    def label = s"in_range($column,${min.getOrElse("-inf")}," +
      s"${max.getOrElse("+inf")})"
  }

  /** Non-null values must be one of `allowed`. */
  case class InSet(
      column: String, allowed: Seq[String], maxViolationRatio: Double = 0.0)
    extends Expectation { def label = s"in_set($column)" }

  /** Non-null values must match `pattern` (Java regex, full rlike
    * semantics — anchor explicitly for whole-string matches). */
  case class MatchesRegex(
      column: String, pattern: String, maxViolationRatio: Double = 0.0)
    extends Expectation { def label = s"matches_regex($column)" }

  /** `columns` must identify rows uniquely: violations = rows beyond the
    * first per duplicated key. */
  case class Unique(columns: Seq[String]) extends Expectation {
    require(columns.nonEmpty, "Unique needs key columns")
    def label = s"unique(${columns.mkString(",")})"
  }

  /** The batch must hold at least `minRows` rows (violations = shortfall). */
  case class NonEmpty(minRows: Long = 1L) extends Expectation {
    def label = s"non_empty($minRows)"
  }

  private val reportSchema = StructType(Seq(
    StructField("check", StringType, nullable = false),
    StructField("violations", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("violation_ratio", DoubleType, nullable = false),
    StructField("passed", BooleanType, nullable = false)))

  /** Violation-count aggregate column for one expectation (the [[Unique]]
    * distinct count is post-processed against n in [[check]]). */
  private def violationAgg(e: Expectation): Column = e match {
    case NotNull(c, _) =>
      sum(when(col(c).isNull, 1L).otherwise(0L))
    case r @ InRange(c, mn, mx, _) =>
      val v = col(c).cast("double")
      val below = mn.map(v < _).getOrElse(lit(false))
      val above = mx.map(v > _).getOrElse(lit(false))
      sum(when(col(c).isNotNull && (below || above), 1L).otherwise(0L))
    case InSet(c, allowed, _) =>
      sum(when(col(c).isNotNull &&
        !col(c).cast("string").isin(allowed: _*), 1L).otherwise(0L))
    case MatchesRegex(c, p, _) =>
      sum(when(col(c).isNotNull && !col(c).rlike(p), 1L).otherwise(0L))
    case Unique(cols) =>
      count_distinct(struct(cols.map(col): _*))
    case NonEmpty(_) => lit(0L)
  }

  private def threshold(e: Expectation): Double = e match {
    case NotNull(_, t) => t
    case InRange(_, _, _, t) => t
    case InSet(_, _, t) => t
    case MatchesRegex(_, _, t) => t
    case _ => 0.0
  }

  /**
   * Audit `df` against `exps` in ONE aggregation pass. Returns the report
   * frame `(check, violations, n_rows, violation_ratio, passed)` — one
   * row per expectation, in declaration order. An empty frame passes
   * everything except [[NonEmpty]].
   */
  def check(df: DataFrame, exps: Seq[Expectation]): DataFrame = {
    require(exps.nonEmpty, "no expectations declared")
    val spark = df.sparkSession
    // sum() over zero rows is NULL — an empty batch must still audit
    val aggs = count(lit(1)).as("__n") +:
      exps.zipWithIndex.map { case (e, i) =>
        coalesce(violationAgg(e), lit(0L)).as(s"__v$i") }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    val report = exps.zipWithIndex.map { case (e, i) =>
      val violations = e match {
        case Unique(_) => n - row.getLong(i + 1)
        case NonEmpty(minRows) => math.max(0L, minRows - n)
        case _ => row.getLong(i + 1)
      }
      val ratio = if (n == 0L) 0.0 else violations.toDouble / n.toDouble
      val passed = e match {
        case NonEmpty(_) => violations == 0L
        case Unique(_) => violations == 0L
        case other => ratio <= threshold(other)
      }
      Row(e.label, violations, n, ratio, passed)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(report: _*)),
      reportSchema)
  }

  /** [[check]], then throw listing EVERY failed expectation (not just the
    * first) if any failed — the gate shape callers wrap a publish in. */
  def requireClean(df: DataFrame, exps: Seq[Expectation]): Unit = {
    val failed = check(df, exps).collect().filterNot(_.getBoolean(4))
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "expectations failed: " + failed.map(r =>
          s"${r.getString(0)} [${r.getLong(1)}/${r.getLong(2)} rows]")
          .mkString("; "))
  }
}
