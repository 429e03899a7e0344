package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/**
 * The library's SQL function surface, shared by the two installation
 * paths: per-session temp registration ([[hashes.registerSql]]) and
 * session-creation injection ([[graft.GraftExtensions]]).
 */
object SqlFunctions {

  private def intArg(exprs: Seq[Expression], i: Int, default: Int): Int =
    if (exprs.length > i) exprs(i) match {
      case Literal(v: Int, _) => v
      case other => other.eval(null).asInstanceOf[Int]
    } else default

  /** name → Catalyst expression builder, for every native expression. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_signature" -> (e =>
      MinHashSignature(e.head, intArg(e, 1, 64), intArg(e, 2, 5))),
    "simhash64" -> (e => SimHash64(e.head)),
    "word_tokens" -> (e => WordTokens(e.head)),
    "word_ngrams" -> (e => WordNgrams(e.head, intArg(e, 1, 3))),
    "dot_product" -> (e => DotProduct(e(0), e(1))),
    "int8_pack" -> (e => Int8Pack(e.head)),
    "int8_dot" -> (e => Int8Dot(e(0), e(1))),
    "cosine_similarity" -> (e => CosineSimilarity(e(0), e(1))),
    "sorted_intersect_count" -> (e => SortedIntersectCount(e(0), e(1))),
    "repetition_stats" -> (e => RepetitionStats(e.head, intArg(e, 1, 2))),
    "compression_ratio" -> (e => CompressionRatio(e.head, intArg(e, 1, 6))),
    "char_entropy" -> (e => CharEntropy(e.head)),
    "math_ln" -> (e => MathLn(e.head)),
    "jaro_winkler" -> (e => JaroWinkler(e(0), e(1))),
    "damerau_levenshtein" -> (e => DamerauLevenshtein(e(0), e(1))),
    // composition of built-in bit ops — registered so SQL users can
    // sort/cluster by the same layout key the sink writes
    "zorder2" -> (e => ZOrder.zorder2Expr(e(0), e(1))),
    // aggregate: the analyzer wraps a bare AggregateFunction returned by
    // a registry builder, so SQL GROUP BY gets the bounded-heap top-k
    "top_k_by_score" -> (e =>
      TopKByScore(e(0), e(1), intArg(e, 2, 10)).toAggregateExpression()),
    // aggregate: bounded Misra-Gries frequent-items counters
    "misra_gries" -> (e =>
      MisraGriesSketch(e.head, intArg(e, 1, 199)).toAggregateExpression()),
    // aggregate: γ-log-bucket rank histogram (exact bucket counts)
    "dd_sketch" -> (e =>
      DdSketchAgg(e.head, doubleArg(e, 1, 1.02)).toAggregateExpression()),
    // weighted form: buckets carry weight mass instead of row counts
    "dd_sketch_weighted" -> (e =>
      DdSketchAgg(e.head, doubleArg(e, 2, 1.02), Some(e(1)))
        .toAggregateExpression()),
  )

  private def doubleArg(exprs: Seq[Expression], i: Int, default: Double): Double =
    if (exprs.length > i) exprs(i) match {
      case Literal(v: Double, _) => v
      case Literal(v: Int, _) => v.toDouble
      case other => other.eval(null) match {
        case d: Double => d
        // SQL fractional literals parse as DecimalType by default, and
        // Spark's Decimal is not a java.lang.Number — without this case
        // the natural spelling dd_sketch(v, 1.02) MatchErrors at analysis
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: Number => n.doubleValue()
        case other2 => throw new IllegalArgumentException(
          s"argument $i must be a numeric literal, got $other2")
      }
    } else default
}
