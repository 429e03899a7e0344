package graft.schema

import org.apache.spark.sql.types._

/**
 * Schema-evolution classification for the append/merge path of a
 * long-lived partitioned dataset.
 *
 * The reference's validators (V1–V4) check a batch against a FIXED
 * declared schema — correct for a one-shot pipeline, but a dataset
 * ingesting for months drifts: producers add columns, widen counters
 * that outgrew int, or stop emitting a deprecated field. This validator
 * classifies every incoming-vs-stored field delta into exactly one of
 *
 *  - UNCHANGED — same name, same type (nullability equal or tightened)
 *  - WIDENED   — a delta every existing reader survives: a NEW nullable
 *    column (old files read null under the merged schema), a lossless
 *    type promotion on the Parquet/Avro resolution chains
 *    (byte→short→int→long, float→double, same-scale decimal precision
 *    growth), a loosened nullability, or an OMITTED nullable column
 *    (the batch's files read null for it)
 *  - BROKEN    — everything else: new non-nullable columns (old rows
 *    cannot supply a value), narrowing or cross-family type changes,
 *    a missing non-nullable column, and ANY delta on a partition field
 *    (partition values are path-encoded — a changed partition schema
 *    silently splits the directory layout)
 *
 * [[validate]] applies a policy: [[Strict]] admits only UNCHANGED
 * (the reference-faithful posture), [[Widen]] admits WIDENED too and
 * returns the merged (widened) schema the dataset contract becomes.
 * Breakage always fails loudly, listing every broken field with its
 * reason — never just the first.
 */
object SchemaEvolution {

  sealed trait Policy
  /** Exact-schema appends only — any drift fails. */
  case object Strict extends Policy
  /** Safe widening admitted; breakage still fails. */
  case object Widen extends Policy

  sealed trait Delta { def field: String; def reason: String }
  final case class Unchanged(field: String) extends Delta {
    val reason = "unchanged"
  }
  final case class Widened(field: String, reason: String) extends Delta
  final case class Broken(field: String, reason: String) extends Delta

  /** Lossless promotion on the Parquet/Avro schema-resolution chains. */
  private def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => false
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (a: DecimalType, b: DecimalType) =>
      b.scale == a.scale && b.precision > a.precision
    case _ => false
  }

  /** Classify every field of `stored` ∪ `incoming` (compared BY NAME —
    * parquet appends do not care about column order). */
  def classify(
      stored: StructType, incoming: StructType,
      partitionFields: Seq[String]): Seq[Delta] = {
    val storedByName = stored.fields.map(f => f.name -> f).toMap
    val incomingNames = incoming.fieldNames.toSet
    val pf = partitionFields.toSet

    val forward = incoming.fields.toSeq.map { in =>
      storedByName.get(in.name) match {
        case None if pf(in.name) =>
          Broken(in.name, "new partition field — the directory layout is " +
            "fixed at dataset creation")
        case None if in.nullable =>
          Widened(in.name, s"new nullable column ${in.dataType.sql} — " +
            "old files read null under the merged schema")
        case None =>
          Broken(in.name, "new NON-nullable column — rows already stored " +
            "cannot supply a value; add it nullable (or backfill first)")
        case Some(st) if pf(in.name) && st.dataType != in.dataType =>
          Broken(in.name, s"partition field type changed " +
            s"${st.dataType.sql} → ${in.dataType.sql} — partition values " +
            "are path-encoded; the layout cannot re-key")
        case Some(st) if st.dataType == in.dataType =>
          if (in.nullable && !st.nullable)
            Widened(in.name, "nullability loosened — the dataset contract " +
              "becomes nullable for every reader")
          else Unchanged(in.name)
        case Some(st) if widens(st.dataType, in.dataType) =>
          Widened(in.name,
            s"type widened ${st.dataType.sql} → ${in.dataType.sql}")
        case Some(st) if widens(in.dataType, st.dataType) =>
          Broken(in.name, s"type NARROWED ${st.dataType.sql} → " +
            s"${in.dataType.sql} — stored values overflow the new type")
        case Some(st) =>
          Broken(in.name, s"incompatible type change ${st.dataType.sql} → " +
            s"${in.dataType.sql}")
      }
    }
    val missing = stored.fields.toSeq.filterNot(f => incomingNames(f.name))
      .map { st =>
        if (pf(st.name))
          Broken(st.name, "partition field missing from the batch")
        else if (st.nullable)
          Widened(st.name, "column omitted by the batch — its files read " +
            "null for it")
        else
          Broken(st.name, "NON-nullable column missing from the batch")
      }
    forward ++ missing
  }

  /** The schema the dataset contract becomes after a widening append:
    * stored fields (in stored order) promoted to the wider of the two
    * sides, then genuinely-new incoming fields in batch order. */
  def merged(stored: StructType, incoming: StructType): StructType = {
    val incomingByName = incoming.fields.map(f => f.name -> f).toMap
    val kept = stored.fields.map { st =>
      incomingByName.get(st.name).fold(st) { in =>
        val dt = if (widens(st.dataType, in.dataType)) in.dataType
                 else st.dataType
        st.copy(dataType = dt, nullable = st.nullable || in.nullable)
      }
    }
    val storedNames = stored.fieldNames.toSet
    StructType(kept ++ incoming.fields.filterNot(f => storedNames(f.name)))
  }

  /**
   * Gate an append/merge batch: throws [[GraftSchemaException]] listing
   * EVERY offending field when the batch breaks the stored contract (or
   * merely drifts, under [[Strict]]); returns the merged schema the
   * dataset holds after the batch lands.
   */
  def validate(
      stored: StructType, incoming: StructType,
      partitionFields: Seq[String], policy: Policy): StructType = {
    val deltas = classify(stored, incoming, partitionFields)
    val broken = deltas.collect { case b: Broken => b }
    val widened = deltas.collect { case w: Widened => w }
    def fmt(ds: Seq[Delta]) =
      ds.map(d => s"  ${d.field}: ${d.reason}").mkString("\n")
    if (broken.nonEmpty)
      throw new GraftSchemaException(
        s"schema evolution BREAKS the stored dataset contract:\n${fmt(broken)}")
    if (policy == Strict && widened.nonEmpty)
      throw new GraftSchemaException(
        "schema drift under Strict evolution policy (set Widen to admit " +
          s"safe widening):\n${fmt(widened)}")
    merged(stored, incoming)
  }
}
