package graft.sink

import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/**
 * Driver-side parquet writer for DRIVER-LOCAL frames — the state-sized
 * metadata parts every publish lane carries (generation `meta` rows,
 * `seen/` replay ledgers, heavy-hitter counter tables, per-batch Bloom
 * sidecars). A `df.coalesce(1).write.parquet(...)` of a LocalRelation
 * spawns a WHOLE Spark job (planning, one task, commit protocol) to
 * write a handful of rows the driver already holds; a state fixture
 * publishing three generations pays that ~6-9 times per run. This path
 * collects the LocalRelation (free — `LocalTableScanExec` returns its
 * rows without launching a job) and streams them through parquet's own
 * writer: one file, standard logical types, byte-compatible with every
 * `spark.read.parquet` consumer.
 *
 * Scale note: this is NOT a driver funnel — eligibility is decided by
 * PLAN SHAPE (a LocalRelation is driver-resident by construction, and
 * every call site's frame is O(vocab)/O(seen-window)/O(batch-files)
 * bounded by contract). Distributed parts keep the Spark write.
 */
private[graft] object LocalParquet {

  private def primFor(dt: DataType): Option[PrimitiveTypeName] = dt match {
    case StringType | BinaryType => Some(PrimitiveTypeName.BINARY)
    case LongType => Some(PrimitiveTypeName.INT64)
    case IntegerType => Some(PrimitiveTypeName.INT32)
    case DoubleType => Some(PrimitiveTypeName.DOUBLE)
    case FloatType => Some(PrimitiveTypeName.FLOAT)
    case BooleanType => Some(PrimitiveTypeName.BOOLEAN)
    case _ => None
  }

  /** Eligible iff the optimized plan IS a LocalRelation (one-row-relation
    * projections fold into one) and every column maps to a flat parquet
    * primitive. Anything else — a distributed part, a nested type —
    * falls back to the ordinary Spark write at the call site. */
  def supported(df: DataFrame): Boolean =
    (df.queryExecution.optimizedPlan match {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _ => false
    }) && df.schema.fields.forall(f => primFor(f.dataType).isDefined)

  /** Write `df` (must satisfy [[supported]]) as ONE snappy parquet file
    * `part-00000-<uuid>.parquet` under `dir`. */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val mt: MessageType = {
      val b = Types.buildMessage()
      schema.fields.foreach { f =>
        val prim = primFor(f.dataType).get
        val fb =
          if (f.nullable) Types.optional(prim) else Types.required(prim)
        val withAnn = f.dataType match {
          case StringType => fb.as(LogicalTypeAnnotation.stringType())
          case _ => fb
        }
        b.addField(withAnn.named(f.name))
      }
      b.named("spark_schema")
    }
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val (_, qdir) = FsOps.fs(spark, dir)
    val file = new org.apache.hadoop.fs.Path(qdir,
      s"part-00000-${java.util.UUID.randomUUID().toString.take(12)}.parquet")
    val writer = ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, conf))
      .withConf(conf)
      .withType(mt)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val factory = new SimpleGroupFactory(mt)
    try {
      df.collect().foreach { row =>
        val g = factory.newGroup()
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          if (!row.isNullAt(i)) f.dataType match {
            case StringType => g.add(f.name, row.getString(i))
            case BinaryType => g.add(f.name,
              Binary.fromConstantByteArray(row.getAs[Array[Byte]](i)))
            case LongType => g.add(f.name, row.getLong(i))
            case IntegerType => g.add(f.name, row.getInt(i))
            case DoubleType => g.add(f.name, row.getDouble(i))
            case FloatType => g.add(f.name, row.getFloat(i))
            case BooleanType => g.add(f.name, row.getBoolean(i))
            case other => throw new IllegalStateException(
              s"unsupported local-parquet type $other — guarded by supported()")
          }
        }
        writer.write(g)
      }
    } finally writer.close()
  }

  /** The one-call shape every metadata part uses: the local fast path
    * when eligible, the ordinary one-file Spark write otherwise. */
  def writeOrFallback(df: DataFrame, dir: String): Unit =
    if (supported(df)) write(df, dir)
    else df.coalesce(1).write.parquet(dir)
}
