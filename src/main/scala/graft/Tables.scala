package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loader over the driver-generated parquet (TESTDATA.md). */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Schema-adaptive events loader. The driver has shipped `ts` in two
    * physical layouts across rounds: parquet TIMESTAMP(NANOS) — which Spark's
    * vectorized reader only accepts as a raw long (`nanosAsLong`) — and
    * parquet TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
    * TIMESTAMP_NTZ. Normalize both to a session-TZ (UTC) TimestampType so
    * every downstream query sees one stable type; sub-microsecond precision
    * is below every window/trunc granularity the engine exposes. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
