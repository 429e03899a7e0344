package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loader over the driver-generated parquet (TESTDATA.md). */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
