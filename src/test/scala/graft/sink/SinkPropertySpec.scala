package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/**
 * Property-style layout invariants (SURVEY.md §5.2): for random partition
 * values and field subsets —
 *  - directory layer count == partition field count,
 *  - payload files never contain partition columns,
 *  - read-back row multiset equals the input (modulo column order),
 *  - partition values come back stringified + trimmed.
 */
class SinkPropertySpec extends SparkSpec {

  private def forSamples[A](gen: Gen[A], n: Int)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  // partition-safe values: printable, no '/', not empty after trim
  private val valueGen: Gen[String] = for {
    core <- Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '-', '_', '.', ':', '=', '%')))
      .map(_.mkString.trim).suchThat(_.nonEmpty)
    pad <- Gen.oneOf("", " ", "  ")
  } yield pad + core + pad

  private val rowsGen: Gen[List[(Long, String, String)]] = for {
    n <- Gen.choose(1, 12)
    vals <- Gen.listOfN(n, valueGen)
  } yield vals.zipWithIndex.map { case (v, i) => (i.toLong, s"payload_$i", v) }

  test("property: layout invariants hold for random partition values") {
    forSamples(rowsGen, 25) { rows =>
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("payload", StringType, nullable = false),
        StructField("part", StringType, nullable = false)))
      val df = spark.createDataFrame(
        rows.map(r => Row(r._1, r._2, r._3)).asJava, schema)
      val out = Files.createTempDirectory("graft_prop").toString
      PartitionedSink.write(df, out, SinkConfig(ParquetFormat, Seq("part")))

      val expectedParts = rows.map(_._3.trim).toSet
      val listed = PartitionCatalog.list(spark, out, 1).map(_("part")).toSet
      assert(listed == expectedParts, s"layout mismatch for values $expectedParts")

      val back = PartitionedSink.readBack(spark, out)
      assert(back.schema("part").dataType == StringType)
      val expectedRows = rows.map(r => (r._1, r._2, r._3.trim)).toSet
      val gotRows = back.collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"),
          r.getAs[String]("part"))).toSet
      assert(gotRows == expectedRows)

      // payload files exclude the partition column
      val anyPart = expectedParts.head
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val partDir = fs.listStatus(new org.apache.hadoop.fs.Path(out))
        .filter(_.isDirectory).head.getPath
      val dataOnly = spark.read.parquet(partDir.toString)
      assert(dataOnly.schema.fieldNames.toSeq == Seq("id", "payload"))
    }
  }

  test("property: multi-field keys nest in order for random field pairs") {
    forSamples(Gen.listOfN(6, Gen.alphaNumStr.suchThat(_.nonEmpty)), 10) { vals =>
      val rows = vals.zipWithIndex.map { case (v, i) =>
        Row(i.toLong, v.take(8), s"g${i % 2}")
      }
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("a", StringType, nullable = false),
        StructField("b", StringType, nullable = false)))
      val df = spark.createDataFrame(rows.asJava, schema)
      val out = Files.createTempDirectory("graft_prop2").toString
      PartitionedSink.write(df, out, SinkConfig(ParquetFormat, Seq("b", "a")))
      // two layers, first is b
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val level1 = fs.listStatus(new org.apache.hadoop.fs.Path(out))
        .filter(_.isDirectory).map(_.getPath.getName)
      assert(level1.nonEmpty && level1.forall(_.startsWith("b=")))
      assert(PartitionCatalog.list(spark, out, 2)
        .forall(m => m.contains("a") && m.contains("b")))
    }
  }
}
