package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for suites (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}

object SparkSpec {
  lazy val session: SparkSession = {
    // Hive-backed (Derby metastore in a temp dir) so catalog behavior under
    // test is a REAL metastore: F7 Explore-registration parity
    // (hiveRegistrationDdl → MSCK REPAIR → SHOW PARTITIONS) executes rather
    // than being asserted as emitted DDL text. catalogImplementation is a
    // static conf per JVM, so the whole suite shares the Hive session.
    val meta = java.nio.file.Files.createTempDirectory("graft-metastore")
    System.setProperty("derby.stream.error.file", s"$meta/derby.log")
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", s"$meta/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$meta/metastore_db;create=true")
      .enableHiveSupport()
      // the standard deployment extension: SQL functions + snapshot-table
      // row-level DML — suites exercise what a configured cluster runs
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
