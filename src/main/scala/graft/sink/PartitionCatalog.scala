package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import java.net.URLDecoder
import java.nio.charset.StandardCharsets

/**
 * Partition catalog over a Hive-style partitioned directory tree — the
 * Spark-side stand-in for the reference's `PartitionedFileSet` metadata
 * (`getPartitions` / `getPartition(PartitionKey)`, SURVEY.md §1.1;
 * `DynamicPartitionedFilesetSinkTest.java:155-162`).
 *
 * At 100 TB the listing must come from a metastore catalog
 * (`SHOW PARTITIONS`), not a filesystem walk; `list` below walks the tree
 * with one listStatus per directory level, which is fine for the file-based
 * layout this project tests against, and the CREATE pre-check intersects in
 * a single distributed job either way.
 */
object PartitionCatalog {

  /** List partition keys present under `path` as ordered (field -> value)
    * maps, by walking `nFields` directory levels of `field=value` dirs.
    * Values are URL-decoded (Spark escapes special chars in dir names). */
  def list(spark: org.apache.spark.sql.SparkSession, path: String, nFields: Int): Seq[Map[String, String]] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    var frontier: Seq[(Path, Map[String, String])] = Seq(p -> Map.empty)
    (0 until nFields).foreach { _ =>
      frontier = frontier.flatMap { case (dir, key) =>
        fs.listStatus(dir).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.contains("="))
          .map { s =>
            val Array(f, v) = s.getPath.getName.split("=", 2)
            s.getPath -> (key + (f -> URLDecoder.decode(v, StandardCharsets.UTF_8)))
          }
      }
    }
    frontier.map(_._2)
  }

  /** F7 (Explore/Hive registration,
    * `common/FileSetUtil.java:75-80,114-121,155-164`): register a written
    * partitioned tree as an external catalog table and recover its
    * partitions, making it queryable by name (`SHOW PARTITIONS`, SQL).
    * At 100 TB this catalog — not a filesystem walk — is what the CREATE
    * pre-check and partition pruning consult. */
  def registerExternal(
      spark: org.apache.spark.sql.SparkSession, tableName: String,
      path: String, format: String = "parquet"): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    spark.catalog.createTable(tableName, format, Map("path" -> path))
    spark.catalog.recoverPartitions(tableName)
  }

  /** CREATE-disposition pre-check (W1): fail if any incoming partition tuple
    * already exists at the target. Incoming tuples come from a distinct
    * aggregation over just the partition columns (column-pruned, map-side
    * partial agg); only the distinct tuples — bounded by partition
    * cardinality, not row count — reach the driver. */
  def assertNoneExist(prepared: DataFrame, path: String, fields: Seq[String]): Unit = {
    val existing = list(prepared.sparkSession, path, fields.length)
    if (existing.isEmpty) return
    val existingSet = existing.map(m => fields.map(m(_))).toSet
    val incoming = prepared.select(fields.map(col): _*).distinct().collect()
      .map(r => fields.indices.map(i => String.valueOf(r.get(i))))
    val clashes = incoming.filter(t => existingSet.contains(t))
    if (clashes.nonEmpty)
      throw new IllegalStateException(
        s"CREATE disposition: partition(s) already exist: " +
          clashes.take(5).map(t => fields.zip(t).map { case (f, v) => s"$f=$v" }
            .mkString("/")).mkString(", "))
  }
}
