package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-FileSystem helpers for staged-write → rename-swap maintenance
  * operations ([[PartitionedSink.compactInPlace]],
  * `Similarity.rebuildIvfIndex`). Everything goes through the Hadoop API —
  * `java.io.File`/`java.nio` renames only work on a local/posix mount,
  * while these paths accept any Hadoop filesystem (HDFS, object stores). */
private[graft] object FsOps {

  def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (f, f.makeQualified(p))
  }

  def deleteIfExists(f: FileSystem, p: Path): Unit = { f.delete(p, true): Unit }

  def renameOrFail(f: FileSystem, src: Path, dst: Path): Unit =
    if (!f.rename(src, dst))
      throw new java.io.IOException(s"rename $src -> $dst failed")

  /** Swap `incoming` into `dst`: retire the current `dst` (if any) to a
    * dot-hidden sibling, rename `incoming` in, drop the retired copy.
    * Two metadata ops — the reader-visible window is rename-sized. A
    * leftover retired dir from a crashed prior swap is restored (crash
    * landed between the two renames: `dst` missing) or dropped (swap
    * completed, cleanup didn't). */
  def swapIn(f: FileSystem, incoming: Path, dst: Path): Unit = {
    val retired = new Path(dst.getParent, s".retired_${dst.getName}")
    if (f.exists(retired)) {
      if (!f.exists(dst)) renameOrFail(f, retired, dst)
      else deleteIfExists(f, retired)
    }
    if (f.exists(dst)) renameOrFail(f, dst, retired)
    renameOrFail(f, incoming, dst)
    deleteIfExists(f, retired)
  }
}
