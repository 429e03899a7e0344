package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Snapshot / time-travel layer over a partitioned dataset — the
 * "index is the state" posture applied to the DATASET ITSELF (the
 * IVF / BM25 / dup-graph discipline, [[graft.ops.Similarity.writeIvfIndex]]):
 * data files are immutable once landed, and each write publishes a new
 * SNAPSHOT — a small manifest listing exactly the live files — behind the
 * same atomic `MANIFEST` pointer flip the versioned index layout uses
 * ([[FsOps.writeManifest]]). Reads resolve a snapshot first and scan only
 * its files, so:
 *
 *  - an APPEND adds files and a manifest; nothing is rewritten,
 *  - an OVERWRITE-PARTITIONS write replaces partitions LOGICALLY — the
 *    new manifest drops the replaced partitions' files, but the bytes
 *    stay until retention expires the snapshots referencing them,
 *  - TIME TRAVEL is "read an older manifest" — metadata cost only,
 *  - concurrent readers never see a partial state: a reader that
 *    resolved `s<N>` keeps scanning `s<N>`'s immutable files while
 *    `s<N+1>` publishes.
 *
 * 100 TB shape: every operation here is metadata-cost — manifests scale
 * with FILE COUNT, not data size (the Iceberg/Delta argument), the
 * pointer flip is one small PUT, and expiry deletes only files no
 * retained snapshot references. Partition pruning still works on reads:
 * the file listing is handed to the scan with `basePath`, so partition
 * directories become partition COLUMNS and a filter on them prunes at
 * planning time (asserted by `SnapshotsSpec`).
 *
 * Layout under `root`:
 * {{{
 *   data/<field>=<value>/.../part-*.parquet   immutable data files
 *   snapshots/s<N>                            one text manifest per snapshot
 *   MANIFEST                                  current snapshot name, e.g. "s3"
 * }}}
 *
 * Manifest format: line 1 `mode=<append|overwrite_partitions|compact>`,
 * line 2 `schema=<Spark StructType JSON>` (the dataset's recorded read
 * contract), then one data-file path per line, relative to `data/`.
 * Writes are gated by [[graft.schema.SchemaEvolution]] against the
 * recorded schema — safe widening updates the contract, breakage fails
 * loudly with nothing published.
 *
 * Same single-WRITER discipline as the rest of the sink maintenance
 * surface ([[PartitionedSink.compactInPlace]]): writes and expiry are one
 * maintainer's job; readers are unrestricted.
 */
object Snapshots {

  sealed abstract class SnapshotMode(val name: String)
  case object SnapAppend extends SnapshotMode("append")
  case object SnapOverwritePartitions extends SnapshotMode("overwrite_partitions")

  private val SnapRe = "^s(\\d+)$".r

  private def snapshotsDir(root: Path) = new Path(root, "snapshots")
  private def dataDir(root: Path) = new Path(root, "data")

  private def parentDirOf(rel: String): String = {
    val i = rel.lastIndexOf('/')
    if (i < 0) "" else rel.substring(0, i)
  }

  /** Parsed snapshot manifest: write mode, the dataset's recorded schema
    * (the contract every reader gets — inference-free), live files. */
  private case class Manifest(
      mode: String, schema: Option[org.apache.spark.sql.types.StructType],
      files: Seq[String])

  private def readSnapshotFile(
      f: FileSystem, root: Path, id: Int): Manifest = {
    val p = new Path(snapshotsDir(root), s"s$id")
    if (!f.exists(p))
      throw new IllegalStateException(
        s"snapshot s$id does not exist under $root — never written, or " +
          "expired by Snapshots.expire (time travel only reaches retained " +
          "snapshots)")
    val in = f.open(p)
    val text =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val lines = text.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    val mode = lines.head.stripPrefix("mode=")
    // the schema line is POSITIONAL (second) — a `field=value` partition
    // path can never be confused with it because paths are listed after
    val (schema, files) = lines.tail match {
      case s +: rest if s.startsWith("schema=") =>
        (Some(org.apache.spark.sql.types.DataType
          .fromJson(s.stripPrefix("schema="))
          .asInstanceOf[org.apache.spark.sql.types.StructType]), rest)
      case rest => (None, rest)
    }
    Manifest(mode, schema, files)
  }

  private def writeSnapshotFile(
      f: FileSystem, root: Path, id: Int, mode: String,
      schema: org.apache.spark.sql.types.StructType,
      files: Seq[String]): Unit = {
    f.mkdirs(snapshotsDir(root))
    val p = new Path(snapshotsDir(root), s"s$id")
    val out = f.create(p, false) // snapshots are immutable — never overwrite
    try out.write(
      (s"mode=$mode\nschema=${schema.json}\n" + files.sorted.mkString("\n"))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The current snapshot id, if any write has published. */
  def currentSnapshot(spark: SparkSession, root: String): Option[Int] = {
    val (f, qroot) = FsOps.fs(spark, root)
    FsOps.readManifest(f, qroot).map {
      case SnapRe(n) => n.toInt
      case other => throw new IllegalStateException(
        s"corrupt MANIFEST at $root: expected s<N>, got '$other'")
    }
  }

  private def listDataFiles(
      f: FileSystem, base: Path): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val baseUri = base.toUri.getPath
    val it = f.listFiles(base, true)
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (s.isFile && !name.startsWith("_") && !name.startsWith("."))
        out += s.getPath.toUri.getPath.stripPrefix(baseUri).stripPrefix("/")
    }
    out.toSeq
  }

  /**
   * Land `df` as the next snapshot. The batch is staged as a partitioned
   * parquet tree, its files MOVED (rename — metadata-cost) into `data/`
   * under their partition directories, and the new manifest published
   * with one atomic pointer flip. Spark's job-unique part-file names make
   * staged files collision-free against every previously landed batch.
   *
   * `SnapAppend`: the new manifest is the previous live set plus the
   * batch's files. `SnapOverwritePartitions`: partitions the batch
   * touches are logically replaced (their previous files leave the live
   * set but stay on disk for older snapshots); untouched partitions ride
   * through unchanged — the dynamic-overwrite semantics of the
   * reference's CREATE_OR_APPEND surface, but non-destructive.
   *
   * Returns the published snapshot id (1-based, monotonic).
   */
  def write(
      df: DataFrame, root: String, partitionFields: Seq[String],
      mode: SnapshotMode = SnapAppend,
      evolution: graft.schema.SchemaEvolution.Policy =
        graft.schema.SchemaEvolution.Widen): Int =
    writeInternal(df, root, partitionFields, mode, mode.name, evolution)

  private def writeInternal(
      df: DataFrame, root: String, partitionFields: Seq[String],
      mode: SnapshotMode, modeLabel: String,
      evolution: graft.schema.SchemaEvolution.Policy,
      dropPartitionDirs: Set[String] = Set.empty): Int = {
    require(partitionFields.nonEmpty, "snapshot datasets are partitioned")
    val spark = df.sparkSession
    val (f, qroot) = FsOps.fs(spark, root)
    val cur = currentSnapshot(spark, root)
    val prev = cur.map(readSnapshotFile(f, qroot, _))
    // schema-evolution gate BEFORE any file lands (the PartitionedSink
    // append/merge discipline): the batch either breaks the recorded
    // contract loudly with nothing written, or the recorded schema
    // becomes the (possibly widened) merge — so every reader resolves a
    // single authoritative schema instead of per-file footer inference
    val contract = prev.flatMap(_.schema) match {
      case Some(stored) => graft.schema.SchemaEvolution.validate(
        stored, df.schema, partitionFields, evolution)
      case None => df.schema
    }
    val staging = new Path(qroot,
      s".stage_${java.util.UUID.randomUUID().toString.take(12)}")
    df.write.mode("overwrite").partitionBy(partitionFields: _*)
      .parquet(staging.toString)
    val staged = listDataFiles(f, staging)
    require(staged.nonEmpty || dropPartitionDirs.nonEmpty,
      "empty batch — nothing to snapshot")
    val data = dataDir(qroot)
    staged.foreach { rel =>
      val dst = new Path(data, rel)
      f.mkdirs(dst.getParent)
      FsOps.renameOrFail(f, new Path(staging, rel), dst)
    }
    FsOps.deleteIfExists(f, staging)
    val prevFiles = prev.map(_.files).getOrElse(Seq.empty)
    val live = mode match {
      case SnapAppend => prevFiles ++ staged
      case SnapOverwritePartitions =>
        // replaced: partitions receiving staged files, plus partitions
        // explicitly dropped with NO replacement files (a merge that
        // deleted a partition's every row — dynamic overwrite alone
        // would silently leave them live)
        val replaced = staged.map(parentDirOf).toSet ++ dropPartitionDirs
        prevFiles.filterNot(p => replaced(parentDirOf(p))) ++ staged
    }
    val id = cur.getOrElse(0) + 1
    writeSnapshotFile(f, qroot, id, modeLabel, contract, live)
    FsOps.writeManifest(f, qroot, s"s$id")
    id
  }

  /**
   * NON-DESTRUCTIVE compaction: partitions whose live file count exceeds
   * `targetFilesPerPartition` are rewritten into that many files and
   * published as a new snapshot (history mode `compact`); every older
   * snapshot keeps reading the original fragments until [[expire]]
   * reclaims them — contrast [[PartitionedSink.compactInPlace]], whose
   * swap retires the fragments immediately. This is what the append lane
   * needs operationally: micro-batches land one file per partition per
   * batch, fragment counts grow linearly, and the streaming-side fix is
   * a maintenance rewrite that cannot disturb concurrent readers.
   *
   * Scale shape: only over-fragmented partitions' files are read (the
   * manifest names them — untouched partitions ride through by
   * reference), and the rewrite repartitions by the partition columns so
   * each partition compacts in parallel on its own task. Returns the new
   * snapshot id, or None when nothing is fragmented.
   */
  def compact(
      spark: SparkSession, root: String, partitionFields: Seq[String],
      targetFilesPerPartition: Int = 1): Option[Int] = {
    require(targetFilesPerPartition >= 1, "need at least one file")
    val (f, qroot) = FsOps.fs(spark, root)
    val id = currentSnapshot(spark, root).getOrElse(
      throw new IllegalStateException(s"no snapshot published under $root"))
    val m = readSnapshotFile(f, qroot, id)
    val fragmented = m.files.groupBy(parentDirOf)
      .filter(_._2.length > targetFilesPerPartition)
    if (fragmented.isEmpty) return None
    val base = dataDir(qroot).toString
    val reader0 = spark.read.option("basePath", base)
    // rewrite under the RECORDED contract, not per-file inference — a
    // widened dataset's old fragments must compact into contract-typed
    // files, not resurrect their pre-widening footer schemas
    val reader = m.schema.fold(reader0)(reader0.schema)
    val frag = reader
      .parquet(fragmented.values.flatten.map(r => s"$base/$r").toSeq: _*)
    import org.apache.spark.sql.functions.col
    // one task (→ one file) per partition value under the partition-column
    // repartition; a >1 target adds a deterministic row-hash salt so each
    // partition splits into at most that many tasks
    val rewritten =
      if (targetFilesPerPartition == 1)
        frag.repartition(partitionFields.map(col): _*)
      else frag.repartition(
        (partitionFields.map(col) :+
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.hash(frag.columns.map(col): _*),
            org.apache.spark.sql.functions.lit(targetFilesPerPartition))): _*)
    Some(writeInternal(rewritten, root, partitionFields,
      SnapOverwritePartitions, "compact", graft.schema.SchemaEvolution.Widen))
  }

  /**
   * CDC MERGE (upsert + delete) published as a NEW SNAPSHOT —
   * [[PartitionedSink.mergeUpsert]]'s copy-on-write-at-partition-
   * granularity semantics made non-destructive: replaced partitions'
   * files leave the live set but stay on disk, so the pre-merge state
   * remains time-travelable (audit the table as of before any change
   * batch) until [[expire]] reclaims it.
   *
   * Semantics match the sink: per key, a non-delete row REPLACES the
   * stored row (inserting if absent; the replacement may land in a
   * different partition and the old copy leaves its old one), a
   * `deleteCol=true` row removes the key wherever it lives; batch keys
   * must be unique (checked). Only partitions that can change are read —
   * those receiving upserts plus those holding updated keys (one
   * column-pruned key+partition scan) — via a literal pruning predicate;
   * update keys broadcast. Partitions whose every row disappeared are
   * dropped from the manifest explicitly. Returns the new snapshot id.
   */
  def mergeUpsert(
      spark: SparkSession, root: String, updates: DataFrame,
      partitionFields: Seq[String], keyFields: Seq[String],
      deleteCol: Option[String] = None,
      evolution: graft.schema.SchemaEvolution.Policy =
        graft.schema.SchemaEvolution.Widen): Int = {
    import org.apache.spark.sql.functions._
    require(keyFields.nonEmpty, "mergeUpsert needs at least one key field")
    require(!keyFields.exists(partitionFields.contains),
      "partition fields cannot be merge keys (a key that IS the partition " +
        "value cannot move; route through a payload column instead)")
    val dupKeys = updates.groupBy(keyFields.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    require(dupKeys == 0L,
      s"update batch has multiple rows for one (${keyFields.mkString(",")}) key")
    val isDelete = deleteCol
      .map(c => coalesce(col(c), lit(false))).getOrElse(lit(false))
    val upserts = deleteCol
      .foldLeft(updates.filter(!isDelete))((d, c) => d.drop(c))
    val allKeys = updates.select(keyFields.map(col): _*).distinct()
    val pCols = partitionFields.map(col)
    val base = read(spark, root)
    val touched = upserts.select(pCols: _*)
      .unionByName(base.join(broadcast(allKeys), keyFields.toSeq, "left_semi")
        .select(pCols: _*))
      .distinct().collect()
    val touchedPred = touched.map { r =>
      partitionFields.zipWithIndex
        // null-safe equality: a null partition value must still prune to
        // ITS partition, not silently match nothing
        .map { case (f, i) => col(f) <=> lit(r.get(i)) }
        .reduce(_ && _)
    }.reduceOption(_ || _).getOrElse(lit(false))
    val survivors = base.filter(touchedPred)
      .join(broadcast(allKeys), keyFields.toSeq, "left_anti")
    val out = evolution match {
      case graft.schema.SchemaEvolution.Widen =>
        survivors.unionByName(upserts, allowMissingColumns = true)
      case _ => survivors.unionByName(upserts)
    }
    // partitions left with zero rows (all deleted, nothing upserted)
    // must leave the manifest even though no file replaces them
    val live = out.select(pCols: _*).distinct().collect()
      .map(partitionRelDir(partitionFields, _)).toSet
    val emptied = touched.map(partitionRelDir(partitionFields, _))
      .filterNot(live).toSet
    // a batch that changes nothing (e.g. deletes of absent keys) is a
    // NO-OP — don't burn a snapshot id on an identical manifest
    if (touched.isEmpty)
      return currentSnapshot(spark, root).getOrElse(
        throw new IllegalStateException(s"no snapshot published under $root"))
    writeInternal(out, root, partitionFields, SnapOverwritePartitions,
      "merge", evolution, dropPartitionDirs = emptied)
  }

  private def partitionRelDir(
      partitionFields: Seq[String], r: org.apache.spark.sql.Row): String =
    partitionFields.zipWithIndex.map { case (f, i) =>
      // null must reach getPartitionPathString AS null so it maps to the
      // __HIVE_DEFAULT_PARTITION__ directory, not a literal "null" dir
      val v = r.get(i)
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .getPartitionPathString(f, if (v == null) null else v.toString)
    }.mkString("/")

  /**
   * Sweep files NO snapshot references (crashed writes that moved files
   * in before their manifest published, plus leftover `.stage_*` trees)
   * — the orphan-reclaim counterpart of [[expire]], which only deletes
   * files that WERE referenced by expired manifests. Same single-
   * maintainer discipline: do not run concurrently with a writer (an
   * in-flight write's files are unreferenced until its manifest flips).
   * Returns (orphan data files deleted, staging trees dropped).
   */
  def vacuum(spark: SparkSession, root: String): (Int, Int) = {
    val (f, qroot) = FsOps.fs(spark, root)
    val referenced = snapshotIds(f, qroot)
      .flatMap(readSnapshotFile(f, qroot, _).files).toSet
    val data = dataDir(qroot)
    val orphans =
      if (f.exists(data)) listDataFiles(f, data).filterNot(referenced)
      else Seq.empty
    orphans.foreach(rel => FsOps.deleteIfExists(f, new Path(data, rel)))
    orphans.map(parentDirOf).distinct.filter(_.nonEmpty).foreach { d =>
      val p = new Path(data, d)
      if (f.exists(p) && !f.listFiles(p, true).hasNext)
        FsOps.deleteIfExists(f, p)
    }
    val stages = Option(f.listStatus(qroot)).getOrElse(Array.empty)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".stage_"))
    stages.foreach(s => FsOps.deleteIfExists(f, s.getPath))
    (orphans.length, stages.length)
  }

  /**
   * Incremental consumption: read ONLY the files the dataset gained
   * between snapshot `sinceId` (exclusive) and `untilId` (inclusive,
   * default current) — the "process what's new since my last run" read
   * every incremental ETL wants, resolved ENTIRELY from two manifests
   * (no directory listing, no data diffing). For append-only histories
   * this is exactly the appended rows; a rewritten partition
   * (overwrite/compact) surfaces its new files whole — callers that must
   * distinguish logical changes diff at row level over
   * [[changedPartitions]]' pruned slice instead. Returns None when no
   * files were added (since == until), so "nothing new" is explicit
   * rather than an empty scan.
   */
  def readAddedSince(
      spark: SparkSession, root: String, sinceId: Int,
      untilId: Option[Int] = None): Option[DataFrame] = {
    val (f, qroot) = FsOps.fs(spark, root)
    val until = untilId.orElse(currentSnapshot(spark, root)).getOrElse(
      throw new IllegalStateException(s"no snapshot published under $root"))
    require(sinceId <= until, s"since s$sinceId is after until s$until")
    val before = readSnapshotFile(f, qroot, sinceId).files.toSet
    val m = readSnapshotFile(f, qroot, until)
    val added = m.files.filterNot(before)
    if (added.isEmpty) None
    else {
      val base = dataDir(qroot).toString
      val reader0 = spark.read.option("basePath", base)
      Some(m.schema.fold(reader0)(reader0.schema)
        .parquet(added.map(r => s"$base/$r"): _*))
    }
  }

  /** Partition directories whose live FILE SETS differ between two
    * snapshots — the pruning pre-pass for row-level snapshot diffing:
    * manifests alone name the partitions worth reading; everything else
    * is provably identical (same immutable files). */
  def changedPartitions(
      spark: SparkSession, root: String, fromId: Int, toId: Int): Seq[String] = {
    val (f, qroot) = FsOps.fs(spark, root)
    val a = readSnapshotFile(f, qroot, fromId).files.groupBy(parentDirOf)
    val b = readSnapshotFile(f, qroot, toId).files.groupBy(parentDirOf)
    (a.keySet ++ b.keySet).toSeq.sorted
      .filter(p => a.get(p).map(_.toSet) != b.get(p).map(_.toSet))
  }

  /**
   * Continuous snapshot maintenance: every micro-batch lands as one
   * snapshot through [[write]] — the stateless-foreachBatch posture of
   * all the persisted-index streams ([[graft.streaming.EventStream]]):
   * the SNAPSHOT TREE is the state, each batch publishes atomically, and
   * readers time-travel to any retained batch boundary. Pair with a
   * scheduled [[compact]] + [[expire]] to bound fragment and manifest
   * growth.
   */
  def snapshotStream(
      stream: DataFrame, root: String, partitionFields: Seq[String],
      mode: SnapshotMode = SnapAppend)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // an empty batch must not burn a snapshot id
        if (!batch.isEmpty)
          write(batch.toDF(), root, partitionFields, mode): Unit
      }
      .start()

  /**
   * Read the dataset at a snapshot — the CURRENT one when `asOf` is
   * empty, or any retained older one (time travel). The manifest's file
   * list goes straight to the scan with `basePath`, so the partition
   * directories surface as partition columns and partition-filter
   * pruning applies exactly as on a directly-read tree.
   */
  def read(
      spark: SparkSession, root: String,
      asOf: Option[Int] = None): DataFrame = {
    val (f, qroot) = FsOps.fs(spark, root)
    val id = asOf.orElse(currentSnapshot(spark, root)).getOrElse(
      throw new IllegalStateException(s"no snapshot published under $root"))
    val m = readSnapshotFile(f, qroot, id)
    require(m.files.nonEmpty, s"snapshot s$id is empty")
    val base = dataDir(qroot).toString
    val reader0 = spark.read.option("basePath", base)
    // the recorded schema IS the read contract: inference-free, stable
    // column order, widened columns resolve against pre-widening files
    // (absent columns read null, stored ints upcast)
    val reader = m.schema.fold(reader0)(reader0.schema)
    reader.parquet(m.files.map(r => s"$base/$r"): _*)
  }

  /**
   * Snapshot history as a DataFrame — the index-health read of the
   * snapshot tree ([[graft.ops.Dedup.dupGraphHealth]]'s role): per
   * retained snapshot, its write mode, live file count, live partition
   * count, and whether it is current. All figures come from the manifests
   * alone — no data file is opened.
   */
  private def snapshotIds(f: FileSystem, qroot: Path): Seq[Int] = {
    val dir = snapshotsDir(qroot)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case SnapRe(n) => n.toInt }.sorted.toSeq
  }

  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val (f, qroot) = FsOps.fs(spark, root)
    val cur = currentSnapshot(spark, root)
    val ids = snapshotIds(f, qroot)
    ids.map { id =>
      val m = readSnapshotFile(f, qroot, id)
      (id, m.mode, m.files.length.toLong,
        m.files.map(parentDirOf).distinct.length.toLong, cur.contains(id))
    }.toDF("snapshot_id", "mode", "n_files", "n_partitions", "is_current")
  }

  /**
   * Retention: keep the newest `keepLast` snapshots (always including the
   * current one — ids are monotonic so the newest IS the current), delete
   * older manifests, then delete every data file no retained snapshot
   * references and prune emptied partition directories. Time travel to an
   * expired snapshot fails loudly afterwards ([[read]]'s message).
   * Returns (expired snapshot ids, deleted data-file count).
   */
  def expire(
      spark: SparkSession, root: String, keepLast: Int): (Seq[Int], Int) = {
    require(keepLast >= 1, "must retain at least the current snapshot")
    val (f, qroot) = FsOps.fs(spark, root)
    val ids = snapshotIds(f, qroot)
    val (expired, kept) = ids.splitAt(math.max(0, ids.length - keepLast))
    if (expired.isEmpty) return (Seq.empty, 0)
    val referenced = kept.flatMap(readSnapshotFile(f, qroot, _).files).toSet
    val data = dataDir(qroot)
    val dead = listDataFiles(f, data).filterNot(referenced)
    dead.foreach(rel => FsOps.deleteIfExists(f, new Path(data, rel)))
    // prune emptied partition directories (metadata hygiene — an empty
    // name=value dir would otherwise surface a phantom partition value)
    dead.map(parentDirOf).distinct.filter(_.nonEmpty).foreach { d =>
      val p = new Path(data, d)
      if (f.exists(p) && !f.listFiles(p, true).hasNext)
        FsOps.deleteIfExists(f, p)
    }
    expired.foreach(id =>
      FsOps.deleteIfExists(f, new Path(snapshotsDir(qroot), s"s$id")))
    (expired, dead.length)
  }
}
