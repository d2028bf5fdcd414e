package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

import java.nio.file.{Files, Paths, FileAlreadyExistsException}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Versioned catalog metadata — the Spark-native analog of DuckLake's
  * "metadata is just rows in a transactional store" design
  * (ref README.md:202-209, utils/ducklake_utils.py:58-78).
  *
  * One immutable JSON snapshot document per committed transaction under
  * `<root>/_manifest/v{N}.json`; current state = max N. A snapshot is
  * CATALOG-level (covers every table), which is what makes multi-table
  * transactions atomic (ref demos/01_transaction_rollback/demo.py:177-214,
  * README.md:22-31) — one file publish commits changes to any number of
  * tables at once.
  *
  * Incremental layout (the Iceberg-manifest-style delta scheme):
  *  - A table's file list lives in immutable BLOB files under
  *    `_manifest/blobs/` (each a JSON array of FileEntry); the snapshot
  *    document stores only the ordered blob names per table.
  *  - An append commit writes ONE new blob holding just the added entries
  *    and re-references the previous blobs — per-commit metadata bytes are
  *    O(delta), not O(table files), and unchanged tables are O(1) (their
  *    blob list is copied by name). Copy-on-write DML / compaction replace
  *    the file set wholesale and write one consolidated blob (they already
  *    rewrote the data, so O(files) metadata is proportional work).
  *  - When a table accumulates > [[Manifest.BlobMergeThreshold]] blobs they
  *    are folded into one, bounding per-read fan-out; older snapshots keep
  *    referencing the original blobs (immutability = time travel).
  *  - Every snapshot document embeds the full HEADER history (id,
  *    timestamp, schema version, change summary per version — O(1) bytes
  *    each), so `snapshots()` / `versionAsOf` resolve from ONE manifest
  *    read instead of loading every version.
  *  - Blob contents are immutable → cached process-wide; `LakeCatalog`
  *    additionally caches whole snapshots by version.
  *
  * Scale notes (100 TB / 1000 executors): the manifest holds file-level
  * metadata only (path, size, rows, schema version, column min/max) —
  * O(files), never O(rows). Readers resolve a snapshot with one metadata
  * read + cached blob reads instead of object-store listing. All IO goes
  * through the Hadoop FileSystem API, so `root` can be hdfs:// or s3a://
  * unchanged; see [[Manifest.publish]] for the commit-atomicity seam.
  */
final case class ColumnDef(
    id: Int,                 // stable identity — survives renames
    name: String,
    typeJson: String,        // Spark DataType JSON
    default: Option[String]) // SQL literal expr, for files predating the col

/** Per-file min/max of a column (values as strings for JSON; parse with
  * the column's declared type) — the `ducklake_table_stats` analog
  * (ref exploration/benchmark_ducklake.sh:164-168, README.md:202-209).
  * Used to prune file sets before scanning: a PK-uniqueness check against
  * a 100TB table only reads files whose key range overlaps the incoming
  * batch. */
final case class ColStat(min: String, max: String)

final case class FileEntry(
    path: String,            // relative to lake root
    sizeBytes: Long,
    rowCount: Long,
    schemaVersion: Int,      // table schema version the file was written under
    stats: Map[String, ColStat] = Map.empty) // colName -> footer min/max

/** Rows stored INSIDE the manifest instead of parquet — DuckLake's
  * "optional inlining" for high-frequency small writes (ref README.md:58-63,
  * demos/04_small_file_optimization/demo.py:314-368): a 1-row insert costs
  * one metadata publish, zero data files. Compaction (and any DDL or
  * copy-on-write DML) flushes them to parquet. Rows are JSON objects in
  * the schema version they were written under. */
final case class InlineBatch(
    schemaVersion: Int,
    rows: Seq[String])

final case class TableState(
    schemaVersion: Int,
    schemas: Map[String, Seq[ColumnDef]], // version (as string for JSON) -> cols
    files: Seq[FileEntry],
    primaryKey: Seq[String],
    notNull: Seq[String],
    nextColId: Int,
    inlined: Seq[InlineBatch] = Nil,
    blobs: Seq[String] = Nil) {          // blob files backing `files` (bookkeeping)
  def columns: Seq[ColumnDef] = schemas(schemaVersion.toString)
  def columnsAt(v: Int): Seq[ColumnDef] = schemas(v.toString)
  def inlinedRowCount: Long = inlined.map(_.rows.size.toLong).sum
}

/** O(1)-sized per-version header carried in every snapshot document. */
final case class SnapHeader(
    snapshotId: Long,
    timestampMs: Long,
    schemaVersion: Long,
    changes: Map[String, Seq[String]])

final case class Snapshot(
    snapshotId: Long,
    timestampMs: Long,
    schemaVersion: Long,                  // catalog-global DDL counter
    changes: Map[String, Seq[String]],    // e.g. tables_deleted_from -> [t]
    tables: Map[String, TableState],
    views: Map[String, String],           // view name -> SQL text
    history: Seq[SnapHeader] = Nil)       // headers of v1..this, in order

/** Typed comparisons over the string-encoded file stats. Only types whose
  * string casts order-compare safely are harvested (integral, double,
  * string); anything else simply gets no stats — pruning then degrades to
  * scanning, never to wrong answers. */
object Stats {
  def comparable(c: ColumnDef): Boolean = c.typeJson match {
    case "\"integer\"" | "\"long\"" | "\"short\"" | "\"byte\"" |
         "\"double\"" | "\"float\"" | "\"string\"" => true
    case _ => false
  }

  private def cmp(c: ColumnDef, a: String, b: String): Int = c.typeJson match {
    case "\"integer\"" | "\"long\"" | "\"short\"" | "\"byte\"" =>
      java.lang.Long.compare(a.toLong, b.toLong)
    case "\"double\"" | "\"float\"" =>
      java.lang.Double.compare(a.toDouble, b.toDouble)
    case _ => a.compareTo(b)
  }

  /** Can [lo,hi] of an incoming batch intersect this file's range?
    * Missing stats → must assume yes. */
  def overlaps(st: Option[ColStat], c: ColumnDef, lo: String, hi: String): Boolean =
    st match {
      case Some(ColStat(mn, mx)) => cmp(c, mn, hi) <= 0 && cmp(c, lo, mx) <= 0
      case None => true
    }
}

object Manifest {
  private implicit val fmts: Formats = Serialization.formats(NoTypeHints)

  /** Fold a table's blob list into one when it grows past this — bounds
    * read fan-out at O(threshold) blob fetches per table. */
  val BlobMergeThreshold = 32

  val empty: Snapshot = Snapshot(0L, 0L, 0L, Map.empty, Map.empty, Map.empty)

  /** On-disk snapshot document: TableState minus `files` (those live in
    * the referenced blobs). */
  private final case class TableDoc(
      schemaVersion: Int,
      schemas: Map[String, Seq[ColumnDef]],
      primaryKey: Seq[String],
      notNull: Seq[String],
      nextColId: Int,
      inlined: Seq[InlineBatch],
      blobs: Seq[String])
  private final case class SnapshotDoc(
      snapshotId: Long,
      timestampMs: Long,
      schemaVersion: Long,
      changes: Map[String, Seq[String]],
      tables: Map[String, TableDoc],
      views: Map[String, String],
      history: Seq[SnapHeader])

  /** Immutable blob contents, cached process-wide (keyed by absolute
    * path). Entries are dropped when vacuum deletes the blob. */
  private val blobCache = new ConcurrentHashMap[String, Seq[FileEntry]]()

  /** Diagnostic: physical manifest-document reads (cache misses at the
    * catalog layer). Tests assert metadata-read complexity with this. */
  val manifestFileReads = new AtomicLong(0)

  def manifestDir(root: String) = new Path(root, "_manifest")
  private def blobDir(root: String) = new Path(manifestDir(root), "blobs")
  private def versionPath(root: String, v: Long) =
    new Path(manifestDir(root), s"v$v.json")

  def fs(root: String, conf: Configuration): FileSystem =
    new Path(root).getFileSystem(conf)

  /** Current committed version (0 = empty catalog, no manifest yet). */
  def currentVersion(root: String, conf: Configuration): Long = {
    val f = fs(root, conf)
    val dir = manifestDir(root)
    if (!f.exists(dir)) 0L
    else {
      val vs = f.listStatus(dir).iterator.map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
          n.stripPrefix("v").stripSuffix(".json").toLong }
      if (vs.isEmpty) 0L else vs.max
    }
  }

  def delete(root: String, v: Long, conf: Configuration): Unit =
    fs(root, conf).delete(versionPath(root, v), false)

  def exists(root: String, v: Long, conf: Configuration): Boolean =
    fs(root, conf).exists(versionPath(root, v))

  private def readBytes(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      StandardCharsets.UTF_8)
    finally in.close()
  }

  private def loadBlob(f: FileSystem, root: String, name: String): Seq[FileEntry] = {
    val abs = new Path(blobDir(root), name)
    blobCache.computeIfAbsent(abs.toUri.getPath, _ =>
      JsonMethods.parse(readBytes(f, abs)).extract[Seq[FileEntry]])
  }

  def load(root: String, v: Long, conf: Configuration): Snapshot = {
    if (v == 0L) return empty
    val f = fs(root, conf)
    manifestFileReads.incrementAndGet()
    val doc = JsonMethods.parse(readBytes(f, versionPath(root, v)))
      .extract[SnapshotDoc]
    val tables = doc.tables.map { case (name, td) =>
      name -> TableState(td.schemaVersion, td.schemas,
        td.blobs.flatMap(loadBlob(f, root, _)), td.primaryKey, td.notNull,
        td.nextColId, td.inlined, td.blobs)
    }
    Snapshot(doc.snapshotId, doc.timestampMs, doc.schemaVersion, doc.changes,
      tables, doc.views, doc.history)
  }

  private def writeBlob(f: FileSystem, root: String, v: Long,
      entries: Seq[FileEntry]): String = {
    f.mkdirs(blobDir(root))
    val name = s"b$v-${java.util.UUID.randomUUID().toString.take(8)}.json"
    val abs = new Path(blobDir(root), name)
    val out = f.create(abs, false)
    try out.write(Serialization.write(entries).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    blobCache.put(abs.toUri.getPath, entries)
    name
  }

  /** Atomically publish `s` as version `v`, deltaing each table's file
    * list against `base` (the snapshot the transaction was built on):
    * unchanged file lists re-reference the base's blobs byte-free, pure
    * appends write one O(delta) blob, rewrites write one consolidated
    * blob. Returns the STORED snapshot (blob bookkeeping corrected) when
    * this writer wins, None when another writer took version `v` first
    * (caller retries on fresh state; this writer's blobs are deleted).
    *
    * Commit atomicity is THE object-store seam (same class as Delta's
    * LogStore / Iceberg's commit lock): local fs uses a hard link (atomic
    * + EEXIST), HDFS uses create-exclusive (atomic). s3a has no
    * create-exclusive, so there exists()+create(false) is check-then-act —
    * concurrent commits to an object-store-rooted lake need a conditional
    * PUT (If-None-Match) or an external lock plugged in HERE; reads and
    * single-writer pipelines are safe unchanged. */
  def publish(root: String, v: Long, s: Snapshot, base: Snapshot,
      conf: Configuration): Option[Snapshot] = {
    val f = fs(root, conf)
    f.mkdirs(manifestDir(root))
    var written = List.empty[String]
    def blobFor(entries: Seq[FileEntry]): String = {
      val n = writeBlob(f, root, v, entries)
      written ::= n
      n
    }
    val storedTables = s.tables.map { case (name, st) =>
      val baseSt = base.tables.get(name)
      val baseFiles = baseSt.map(_.files).getOrElse(Nil)
      val baseBlobs = baseSt.map(_.blobs).getOrElse(Nil)
      val blobs =
        if (st.files == baseFiles) baseBlobs
        else if (st.files.startsWith(baseFiles) && baseFiles.nonEmpty) {
          if (baseBlobs.size + 1 > BlobMergeThreshold) Seq(blobFor(st.files))
          else baseBlobs :+ blobFor(st.files.drop(baseFiles.size))
        }
        else if (st.files.isEmpty) Nil
        else Seq(blobFor(st.files))
      name -> st.copy(blobs = blobs)
    }
    val stored = s.copy(tables = storedTables)
    val doc = SnapshotDoc(stored.snapshotId, stored.timestampMs,
      stored.schemaVersion, stored.changes,
      storedTables.map { case (n, st) =>
        n -> TableDoc(st.schemaVersion, st.schemas, st.primaryKey,
          st.notNull, st.nextColId, st.inlined, st.blobs)
      }, stored.views, stored.history)
    val bytes = Serialization.write(doc).getBytes(StandardCharsets.UTF_8)
    def loseRace(): Option[Snapshot] = {
      written.foreach { n =>
        val abs = new Path(blobDir(root), n)
        blobCache.remove(abs.toUri.getPath)
        try f.delete(abs, false) catch { case _: Exception => }
      }
      None
    }
    val target = versionPath(root, v)
    if (f.getScheme == "file") {
      val tmp = new Path(manifestDir(root), s".v$v.${java.util.UUID.randomUUID}.tmp")
      val out = f.create(tmp, true)
      try out.write(bytes) finally out.close()
      val localTmp = Paths.get(tmp.toUri.getPath)
      val localTarget = Paths.get(target.toUri.getPath)
      try { Files.createLink(localTarget, localTmp); Files.delete(localTmp); Some(stored) }
      catch { case _: FileAlreadyExistsException =>
        Files.delete(localTmp); loseRace() }
    } else {
      if (f.exists(target)) return loseRace()
      try {
        val out = f.create(target, false) // create-exclusive
        try out.write(bytes) finally out.close()
        Some(stored)
      } catch { case _: java.io.IOException => loseRace() }
    }
  }

  /** Blob GC for vacuum: delete every blob file not referenced by `kept`
    * snapshots (and evict it from the cache). */
  def deleteUnreferencedBlobs(root: String, kept: Seq[Snapshot],
      conf: Configuration): Unit = {
    val f = fs(root, conf)
    val dir = blobDir(root)
    if (!f.exists(dir)) return
    val live = kept.flatMap(_.tables.values.flatMap(_.blobs)).toSet
    f.listStatus(dir).foreach { fst =>
      val n = fst.getPath.getName
      if (n.endsWith(".json") && !live.contains(n)) {
        blobCache.remove(fst.getPath.toUri.getPath)
        try f.delete(fst.getPath, false) catch { case _: Exception => }
      }
    }
  }
}
