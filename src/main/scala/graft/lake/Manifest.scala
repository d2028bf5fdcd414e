package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

import java.nio.file.{Files, Paths, FileAlreadyExistsException}
import java.nio.charset.StandardCharsets

/** Versioned catalog metadata — the Spark-native analog of DuckLake's
  * "metadata is just rows in a transactional store" design
  * (ref README.md:202-209, utils/ducklake_utils.py:58-78).
  *
  * One immutable JSON snapshot file per committed transaction under
  * `<root>/_manifest/v{N}.json`; current state = max N. A snapshot is
  * CATALOG-level (covers every table), which is what makes multi-table
  * transactions atomic (ref demos/01_transaction_rollback/demo.py:177-214,
  * README.md:22-31) — one file publish commits changes to any number of
  * tables at once.
  *
  * Scale notes (100 TB / 1000 executors):
  *  - The manifest holds file-level metadata only (path, size, rows,
  *    schema version, column min/max) — O(files), never O(rows). Readers
  *    resolve a snapshot with ONE metadata read instead of object-store
  *    listing.
  *  - Each snapshot file is self-contained (full table state), so a
  *    long-lived table with many files pays O(files) JSON per commit and
  *    O(snapshots x files) manifest storage. `vacuum` bounds the history;
  *    the upgrade path for larger catalogs is Iceberg-style delta
  *    manifests (per-commit file-list diffs + periodic rewrites), which
  *    changes only this object's load/publish, not the catalog API.
  *  - All data IO goes through the Hadoop FileSystem API, so `root` can
  *    be hdfs:// or s3a:// unchanged; publish uses create-exclusive
  *    semantics (atomic on HDFS; hard-link trick on local fs for tests).
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
    inlined: Seq[InlineBatch] = Nil) {
  def columns: Seq[ColumnDef] = schemas(schemaVersion.toString)
  def columnsAt(v: Int): Seq[ColumnDef] = schemas(v.toString)
  def inlinedRowCount: Long = inlined.map(_.rows.size.toLong).sum
}

final case class Snapshot(
    snapshotId: Long,
    timestampMs: Long,
    schemaVersion: Long,                  // catalog-global DDL counter
    changes: Map[String, Seq[String]],    // e.g. tables_deleted_from -> [t]
    tables: Map[String, TableState],
    views: Map[String, String])           // view name -> SQL text

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

  val empty: Snapshot = Snapshot(0L, 0L, 0L, Map.empty, Map.empty, Map.empty)

  def toJson(s: Snapshot): String = Serialization.write(s)
  def fromJson(j: String): Snapshot = JsonMethods.parse(j).extract[Snapshot]

  def manifestDir(root: String) = new Path(root, "_manifest")
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

  def load(root: String, v: Long, conf: Configuration): Snapshot = {
    if (v == 0L) return empty
    val f = fs(root, conf)
    val in = f.open(versionPath(root, v))
    try fromJson(new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      StandardCharsets.UTF_8))
    finally in.close()
  }

  /** Atomically publish snapshot as version `v`; returns false when another
    * writer won the race (caller retries on fresh state). Local fs uses a
    * hard link (atomic + EEXIST); remote fs uses create-exclusive, which is
    * atomic on HDFS.
    *
    * LIMITATION (concurrent writers on object stores): s3a has no
    * create-exclusive, so exists()+create(false) is check-then-act and two
    * concurrent committers could both publish the same version. Reads and
    * single-writer pipelines on s3a:// are safe unchanged; CONCURRENT
    * commits to an object-store-rooted lake need a coordination layer
    * (conditional PUT, a DynamoDB/ZK lock, or an HDFS-/file-rooted
    * manifest dir) — same class of fix as Delta's LogStore. */
  def publish(root: String, v: Long, s: Snapshot, conf: Configuration): Boolean = {
    val f = fs(root, conf)
    f.mkdirs(manifestDir(root))
    val target = versionPath(root, v)
    val bytes = toJson(s).getBytes(StandardCharsets.UTF_8)
    if (f.getScheme == "file") {
      val tmp = new Path(manifestDir(root), s".v$v.${java.util.UUID.randomUUID}.tmp")
      val out = f.create(tmp, true)
      try out.write(bytes) finally out.close()
      val localTmp = Paths.get(tmp.toUri.getPath)
      val localTarget = Paths.get(target.toUri.getPath)
      try { Files.createLink(localTarget, localTmp); Files.delete(localTmp); true }
      catch { case _: FileAlreadyExistsException =>
        Files.delete(localTmp); false }
    } else {
      if (f.exists(target)) return false
      try {
        val out = f.create(target, false) // create-exclusive
        try out.write(bytes) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }
}
