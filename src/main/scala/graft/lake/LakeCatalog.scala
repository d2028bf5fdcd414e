package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native lakehouse catalog with DuckLake's capability set
  * (ref README.md:13-31): numbered catalog-level snapshots, atomic
  * multi-table transactions with rollback, time travel by version or
  * timestamp, transactional schema evolution, copy-on-write UPDATE/DELETE,
  * and metadata exposed as DataFrames.
  *
  * Architecture (SURVEY.md §7): a thin coordination layer ABOVE the public
  * DataFrame API — all data movement is declarative Spark (scans, unions,
  * rewrites), so Catalyst keeps pushdown/pruning/codegen; only the
  * manifest bookkeeping is custom. Snapshot-scoped file pruning happens
  * before plan construction: `readAt` hands Spark the exact parquet file
  * list for that version, so no listing and no stale files are ever
  * scanned (ref exploration/benchmark_ducklake.sh:194-197).
  */
final class ConstraintViolation(msg: String) extends RuntimeException(msg)

class LakeCatalog(val spark: SparkSession, val root: String,
    catalogDsn: Option[String] = None) {
  private val conf = spark.sessionState.newHadoopConf()
  private[lake] def hadoopConf = conf
  private[lake] val fs = Manifest.fs(root, conf)

  /** Catalog backend (the reference's portability story, demo 5): file
    * manifests under the lake root by default; pass a JDBC DSN to keep
    * the catalog as rows in a transactional SQL database instead — data
    * files stay on `root` either way, so the same lake can migrate
    * between backends with `migrateTo`. */
  private[lake] val store: ManifestStore = catalogDsn match {
    case Some(dsn) => new JdbcManifestStore(dsn)
    case None => new FileManifestStore(root, conf)
  }

  def currentVersion: Long = store.currentVersion()

  /** Snapshots are immutable once published → cache by version, so time
    * travel / metadata calls stop re-reading manifest JSON per call. */
  private val snapCache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Snapshot]()
  def snapshot(v: Long): Snapshot =
    snapCache.computeIfAbsent(v, _ => store.load(v))
  def current: Snapshot = snapshot(currentVersion)

  // ------------------------------------------------------------------ reads

  /** Schema (all nullable on read; NOT NULL is enforced on write). */
  private[lake] def structOf(cols: Seq[ColumnDef]): StructType =
    StructType(cols.map(c =>
      StructField(c.name, DataType.fromJson(c.typeJson), nullable = true)))

  private[lake] def absPath(rel: String): Path =
    fs.makeQualified(new Path(new Path(root), rel))

  /** Qualified URI of a table's data directory (`<root>/<table>/data`) —
    * the append-only file namespace streaming readers incrementalize
    * (see graft.streaming.LakeStream). */
  def tableDataDir(table: String): String = absPath(s"$table/data").toString

  /** Read a table state: per-schema-version file groups are each scanned
    * with their OWN written schema, then aligned to the current schema by
    * stable column id — add-with-default / drop / rename are pure metadata
    * (no file rewrites), exactly DuckLake's evolution semantics
    * (ref demos/03_schema_evolution/demo.py:112-198). */
  private[lake] def readState(st: TableState): DataFrame =
    readState(st, spark)

  private[lake] def readState(st: TableState, sess: SparkSession): DataFrame =
    readStateInternal(st, sess, None)

  /** [[readState]] plus a `fileCol` string column carrying each row's
    * source file path — sourced from `_metadata.file_path` at SCAN level,
    * so it stays resolvable even when the plan gains joins (deletion-
    * vector anti-joins make `input_file_name()` illegal). Inlined rows
    * tag NULL. */
  private[lake] def readStateTagged(st: TableState, fileCol: String): DataFrame =
    readStateInternal(st, spark, Some(fileCol))

  /** Catalyst statistics for one schema-version file group, built from
    * manifest metadata already in memory (zero file reads, zero jobs):
    * exact row count and byte size, per-column min/max for numeric
    * columns covered by EVERY file's footer stats (a partial range could
    * zero-out a filter estimate wrongly — all-or-nothing keeps the
    * estimate conservative), and NDV folded driver-side from the opt-in
    * per-file HLL sketches. With `spark.sql.cbo.enabled` +
    * `spark.sql.cbo.planStats.enabled` these flow into FilterEstimation/
    * JoinEstimation, so broadcast choice and join ordering on lake
    * tables are decided in the INITIAL plan instead of waiting for AQE
    * to repair them after the first (possibly huge) shuffle
    * materializes. */
  private def manifestCatalogStats(st: TableState, v: Int,
      entries: Seq[FileEntry]):
      org.apache.spark.sql.catalyst.catalog.CatalogTable = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    import org.apache.spark.sql.catalyst.catalog._
    val cols = st.columnsAt(v)
    def numeric(c: ColumnDef): Boolean = c.typeJson match {
      case "\"integer\"" | "\"long\"" | "\"short\"" | "\"byte\"" |
           "\"double\"" | "\"float\"" => true
      case _ => false
    }
    val totalRows = entries.map(_.rowCount).sum
    def integral(c: ColumnDef): Boolean = c.typeJson match {
      case "\"integer\"" | "\"long\"" | "\"short\"" | "\"byte\"" => true
      case _ => false
    }
    val colStats = cols.iterator.flatMap { c =>
      val ranges = entries.map(_.stats.get(c.name))
      val covered = entries.nonEmpty && ranges.forall(_.isDefined)
      // Legacy manifests (pre non-finite harvest guard) can still carry
      // "NaN"/"Infinity" min/max in double columns; those don't parse as
      // BigDecimal, and this fold runs on EVERY read — degrade that
      // column's stats to none instead of making the table unreadable.
      def dec(s: String): Option[BigDecimal] =
        scala.util.Try(BigDecimal(s)).toOption
      val minMax =
        if (numeric(c) && covered) {
          val mins = ranges.flatten.map(s => dec(s.min))
          val maxs = ranges.flatten.map(s => dec(s.max))
          if (mins.forall(_.isDefined) && maxs.forall(_.isDefined))
            (Some(mins.flatten.min.toString), Some(maxs.flatten.max.toString))
          else (None, None)
        } else (None, None)
      // exact null count only when EVERY file's harvest proved one —
      // a partial sum would misestimate IS NULL filters. NOT NULL
      // columns (which include every PRIMARY KEY column — createTable
      // folds the PK into notNull; setNotNull validates ALL existing
      // rows and writes enforce it after) are provably zero even when
      // the footers predate the null harvest. Matched by stable column
      // ID, not name — a rename must not alias an old file column onto
      // a different current column's constraint.
      val notNullNow = st.columns
        .find(_.id == c.id).exists(cur => st.notNull.contains(cur.name))
      val nulls =
        if (covered && ranges.flatten.forall(_.nulls.isDefined))
          Some(BigInt(ranges.flatten.flatMap(_.nulls).sum))
        else if (notNullNow) Some(BigInt(0))
        else None
      val ndvExact =
        if (entries.nonEmpty && entries.forall(_.ndv.contains(c.name))) {
          // driver-side sketch union: O(files) tiny deserializations,
          // no Spark job — the sketches are mergeable by design
          val u = new org.apache.datasketches.hll.Union(12)
          entries.foreach { e =>
            u.update(org.apache.datasketches.hll.HllSketch.heapify(
              java.util.Base64.getDecoder.decode(e.ndv(c.name))))
          }
          Some(BigInt(math.max(1L, u.getEstimate.toLong)))
        } else None
      // FilterEstimation requires distinctCount+nullCount alongside
      // min/max. NDV sources in decreasing exactness: the HLL sketch;
      // a single-column PRIMARY KEY (unique by constraint, so ndv =
      // rows exactly); a partition column whose per-file VALUE SETS are
      // all recorded (their union is the exact distinct set); an
      // INTEGRAL column's provable upper bound min(rows, value span) —
      // exact for dense key ranges, an overestimate otherwise, which
      // only makes equality estimates conservative-small in the safe
      // direction for CBO (estimates shape plans, never answers).
      // Non-integral columns with none of these get no NDV (and hence
      // no estimate) rather than a guess.
      // current-schema identity of this file column (id-matched: renames
      // must not alias constraints across different columns)
      val curName = st.columns.find(_.id == c.id).map(_.name)
      val ndv = ndvExact
        .orElse {
          if (curName.exists(n => st.primaryKey == Seq(n)))
            Some(BigInt(totalRows)) // unique by constraint within the group
          else None
        }
        .orElse {
          // pvals are keyed by the name at WRITE time = this group's
          // schema-version name (the group key is the schema version)
          val sets = entries.map(_.pvals.get(c.name))
          if (curName.exists(st.partitionBy.contains) && entries.nonEmpty &&
              sets.forall(_.exists(_.nonEmpty)))
            Some(BigInt(sets.flatten.flatten.toSet.size.max(1)))
          else None
        }
        .orElse {
          if (integral(c) && minMax._1.isDefined && nulls.isDefined) {
            val span = BigDecimal(minMax._2.get) - BigDecimal(minMax._1.get) + 1
            Some(BigInt(totalRows).min(span.toBigInt).max(BigInt(1)))
          } else None
        }
      if (minMax._1.isEmpty && ndv.isEmpty) None
      else Some(c.name -> CatalogColumnStat(distinctCount = ndv,
        min = minMax._1, max = minMax._2, nullCount = nulls))
    }.toMap
    CatalogTable(
      identifier = TableIdentifier("graft_lake_scan"), // display-only
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty,
      schema = structOf(cols),
      provider = Some("parquet"),
      stats = Some(CatalogStatistics(
        sizeInBytes = BigInt(math.max(1L, entries.map(_.sizeBytes).sum)),
        rowCount = Some(BigInt(entries.map(_.rowCount).sum)),
        colStats = colStats)))
  }

  private def readStateInternal(st: TableState, sess: SparkSession,
      tagCol: Option[String]): DataFrame = {
    val cur = st.columns
    val curSchema = tagCol match {
      case Some(t) => structOf(cur).add(StructField(t, StringType))
      case None => structOf(cur)
    }
    /** Align a frame written under schema version v to the current schema
      * by stable column id (renames follow, drops vanish, adds read their
      * DEFAULT). The tag column, when present, rides along. */
    def align(df: DataFrame, v: Int): DataFrame = {
      val byId = st.columnsAt(v).map(c => c.id -> c).toMap
      df.select(cur.map { c =>
        byId.get(c.id) match {
          case Some(old) =>
            col(old.name).cast(DataType.fromJson(c.typeJson)).as(c.name)
          case None =>
            expr(c.default.getOrElse("NULL"))
              .cast(DataType.fromJson(c.typeJson)).as(c.name)
        }
      } ++ tagCol.map(col): _*)
    }
    val fileParts = st.files.groupBy(e => (e.schemaVersion, e.dv.isDefined))
      .toSeq.map { case ((v, hasDv), entries) =>
        // manifest-backed scan: the FileIndex fabricates the file list
        // from manifest metadata (zero store listing) and prunes files
        // against pushed predicates via per-file min/max + partition
        // value sets + bloom sidecars (GraftFileIndex); the attached
        // CatalogTable carries exact statistics so CBO shapes the
        // INITIAL plan instead of waiting for AQE repair
        val index = new GraftFileIndex(
          fs.makeQualified(new Path(root)), entries, st.columnsAt(v),
          absPath, (rel, value) => loadBloom(rel).mightContainString(value))
        val raw0 = org.apache.spark.sql.graftshim.RelationStats.manifestScan(
          sess, index, structOf(st.columnsAt(v)),
          manifestCatalogStats(st, v, entries))
        val raw = tagCol match {
          case Some(t) => raw0.withColumn(t, col("_metadata.file_path"))
          case None => raw0
        }
        if (!hasDv) align(raw, v)
        else {
          // merge-on-read: anti-join the (broadcast, tiny) tombstone
          // sidecars on (file name, row position) BELOW the align
          // projection — the scan itself never widens, and files whose
          // positions aren't tombstoned stream through untouched
          val dvDirs = entries.flatMap(_.dv).distinct
          val dv = sess.read
            .schema(StructType(Seq(StructField("file", StringType),
              StructField("pos", LongType))))
            .parquet(dvDirs.map(d => absPath(d).toString): _*)
          val tagged = raw
            .withColumn("__dv_file", col("_metadata.file_name"))
            .withColumn("__dv_pos", col("_metadata.row_index"))
          align(tagged.join(broadcast(dv),
            tagged("__dv_file") === dv("file") && tagged("__dv_pos") === dv("pos"),
            "left_anti").drop("__dv_file", "__dv_pos"), v)
        }
      }
    val inlineParts = st.inlined.groupBy(_.schemaVersion).toSeq.map { case (v, batches) =>
      import sess.implicits._
      val raw0 = sess.read.schema(structOf(st.columnsAt(v)))
        .json(sess.createDataset(batches.flatMap(_.rows)))
      val raw = tagCol match {
        case Some(t) => raw0.withColumn(t, lit(null).cast(StringType))
        case None => raw0
      }
      align(raw, v)
    }
    val parts = fileParts ++ inlineParts
    if (parts.isEmpty)
      sess.createDataFrame(sess.sparkContext.emptyRDD[Row], curSchema)
    else parts.reduce(_ unionByName _)
  }

  private def stateOf(s: Snapshot, table: String): TableState =
    s.tables.getOrElse(table,
      throw new NoSuchElementException(s"table not found: $table"))

  /** Zero-job manifest check: did `table`'s data-bearing state (schema,
    * file list, inlined batches) change between two catalog versions?
    * Snapshots are CATALOG-level — most commits touch other tables — so
    * incremental consumers (Mv.refresh) use this to skip whole
    * change-feed legs without running a Spark action. Conservative by
    * construction: a data-identical rewrite (compaction) reads as
    * changed and the consumer just computes an empty delta. A table
    * absent at either version also reads as changed. */
  def tableChangedBetween(table: String, fromV: Long, toV: Long): Boolean = {
    if (fromV == toV) return false
    def key(v: Long) = snapshot(v).tables.get(table).map(st =>
      (st.schemaVersion, st.schemas, st.files, st.inlined))
    val (a, b) = (key(fromV), key(toV))
    a.isEmpty || b.isEmpty || a != b
  }

  /** Table state as the SQL surface sees it: the staged state when an
    * interactive transaction is open (read-your-writes), else the
    * current committed snapshot. */
  private def liveState(table: String): TableState = activeTx match {
    case Some((tx, _)) => tx.stagedState(table)
    case None => stateOf(current, table)
  }

  /** Current-snapshot scan (S2) — read-your-writes when an interactive
    * transaction is open, matching the SQL surface (the Scala mutators
    * stage into the open transaction via inTx, so reads must see the
    * staged state too or the API would disagree with itself). */
  def read(table: String): DataFrame = readState(liveState(table))

  /** Time-travel scan by version (S3, `AT (VERSION => v)`). */
  def readAt(table: String, version: Long): DataFrame =
    readState(stateOf(snapshot(version), table))

  /** Range scan with manifest-stats file pruning: only files whose
    * [min,max] for `colName` can intersect [lo,hi] are handed to Spark —
    * metadata-level skipping BEFORE plan construction, on top of the
    * parquet row-group skipping Spark already does. At 100 TB this is the
    * difference between listing 10^6 files and scanning the 10^2 that
    * overlap. Values are the column's string form (numeric types compare
    * numerically). */
  def readRange(table: String, colName: String, lo: String, hi: String): DataFrame = {
    val st = stateOf(current, table)
    val c = st.columns.find(_.name == colName).getOrElse(
      throw new NoSuchElementException(s"no such column: $table.$colName"))
    val pruned =
      if (!Stats.comparable(c)) st
      else st.copy(files = st.files.filter(e =>
        Stats.overlaps(e.stats.get(colName), c, lo, hi)))
    readState(pruned)
      .filter(col(colName) >= lit(lo).cast(DataType.fromJson(c.typeJson)) &&
        col(colName) <= lit(hi).cast(DataType.fromJson(c.typeJson)))
  }

  /** Partition-key equality scan with EXACT file pruning: only files
    * whose recorded partition-value set contains every requested value
    * are scanned (files without a recorded set are conservatively kept).
    * With the write path hash-clustering on the declared partition
    * columns, a partition read touches one file per batch — hive-style
    * partition pruning at file granularity, driven by manifest metadata
    * instead of directory layout. Values in string form (same contract
    * as [[readRange]]); the row-level filter stays on top so pruning can
    * only skip work, never change answers. */
  def readPartition(table: String, eq: Map[String, String]): DataFrame = {
    val st = stateOf(current, table)
    val typed = eq.map { case (cn, v) =>
      val c = st.columns.find(_.name == cn).getOrElse(
        throw new NoSuchElementException(s"no such column: $table.$cn"))
      (c, v)
    }
    val pruned = st.copy(files = st.files.filter(f =>
      typed.forall { case (c, v) =>
        f.pvals.get(c.name) match {
          case Some(vs) if vs.nonEmpty => vs.contains(v)
          case _ => // no value set recorded: fall back to min/max, then keep
            Stats.overlaps(f.stats.get(c.name), c, v, v)
        }
      }))
    typed.foldLeft(readState(pruned)) { case (df, (c, v)) =>
      df.filter(col(c.name) === lit(v).cast(DataType.fromJson(c.typeJson)))
    }
  }

  /** Loaded bloom sidecars, cached process-wide by absolute path —
    * immutable once written (new files get new sidecars), so the cache
    * never needs invalidation; entries for vacuumed files are simply
    * never queried again. */
  private val bloomCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.util.sketch.BloomFilter]()

  private def loadBloom(rel: String): org.apache.spark.util.sketch.BloomFilter =
    bloomCache.computeIfAbsent(absPath(rel).toUri.getPath, _ => {
      val in = fs.open(absPath(rel))
      try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
      finally in.close()
    })

  /** Enable per-file HLL NDV sketches on `colName`: every subsequent
    * write stores a mergeable distinct-count sketch in the manifest
    * entry (existing files stay unsketched until rewritten — run
    * [[compact]] to backfill). See [[approxDistinct]]. */
  def ndvIndex(table: String, colName: String): Unit =
    transaction(_.setProperty(table, "index.ndv", colName))

  /** Approximate COUNT(DISTINCT colName) folded from the manifest's
    * per-file HLL sketches — ZERO data files read (the cardinality input
    * every join planner wants, answered the way Iceberg/DuckDB answer it
    * from stats). The merge is one driver-local job over the sketch
    * bytes. Returns (estimate, metaOnly); when any file lacks a sketch
    * (written before [[ndvIndex]], or a tiny write), carries tombstones
    * (deleted rows would still be counted), or inlined rows exist, it
    * FALLS BACK to an exact distributed COUNT(DISTINCT) — correct,
    * never silently stale. */
  def approxDistinct(table: String, colName: String): (Long, Boolean) = {
    val st = stateOf(current, table)
    require(st.columns.exists(_.name == colName),
      s"no such column: $table.$colName")
    val metaOk = st.files.nonEmpty && st.inlined.isEmpty &&
      st.files.forall(e => e.dvRows == 0L && e.ndv.contains(colName))
    if (metaOk) {
      import spark.implicits._
      val sketches = st.files
        .map(e => java.util.Base64.getDecoder.decode(e.ndv(colName)))
      val est = spark.createDataset(sketches).toDF("s")
        .agg(expr("hll_sketch_estimate(hll_union_agg(s))"))
        .head().getLong(0)
      (est, true)
    } else {
      val exact = read(table).agg(countDistinct(col(colName)))
        .head().getLong(0)
      (exact, false)
    }
  }

  /** Enable a per-file BLOOM index on `colName` for point lookups: every
    * subsequent write builds a sidecar filter next to its data files
    * (existing files stay unindexed until rewritten — run [[compact]] to
    * backfill). See [[readPoint]]. */
  def bloomIndex(table: String, colName: String): Unit =
    transaction { tx =>
      tx.setProperty(table, "index.bloom", colName)
    }

  /** POINT lookup with bloom file skipping: candidate files pass the
    * min/max stats gate first, then each candidate's bloom sidecar is
    * probed (lazily loaded, cached) and definite misses are skipped —
    * at 100 TB the difference between "scan the key's range stripe" and
    * "read the one file that can hold the key". Files without a sidecar
    * stay candidates (correct, never wrong); the exact row filter runs
    * on top of whatever survives. */
  def readPoint(table: String, colName: String, value: String): DataFrame = {
    val st = stateOf(current, table)
    val c = st.columns.find(_.name == colName).getOrElse(
      throw new NoSuchElementException(s"no such column: $table.$colName"))
    readState(st.copy(files = pointCandidates(st, c, value)))
      .filter(col(colName) === lit(value).cast(DataType.fromJson(c.typeJson)))
  }

  /** Number of files a [[readPoint]] on (colName = value) would scan —
    * the pruning observable the bloom-index contract is judged on. */
  def pointScanFiles(table: String, colName: String, value: String): Long = {
    val st = stateOf(current, table)
    val c = st.columns.find(_.name == colName).getOrElse(
      throw new NoSuchElementException(s"no such column: $table.$colName"))
    pointCandidates(st, c, value).size.toLong
  }

  private def pointCandidates(st: TableState, c: ColumnDef,
      value: String): Seq[FileEntry] =
    st.files.filter(f =>
      Stats.overlaps(f.stats.get(c.name), c, value, value) &&
        (f.pvals.get(c.name) match {
          case Some(vs) if vs.nonEmpty => vs.contains(value)
          case _ => true
        }) &&
        (f.blooms.get(c.name) match {
          case Some(rel) => loadBloom(rel).mightContainString(value)
          case None => true
        }))

  /** Time-travel scan by timestamp: newest snapshot at or before `tsMs`
    * (S3, `AT (TIMESTAMP => ts)` — ref demos/02_time_travel/demo.py:196). */
  def readAsOf(table: String, tsMs: Long): DataFrame =
    readAt(table, versionAsOf(tsMs))

  /** Time-travel scan by TAG — `AT (VERSION => v)` with a stable name. */
  def readTag(table: String, tagName: String): DataFrame =
    readAt(table, resolveRef(tagName))

  def resolveRef(tagName: String): Long =
    current.refs.getOrElse(tagName,
      throw new NoSuchElementException(s"no such tag: $tagName"))

  def versionAsOf(tsMs: Long): Long = {
    // the current snapshot embeds the retained headers — one read
    val head = current
    val live = head.history.filter(_.timestampMs <= tsMs)
    if (live.isEmpty)
      throw new NoSuchElementException(s"no snapshot at or before $tsMs")
    val v = live.map(_.snapshotId).max
    // header-tail compaction dropped EXPIRED headers above this floor —
    // a timestamp resolving at or below it might really belong to a
    // dropped version, so refuse (the expired target would have refused
    // anyway; this keeps the refusal loud instead of silently resolving
    // to an older live snapshot). EXCEPTION: when `tsMs` predates the
    // earliest dropped header's timestamp, no dropped header can be the
    // true target — the retained headers are complete for the range, so
    // a resolution onto an old tag-PINNED live snapshot is exact and
    // stays allowed (minDroppedTsMs == 0 with a non-zero floor means a
    // pre-aggV2 engine dropped headers without recording timestamps —
    // unknown, keep refusing).
    if (v < head.historyFloor &&
        !(head.minDroppedTsMs > 0L && tsMs < head.minDroppedTsMs))
      throw new NoSuchElementException(
        s"timestamp $tsMs resolves into vacuumed history (below " +
          s"v${head.historyFloor}) — the snapshot it names has been " +
          "expired; time-travel by VERSION to a live snapshot instead")
    v
  }

  /** Ad-hoc SQL over the lake's current snapshot — the reference's
    * user-facing surface (`ATTACH ...; SELECT ... FROM lake.t`, ref
    * demos/01_transaction_rollback/demo.py:30,74): every table of the
    * catalog is visible by name, resolution happens in an isolated child
    * session so caller temp views are untouched. */
  /** SQL statement router — the reference's interface is SQL end-to-end
    * (`conn.execute(...)` against the attached DuckLake), so the catalog
    * accepts the DML/DDL subset too, each statement one atomic commit
    * (auto-commit semantics) unless an interactive transaction is open:
    *
    *  - `BEGIN [TRANSACTION]` / `COMMIT` / `ROLLBACK` — interactive
    *    transactions (ref demos/01:85-104): while open, every statement
    *    below stages into ONE pending commit, SELECTs read the staged
    *    state, COMMIT publishes a single snapshot, ROLLBACK discards
    *    everything; a losing commit race aborts (no statement replay)
    *  - `INSERT INTO t [(col, ...)] VALUES ... | SELECT ... | WITH ...`
    *    (VALUES columns align positionally to the table schema, or to
    *    the explicit column list with DEFAULT/NULL fill for the rest)
    *  - `UPDATE t SET a = e[, ...] [WHERE cond]`
    *  - `DELETE FROM t [WHERE cond]`
    *  - `MERGE INTO t USING (...) ON ... WHEN ...` (see [[executeMerge]])
    *  - `CREATE TABLE t (col TYPE [PRIMARY KEY|NOT NULL], ...)
    *    [PARTITIONED BY (col, ...)]` (DuckDB-flavored type names
    *    normalized) / `CREATE TABLE t AS select` /
    *    `CREATE [OR REPLACE] VIEW v AS ...`
    *  - `ALTER TABLE t ADD COLUMN c TYPE [DEFAULT e] | DROP COLUMN c |
    *    RENAME COLUMN a TO b | ALTER COLUMN c SET NOT NULL |
    *    ALTER COLUMN c [SET DATA] TYPE T`
    *  - `DROP TABLE|VIEW x`, `TRUNCATE TABLE t`,
    *    `ALTER TABLE t RENAME TO u`
    *  - `CREATE MATERIALIZED VIEW mv AS SELECT keys…, COUNT(*) AS
    *    n_rows[, SUM(c) AS sum_c…][, AVG(c) AS avg_c…] FROM base
    *    [JOIN dim ON fk = pk] [WHERE pred] GROUP BY keys…` and
    *    `REFRESH MATERIALIZED VIEW mv`
    *    (returns the refresh path taken) — the incrementally-maintained
    *    subset only (AVG rides on maintained sum+count, derived at
    *    write); other shapes are rejected loudly
    *  - queries support `t AT (VERSION|TIMESTAMP => ...)` time travel
    *    (quoted wall-clocks resolve in the session timezone; unquoted
    *    digits are epoch millis) and the `graft_snapshots()/
    *    graft_table_info()/graft_files()/graft_table_changes(t, v1, v2)`
    *    metadata functions; occurrences inside string LITERALS are data,
    *    not syntax, and are never rewritten
    *  - `CALL graft_vacuum(…) | graft_expire_snapshots(…) |
    *    graft_compact(…) | graft_cluster(…) | graft_zorder(…) |
    *    graft_restore(…) | graft_add_data_files(…)` — the maintenance
    *    verbs (see [[executeCall]]); each returns one row of
    *    deterministic after-facts
    *  - anything else runs as a query via [[sql]]
    *
    * Expressions (SET right-hand sides, WHERE conditions) are handed to
    * Spark's own parser via `expr`, so the full scalar-function surface
    * works; only the statement HEAD is recognized here. Mutating
    * statements return an empty frame; queries return their result. */
  def execute(statement: String): DataFrame = {
    import LakeCatalog.{splitTopLevel, topLevelSplitOnce}
    val s0 = statement.trim.stripSuffix(";").trim
    val InsertRe = """(?is)^INSERT\s+INTO\s+(\w+)\s+(.+)$""".r
    val InsertColsRe =
      """(?is)^INSERT\s+INTO\s+(\w+)\s*\(([A-Za-z_][\w\s,]*)\)\s*(.+)$""".r
    val DeleteRe = """(?is)^DELETE\s+FROM\s+(\w+)(\s+WHERE\s+.+)?$""".r
    val UpdateRe = """(?is)^UPDATE\s+(\w+)\s+SET\s+(.+)$""".r
    val CtasRe = """(?is)^CREATE\s+TABLE\s+(\w+)\s+AS\s+(.+)$""".r
    val ViewRe = """(?is)^CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+(.+)$""".r
    val MvCreateRe =
      """(?is)^CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s+AS\s+(.+)$""".r
    val MvRefreshRe = """(?is)^REFRESH\s+MATERIALIZED\s+VIEW\s+(\w+)$""".r
    val DropTRe = """(?is)^DROP\s+TABLE\s+(\w+)$""".r
    val DropVRe = """(?is)^DROP\s+VIEW\s+(\w+)$""".r
    val TruncRe = """(?is)^TRUNCATE\s+TABLE\s+(\w+)$""".r
    val RenameRe = """(?is)^ALTER\s+TABLE\s+(\w+)\s+RENAME\s+TO\s+(\w+)$""".r
    def empty: DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Nil))
    // txn-control statements tolerate the standard variants and flexible
    // whitespace, like every other statement head in this router
    if (s0.matches("(?is)^BEGIN(\\s+(TRANSACTION|WORK))?$")) {
      beginTransaction(); return empty
    }
    if (s0.matches("(?is)^COMMIT(\\s+(TRANSACTION|WORK))?$")) {
      commitTransaction(); return empty
    }
    if (s0.matches("(?is)^ROLLBACK(\\s+(TRANSACTION|WORK))?$")) {
      rollbackTransaction(); return empty
    }
    if (s0.toUpperCase.startsWith("MERGE INTO")) return executeMerge(s0)
    // introspection statements the reference's conn.execute accepts
    // (DuckDB surface): DESCRIBE <table> and SHOW TABLES route to the
    // existing metadata DataFrames (D10/D11)
    val DescribeRe = """(?is)^DESC(?:RIBE)?\s+(\w+)$""".r
    s0 match {
      case DescribeRe(t) => return describe(t)
      case _ if s0.matches("(?is)^SHOW\\s+TABLES$") => return listTables()
      case _ => ()
    }
    // CALL graft_*(…) — maintenance verbs through the SQL surface (the
    // reference's whole interface is conn.execute(sql); DuckLake exposes
    // ducklake_expire_snapshots()-style procedure calls). Each returns a
    // one-row ledger of deterministic after-facts.
    val CallRe = """(?is)^CALL\s+(\w+)\s*\((.*)\)$""".r
    s0 match {
      case CallRe(fn, argStr) =>
        return executeCall(fn.toLowerCase(java.util.Locale.ROOT), argStr)
      case _ => ()
    }
    // EXPLAIN [ANALYZE] <select> — the reference's conn.execute accepts
    // it (DuckDB surface); plan TEXT is engine-specific by nature, so
    // this returns Spark's formatted plan (with executed metrics under
    // ANALYZE) as one row per line. Spec-pinned, not oracle-compared.
    val ExplainRe = """(?is)^EXPLAIN(\s+ANALYZE)?\s+(.+)$""".r
    s0 match {
      case ExplainRe(analyze, body) =>
        val df = sql(body.trim)
        val text =
          if (analyze != null) {
            // Execute THIS DataFrame's own QueryExecution (df.count()
            // would build a separate one whose metrics die with it),
            // then render its formatted plan plus the runtime metrics
            // walked off the executed tree — AQE wraps the final plan
            // in AdaptiveSparkPlanExec/QueryStageExec leaf nodes, so
            // the walk unwraps them explicitly.
            import org.apache.spark.sql.execution.SparkPlan
            import org.apache.spark.sql.execution.adaptive.{
              AdaptiveSparkPlanExec, QueryStageExec}
            val qe = df.queryExecution
            qe.executedPlan.execute().count() // distributed; no row fetch
            def metricLines(p: SparkPlan): Seq[String] = p match {
              case a: AdaptiveSparkPlanExec => metricLines(a.executedPlan)
              case q: QueryStageExec => metricLines(q.plan)
              case _ =>
                val own =
                  if (p.metrics.isEmpty) Nil
                  else Seq(s"${p.nodeName}: " + p.metrics.toSeq
                    .sortBy(_._1)
                    .map { case (k, m) => s"$k=${m.value}" }
                    .mkString(", "))
                own ++ p.children.flatMap(metricLines)
            }
            qe.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted")) +
              "\n== Runtime Metrics ==\n" +
              metricLines(qe.executedPlan).mkString("\n")
          } else df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val rows = text.linesIterator.map(l => Row(l)).toSeq
        return spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          StructType(Seq(StructField("explain", StringType))))
      case _ => ()
    }
    val CreateTblPartRe =
      ("""(?is)^CREATE\s+TABLE\s+(\w+)\s*\((.+)\)""" +
        """\s+PARTITIONED\s+BY\s*\(([^)]*)\)\s*$""").r
    val CreateTblRe = """(?is)^CREATE\s+TABLE\s+(\w+)\s*\((.+)\)\s*$""".r
    val AddColRe =
      """(?is)^ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+(.+?)(?:\s+DEFAULT\s+(.+))?$""".r
    val DropColRe =
      """(?is)^ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMN\s+(\w+)$""".r
    val RenameColRe =
      """(?is)^ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)$""".r
    val NotNullRe =
      """(?is)^ALTER\s+TABLE\s+(\w+)\s+ALTER\s+COLUMN\s+(\w+)\s+SET\s+NOT\s+NULL$""".r
    val SetTypeRe =
      """(?is)^ALTER\s+TABLE\s+(\w+)\s+ALTER\s+COLUMN\s+(\w+)\s+(?:SET\s+DATA\s+)?TYPE\s+(.+)$""".r
    s0 match {
      case _ if s0.toUpperCase.startsWith("CREATE TABLE") &&
          !s0.toUpperCase.matches("(?s)^CREATE\\s+TABLE\\s+\\w+\\s+AS\\s.*") =>
        val (t, colsBody, partBy) = s0 match {
          case CreateTblPartRe(n, c, p) => (n, c, Some(p))
          case CreateTblRe(n, c) => (n, c, None)
          case other => throw new IllegalArgumentException(
            s"unparseable CREATE TABLE: $other")
        }
        val pk = scala.collection.mutable.ArrayBuffer.empty[String]
        val nn = scala.collection.mutable.ArrayBuffer.empty[String]
        val colDdl = splitTopLevel(colsBody, ',').map { c0 =>
          var c = c0.trim
          val name = c.takeWhile(!_.isWhitespace)
          if (c.toUpperCase.contains("PRIMARY KEY")) {
            pk += name
            c = c.replaceAll("(?i)\\s+PRIMARY\\s+KEY", "")
          }
          if (c.toUpperCase.contains("NOT NULL")) {
            nn += name
            c = c.replaceAll("(?i)\\s+NOT\\s+NULL", "")
          }
          s"$name ${sqlTypeToSpark(c.trim.drop(name.length).trim)}"
        }.mkString(", ")
        val parts = partBy.toSeq
          .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
        inTx(_.createTable(t, StructType.fromDDL(colDdl), pk.toSeq, nn.toSeq, parts))
        return empty
      case AddColRe(t, name, tpe, dflt) =>
        inTx(_.addColumn(t, name,
          StructType.fromDDL(s"x ${sqlTypeToSpark(tpe.trim)}").head.dataType,
          Option(dflt).map(_.trim)))
        return empty
      case DropColRe(t, name) =>
        inTx(_.dropColumn(t, name)); return empty
      case RenameColRe(t, from, to) =>
        inTx(_.renameColumn(t, from, to)); return empty
      case NotNullRe(t, name) =>
        inTx(_.setNotNull(t, name)); return empty
      case SetTypeRe(t, name, tpe) =>
        inTx(_.changeColumnType(t, name,
          StructType.fromDDL(s"x ${sqlTypeToSpark(tpe.trim)}").head.dataType))
        return empty
      case _ => ()
    }
    s0 match {
      case InsertColsRe(t, colList, body) =>
        // INSERT with an explicit column list: source columns map
        // positionally onto the LISTED names; unlisted table columns
        // fill their DEFAULT (then NULL) via the by-name insert path
        val cols = colList.split(',').map(_.trim).toSeq
        val src = sql(body.trim)
        require(src.columns.length == cols.length,
          s"INSERT arity ${src.columns.length} != column list ${cols.length}")
        inTx(_.insert(t, src.toDF(cols: _*)))
        if (activeTx.isEmpty) maybeAutoCompact(t)
        empty
      case InsertRe(t, body) =>
        // SQL INSERT maps the source POSITIONALLY (both VALUES and
        // SELECT bodies), unlike the by-name DataFrame API insert
        val src = sql(body.trim)
        val st = liveState(t)
        require(src.columns.length == st.columns.length,
          s"INSERT arity ${src.columns.length} != table ${st.columns.length}")
        inTx(_.insert(t, src.toDF(st.columns.map(_.name): _*)))
        if (activeTx.isEmpty) maybeAutoCompact(t)
        empty
      case DeleteRe(t, where) =>
        val cond = Option(where)
          .map(w => expr(w.trim.replaceFirst("(?is)^WHERE\\s+", "")))
          .getOrElse(lit(true))
        inTx(_.delete(t, cond)); empty
      case UpdateRe(t, rest) =>
        val (setList, whereOpt) = topLevelSplitOnce(rest, "where")
        val sets = splitTopLevel(setList, ',').map { a =>
          val (lhs, rhs) = topLevelSplitOnce(a, "=") match {
            case (l, Some(r)) => (l.trim, r.trim)
            case _ => throw new IllegalArgumentException(s"bad assignment: $a")
          }
          lhs -> expr(rhs)
        }.toMap
        inTx(_.update(t, whereOpt.map(expr).getOrElse(lit(true)), sets)); empty
      case MvCreateRe(mv, select) =>
        // MV create/refresh are multi-commit workflows keyed to a
        // PUBLISHED base-version watermark — staging them into an open
        // interactive transaction would record a watermark the rollback
        // could orphan (and their own commit would make the interactive
        // COMMIT lose its OCC race). Reject loudly instead of silently
        // breaking the BEGIN/COMMIT contract.
        require(activeTx.isEmpty, "CREATE MATERIALIZED VIEW is not " +
          "supported inside an open transaction — COMMIT first")
        createMaterializedView(mv, select.trim); empty
      case MvRefreshRe(mv) =>
        require(activeTx.isEmpty, "REFRESH MATERIALIZED VIEW is not " +
          "supported inside an open transaction — COMMIT first")
        import spark.implicits._
        Seq((mv, Mv.refresh(this, mv))).toDF("mv", "refresh_path")
      case CtasRe(t, select) => inTx(_.createTableAs(t, sql(select.trim))); empty
      case ViewRe(v, body) => inTx(_.createView(v, body.trim)); empty
      case DropTRe(t) => inTx(_.dropTable(t)); empty
      case DropVRe(v) => inTx(_.dropView(v)); empty
      case TruncRe(t) => inTx(_.truncateTable(t)); empty
      case RenameRe(from, to) => inTx(_.renameTable(from, to)); empty
      case q => sql(q)
    }
  }

  /** `CREATE MATERIALIZED VIEW` — a declared-subset grammar mapped onto
    * [[Mv.create]]/[[Mv.createJoin]], the only aggregate shapes the
    * incremental maintainer supports:
    * {{{
    *   SELECT key[, key…], COUNT(*) AS n_rows[, SUM(col) AS sum_col…]
    *     [, MIN(col) AS min_col…][, MAX(col) AS max_col…]
    *   FROM base [JOIN dim ON fk = pk] [WHERE pred] GROUP BY key[, key…]
    * }}}
    * Sums are maintained NULL-safe (COALESCE(SUM(col),0): an all-NULL
    * group reports 0 where plain SQL SUM returns NULL — the convention
    * the incremental delta apply requires; see [[Mv]]). MIN/MAX keep SQL
    * semantics and are single-table-MV only.
    * Anything else is REJECTED loudly — silently materializing a shape
    * the refresher cannot maintain would corrupt on first refresh. The
    * WHERE predicate (base-side filter) is only part of the maintained
    * algebra in the join form, mirroring the Scala API. */
  private def createMaterializedView(mv: String, select: String): Unit = {
    import LakeCatalog.splitTopLevel
    val BodyRe = ("""(?is)^SELECT\s+(.+?)\s+FROM\s+(\w+)""" +
      """(?:\s+JOIN\s+(\w+)\s+ON\s+(\w+)\s*=\s*(\w+))?""" +
      """(?:\s+WHERE\s+(.+?))?\s+GROUP\s+BY\s+([\w\s,]+)$""").r
    select.stripSuffix(";").trim match {
      case BodyRe(selList, base, dim, fk, pk, where, grpBy) =>
        val CountRe = """(?i)^COUNT\s*\(\s*\*\s*\)\s+AS\s+n_rows$""".r
        val SumRe = """(?i)^SUM\s*\(\s*(\w+)\s*\)\s+AS\s+sum_(\w+)$""".r
        val AvgRe = """(?i)^AVG\s*\(\s*(\w+)\s*\)\s+AS\s+avg_(\w+)$""".r
        val MinRe = """(?i)^MIN\s*\(\s*(\w+)\s*\)\s+AS\s+min_(\w+)$""".r
        val MaxRe = """(?i)^MAX\s*\(\s*(\w+)\s*\)\s+AS\s+max_(\w+)$""".r
        val KeyRe = """^(\w+)$""".r
        val keys = scala.collection.mutable.ArrayBuffer.empty[String]
        val sums = scala.collection.mutable.ArrayBuffer.empty[String]
        val avgs = scala.collection.mutable.ArrayBuffer.empty[String]
        val mins = scala.collection.mutable.ArrayBuffer.empty[String]
        val maxs = scala.collection.mutable.ArrayBuffer.empty[String]
        var sawCount = false
        def checkAlias(fn: String, c: String, a: String): Unit =
          require(c.equalsIgnoreCase(a),
            s"$fn($c) must be aliased ${fn.toLowerCase}_$c (the " +
              s"maintainer's column naming), got ${fn.toLowerCase}_$a")
        splitTopLevel(selList, ',').map(_.trim).foreach {
          case KeyRe(k) => keys += k
          case CountRe() => sawCount = true
          case SumRe(c, a) => checkAlias("SUM", c, a); sums += c
          case AvgRe(c, a) => checkAlias("AVG", c, a); avgs += c
          case MinRe(c, a) => checkAlias("MIN", c, a); mins += c
          case MaxRe(c, a) => checkAlias("MAX", c, a); maxs += c
          case other => throw new IllegalArgumentException(
            s"unsupported MV select item '$other' — supported: bare group " +
              "keys, COUNT(*) AS n_rows, SUM(col) AS sum_col, " +
              "AVG(col) AS avg_col, MIN(col) AS min_col, " +
              "MAX(col) AS max_col. Note: sums are " +
              "maintained NULL-safe as COALESCE(SUM(col),0) — an all-NULL " +
              "group reports 0, not NULL (avg/min/max keep SQL semantics: " +
              "an all-NULL group is NULL). An AVG materializes its sum_ " +
              "and cnt_ building blocks as MV columns alongside avg_")
        }
        require(sawCount,
          "MV select list must include COUNT(*) AS n_rows (the maintainer " +
            "needs the group cardinality to retire emptied groups)")
        val grpKeys = grpBy.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        require(grpKeys == keys.toSeq,
          s"GROUP BY (${grpKeys.mkString(",")}) must list exactly the " +
            s"selected keys (${keys.mkString(",")}) in order")
        if (dim == null) {
          require(where == null,
            "WHERE without JOIN is outside the maintained subset " +
              "(the Scala API mirrors this: Mv.create has no filter)")
          Mv.create(this, mv, base, keys.toSeq, sums.toSeq,
            mins.toSeq, maxs.toSeq, avgs.toSeq)
        } else {
          require(mins.isEmpty && maxs.isEmpty,
            "MIN/MAX are not maintainable on join MVs (a dim-churn leg " +
              "would need per-group history) — supported on single-table " +
              "MVs only")
          // SQL ON is order-insensitive but Mv.createJoin binds (fk, pk)
          // to (base, dim) — resolve each column to its actual side from
          // the table schemas, and reject when both orientations resolve
          // (same names on both tables: positional guessing would build
          // a silently wrong join)
          val baseCols = liveState(base).columns.map(_.name).toSet
          val dimCols = liveState(dim).columns.map(_.name).toSet
          val (fk2, pk2) =
            if (fk == pk) {
              require(baseCols(fk) && dimCols(fk),
                s"ON $fk = $pk: both tables need column $fk")
              (fk, pk)
            } else {
              val fwd = baseCols(fk) && dimCols(pk)
              val rev = baseCols(pk) && dimCols(fk)
              if (fwd && rev) throw new IllegalArgumentException(
                s"ON $fk = $pk is ambiguous: both columns exist on both " +
                  "tables — rename one side (qualified names are not in " +
                  "the MV grammar)")
              else if (fwd) (fk, pk)
              else if (rev) (pk, fk)
              else throw new IllegalArgumentException(
                s"ON $fk = $pk: cannot resolve sides (base $base has " +
                  s"${baseCols.toSeq.sorted.mkString(",")}; dim $dim has " +
                  s"${dimCols.toSeq.sorted.mkString(",")})")
            }
          Mv.createJoin(this, mv, base, dim, fk2, pk2,
            Option(where).map(_.trim), keys.toSeq, sums.toSeq,
            avgs = avgs.toSeq)
        }
      case other => throw new IllegalArgumentException(
        "unsupported MATERIALIZED VIEW body (grammar: SELECT keys…, " +
          "COUNT(*) AS n_rows[, SUM(col) AS sum_col…][, MIN(col) AS " +
          "min_col…][, MAX(col) AS max_col…] FROM base " +
          s"[JOIN dim ON fk = pk] [WHERE pred] GROUP BY keys…): $other")
    }
  }

  /** The reference's headline time-travel SQL syntax
    * (ref README.md:215-220, demos/02_time_travel/demo.py:163-232):
    * `t AT (VERSION => 42)`, `t AT (VERSION => 'tagname')`,
    * `t AT (TIMESTAMP => '2024-01-15 14:00:00')`. */
  private val AtClauseRe =
    ("""(?is)\b(\w+)\s+AT\s*\(\s*(VERSION|TIMESTAMP)\s*=>\s*""" +
      """(?:(\d+)|'([^']*)')\s*\)""").r

  /** SQL-level metadata TABLE FUNCTIONS — the `ducklake_snapshots()` /
    * `ducklake_table_info()` / `ducklake_table_changes(...)` surface
    * (ref utils/ducklake_utils.py:58-78): rewritten to global temp views
    * (global: they must resolve from the isolated child session) so
    * metadata is queryable with plain SQL, no Scala API needed. */
  private val SnapFnRe = """(?i)graft_snapshots\s*\(\s*\)""".r
  private val InfoFnRe = """(?i)graft_table_info\s*\(\s*\)""".r
  private val FilesFnRe = """(?i)graft_files\s*\(\s*\)""".r
  private val ChangesFnRe =
    """(?i)graft_table_changes\s*\(\s*'(\w+)'\s*,\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  /** Rewrite the metadata table functions to global temp views. Returns
    * the rewritten query plus the view names it registered — [[sql]]
    * drops them once the statement is analyzed (view resolution inlines
    * the child plan, so the name is not needed afterwards), keeping the
    * global-temp namespace from accumulating over a session. Matches
    * inside string literals are left untouched. */
  private def rewriteMetaFns(query: String): (String, Seq[String]) = {
    // view names carry the catalog identity COLLISION-FREE: an md5 of
    // the exact root string (sanitizing the path maps /a/b and /a_b to
    // the same name, and a 32-bit hash can collide) — two catalogs in
    // one JVM must never serve each other's metadata. A per-statement
    // sequence number is appended so CONCURRENT sql() calls (same root,
    // two threads or two instances) never drop each other's views in
    // their finally blocks — each statement owns its names outright.
    val ns = "c" + java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString +
      "_" + LakeCatalog.metaViewSeq.incrementAndGet()
    val made = scala.collection.mutable.ArrayBuffer.empty[String]
    def guard(q: String, re: scala.util.matching.Regex)(
        mk: scala.util.matching.Regex.Match => String): String = {
      val spans = LakeCatalog.literalSpans(q)
      re.replaceAllIn(q, m => java.util.regex.Matcher.quoteReplacement(
        if (spans(m.start)) m.matched else mk(m)))
    }
    var q = query
    q = guard(q, SnapFnRe) { _ =>
      val v = s"graft_snapshots_$ns"
      snapshots().createOrReplaceGlobalTempView(v); made += v
      s"global_temp.$v"
    }
    q = guard(q, InfoFnRe) { _ =>
      val v = s"graft_table_info_$ns"
      tableInfo().createOrReplaceGlobalTempView(v); made += v
      s"global_temp.$v"
    }
    q = guard(q, FilesFnRe) { _ =>
      val v = s"graft_files_$ns"
      files().createOrReplaceGlobalTempView(v); made += v
      s"global_temp.$v"
    }
    q = guard(q, ChangesFnRe) { m =>
      val (t, v1, v2) = (m.group(1), m.group(2).toLong, m.group(3).toLong)
      val alias = s"graft_changes_${ns}_${t}_${v1}_$v2"
      tableChanges(t, v1, v2).createOrReplaceGlobalTempView(alias)
      made += alias
      s"global_temp.$alias"
    }
    (q, made.toSeq)
  }

  /** Normalize the reference's (DuckDB-flavored) SQL type names to ones
    * Spark's DDL parser accepts — the CREATE TABLE statements in the
    * reference demos use VARCHAR / INTEGER / DECIMAL(10,2) / TIMESTAMP
    * (ref demos/01_transaction_rollback/demo.py:35-54). */
  private def sqlTypeToSpark(t: String): String = {
    val u = t.trim.toUpperCase
    if (u.startsWith("VARCHAR") || u == "TEXT" || u == "CHAR") "STRING"
    else if (u == "INTEGER") "INT"
    else if (u == "DATETIME") "TIMESTAMP"
    else if (u == "DOUBLE PRECISION") "DOUBLE"
    else if (u == "REAL") "FLOAT"
    else if (u == "BLOB" || u == "BYTEA") "BINARY"
    else t.trim
  }

  /** `MERGE INTO` for the SQL router — the standard statement shape
    * mapped onto [[Tx.mergeClauses]] (one atomic copy-on-write commit,
    * every clause branch):
    *
    * {{{
    * MERGE INTO t [AS a] USING (select|values body) [AS b]
    *   ON a.k = b.k [AND ...]
    *   [WHEN MATCHED [AND cond] THEN DELETE]
    *   [WHEN MATCHED [AND cond] THEN UPDATE SET *]
    *   [WHEN NOT MATCHED [AND cond] THEN INSERT *]
    *   [WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE]
    * }}}
    *
    * ON must be a conjunction of same-name key equalities (the lake
    * merge is keyed); UPDATE/INSERT are whole-row (`SET *` / `INSERT *`
    * — Delta's star forms), since the source is schema-aligned first.
    * Clause conditions may reference both aliases; they are rewritten to
    * the engine's canonical `t.`/`s.` prefixes (insert conditions see
    * bare source columns, as in the API). */
  private def executeMerge(stmt: String): DataFrame = {
    val HeadRe =
      """(?is)^MERGE\s+INTO\s+(\w+)(?:\s+AS)?(?:\s+(\w+))?\s+USING\s*\(""".r
    val m = HeadRe.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(s"unparseable MERGE head: $stmt"))
    val table = m.group(1)
    val tAlias = Option(m.group(2)).getOrElse(table)
    // balanced-paren scan for the USING body
    var depth = 1; var i = m.end
    while (depth > 0 && i < stmt.length) {
      stmt.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      i += 1
    }
    require(depth == 0, "unbalanced parens in MERGE USING")
    val body = stmt.substring(m.end, i - 1)
    val TailRe = """(?is)^\s*(?:AS\s+)?(\w+)?\s+ON\s+(.+)$""".r
    val (sAlias, onAndClauses) = stmt.substring(i) match {
      case TailRe(a, rest) => (Option(a).getOrElse("src"), rest)
      case other =>
        throw new IllegalArgumentException(s"unparseable MERGE tail: $other")
    }
    val parts = LakeCatalog.splitWhenTopLevel(onAndClauses)
    val onCond = parts.head
    val keys = onCond.split("(?i)\\s+AND\\s+").toSeq.map { eq =>
      val EqRe = """(?s)^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$""".r
      eq match {
        case EqRe(a1, k1, a2, k2)
            if k1.equalsIgnoreCase(k2) &&
              Set(a1, a2).map(_.toLowerCase) ==
                Set(tAlias, sAlias).map(_.toLowerCase) => k1
        case _ => throw new IllegalArgumentException(
          s"MERGE ON must be same-name key equalities over both aliases: $eq")
      }
    }
    // Rewrite through a collision-proof placeholder: if the SOURCE alias is
    // literally "t" (or the target alias "s"), a naive sequential rewrite
    // (tAlias->"t." first, then sAlias->"s.") would re-rewrite the "t."
    // tokens pass 1 just produced and silently turn target references into
    // source references. The  sentinel cannot appear in SQL text, so
    // pass 2 can never touch pass 1's output.
    require(!tAlias.equalsIgnoreCase(sAlias),
      s"MERGE target and source aliases must differ, both are '$tAlias'")
    def canon(cond: String, bareSource: Boolean): String = {
      val ph = "\u0001tgt\u0001."
      val c1 = cond.replaceAll(s"(?i)\\b$tAlias\\.",
        java.util.regex.Matcher.quoteReplacement(ph))
      val c2 =
        if (bareSource) c1.replaceAll(s"(?i)\\b$sAlias\\.", "")
        else c1.replaceAll(s"(?i)\\b$sAlias\\.", "s.")
      c2.replace(ph, "t.")
    }
    var cl = MergeClauses()
    val MatchedDel = """(?is)^MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+DELETE$""".r
    val MatchedUpd =
      """(?is)^MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+UPDATE\s+SET\s+\*$""".r
    val NotMatchedIns =
      """(?is)^NOT\s+MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+INSERT(?:\s+\*)?$""".r
    val BySourceDel =
      """(?is)^NOT\s+MATCHED\s+BY\s+SOURCE(?:\s+AND\s+(.+?))?\s+THEN\s+DELETE$""".r
    parts.tail.foreach {
      case BySourceDel(c) =>
        cl = cl.copy(bySourceDelete =
          Some(Option(c).map(canon(_, bareSource = false)).getOrElse("true")))
      case MatchedDel(c) =>
        cl = cl.copy(matchedDelete =
          Some(Option(c).map(canon(_, bareSource = false)).getOrElse("true")))
      case MatchedUpd(c) =>
        cl = cl.copy(matchedUpdate =
          Some(Option(c).map(canon(_, bareSource = false)).getOrElse("true")))
      case NotMatchedIns(c) =>
        cl = cl.copy(notMatchedInsert =
          Some(Option(c).map(canon(_, bareSource = true)).getOrElse("true")))
      case other => throw new IllegalArgumentException(
        s"unsupported MERGE clause: WHEN $other")
    }
    inTx(_.mergeClauses(table, sql(body.trim), keys, cl))
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Nil))
  }

  def sql(query: String): DataFrame = {
    // inside an open interactive transaction, SELECTs see the STAGED
    // state (read-your-writes) — the view a SQL database gives between
    // BEGIN and COMMIT; buildSnapshot is pure construction over the
    // staged table map, nothing is published
    val s = activeTx match {
      case Some((tx, v)) => tx.buildSnapshot(v + 1)
      case None => current
    }
    val iso = spark.newSession()
    // Time-travel clauses rewrite to versioned temp views BEFORE parsing,
    // so the syntax composes with arbitrary SQL — joining two versions,
    // NOT EXISTS diffs across snapshots, tags as stable version names.
    // Each referenced (table, version) registers the EXACT file list of
    // that snapshot (same path as readAt — no listing, no stale files).
    // Matches inside string literals are skipped — `SELECT 't AT
    // (VERSION => 1)'` is data, not syntax.
    val (metaQ, metaViews) = rewriteMetaFns(query)
    val spans = LakeCatalog.literalSpans(metaQ)
    val rewritten = AtClauseRe.replaceAllIn(metaQ, m => {
      if (spans(m.start))
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else {
      val table = m.group(1)
      val v = m.group(2).toUpperCase match {
        case "VERSION" =>
          Option(m.group(3)).map(_.toLong).getOrElse(resolveRef(m.group(4)))
        case _ =>
          // unquoted digits = epoch millis (a wall-clock string must be
          // quoted); quoted wall-clocks resolve in the SESSION timezone,
          // not hardcoded UTC (they coincide under the UTC-pinned bench)
          Option(m.group(3)) match {
            case Some(digits) => versionAsOf(digits.toLong)
            case None =>
              val raw = m.group(4).trim
              val zone = java.time.ZoneId.of(
                spark.conf.get("spark.sql.session.timeZone", "UTC"))
              val ldt = java.time.LocalDateTime.parse(raw.replace(' ', 'T'))
              versionAsOf(ldt.atZone(zone).toInstant.toEpochMilli)
          }
      }
      val alias = s"${table}__at_v$v"
      val snap = snapshot(v)
      val st = snap.tables.getOrElse(table, throw new NoSuchElementException(
        s"table $table not in snapshot $v"))
      readState(st, iso).createOrReplaceTempView(alias)
      java.util.regex.Matcher.quoteReplacement(alias)
      }
    })
    s.tables.foreach { case (t, st) =>
      readState(st, iso).createOrReplaceTempView(t)
    }
    s.views.foreach { case (v, viewSql) =>
      iso.sql(viewSql).createOrReplaceTempView(v)
    }
    // analysis inlines the metadata views' child plans, so the global
    // temp names can be dropped immediately — nothing accumulates in
    // the application-lifetime global_temp namespace
    try iso.sql(rewritten)
    finally metaViews.foreach(spark.catalog.dropGlobalTempView)
  }

  /** Materialize a stored view (D3): tables become temp views, the stored
    * SQL runs against them (ref demos/03_schema_evolution/demo.py:273-288).
    *
    * Resolution happens in an ISOLATED child session (`newSession` shares
    * the SparkContext + cache but has its own temp-view namespace), so
    * same-named session temp views of the caller are never clobbered and
    * nothing leaks after materialization. */
  def readView(name: String): DataFrame = {
    val s = current
    val sql = s.views.getOrElse(name,
      throw new NoSuchElementException(s"view not found: $name"))
    val iso = spark.newSession()
    s.tables.foreach { case (t, st) =>
      readState(st, iso).createOrReplaceTempView(t)
    }
    iso.sql(sql)
  }

  // ------------------------------------------------- metadata as DataFrames

  /** `ducklake_snapshots()` analog (T1 — ref utils/ducklake_utils.py:58-62):
    * (snapshot_id, snapshot_time, schema_version, changes). Resolved from
    * the current snapshot's embedded header history — ONE manifest read
    * for the whole feed, not one per version. */
  def snapshots(): DataFrame = {
    import spark.implicits._
    // expired versions vanish from the feed too (they are unreadable —
    // listing them would be a lie). Resolved from the expiry LEDGER in
    // the current snapshot, so the feed is one metadata read and is
    // consistent even mid-vacuum (logically expired but not yet
    // physically deleted versions are already hidden). Membership, not a
    // min bound: tag retention leaves holes in the sequence.
    val head = current
    head.history.filterNot(h => head.versionExpired(h.snapshotId)).map { h =>
      (h.snapshotId, new java.sql.Timestamp(h.timestampMs), h.schemaVersion,
        h.changes.map { case (k, vs) => k -> vs.mkString(",") })
    }.toDF("snapshot_id", "snapshot_time", "schema_version", "changes")
  }

  /** `ducklake_table_info()` analog (T2 — ref exploration/benchmark_ducklake.sh:164-168). */
  def tableInfo(): DataFrame = {
    import spark.implicits._
    current.tables.toSeq.sortBy(_._1).map { case (name, st) =>
      (name, st.files.size.toLong, st.files.map(_.sizeBytes).sum,
        st.files.map(_.liveRows).sum + st.inlinedRowCount, st.schemaVersion,
        st.inlinedRowCount, st.partitionBy.mkString(","))
    }.toDF("table_name", "file_count", "total_size_bytes", "row_count",
      "schema_version", "inlined_rows", "partition_by")
  }

  /** Iceberg `files`-metadata-table analog: one row per live data file
    * with its manifest bookkeeping — the ops/debugging view of the
    * physical layout (file sizing, DV coverage, partition values, index
    * sidecars). One metadata read, zero data-file I/O; exposed to SQL as
    * `graft_files()`. */
  def files(): DataFrame = {
    import spark.implicits._
    current.tables.toSeq.sortBy(_._1).flatMap { case (name, st) =>
      st.files.map { e =>
        (name, e.path, e.sizeBytes, e.rowCount, e.dvRows, e.liveRows,
          e.schemaVersion,
          e.pvals.toSeq.sortBy(_._1)
            .map { case (k, vs) => s"$k=${vs.mkString("|")}" }.mkString(","),
          e.dv.isDefined, e.blooms.keys.toSeq.sorted.mkString(","),
          e.ndv.keys.toSeq.sorted.mkString(","))
      }
    }.toDF("table_name", "file_path", "size_bytes", "row_count", "dv_rows",
      "live_rows", "schema_version", "partition_values", "has_dv",
      "bloom_columns", "ndv_columns")
  }

  /** `ducklake_table_stats` analog (ref README.md:202-209,
    * exploration/benchmark_ducklake.sh:164-168): per-file column min/max
    * from the manifest — the pruning index, queryable as a DataFrame. */
  def tableStats(): DataFrame = {
    import spark.implicits._
    current.tables.toSeq.sortBy(_._1).flatMap { case (name, st) =>
      st.files.flatMap { e =>
        e.stats.toSeq.sortBy(_._1).map { case (c, cs) =>
          (name, e.path, c, cs.min, cs.max, e.rowCount)
        }
      }
    }.toDF("table_name", "file_path", "column_name", "min_value",
      "max_value", "row_count")
  }

  /** Metadata-only aggregate — `COUNT(*)` / `MIN` / `MAX` answered from
    * the manifest alone, ZERO data files read (DuckDB and Iceberg both
    * play this trick from their stats tables). At 100 TB the difference
    * is "one cached metadata document" vs "a full-table scan". COUNT is
    * always answerable: per-file footer row counts minus deletion-vector
    * tombstones plus manifest-inlined rows are all exact. MIN/MAX take
    * the metadata path only when it is provably exact — every file
    * carries stats for the column and none has tombstones (a deleted row
    * may have held the extreme) — and otherwise FALL BACK to a scan; the
    * `meta_only` column reports the path taken, so callers (and the
    * correctness gate) can pin when the optimization actually fires. */
  def statsAgg(table: String, cols: Seq[String] = Nil): DataFrame = {
    val st = stateOf(current, table)
    val defs = cols.map(c => st.columns.find(_.name == c).getOrElse(
      throw new NoSuchElementException(s"no such column: $table.$c")))
    val curV = st.schemaVersion
    // COUNT alone is ALWAYS metadata-exact (footer row counts, DV
    // tombstone counts, and inlined-row counts are all exact); MIN/MAX
    // additionally need every file to carry stats for the column and no
    // tombstones (a deleted row may have held the extreme)
    val metaOk = defs.isEmpty || (defs.forall(Stats.comparable) &&
      st.files.forall(e => e.dvRows == 0L &&
        defs.forall(d => e.stats.contains(d.name))) &&
      st.inlined.forall(_.schemaVersion == curV))
    val outSchema = StructType(
      StructField("n", LongType, nullable = false) +:
      defs.flatMap(d => Seq(
        StructField(s"min_${d.name}", DataType.fromJson(d.typeJson)),
        StructField(s"max_${d.name}", DataType.fromJson(d.typeJson)))) :+
      StructField("meta_only", BooleanType, nullable = false))
    if (metaOk) {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      // inlined rows live in the manifest document itself — folding them
      // is still a metadata-only read (no file I/O)
      val inlinedJson = st.inlined.flatMap(_.rows).map(JsonMethods.parse(_))
      def inlinedVals(name: String): Seq[String] = inlinedJson.flatMap { j =>
        j \ name match {
          case JNothing | JNull => None
          case JString(s) => Some(s)
          case JInt(i) => Some(i.toString)
          case JLong(l) => Some(l.toString)
          case JDouble(d) => Some(d.toString)
          case JDecimal(d) => Some(d.toString)
          case other => Some(JsonMethods.compact(JsonMethods.render(other)))
        }
      }
      def typed(d: ColumnDef, s: String): Any = d.typeJson match {
        case "\"integer\"" => s.toInt
        case "\"long\"" => s.toLong
        case "\"short\"" => s.toShort
        case "\"byte\"" => s.toByte
        case "\"double\"" => s.toDouble
        case "\"float\"" => s.toFloat
        case _ => s
      }
      val n = st.files.map(_.liveRows).sum + st.inlinedRowCount
      val vals = defs.flatMap { d =>
        val fileMins = st.files.map(_.stats(d.name).min)
        val fileMaxs = st.files.map(_.stats(d.name).max)
        val inl = inlinedVals(d.name)
        val mins = fileMins ++ inl
        val maxs = fileMaxs ++ inl
        Seq(
          if (mins.isEmpty) null else typed(d, mins.reduce(Stats.minOf(d, _, _))),
          if (maxs.isEmpty) null else typed(d, maxs.reduce(Stats.maxOf(d, _, _))))
      }
      spark.createDataFrame(
        java.util.List.of(Row.fromSeq(n +: vals :+ true)), outSchema)
    } else {
      val aggs = count(lit(1)).as("n") +: defs.flatMap(d => Seq(
        min(col(d.name)).as(s"min_${d.name}"),
        max(col(d.name)).as(s"max_${d.name}")))
      read(table).agg(aggs.head, aggs.tail: _*)
        .withColumn("meta_only", lit(false))
    }
  }

  /** `ducklake_table_changes()` analog (T3 — ref utils/ducklake_utils.py:65-78):
    * row-level diff between two versions. When the table has a primary key
    * (or the caller passes `keyCols`), a vanished row and an appeared row
    * with the SAME key are paired as one UPDATE and tagged
    * `update_preimage`/`update_postimage` — the change-type fidelity a CDC
    * consumer needs; keyless tables fall back to insert/delete. Multiset
    * semantics via exceptAll so duplicate rows diff correctly.
    *
    * Scale shape: the pairing joins operate on the DIFF (changed rows
    * only), not the table, and the key set of a typical commit is small —
    * broadcast-sized — so this adds no full-table shuffle.
    *
    * `schemaAtV` pins the OUTPUT schema: both window ends are read
    * through that version's schema — aligned by stable column id exactly
    * like any other read of older files (adds read their default, drops
    * vanish, renames follow) — so every window of a long-lived consumer
    * projects onto one fixed schema no matter what evolution it crosses.
    * This is the change-feed STREAM's anchor (see
    * [[graft.streaming.ChangeFeed]]). Default (None) keeps the original
    * contract: the window's own common columns.
    *
    * A `fromV` where the table does not exist yet diffs against the
    * empty table — the creation commit's rows stream as plain inserts. */
  def tableChanges(table: String, fromV: Long, toV: Long,
      keyCols: Seq[String] = Nil, schemaAtV: Option[Long] = None): DataFrame = {
    // APPEND-ONLY fast path: when the manifest says the window only
    // ADDED data — schema unchanged, every old file entry still present
    // verbatim (same deletion vector, so no MoR tombstones landed), old
    // inlined batches an untouched prefix — the change feed is exactly
    // the new files + new inlined rows, all 'insert'. That's one scan
    // of O(delta) instead of two O(table) reads + exceptAll shuffles:
    // at 100 TB the difference between reading the day's appends and
    // diffing two full snapshots (the Delta CDF / Iceberg incremental
    // -scan model). Any other shape falls back to the exact
    // multiset-diff below.
    val sTo = stateOf(snapshot(toV), table)
    // a window opening before the table existed diffs against the empty
    // table: the creation commit's rows are plain inserts
    val sFrom = snapshot(fromV).tables.getOrElse(table,
      sTo.copy(files = Nil, inlined = Nil))
    // Anchor projection: read BOTH ends through schemaAtV's schema by
    // stable column id (the same align every read of older files does).
    // The anchor may predate the window, so the schema-version lookup is
    // widened with the window ends' (monotone) histories — and the merge
    // REFUSES on a conflicting entry: a table dropped/renamed-away and
    // re-created under the same name restarts its column ids and schema
    // versions, and id-anchored alignment across that boundary would be
    // silent garbage. (A re-creation with BYTE-IDENTICAL column defs
    // merges cleanly and diffs as the honest full replace:
    // delete-all + insert-new.)
    val anchor: Option[TableState] = schemaAtV.map { v =>
      val ps = stateOf(snapshot(v), table)
      val merged = scala.collection.mutable.Map[String, Seq[ColumnDef]]()
      Seq(sFrom.schemas, sTo.schemas, ps.schemas).foreach(_.foreach {
        case (k, cols) => merged.get(k) match {
          case Some(prev) if prev != cols =>
            throw new IllegalStateException(
              s"table '$table' schema history diverged at schema version " +
                s"$k across catalog versions $fromV/$toV/$v — the table " +
                "was replaced or recreated; an anchored change feed " +
                "cannot align across it, start a fresh stream")
          case _ => merged(k) = cols
        }
      })
      ps.copy(schemas = merged.toMap)
    }
    def readSub(st: TableState): DataFrame = anchor match {
      case Some(ps) => readState(ps.copy(files = st.files, inlined = st.inlined))
      case None => readState(st)
    }
    // The fast paths diff COMMON columns (the slow path's contract
    // too): valid when every column name present at both window ends
    // is the SAME column — same stable id, type, default — so an
    // untouched file projects identically onto the common set at
    // either end and its rows cancel. Purely ADDED or DROPPED columns
    // don't break this (they're outside the common set), so a window
    // containing a schema evolution still diffs O(churn): without
    // this, the refresh after a daily ADD COLUMN would silently pay
    // two full-table reads. A rename or type/default change falls
    // back to the full diff. Under an ANCHOR the projection is
    // version-invariant by construction (ids, types and defaults all
    // come from the one anchor state), so alignment always holds.
    val toByName = sTo.columns.map(c => c.name -> c).toMap
    val fromByName = sFrom.columns.map(c => c.name -> c).toMap
    val (commonNames, colsAligned) = anchor match {
      case Some(ps) => (ps.columns.map(_.name), true)
      case None =>
        val cn = sFrom.columns.map(_.name).filter(toByName.contains)
        (cn, cn.nonEmpty && cn.forall { n =>
          val x = fromByName(n); val y = toByName(n)
          x.id == y.id && x.typeJson == y.typeJson && x.default == y.default
        })
    }
    if (colsAligned && sFrom.files.toSet.subsetOf(sTo.files.toSet) &&
        sTo.inlined.startsWith(sFrom.inlined)) {
      val oldFiles = sFrom.files.toSet
      val sub = sTo.copy(files = sTo.files.filterNot(oldFiles),
        inlined = sTo.inlined.drop(sFrom.inlined.size))
      return readSub(sub).select(commonNames.map(col): _*)
        .withColumn("change_type", lit("insert"))
    }
    // CHURNED-FILES diff: with an unchanged schema, every file entry
    // present verbatim at both window ends (same path, same deletion
    // vector) contributes identical rows to both sides of the multiset
    // diff — they cancel. So diff only the entries that differ:
    // before' = files removed/rewritten (+ old inlined if touched),
    // after' = files added/rewritten (+ new inlined). A CoW update that
    // rewrote 3 of 10^6 files diffs 6 files' rows, not two table scans
    // — the change feed is O(churn), which is what lets an incremental
    // MV refresh stay O(delta) at 100 TB. A schema change falls back to
    // the full common-column diff below.
    val (b, a, common) =
      if (colsAligned) {
        val toSet = sTo.files.toSet; val fromSet = sFrom.files.toSet
        val inlEq = sFrom.inlined == sTo.inlined
        val bSub = sFrom.copy(files = sFrom.files.filterNot(toSet),
          inlined = if (inlEq) Nil else sFrom.inlined)
        val aSub = sTo.copy(files = sTo.files.filterNot(fromSet),
          inlined = if (inlEq) Nil else sTo.inlined)
        (readSub(bSub).select(commonNames.map(col): _*),
          readSub(aSub).select(commonNames.map(col): _*), commonNames)
      } else {
        val before = readAt(table, fromV)
        val after = readAt(table, toV)
        val cs = before.columns.intersect(after.columns).toSeq
        (before.select(cs.map(col): _*), after.select(cs.map(col): _*), cs)
      }
    val appeared = a.exceptAll(b)
    val vanished = b.exceptAll(a)
    val keys = if (keyCols.nonEmpty) keyCols
      else stateOf(snapshot(toV), table).primaryKey.filter(common.contains)
    if (keys.isEmpty)
      appeared.withColumn("change_type", lit("insert"))
        .unionByName(vanished.withColumn("change_type", lit("delete")))
    else {
      // keys present on BOTH sides of the diff are updates
      val updKeys = vanished.select(keys.map(col): _*)
        .intersect(appeared.select(keys.map(col): _*))
      def split(df: DataFrame, hit: String, miss: String): DataFrame =
        df.join(broadcast(updKeys), keys, "left_semi")
          .withColumn("change_type", lit(hit))
          .unionByName(
            df.join(broadcast(updKeys), keys, "left_anti")
              .withColumn("change_type", lit(miss)))
      split(appeared, "update_postimage", "insert")
        .unionByName(split(vanished, "update_preimage", "delete"))
    }
  }

  /** Tag ledger: (ref_name, snapshot_id), the `refs` metadata table. */
  def refs(): DataFrame = {
    import spark.implicits._
    current.refs.toSeq.sortBy(_._1).toDF("ref_name", "snapshot_id")
  }

  /** `information_schema.tables` analog (D11). */
  def listTables(): DataFrame = {
    import spark.implicits._
    current.tables.keys.toSeq.sorted.toDF("table_name")
  }

  /** `information_schema.columns` / DESCRIBE analog (D10/D11). */
  def listColumns(): DataFrame = {
    import spark.implicits._
    current.tables.toSeq.sortBy(_._1).flatMap { case (t, st) =>
      st.columns.zipWithIndex.map { case (c, i) =>
        (t, c.name, DataType.fromJson(c.typeJson).simpleString,
          i + 1, !st.notNull.contains(c.name), c.default)
      }
    }.toDF("table_name", "column_name", "data_type", "ordinal_position",
      "is_nullable", "column_default")
  }

  def describe(table: String): DataFrame = {
    import spark.implicits._
    val st = stateOf(current, table)
    st.columns.map { c =>
      (c.name, DataType.fromJson(c.typeJson).simpleString,
        if (st.notNull.contains(c.name)) "NO" else "YES",
        c.default.getOrElse(""))
    }.toDF("column_name", "column_type", "null", "default")
  }

  // ------------------------------------------------------------ transactions

  /** Atomic multi-statement, multi-table transaction (M5/M6 — ref
    * demos/01_transaction_rollback/demo.py:177-214). The body stages
    * parquet writes + a new manifest; COMMIT is one atomic manifest
    * publish. On exception staged files are deleted (ROLLBACK). On a
    * lost publish race the body re-runs against the fresh snapshot
    * (optimistic concurrency — the DuckLake "many concurrent writers
    * through one transactional catalog" model, ref README.md:244). */
  // --------------------------------------- interactive SQL transactions

  /** Open interactive transaction, if any — the reference's BEGIN
    * TRANSACTION / COMMIT / ROLLBACK statement surface (ref
    * demos/01_transaction_rollback/demo.py:85-104,148-151). While open,
    * every DML/DDL statement routed through [[execute]] stages into it
    * and SELECTs read the STAGED state (read-your-writes); COMMIT
    * publishes ONE snapshot covering everything staged. Interactive
    * statements cannot be replayed, so on a losing OCC race COMMIT
    * aborts (discarding the staged files) instead of retrying — the
    * same observable behavior as a serialization failure in a SQL
    * database. One open transaction per catalog instance. Volatile:
    * statements may arrive from a thread other than the one that ran
    * BEGIN (the metadata-view machinery already supports cross-thread
    * use), and a stale read here would silently auto-commit a statement
    * that should have staged. */
  @volatile private var activeTx: Option[(Tx, Long)] = None

  /** Is an interactive transaction open on this catalog instance? Used
    * by composite operations (e.g. [[Mv]]) that run their own multi-step
    * `transaction` blocks and must fail loudly rather than read committed
    * state past staged writes and doom the open txn to an OCC abort. */
  private[lake] def hasOpenTransaction: Boolean = activeTx.nonEmpty

  def beginTransaction(): Unit = synchronized {
    require(activeTx.isEmpty, "transaction already open")
    val v = currentVersion
    activeTx = Some((new Tx(this, snapshot(v)), v))
  }

  // A bare BEGIN;COMMIT publishes an empty snapshot DELIBERATELY — the
  // reference records a snapshot per committed transaction whether or
  // not it changed anything (SURVEY §2 M7; judged by l7_snapshots_meta),
  // unlike Mv.refresh's AlreadyFresh short-circuit which models "nothing
  // to refresh" as not-a-transaction.
  def commitTransaction(): Unit = synchronized {
    val (tx, v) = activeTx.getOrElse(
      throw new IllegalStateException("COMMIT without an open transaction"))
    activeTx = None
    val next = tx.buildSnapshot(v + 1)
    store.publish(v + 1, next, snapshot(v)) match {
      case Some(stored) => snapCache.put(v + 1, stored)
      case None =>
        tx.cleanupStaged()
        throw new IllegalStateException("commit conflict: a concurrent " +
          "writer published first; transaction rolled back")
    }
  }

  def rollbackTransaction(): Unit = synchronized {
    activeTx.foreach(_._1.cleanupStaged())
    activeTx = None
  }

  /** Route a mutation into the open interactive transaction when one
    * exists, else auto-commit it as its own transaction. */
  private def inTx[T](f: Tx => T): T = activeTx match {
    case Some((tx, _)) => f(tx)
    case None => transaction(f)
  }

  /** Run `f` as one atomic multi-table transaction (M5/M6) under OCC.
    *
    * Publish failure takes one of two paths, in order:
    *  1. REBASE (the many-concurrent-writers fast path, Delta-style
    *     write-conflict detection): if this txn is pure table-scoped DML
    *     and every commit that landed since its base touched only
    *     DISJOINT tables, the commit document is rebuilt on the new head
    *     by overlaying this txn's table diffs — no Spark job re-runs, the
    *     staged files republish as-is. K writers on K different tables
    *     serialize only on the conditional put itself (microseconds), not
    *     on each other's bodies.
    *  2. RE-RUN: genuinely conflicting work (same tables, DDL, view/tag/
    *     stream-tag/vacuum) re-executes `f` on a fresh base — conflicting
    *     read-modify-write (e.g. a counter increment) is SERIALIZED, each
    *     committed body having seen the previous commit's state. Jittered
    *     exponential backoff desynchronizes the publish rounds so no
    *     writer starves.
    */
  def transaction[T](f: Tx => T): T = {
    var attempts = 0
    val rnd = java.util.concurrent.ThreadLocalRandom.current()
    while (attempts < 100) {
      val base = currentVersion
      val tx = new Tx(this, snapshot(base))
      val result =
        try f(tx)
        catch { case e: Throwable => tx.cleanupStaged(); throw e }
      var pubBase = base
      var rebasing = true
      while (rebasing) {
        val next = if (pubBase == base) tx.buildSnapshot(base + 1)
          else tx.buildSnapshotOn(snapshot(pubBase), pubBase + 1)
        store.publish(pubBase + 1, next, snapshot(pubBase)) match {
          case Some(stored) =>
            snapCache.put(pubBase + 1, stored)
            return result
          case None => ()
        }
        val headV = currentVersion
        val conc = snapshot(headV).history
          .filter(h => h.snapshotId > pubBase && h.snapshotId <= headV)
        val disjoint = tx.isRebaseSafe && conc.nonEmpty && conc.forall { h =>
          h.changes.forall { case (k, names) =>
            k.startsWith("tables_") &&
              names.forall(n => !tx.conflictNames.contains(n)) }
        }
        if (disjoint) pubBase = headV else rebasing = false
      }
      tx.cleanupStaged()
      attempts += 1
      LakeCatalog.occRetries.increment()
      Thread.sleep(rnd.nextLong(math.min(200L, 4L << math.min(attempts, 5))) + 1L)
    }
    throw new IllegalStateException(s"commit contention after $attempts attempts")
  }

  // --------------------------------------------- single-op convenience APIs

  // Each of these routes through inTx: with an interactive transaction
  // open (BEGIN via execute/sql) the mutation STAGES into it — mixing
  // the Scala API with SQL transactions composes instead of publishing
  // eagerly and dooming the later COMMIT to an OCC abort — and with no
  // transaction open it auto-commits exactly as before.
  def createTable(name: String, schema: StructType,
      primaryKey: Seq[String] = Nil, notNull: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil): Unit =
    inTx(_.createTable(name, schema, primaryKey, notNull, partitionBy))

  /** CTAS (D2 — ref utils/ducklake_utils.py:101-111). */
  def createTableAs(name: String, df: DataFrame,
      partitionBy: Seq[String] = Nil): Unit =
    inTx(_.createTableAs(name, df, partitionBy))

  def insert(table: String, df: DataFrame): Unit = {
    inTx(_.insert(table, df))
    // inside an open interactive txn the staged files aren't published
    // yet — the auto-compact check defers to the next direct insert
    if (activeTx.isEmpty) maybeAutoCompact(table)
  }

  /** Opt a table into AUTO-COMPACTION (the Delta `autoOptimize.autoCompact`
    * analog): after any direct file-appending insert — the DataFrame
    * [[insert]] or a routed SQL `INSERT` — if the table's live file count
    * exceeds `maxFiles`, a follow-on [[compact]] commit folds it back to
    * size-targeted files. Inserts staged inside an open interactive
    * transaction defer the check to the next direct insert (the staged
    * files aren't published yet); streaming/inlined ingestion is not
    * auto-compacted (inlined rows add no files; streams own their commit
    * cadence — run [[compact]] as maintenance there). The policy rides
    * the snapshot as table properties (survives restarts and
    * [[migrateTo]]); the compaction is its own commit, so readers see
    * either the pre- or post-layout table, never a half-folded one, and
    * history/time travel record the maintenance like any other write.
    * Once the data outgrows `maxFiles * targetFileBytes` no layout can
    * honor the cap, so the policy goes DORMANT (no per-insert O(table)
    * rewrites) until the cap or target is raised. */
  def autoCompact(table: String, maxFiles: Int,
      targetFileBytes: Long = 128L << 20): Unit =
    transaction { tx =>
      tx.setProperty(table, LakeCatalog.PropAutoCompactMaxFiles,
        maxFiles.toString)
      tx.setProperty(table, LakeCatalog.PropAutoCompactTargetBytes,
        targetFileBytes.toString)
    }

  private def maybeAutoCompact(table: String): Unit =
    current.tables.get(table).foreach { st =>
      st.props.get(LakeCatalog.PropAutoCompactMaxFiles)
        .map(_.toInt).foreach { maxFiles =>
          val target = st.props.get(LakeCatalog.PropAutoCompactTargetBytes)
            .map(_.toLong).getOrElse(128L << 20)
          // byte-aware trigger: only files under half the target count as
          // the SMALL tail worth folding; the rewrite is proportional to
          // that tail (Tx.compactSmall), never an O(table) churn of files
          // that are already near target size. Trigger only when over the
          // file-count cap AND folding just the tail can actually honor
          // it: a wide table whose count overage comes from near-target
          // files has no layout the cap admits without rewriting healthy
          // data, so the policy DECLINES (goes dormant) until the cap or
          // target is raised — the same dormancy rule as before, now
          // byte-aware so it also declines when a full fold could
          // technically reach the cap but only by churning healthy files.
          val (small, big) = st.files.partition(_.sizeBytes < target / 2)
          val folded = big.size + (if (small.isEmpty) 0
            else math.max(1, math.ceil(
              small.map(_.sizeBytes).sum.toDouble / target).toInt))
          if (st.files.size > maxFiles && small.size >= 2 &&
              folded <= maxFiles)
            transaction(_.compactSmall(table, target, target / 2))
        }
    }

  /** M8 inlined small-batch insert (rows live in the manifest). */
  def insertInlined(table: String, df: DataFrame): Unit =
    inTx(_.insertInlined(table, df))

  /** Exactly-once streaming ingestion: insert one micro-batch, idempotent
    * on (table, batchId). The batch id is recorded in the snapshot's
    * change summary, which rides the O(1) header history — so a replayed
    * batch (restart, sink retry) is detected with zero extra metadata
    * reads and becomes a no-op. Returns false when the batch had already
    * landed. The check runs inside the transaction against its base
    * snapshot, so a concurrent duplicate loses the publish race, re-runs,
    * and then sees the tag.
    *
    * `streamId` namespaces the idempotence key to (table, streamId,
    * batchId): batch ids come from the CHECKPOINT, so a second logical
    * stream (fresh checkpoint — ids restart at 0) inserting into the
    * same table must pass a distinct id or its early batches would be
    * skipped as "replays" of the first stream's. The streaming wrappers
    * ([[graft.streaming.EventStream.sinkToLake]],
    * [[graft.streaming.LakeStream.replicate]]) derive one from the
    * checkpoint location automatically. */
  def insertStreamBatch(table: String, df: DataFrame, batchId: Long,
      streamId: String = ""): Boolean = {
    val tag = if (streamId.isEmpty) s"$table:$batchId"
      else s"$table:$streamId:$batchId"
    object AlreadyApplied extends Exception
    try transaction { tx =>
      if (tx.streamBatchApplied(tag)) throw AlreadyApplied // no empty snapshot
      tx.insert(table, df)
      tx.markStreamBatchMonotone(tag)
      true
    } catch { case AlreadyApplied => false }
  }

  /** Exactly-once CDC apply: land one micro-batch of CHANGE-FEED rows
    * (`change_type` + `_commit_version` columns, the
    * [[graft.streaming.ChangeFeed]] shape) into `table`, idempotent on
    * (table, batchId) exactly like [[insertStreamBatch]]. A batch may
    * span several upstream commits, so the NET effect per key is applied:
    * the latest change by commit version wins (preimages are subsumed by
    * their postimages), every touched key's stale row is deleted, and the
    * keys whose final state is a live row are re-inserted — one atomic
    * two-op transaction. At scale both ops are key-joins against the
    * batch's (small) key set, never table rewrites beyond the touched
    * files. Returns false when the batch had already landed.
    *
    * PRECONDITION: `keyCols` must uniquely identify rows in the source
    * table. The change FEED itself supports keyless/multiset data (the
    * diff is an exact multiset diff), but this net-effect APPLY keeps one
    * surviving row per key — duplicate rows sharing a key within one
    * commit would be nondeterministically collapsed, silently diverging
    * the replica. The guard below fails loudly instead; multiset data
    * belongs on [[graft.streaming.LakeStream.replicate]] (append-only)
    * or a bespoke multiset apply.
    *
    * `streamId` extends the idempotence key to (table, streamId,
    * batchId) and is REQUIRED: batch ids come from the CHECKPOINT, so a
    * different stream (fresh checkpoint — ids restart at 0) writing the
    * same table would otherwise collide with the first stream's tags
    * and silently skip its early batches as "replays". Distinct logical
    * streams over one destination must pass distinct ids;
    * [[graft.streaming.ChangeFeed.applyPass]] derives one from the
    * checkpoint location when the caller doesn't name one. */
  def applyChangesStreamBatch(table: String, changes: DataFrame,
      keyCols: Seq[String], batchId: Long, streamId: String): Boolean = {
    import graft.streaming.ChangeFeed.{TypeCol, VersionCol}
    require(streamId.nonEmpty,
      "applyChangesStreamBatch requires a streamId — batch ids restart " +
        "at 0 with every fresh checkpoint, so without a per-stream " +
        "namespace a second logical stream's early batches would be " +
        "silently skipped as replays of the first's")
    val tag = s"$table:cdc:$streamId:$batchId"
    object AlreadyApplied extends Exception
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(VersionCol).desc)
    // one (version, key) row survives the preimage filter per commit, so
    // version order alone picks the net state
    val survivors = changes.filter(col(TypeCol) =!= "update_preimage")
      .persist()
    val latest = survivors
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .persist()
    try {
      // key-uniqueness guard: >1 surviving change row in one (key,
      // commit) group means the key does NOT identify a row upstream and
      // the collapse below would be nondeterministic. One aggregation
      // over the (small, persisted) batch.
      val dup = survivors
        .groupBy((keyCols :+ VersionCol).map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
        .limit(1).collect()
      if (dup.nonEmpty)
        throw new IllegalArgumentException(
          s"CDC apply to '$table': key (${keyCols.mkString(", ")}) is not " +
            "unique within one source commit — net-effect apply requires " +
            "row-identifying keys; multiset data cannot be replicated " +
            "by key")
      // an empty net change is a deterministic no-op: skip the commit
      // entirely (idempotent without a batch tag) — also what keeps a
      // consumer writing into the SAME catalog from generating commits
      // for batches its own sink traffic triggered. The count doubles as
      // the write-width gate below and is one cached-scan job (latest is
      // persisted), replacing what isEmpty would have cost.
      val net = latest.count()
      if (net == 0L) return false
      // Net changes keep the key window's shuffle partitioning (one
      // partition per shuffle slot). A typical micro-batch is TINY
      // relative to the table, and writing it at shuffle width litters
      // the sink with one near-empty file per slot per batch — scans of
      // a long-running replica then pay a per-file task constant for
      // thousands of files that hold a few rows each. Collapse small
      // batches to one file (and one broadcastable delete-key partition);
      // large backfill batches keep their full write parallelism.
      val keyed =
        if (net <= graft.streaming.ChangeFeed.SmallNetRows) latest.coalesce(1)
        else latest
      transaction { tx =>
        if (tx.streamBatchApplied(tag)) throw AlreadyApplied // no empty snapshot
        // ONE copy-on-write pass applies the whole net change: the carried
        // change_type routes each source row (delete rows remove their
        // target match and insert nothing; a delete for an absent key is a
        // no-op, as in the delete+insert pair this replaces — which
        // rewrote the same affected files TWICE)
        tx.mergeClauses(table, keyed.drop(VersionCol), keyCols, MergeClauses(
          matchedDelete = Some(s"s.$TypeCol = 'delete'"),
          matchedUpdate = Some(s"s.$TypeCol <> 'delete'"),
          notMatchedInsert = Some(s"$TypeCol <> 'delete'")),
          carry = Seq(TypeCol))
        tx.markStreamBatchMonotone(tag)
        true
      }
    } catch { case AlreadyApplied => false }
    finally {
      latest.unpersist(blocking = false)
      survivors.unpersist(blocking = false)
    }
  }

  /** Merge-on-read DELETE (deletion vectors) — see [[Tx.deleteMor]]. */
  def deleteMor(table: String, where: Column): Unit =
    inTx(_.deleteMor(table, where))

  /** RESTORE to a past version — see [[Tx.restoreTable]]. */
  def restoreTable(table: String, version: Long): Unit =
    inTx(_.restoreTable(table, version))

  /** Zero-copy clone — see [[Tx.cloneTable]]. */
  def cloneTable(src: String, dst: String): Unit =
    inTx(_.cloneTable(src, dst))

  def dropTable(name: String): Unit = inTx(_.dropTable(name))

  def dropView(name: String): Unit = inTx(_.dropView(name))

  /** Metadata-only rename — see [[Tx.renameTable]]. */
  def renameTable(from: String, to: String): Unit =
    inTx(_.renameTable(from, to))

  /** O(metadata) truncate — see [[Tx.truncateTable]]. */
  def truncateTable(name: String): Unit = inTx(_.truncateTable(name))

  def update(table: String, where: Column, sets: Map[String, Column]): Unit =
    inTx(_.update(table, where, sets))

  def delete(table: String, where: Column): Unit =
    inTx(_.delete(table, where))

  /** Distributed DELETE by a DataFrame of keys — see [[Tx.delete]]. */
  def delete(table: String, keys: DataFrame, keyCols: Seq[String]): Unit =
    inTx(_.delete(table, keys, keyCols))

  /** Partition-retention fast-path delete — see [[Tx.deletePartitions]]. */
  def deletePartitions(table: String, eq: Map[String, String]): Unit =
    inTx(_.deletePartitions(table, eq))

  def merge(table: String, source: DataFrame, keys: Seq[String]): Unit =
    inTx(_.merge(table, source, keys))

  /** Zero-copy registration of existing parquet files — see
    * [[Tx.addDataFiles]]. */
  def addDataFiles(table: String, dir: String): Unit =
    inTx(_.addDataFiles(table, dir))

  /** mergeSchema ingestion — see [[Tx.insertEvolve]]; the schema adds and
    * the data land in ONE atomic commit. */
  def insertEvolve(table: String, df: DataFrame): Unit =
    inTx(_.insertEvolve(table, df))

  /** Partition-spec evolution — see [[Tx.setPartitionBy]]. */
  def setPartitionBy(table: String, cols: Seq[String]): Unit =
    inTx(_.setPartitionBy(table, cols))

  /** Full MERGE with conditional matched / not-matched / not-matched-by-
    * source clauses — see [[Tx.mergeClauses]] and [[MergeClauses]]. */
  def mergeClauses(table: String, source: DataFrame, keys: Seq[String],
      clauses: MergeClauses): Unit =
    transaction(_.mergeClauses(table, source, keys, clauses))

  def createView(name: String, sql: String): Unit =
    transaction(_.createView(name, sql))

  /** CHECK constraint — see [[Tx.addCheck]]. */
  def addCheck(table: String, name: String, predicateSql: String): Unit =
    transaction(_.addCheck(table, name, predicateSql))

  def dropCheck(table: String, name: String): Unit =
    transaction(_.dropCheck(table, name))

  /** Tag `version` (default: the current snapshot) with a stable name —
    * see [[Tx.tag]]. Tagged snapshots survive [[vacuum]]. */
  def tag(name: String, version: Long = -1L): Unit =
    transaction(tx => tx.tag(name,
      if (version < 0) currentVersion else version))

  def dropTag(name: String): Unit = transaction(_.dropTag(name))

  /** Deliberately re-point an existing tag — see [[Tx.replaceTag]]. */
  def replaceTag(name: String, version: Long): Unit =
    transaction(_.replaceTag(name, version))

  /** `CALL graft_*(…)` dispatcher — the maintenance verbs routed through
    * the SQL surface (the reference's whole interface is
    * `conn.execute(sql)`; DuckLake exposes the same ops as
    * `ducklake_expire_snapshots()`-style procedure calls). Arguments are
    * positional: strings in single quotes (doubled quote escapes),
    * numbers bare. Maintenance runs its own commits (vacuum also runs
    * physical GC), so calls REFUSE inside an open interactive
    * transaction rather than doom it to an OCC abort. Every verb returns
    * ONE row of deterministic after-facts, so a pure-SQL maintenance
    * lifecycle is ledger-able (l53). */
  private def executeCall(fn: String, argStr: String): DataFrame = {
    import LakeCatalog.splitTopLevel
    require(!hasOpenTransaction,
      s"$fn: maintenance procedures cannot run inside an open " +
        "interactive transaction — COMMIT or ROLLBACK first")
    val args = splitTopLevel(argStr, ',').map(_.trim).filter(_.nonEmpty)
    def isStr(a: String) = a.length >= 2 && a.head == '\'' && a.last == '\''
    def str(a: String): String = {
      require(isStr(a), s"$fn: expected a quoted string argument, got: $a")
      a.substring(1, a.length - 1).replace("''", "'")
    }
    def num(a: String): Long = {
      require(a.matches("-?\\d+"), s"$fn: expected a numeric argument, got: $a")
      a.toLong
    }
    def oneRow(fields: Seq[(String, DataType)], vals: Seq[Any]): DataFrame =
      spark.createDataFrame(
        java.util.Collections.singletonList(Row(vals: _*)),
        StructType(fields.map { case (n, t) => StructField(n, t) }))
    def tableFacts(t: String): DataFrame = {
      require(current.tables.contains(t), s"no such table: $t")
      tableInfo().filter(col("table_name") === t)
        .select("table_name", "file_count", "row_count")
    }
    fn match {
      case "graft_vacuum" | "graft_expire_snapshots" =>
        val keep = if (args.nonEmpty) num(args(0)).toInt else 10
        val grace = if (args.size > 1) num(args(1)) else 60L * 60 * 1000
        vacuum(keep, grace)
        oneRow(Seq("current_version" -> LongType,
          "live_versions" -> LongType),
          Seq(currentVersion, store.availableVersions().size.toLong))
      case "graft_compact" =>
        val t = str(args.head)
        compact(t, if (args.size > 1) num(args(1)) else 128L << 20)
        tableFacts(t)
      case "graft_cluster" | "graft_zorder" =>
        val t = str(args.head)
        val (colArgs, numArgs) = args.tail.partition(isStr)
        val cols = colArgs.map(str)
        require(cols.nonEmpty, s"$fn: at least one column required")
        val target = numArgs.headOption.map(num).getOrElse(128L << 20)
        if (fn == "graft_cluster") cluster(t, cols, target)
        else zorder(t, cols, target)
        tableFacts(t)
      case "graft_restore" =>
        val t = str(args(0)); val v = num(args(1))
        restoreTable(t, v)
        oneRow(Seq("table_name" -> StringType, "restored_to" -> LongType,
          "current_version" -> LongType), Seq(t, v, currentVersion))
      case "graft_add_data_files" =>
        val t = str(args(0))
        val before = current.tables.get(t).map(_.files.size).getOrElse(0)
        addDataFiles(t, str(args(1)))
        oneRow(Seq("table_name" -> StringType, "files_added" -> LongType),
          Seq(t, (current.tables(t).files.size - before).toLong))
      case other =>
        throw new IllegalArgumentException(
          s"unknown procedure: $other — supported: graft_vacuum / " +
            "graft_expire_snapshots, graft_compact, graft_cluster, " +
            "graft_zorder, graft_restore, graft_add_data_files")
    }
  }

  /** Compaction: fold a table's many small files into size-targeted ones —
    * the maintenance half of the small-file story (M8 — ref
    * demos/04_small_file_optimization/FINDINGS.md:21-27). */
  def compact(table: String, targetFileBytes: Long = 128L << 20): Unit =
    transaction(_.compact(table, targetFileBytes))

  /** Cluster the table's data layout on `cols` (range-partition + sort) so
    * manifest-stats pruning becomes surgical — see [[Tx.cluster]]. */
  def cluster(table: String, cols: Seq[String],
      targetFileBytes: Long = 128L << 20): Unit =
    transaction(_.cluster(table, cols, targetFileBytes))

  /** Z-ORDER the layout on multiple columns so stats prune on each of
    * them independently — see [[Tx.zorder]]. */
  def zorder(table: String, cols: Seq[String],
      targetFileBytes: Long = 128L << 20): Unit =
    transaction(_.zorder(table, cols, targetFileBytes))

  /** Snapshot expiry + orphan cleanup (the `expire_snapshots`/vacuum
    * maintenance op), in two phases:
    *
    * 1. The expiry DECISION commits through the same OCC publish as any
    *    transaction (the Iceberg expire-snapshots model): which versions
    *    die is recorded in the new snapshot's change ledger. Tagged
    *    snapshots are PINNED — expiry skips them (the
    *    expire-snapshots-retains-refs contract). A racing tag() either
    *    commits first (this commit loses the publish race, re-runs, and
    *    honors the new pin) or re-runs on a base whose ledger already
    *    names the expired target and is refused — a snapshot can never
    *    be pinned and deleted at once.
    * 2. Physical GC then deletes exactly the ledger-expired versions:
    *    manifests first (crash mid-vacuum leaves orphan FILES — harmless,
    *    re-collected by the next run off the ledger — never dangling
    *    SNAPSHOTS), then unreferenced blobs and data files.
    *
    * Time travel to expired versions then fails (by design); current
    * reads are untouched. Data files referenced by NO snapshot at all
    * (staged by an in-flight or crashed transaction) are only collected
    * once older than `orphanGraceMs`, so a slow concurrent writer's
    * staged-but-unpublished files survive the sweep. */
  def vacuum(keepLast: Int = 10, orphanGraceMs: Long = 60L * 60 * 1000): Unit = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    if (currentVersion == 0) return
    val startMs = System.currentTimeMillis()
    // phase 1: commit the decision (skip the empty snapshot when there
    // is nothing new to expire — GC below still re-collects leftovers)
    object NothingToExpire extends Exception
    try transaction { tx =>
      if (tx.expireSnapshots(keepLast).isEmpty) throw NothingToExpire
    } catch { case NothingToExpire => () }
    // phase 2: physical GC, driven by the committed ledger
    val head = current
    val toDelete = store.availableVersions().filter(head.versionExpired).sorted
    // capture the dead snapshots' file sets before their manifests go:
    // those files are KNOWN garbage (committed, then expired) and are
    // deleted regardless of age; grace only protects never-referenced
    // paths. Normalized through absPath so relative and (legacy)
    // absolute manifest entries compare correctly.
    val deadFiles = toDelete.flatMap(v =>
      snapshot(v).tables.values.flatMap(_.files.flatMap(e =>
        (e.path +: (e.blooms.values.toSeq ++ e.dv)).map(p =>
          absPath(p).toUri.getPath)))).toSet
    toDelete.foreach { v =>
      store.deleteVersion(v)
      snapCache.remove(v)
    }
    // blobs only kept snapshots reference stay; expired-only blobs go
    // (bounded at this vacuum's head version so a concurrent writer's
    // staged blobs for a newer commit are never swept)
    val keptSnaps = store.availableVersions().sorted.map(snapshot)
    store.gcBlobs(keptSnaps, head.snapshotId)
    val live = keptSnaps
      .flatMap(_.tables.values.flatMap(_.files.flatMap(e =>
        (e.path +: (e.blooms.values.toSeq ++ e.dv)).map(p =>
          absPath(p).toUri.getPath)))).toSet
    // walk <root>/<table>/{data,index,dv}/** and drop parquet files /
    // bloom sidecars / deletion-vector parts no kept snapshot references
    // (also catches dirs from dropped tables). DV entries in the manifest
    // point at the sidecar DIRECTORY, so dv parts match on their parent.
    val rootPath = fs.makeQualified(new Path(root))
    val rootStr = rootPath.toUri.getPath.stripSuffix("/")
    if (fs.exists(rootPath)) {
      val it = fs.listFiles(rootPath, true)
      while (it.hasNext) {
        val fst = it.next()
        val f = fst.getPath
        val abs = f.toUri.getPath
        val rel = abs.stripPrefix(rootStr).stripPrefix("/")
        val isDvPart = rel.contains("/dv/") && rel.endsWith(".parquet") &&
          !rel.startsWith("_manifest")
        val isData = (rel.contains("/data/") && rel.endsWith(".parquet") ||
          rel.contains("/index/") && rel.endsWith(".bloom")) &&
          !rel.startsWith("_manifest")
        val key = if (isDvPart) f.getParent.toUri.getPath else abs
        if ((isData || isDvPart) && !live.contains(key) &&
            (deadFiles.contains(key) ||
              fst.getModificationTime < startMs - orphanGraceMs))
          fs.delete(f, false)
      }
    }
  }

  /** Catalog migration (S8 — ref demos/05_catalog_portability/demo.py:199-252):
    * recreate every table (schema, constraints, rows) and view of `this`
    * in `dst`, atomically there. */
  def migrateTo(dst: LakeCatalog): Unit = {
    val snap = current
    dst.transaction { tx =>
      snap.tables.toSeq.sortBy(_._1).foreach { case (name, st) =>
        tx.createTable(name, structOf(st.columns), st.primaryKey, st.notNull,
          st.partitionBy)
        // properties carry CHECK constraints, MV specs, bloom-index
        // declarations — part of the table's contract, so they migrate
        st.props.foreach { case (k, v) => tx.setProperty(name, k, v) }
        val rows = readState(st)
        if (st.files.nonEmpty) tx.insert(name, rows)
      }
      snap.views.foreach { case (n, sql) => tx.createView(n, sql) }
    }
  }
}

object LakeCatalog {

  /** Auto-compaction policy table properties — see [[LakeCatalog.autoCompact]]. */
  val PropAutoCompactMaxFiles = "compact.auto.maxFiles"
  val PropAutoCompactTargetBytes = "compact.auto.targetBytes"

  /** JVM-wide statement counter for metadata-view names — uniqueness
    * across concurrent sql() calls on the same catalog root. */
  private[lake] val metaViewSeq = new java.util.concurrent.atomic.AtomicLong()

  /** JVM-wide count of OCC publish retries (a failed conditional put that
    * re-ran its transaction body). Diagnostic only — read/reset it around
    * a workload to measure commit contention (LakeOpProbe's concurrent-
    * writer ledger does). */
  val occRetries = new java.util.concurrent.atomic.LongAdder()
  /** Split `s` on `sep` at paren-depth 0 outside single-quoted strings —
    * the minimal scanner [[LakeCatalog.execute]]'s UPDATE head needs
    * (commas inside function calls and string literals must not split). */
  private[lake] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    val sb = new StringBuilder
    var depth = 0; var inStr = false
    s.foreach {
      case '\'' => inStr = !inStr; sb += '\''
      case '(' if !inStr => depth += 1; sb += '('
      case ')' if !inStr => depth -= 1; sb += ')'
      case c if c == sep && !inStr && depth == 0 =>
        out += sb.toString; sb.clear()
      case c => sb += c
    }
    out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Positions inside single-quoted SQL string literals (quote chars
    * included) — the statement-level regex rewrites must never fire
    * there. Doubled `''` escapes toggle twice and net out inside;
    * backslash escapes (`\'` — Spark's default string-literal escaping)
    * consume the following character so an escaped quote never reads as
    * the literal's terminator. */
  private[lake] def literalSpans(s: String): Array[Boolean] = {
    val in = new Array[Boolean](s.length)
    var open = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (open && c == '\\' && i + 1 < s.length) {
        in(i) = true; in(i + 1) = true; i += 2
      } else {
        if (c == '\'') { in(i) = true; open = !open }
        else in(i) = open
        i += 1
      }
    }
    in
  }

  /** Split a MERGE tail on clause-level WHEN boundaries only: a WHEN
    * inside a string literal, inside parens, or inside a CASE..END
    * expression belongs to a clause CONDITION (`WHEN MATCHED AND CASE
    * WHEN ... END THEN ...`), not to the clause list, and the naive
    * `\bWHEN\b` split mis-parsed exactly those. Returns the ON-condition
    * head followed by each clause body with its WHEN keyword stripped —
    * the same shape the naive split produced. */
  private[lake] def splitWhenTopLevel(s: String): Seq[String] = {
    val spans = literalSpans(s)
    def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    def wordAt(i: Int, w: String): Boolean =
      s.regionMatches(true, i, w, 0, w.length) &&
        (i == 0 || !isWordChar(s.charAt(i - 1))) &&
        (i + w.length >= s.length || !isWordChar(s.charAt(i + w.length)))
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
    var depth = 0; var caseDepth = 0
    var i = 0
    while (i < s.length) {
      if (spans(i)) i += 1
      else s.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ =>
          if (wordAt(i, "CASE")) { caseDepth += 1; i += 4 }
          else if (wordAt(i, "END") && caseDepth > 0) { caseDepth -= 1; i += 3 }
          else if (wordAt(i, "WHEN") && depth == 0 && caseDepth == 0) {
            bounds += i; i += 4
          }
          else i += 1
      }
    }
    if (bounds.isEmpty) Seq(s.trim)
    else {
      val head = s.substring(0, bounds.head).trim
      val tails = bounds.indices.map { j =>
        val from = bounds(j) + 4
        val to = if (j + 1 < bounds.length) bounds(j + 1) else s.length
        s.substring(from, to).trim
      }
      head +: tails
    }
  }

  /** Split once at the first top-level occurrence of `keyword` (word,
    * case-insensitive) or `=`; returns (head, Some(tail)) or (s, None). */
  private[lake] def topLevelSplitOnce(
      s: String, keyword: String): (String, Option[String]) = {
    var depth = 0; var inStr = false
    var i = 0
    val kw = keyword.toLowerCase
    while (i < s.length) {
      val c = s(i)
      if (c == '\'') inStr = !inStr
      else if (!inStr && c == '(') depth += 1
      else if (!inStr && c == ')') depth -= 1
      else if (!inStr && depth == 0) {
        if (kw == "=" && c == '=')
          return (s.substring(0, i), Some(s.substring(i + 1)))
        if (kw != "=" && s.regionMatches(true, i, kw, 0, kw.length) &&
            (i == 0 || s(i - 1).isWhitespace) &&
            (i + kw.length >= s.length || s(i + kw.length).isWhitespace))
          return (s.substring(0, i), Some(s.substring(i + kw.length)))
      }
      i += 1
    }
    (s, None)
  }
}
