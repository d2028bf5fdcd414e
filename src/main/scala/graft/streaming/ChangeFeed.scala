package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.StreamFrame
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._

import graft.lake.LakeCatalog

/** The table CHANGE FEED as a streaming source — streaming
  * `table_changes()` (ref utils/ducklake_utils.py:65-78 exposes the batch
  * feed; this is its incremental-consumption form, the Delta CDF
  * `readChangeFeed` analog). Where [[LakeStream.replicate]] tails an
  * APPEND-ONLY table's data files, this source follows ANY DML: each
  * micro-batch carries the table's per-commit change rows — `insert`,
  * `delete`, `update_preimage`/`update_postimage` — tagged with the
  * commit version, derived on demand from the manifest (no change files
  * are ever written; the O(churn) diff in [[LakeCatalog.tableChanges]]
  * reads only the file entries a commit touched).
  *
  * Offsets are catalog snapshot versions, so the checkpoint contract is
  * exact: a batch is the ordered union of the per-commit diffs in
  * `(startV, endV]`, one window per commit that changed the table's DATA.
  * Layout-only commits (compaction, clustering) rewrite files without
  * changing the logical table — their delta is empty by construction —
  * so the source skips them without reading a byte, exactly as Delta CDF
  * emits nothing for OPTIMIZE.
  *
  * Schema evolution: the stream is ANCHORED — every window is projected
  * through the table schema at stream start, aligned by stable column id
  * ([[LakeCatalog.tableChanges]]'s `schemaAtV`), so an ADD/DROP/RENAME on
  * the base neither breaks the stream nor corrupts it: pre-evolution
  * windows read exactly as history-through-the-anchor-schema, and a
  * column added after the anchor stays invisible until the consumer
  * restarts the query (a restart re-anchors at the then-current schema;
  * the checkpoint offset carries over). Delta fails the stream outright
  * here; the anchor keeps it exact AND running.
  *
  * Loud-failure edges (never silent corruption):
  *  - a vacuumed resume point (the feed below the offset is gone) —
  *    retention must outlive the stream's lag, the same rule Delta
  *    documents for CDF reads;
  *  - the table dropped, or REPLACED/renamed-over mid-stream (a
  *    replacement restarts column ids, so id-anchored alignment would
  *    be meaningless).
  *
  * Scale shape: getOffset is one manifest-head read (zero jobs); a batch
  * plans one O(churn) diff per consumed commit as ordinary DataFrame
  * scans/joins (executor-side, prunable, codegen'd) — nothing is
  * collected on the driver and no second copy of the data is stored.
  */
object ChangeFeed {
  val TypeCol = "change_type"
  val VersionCol = "_commit_version"

  /** Net-change batches at or under this row count are written as ONE
    * file (and one broadcastable delete-key partition) instead of at
    * shuffle width: a steady stream of small batches otherwise litters
    * the sink with a near-empty file per shuffle slot per batch, and
    * every later scan of the replica pays a per-file task constant.
    * Backfill-sized batches above it keep their write parallelism. */
  private[graft] val SmallNetRows = 100000L

  /** Commit kinds that can change a table's LOGICAL rows. Layout-only
    * kinds (`tables_compacted`, `tables_clustered`) and pure DDL
    * (`tables_altered`, `tables_renamed`) are excluded: their logical
    * delta under the stream's anchor projection is empty by construction
    * (compaction/clustering rewrite bytes, not rows; an add/drop/rename
    * doesn't change what existing rows read as through the anchor
    * schema), so reading them would be paying O(rewritten bytes) to emit
    * nothing. (Defined in the lake layer — the same set drives the
    * per-table lastDataVersion stamp the offset reads.) */
  private[streaming] val DataKinds: Set[String] =
    graft.lake.Manifest.DataChangeKinds

  /** Kinds that advance the stream's OFFSET: the data kinds plus the
    * identity-breaking ones the guard must surface promptly. The offset
    * is the last version TOUCHING the table, not the catalog head —
    * snapshots are catalog-level, so a head offset would re-trigger on
    * every unrelated commit; worse, a consumer LANDING its batches in
    * the same catalog (the l50/CDC shape) would chase its own sink
    * commits forever. */
  private[streaming] val OffsetKinds = DataKinds ++ Set(
    "tables_replaced", "tables_renamed", "tables_renamed_from",
    "tables_dropped")

  /** Commit kinds that END the streamed table's column identity: a
    * replace restarts column ids; a rename-AWAY (`tables_renamed_from`)
    * or a rename-over of this name means the name no longer denotes the
    * anchored table; a drop ends the feed outright. Id-anchored alignment
    * across any of these would be silent garbage, so getBatch refuses.
    * Defined in the lake layer (the per-name break version is stamped
    * into [[graft.lake.Snapshot.identityBreaks]] at commit build, so the
    * guard survives header-tail compaction). */
  private[streaming] val IdentityBreakKinds: Seq[String] =
    graft.lake.Manifest.IdentityBreakKinds

  /** Stable stream identity derived from a checkpoint location: batch
    * ids are scoped to the checkpoint, so its (normalized) path is the
    * natural namespace for idempotence tags. Hashed to keep tags short
    * and free of path separators. */
  private[graft] def checkpointStreamId(checkpointDir: String): String = {
    val norm = new java.io.File(checkpointDir).getAbsolutePath
      .stripSuffix("/")
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(norm.getBytes("UTF-8"))
    "ckpt-" + d.take(6).map("%02x".format(_)).mkString
  }

  /** Feed schema = the table's columns + change_type + commit version.
    * The source itself anchors at its construction-time version; this
    * helper (used for pre-construction schema queries) reads the current
    * one — the same thing up to a benign planning race. */
  def feedSchema(spark: SparkSession, parameters: Map[String, String]): StructType = {
    val cat = new LakeCatalog(spark, parameters("root"))
    val base = parameters.get("anchorVersion") match {
      case Some(v) => cat.readAt(parameters("table"), v.toLong)
      case None => cat.read(parameters("table"))
    }
    StructType(base.schema.fields.toSeq :+
      StructField(TypeCol, StringType, nullable = false) :+
      StructField(VersionCol, LongType, nullable = false))
  }

  /** `spark.readStream` over the change feed of `table` in the lake at
    * `root`. `keys` drive update pre/post pairing (defaults to the
    * table's primary key inside tableChanges); `startingVersion` is the
    * exclusive lower bound of the first batch (0 = full history: the
    * table's creation commit streams as inserts). */
  def readChanges(spark: SparkSession, root: String, table: String,
      keys: Seq[String] = Nil, startingVersion: Long = 0L,
      anchorVersion: Option[Long] = None,
      maxWindowsPerBatch: Int = 32): DataFrame = {
    val r = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("root", root)
      .option("table", table)
      .option("keys", keys.mkString(","))
      .option("startingVersion", startingVersion.toString)
      .option("maxWindowsPerBatch", maxWindowsPerBatch.toString)
    anchorVersion.foreach(v => r.option("anchorVersion", v.toString))
    r.load()
  }

  /** One checkpointed incremental CDC pass: consume the change feed of
    * `src` committed since the last pass with this checkpoint and apply
    * its net effect to `dst` ([[LakeCatalog.applyChangesStreamBatch]] —
    * atomic, batch-id-deduped, so a replay or sink retry is exactly-once
    * end to end). `observe` sees each APPLIED batch (already persisted).
    * Returns the number of batches applied this pass — 0 when nothing
    * new was committed upstream.
    *
    * When the caller doesn't name a `streamId`, one is derived from the
    * checkpoint location: batch ids restart at 0 with every fresh
    * checkpoint, so the checkpoint IS the stream's identity — two
    * logical streams (distinct checkpoints) sharing a destination then
    * namespace their idempotence tags apart instead of the second
    * stream's early batches being skipped as replays of the first's. */
  def applyPass(cat: LakeCatalog, src: String, dst: String,
      keys: Seq[String], checkpointDir: String,
      observe: (DataFrame, Long) => Unit = (_, _) => (),
      anchorVersion: Option[Long] = None, streamId: String = ""): Long = {
    val sid = if (streamId.nonEmpty) streamId
      else checkpointStreamId(checkpointDir)
    val applied = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = readChanges(cat.spark, cat.root, src, keys,
        anchorVersion = anchorVersion)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], id: Long) =>
        val df = b.toDF().persist()
        try {
          if (cat.applyChangesStreamBatch(dst, df, keys, id, sid)) {
            applied.incrementAndGet()
            observe(df, id)
          }
        } finally df.unpersist(blocking = false)
        ()
      }
      .start()
    q.awaitTermination()
    applied.get()
  }
}

class ChangeFeedProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-changes"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), ChangeFeed.feedSchema(ctx.sparkSession, parameters))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new ChangeFeedSource(ctx.sparkSession, parameters)
}

class ChangeFeedSource(spark: SparkSession, parameters: Map[String, String])
    extends Source {
  import ChangeFeed._

  private val root = parameters("root")
  private val table = parameters("table")
  private val keyCols = parameters.get("keys").toSeq
    .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
  private val startV =
    parameters.get("startingVersion").map(_.toLong).getOrElse(0L)
  /** Per-batch plan-size bound: at most this many union legs (per-commit
    * windows); a deeper backlog folds its oldest commits into one coarse
    * exact diff. 32 legs is comfortably under Spark's plan-size pain
    * threshold while keeping per-commit tagging for any realistic lag. */
  private val maxWindows =
    parameters.get("maxWindowsPerBatch").map(_.toInt).getOrElse(32)
  require(maxWindows >= 1, "maxWindowsPerBatch must be >= 1")
  private val cat = new LakeCatalog(spark, root)

  /** The stream's schema ANCHOR: every window projects through the table
    * schema at this version, by stable column id. Defaults to the version
    * at stream start; pass `anchorVersion` to pin it explicitly — the
    * production story for SINK-schema stability: a restarted consumer
    * whose downstream table was built against an older schema keeps
    * consuming under that schema no matter how the base has evolved
    * since. */
  private val anchorV: Long = parameters.get("anchorVersion")
    .map(_.toLong).getOrElse(cat.currentVersion)
  require(anchorV == 0L || !cat.current.versionExpired(anchorV),
    s"anchorVersion v$anchorV of '$table' has been vacuumed — anchor at " +
      "a live version")

  override val schema: StructType =
    StructType(cat.readAt(table, anchorV).schema.fields.toSeq :+
      StructField(TypeCol, StringType, nullable = false) :+
      StructField(VersionCol, LongType, nullable = false))
  private val valueCols = schema.fields.dropRight(2).map(_.name).toSeq

  /** One manifest-head read; no Spark jobs and no O(versions) scan: the
    * raw offset is the table's `lastDataVersion` stamp (written at every
    * data/rename-over commit build — immune to header-tail compaction; a
    * pre-stamp manifest falls back to the retained-header scan). A table
    * that is GONE at head (dropped or renamed away) forces one batch at
    * the head version so getBatch refuses loudly instead of idling. If
    * vacuum has expired the stamped version itself (quiescent table,
    * later commits all elsewhere), it is clamped UP to the next live
    * version — the diff between live snapshots carries the same net
    * rows, and without the clamp every stream over the table (including
    * a brand-new checkpoint) would hit getBatch's expiry check forever
    * on a fully-readable table. */
  override def getOffset: Option[Offset] = {
    val head = cat.current
    val last = head.tables.get(table) match {
      case None => head.snapshotId // gone: force a loud refusal
      case Some(st) if st.lastDataVersion > 0L => st.lastDataVersion
      case Some(_) => // manifest predates the stamp: header scan
        head.history.reverseIterator
          .find(h => h.changes.exists { case (k, ts) =>
            OffsetKinds.contains(k) && ts.contains(table) })
          .map(_.snapshotId).getOrElse(0L)
    }
    val v = if (last == 0L || !head.versionExpired(last)) last
      else head.history.iterator.map(_.snapshotId)
        .find(s => s >= last && !head.versionExpired(s))
        .getOrElse(head.snapshotId)
    if (v <= startV) None
    else Some(org.apache.spark.sql.execution.streaming.runtime.LongOffset(v))
  }

  // LongOffset live, SerializedOffset after checkpoint recovery — both
  // render the version as their json
  private def versionOf(o: Offset): Long = o.json.trim.toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(versionOf).getOrElse(startV)
    val toV = versionOf(end)
    // the expiry ledger must come from the CURRENT head — a vacuum that
    // committed after `toV` expired versions that toV's own ledger
    // cannot know about. Checked BEFORE any snapshot load: the engine's
    // restart recovery replays getBatch over checkpointed offsets, and an
    // expired one must fail with the retention message, not a raw
    // missing-manifest read.
    val headNow = cat.current
    Seq(fromV, toV).filter(_ != 0L).find(headNow.versionExpired).foreach { v =>
      throw new IllegalArgumentException(
        s"change-feed offset v$v of '$table' has been vacuumed — the " +
          "feed at it is gone; retention must outlive the stream's lag " +
          "(start a fresh checkpoint to resume from live history)")
    }
    val head = cat.snapshot(toV)
    val window = head.history.iterator
      .filter(h => h.snapshotId > fromV && h.snapshotId <= toV).toSeq
    // a REPLACE (or a rename in EITHER direction: this table renamed
    // away, or another renamed over this name) restarts column identity —
    // id-anchored alignment across it would be meaningless; a DROP ends
    // the feed even if nothing re-creates the name
    // two signals, both consulted: the retained-header scan (complete
    // for windows younger than tail compaction, and the only signal in
    // pre-aggV2 manifests) and the per-name break stamp (exact even
    // after the breaking commit's header was compacted away — a feed
    // whose fromV is 0 or a tag-pinned pre-break version must refuse,
    // not silently diff across restarted column ids)
    val headerBreaks = window.filter(h => IdentityBreakKinds.exists(k =>
      h.changes.getOrElse(k, Nil).contains(table))).map(_.snapshotId)
    val stampedBreak = head.identityBreaks.get(table)
      .filter(bv => bv > fromV && bv <= toV)
    val breaks = (headerBreaks ++ stampedBreak).distinct.sorted
    breaks.headOption.foreach { bv =>
      // a FRESH stream (no checkpointed start) that trips this guard did
      // exactly what "start a fresh stream" asks — the actual remedy is a
      // startingVersion past the LAST identity break, so say so
      val remedy = if (start.isEmpty)
        s"; to stream the name's current incarnation, pass " +
          s"startingVersion = ${breaks.max}"
      else "; start a fresh change stream"
      throw new IllegalStateException(
        s"table '$table' was dropped, replaced or renamed at " +
          s"v$bv — its column identity ended there" + remedy)
    }
    // commits in (fromV, toV] whose changes touched this table's DATA;
    // expired interior versions merge into the next live window (their
    // net effect is still exact — the diff is between live snapshots)
    val liveDataVs = window.iterator
      .filterNot(h => headNow.versionExpired(h.snapshotId))
      .filter(h => h.changes.exists { case (k, ts) =>
        DataKinds.contains(k) && ts.contains(table) })
      .map(_.snapshotId).toSeq
    // TRAILING expired data commits (after the last live data commit)
    // have no later live data commit to merge into — close the batch
    // with one extra live-to-live window up to toV so their net rows
    // still flow (toV itself is live: getOffset clamps past expiry and
    // the check above already rejected an expired endpoint). Detected
    // from the lastDataVersion stamp (exact even when the expired
    // headers were compacted away) OR the retained headers (pre-stamp
    // manifests).
    val lastData = head.tables.get(table).map(_.lastDataVersion).getOrElse(0L)
    val hasTrailingExpired =
      (lastData > liveDataVs.lastOption.getOrElse(fromV) && lastData <= toV) ||
      window.iterator
        .filter(h => headNow.versionExpired(h.snapshotId))
        .filter(h => h.changes.exists { case (k, ts) =>
          DataKinds.contains(k) && ts.contains(table) })
        .exists(h => h.snapshotId > liveDataVs.lastOption.getOrElse(fromV))
    val dataVs0 =
      if (hasTrailingExpired && liveDataVs.lastOption.forall(_ < toV))
        liveDataVs :+ toV
      else liveDataVs
    // FAN-OUT CAP: a consumer resuming after a long backlog would plan
    // one union leg per consumed commit; beyond `maxWindows` commits the
    // oldest are folded into ONE coarse (fromV, foldTo] diff — the merged
    // diff is exact (net effect per key over the span), only the
    // per-commit `_commit_version` tagging coarsens: the folded rows all
    // carry the fold point's version. The plan is then <= maxWindows
    // union legs regardless of backlog depth.
    val endpoints =
      if (dataVs0.size <= maxWindows) dataVs0
      else dataVs0(dataVs0.size - maxWindows) +:
        dataVs0.drop(dataVs0.size - maxWindows + 1)
    val windows = (fromV +: endpoints).zip(endpoints).map {
      case (a, b) => changesAt(a, b)
    }
    val batch =
      if (windows.isEmpty)
        spark.createDataFrame(java.util.List.of[Row](), schema)
      else windows.reduce(_ union _)
    StreamFrame.asStreaming(batch)
  }

  /** The `(fromV, v]` window's change rows, projected through the anchor
    * schema, stamped with the data-changing commit's version. */
  private def changesAt(fromV: Long, v: Long): DataFrame = {
    if (!cat.snapshot(v).tables.contains(table))
      throw new IllegalStateException(
        s"table '$table' was dropped or renamed at v$v — the change " +
          "stream cannot continue; start a fresh stream")
    cat.tableChanges(table, fromV, v, keyCols, schemaAtV = Some(anchorV))
      .select(valueCols.map(col) :+ col(TypeCol): _*)
      .withColumn(VersionCol, lit(v))
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
