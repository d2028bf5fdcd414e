package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import org.apache.spark.sql.Row

/** Structured Streaming semantics: the streaming windowed aggregation over
  * a finite replay must agree with its batch equivalent (for all windows
  * the final watermark closed), and keyed state accumulates correctly. */
class StreamingSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("streaming windowed agg agrees with the batch plan on closed windows") {
    val streamed = EventStream.windowedProfile(spark, d)
    val batch = Tables.events(spark, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
    import spark.implicits._
    val sm = streamed.select("win_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map(r => (r._1.getTime, r._2) -> r._3).toMap
    val bm = batch
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map(r => (r._1.getTime, r._2) -> r._3).toMap
    assert(sm.nonEmpty, "stream emitted no closed windows")
    // append-mode stream emits only watermark-closed windows; each must
    // match the batch count exactly
    sm.foreach { case (k, n) => assert(bm(k) === n, s"window $k") }
    // and the stream must have closed all but the trailing lateness bound
    assert(sm.size >= bm.size - 3)
  }

  test("sliding windows: every event in 4 overlaps; closed windows match batch") {
    val streamed = EventStream.slidingProfile(spark, d)
    val batch = Tables.events(spark, d)
      .groupBy(window(col("ts"), "2 hours", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
    import spark.implicits._
    val sm = streamed.select("win_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map(r => (r._1.getTime, r._2) -> r._3).toMap
    val bm = batch
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map(r => (r._1.getTime, r._2) -> r._3).toMap
    assert(sm.nonEmpty, "stream emitted no closed windows")
    sm.foreach { case (k, n) => assert(bm(k) === n, s"window $k") }
    // overlap factor: total window-rows across the sliding agg = 4x the
    // event count (each event lands in exactly window/slide = 4 windows)
    val n_events = Tables.events(spark, d).count()
    assert(bm.values.sum === 4L * n_events)
  }

  test("streaming results are state-partition-count invariant") {
    // the stateful-operator partition count is a TUNING knob (store-commit
    // fixed cost vs scheduling), never a semantics knob: the drained
    // result at 2 and 8 state partitions must be row-identical. This pins
    // the invariance claim the bench tuning relies on — any state-store
    // keying or watermark bug that leaks partitioning into results fails
    // here, not in a round artifact.
    def runAt(n: String): Seq[Row] = {
      spark.conf.set("spark.graft.streaming.statePartitions", n)
      try EventStream.windowedProfile(spark, d).collect().toSeq
      finally spark.conf.unset("spark.graft.streaming.statePartitions")
    }
    val at2 = runAt("2")
    val at8 = runAt("8")
    assert(at2.nonEmpty)
    assert(at2 === at8, "state partition count changed the RESULT")
  }

  test("RocksDB state store: same results as the default provider") {
    // the state-bigger-than-memory scale path: at 100 TB the stateful
    // operators' keyed state outgrows executor heap, and the RocksDB
    // provider (ships with Spark) keeps it on local disk with
    // incremental checkpointing. Semantics must be provider-invariant —
    // this pins that swapping the provider is a pure deployment knob.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val default = EventStream.windowedProfile(spark, d).collect().toSeq
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val rocks = EventStream.windowedProfile(spark, d).collect().toSeq
      assert(rocks.nonEmpty, "RocksDB run emitted nothing")
      assert(rocks === default, "state store provider changed the RESULT")
    } finally spark.conf.unset(key)
  }

  test("stream lands in the lake exactly-once: one commit per batch, replay is a no-op") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    // source: the events slice split into 3 files -> 3 micro-batches
    val srcDir = tmpDir("stream_src")
    val ev = Tables.events(spark, d).filter(col("event_id") <= 300)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.repartition(3).write.mode("overwrite").parquet(srcDir)
    val cat = new graft.lake.LakeCatalog(spark, tmpDir("stream_lake"))
    cat.createTable("ev", ev.schema)
    val v0 = cat.currentVersion
    def stream() = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    EventStream.sinkToLake(stream(), cat, "ev", tmpDir("stream_ckpt"))
    // one lake snapshot per micro-batch, all rows landed atomically
    val nBatches = cat.currentVersion - v0
    assert(nBatches === 3, "expected one commit per micro-batch")
    assert(cat.read("ev").count() === ev.count())
    // time travel sees the ingestion history batch by batch
    assert(cat.readAt("ev", v0 + 1).count() < ev.count())
    // replay the whole stream (fresh checkpoint -> same batch ids):
    // every batch is recognized as applied; no snapshot, no rows
    EventStream.sinkToLake(stream(), cat, "ev", tmpDir("stream_ckpt2"))
    assert(cat.currentVersion === v0 + nBatches, "replay must be a no-op")
    assert(cat.read("ev").count() === ev.count())
  }

  test("flatMapGroupsWithState accumulates per-user session state") {
    import spark.implicits._
    val sess = EventStream.sessionProfile(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(sess.nonEmpty)
    val batch = Tables.events(spark, d).groupBy("user_id")
      .agg(count(lit(1)).as("n"), countDistinct("event_type").as("nt"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    sess.foreach { case (uid, n, nt, first, last) =>
      assert(batch(uid)._1 === n, s"user $uid event count")
      assert(batch(uid)._2 === nt, s"user $uid type count")
      assert(first <= last)
    }
  }

  test("stream-static enrichment join matches the batch join on closed windows") {
    import spark.implicits._
    val streamed = EventStream.enrichedWindowProfile(spark, d)
    val batch = Tables.events(spark, d)
      .withColumn("tier",
        expr("CASE CAST(user_id % 4 AS INT) WHEN 0 THEN 'bronze' " +
          "WHEN 1 THEN 'silver' WHEN 2 THEN 'gold' ELSE 'platinum' END"))
      .groupBy(window(col("ts"), "1 hour"), col("tier"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("tier"), col("n"))
    val sm = streamed.select("win_start", "tier", "n")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map(r => (r._1.getTime, r._2) -> r._3).toMap
    val bm = batch.as[(java.sql.Timestamp, String, Long)].collect()
      .map(r => (r._1.getTime, r._2) -> r._3).toMap
    assert(sm.nonEmpty, "stream emitted no closed windows")
    // every emitted (window, tier) count must equal the batch join's —
    // the static side joined identically in both worlds
    sm.foreach { case (k, n) => assert(bm(k) === n, s"window/tier $k") }
  }

  test("stream-stream interval join emits every qualifying pair exactly once") {
    import spark.implicits._
    val streamed = EventStream.streamJoinProfile(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(streamed.nonEmpty, "replay should produce attribution pairs")
    val ev = Tables.events(spark, d)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("pid"))
    val batch = c.join(p, col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"))
      .groupBy(col("cu").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("cid")).as("n_clicks_converted"),
        countDistinct(col("pid")).as("n_purchases_attributed"))
      .orderBy("user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(streamed === batch)
  }

  test("stream outer join: matched rows = batch inner join; nulls obey the watermark") {
    import spark.implicits._
    val out = EventStream.outerJoinProfile(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val ev = Tables.events(spark, d)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("pid"))
    val cond = col("cu") === col("pu") && col("pts") >= col("cts") &&
      col("pts") <= col("cts") + org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR")
    val wm = {
      val Row(a: java.sql.Timestamp) = c.agg(max("cts")).head()
      val Row(b: java.sql.Timestamp) = p.agg(max("pts")).head()
      new java.sql.Timestamp(math.min(a.getTime, b.getTime) - 2L * 3600 * 1000)
    }
    val matched = c.join(p, cond).select(col("cu"), col("pid"))
    val unmatched = c.join(p, cond, "left_anti")
      // eviction rule: emitted iff watermark passed c_ts + 1h
      .filter(col("cts") + org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR") < lit(wm))
      .select(col("cu"), lit(null).cast("long").as("pid"))
    val batch = matched.union(unmatched)
      .groupBy(col("cu").as("user_id"))
      .agg(count(lit(1)).as("n_rows"), count(col("pid")).as("n_converted"),
        sum(when(col("pid").isNull, 1L).otherwise(0L)).as("n_unconverted"))
      .orderBy("user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === batch)
  }

  test("lake streaming source: each pass replicates exactly the new commits") {
    import spark.implicits._
    import graft.streaming.LakeStream
    val cat = new graft.lake.LakeCatalog(spark, tmpDir("lakestream"))
    val ev = Tables.events(spark, d).filter(col("event_id") <= 900)
      .select("event_id", "ts", "user_id", "event_type", "value")
    cat.createTable("bronze", ev.schema)
    cat.createTable("silver", ev.schema)
    val ckpt = tmpDir("lakestream_ckpt")
    val slices = Seq(col("event_id") <= 300,
      col("event_id") > 300 && col("event_id") <= 600,
      col("event_id") > 600)
    slices.foreach { pred =>
      val before = cat.read("silver").count()
      val expectDelta = ev.filter(pred).count()
      cat.insert("bronze", ev.filter(pred))
      LakeStream.replicate(cat, "bronze", "silver", identity, ckpt)
      // the pass must add EXACTLY the newly committed rows — O(delta),
      // never a re-read of the table
      assert(cat.read("silver").count() - before === expectDelta)
    }
    // full equality, not just counts
    assert(cat.read("silver").exceptAll(cat.read("bronze")).isEmpty &&
      cat.read("bronze").exceptAll(cat.read("silver")).isEmpty)
    // no new upstream commits -> a pass commits NOTHING
    val v = cat.currentVersion
    LakeStream.replicate(cat, "bronze", "silver", identity, ckpt)
    assert(cat.currentVersion === v)
    // append-only contract ENFORCED: a CoW delete on bronze makes further
    // streaming reads unsound (rewritten files would replay) -> refuse
    cat.delete("bronze", col("event_id") === 1L)
    val ex = intercept[IllegalArgumentException] {
      LakeStream.replicate(cat, "bronze", "silver", identity, ckpt)
    }
    assert(ex.getMessage.contains("append-only"))
  }

  test("applyChangesStreamBatch: racing duplicates land exactly once") {
    // a foreachBatch retry (or two racing sink attempts after a driver
    // hiccup) re-applies the SAME batch id concurrently — exactly one
    // must commit, the other must see the tag after losing the OCC race
    // and no-op, and the replica must hold exactly one copy of the rows
    val cat = new graft.lake.LakeCatalog(spark, tmpDir("cdcdup"))
    val src = spark.range(1, 201).selectExpr("id", "id * 10 AS v")
    cat.createTable("src", src.schema, primaryKey = Seq("id"))
    cat.createTable("replica", src.schema)
    cat.insert("src", src)
    val changes = cat.tableChanges("src", 0L, cat.currentVersion, Seq("id"))
      .withColumn("_commit_version", lit(cat.currentVersion))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(Future.sequence((1 to 2).map(_ => Future {
      cat.applyChangesStreamBatch("replica", changes, Seq("id"), 0L)
    })), Duration.Inf)
    assert(results.count(identity) === 1,
      s"exactly one of the racing applies must land, got $results")
    assert(cat.read("replica").count() === 200L)
    assert(cat.read("replica").exceptAll(cat.read("src")).isEmpty)
    // a later sequential replay of the same batch id is also a no-op
    val v = cat.currentVersion
    assert(!cat.applyChangesStreamBatch("replica", changes, Seq("id"), 0L))
    assert(cat.currentVersion === v)
  }

  test("change-feed stream: full DML lifecycle applies net effects to a replica") {
    import graft.streaming.ChangeFeed
    val cat = new graft.lake.LakeCatalog(spark, tmpDir("cdcstream"))
    val src = spark.range(1, 301).selectExpr("id",
      "id % 10 AS k", "id * 100 AS v")
    cat.createTable("src", src.schema, primaryKey = Seq("id"))
    cat.createTable("replica", src.schema)
    val ckpt = tmpDir("cdcstream_ckpt")
    val typeCounts = scala.collection.mutable.Map[String, Long]()
    val versions = scala.collection.mutable.Set[Long]()
    def observe(b: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      b.groupBy("change_type").count().collect().foreach(r =>
        typeCounts(r.getString(0)) =
          typeCounts.getOrElse(r.getString(0), 0L) + r.getLong(1))
      versions ++= b.select("_commit_version").distinct()
        .collect().map(_.getLong(0))
    }
    // phase A: two inserts, a CoW update, a MoR delete, a compaction
    cat.insert("src", src.filter(col("id") <= 100))
    cat.insert("src", src.filter(col("id") > 100 && col("id") <= 200))
    cat.update("src", col("id") <= 50, Map("v" -> (col("v") + 7L)))
    cat.deleteMor("src", col("k") === 3L)
    val compactV = { cat.compact("src", targetFileBytes = 128L << 20)
      cat.currentVersion }
    assert(ChangeFeed.applyPass(cat, "src", "replica", Seq("id"), ckpt,
      observe) >= 1L)
    // net-effect replica equality, full rows (exercises update + delete)
    assert(cat.read("replica").exceptAll(cat.read("src")).isEmpty &&
      cat.read("src").exceptAll(cat.read("replica")).isEmpty)
    // exact per-type accounting: 200 inserts, 50 update pairs, 20 deletes
    assert(typeCounts("insert") === 200L)
    assert(typeCounts("update_preimage") === 50L)
    assert(typeCounts("update_postimage") === 50L)
    assert(typeCounts("delete") === 20L)
    // compaction is layout-only: its version is never consumed (and so
    // never read) — the Delta "no CDF for OPTIMIZE" contract
    assert(!versions.contains(compactV))
    assert(versions.size === 4)
    // phase B: only the NEW commits stream
    typeCounts.clear(); versions.clear()
    cat.insert("src", src.filter(col("id") > 200))
    cat.update("src", col("k") === 5L, Map("v" -> (col("v") * 2L)))
    assert(ChangeFeed.applyPass(cat, "src", "replica", Seq("id"), ckpt,
      observe) >= 1L)
    assert(typeCounts("insert") === 100L)
    // k=5 rows alive at the update: ids 5,15,...,295 -> 30 rows
    assert(typeCounts("update_postimage") === 30L)
    assert(versions.size === 2)
    assert(cat.read("replica").exceptAll(cat.read("src")).isEmpty &&
      cat.read("src").exceptAll(cat.read("replica")).isEmpty)
    // phase C: nothing new upstream -> no batch, no commit
    val vBefore = cat.currentVersion
    assert(ChangeFeed.applyPass(cat, "src", "replica", Seq("id"), ckpt) === 0L)
    assert(cat.currentVersion === vBefore)
  }

  test("change-feed stream: anchored schema survives evolution; restart adopts it") {
    import graft.streaming.ChangeFeed
    val cat = new graft.lake.LakeCatalog(spark, tmpDir("cdcevolve"))
    val src = spark.range(1, 101).selectExpr("id", "id * 10 AS v")
    cat.createTable("src", src.schema, primaryKey = Seq("id"))
    cat.createTable("replica", src.schema)
    val ckpt = tmpDir("cdcevolve_ckpt")
    cat.insert("src", src.filter(col("id") <= 40))
    // ONE long-lived query spans the evolution: the source object (and so
    // the anchor) lives across micro-batches
    val q = ChangeFeed.readChanges(spark, cat.root, "src", Seq("id"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
          cat.applyChangesStreamBatch("replica", b.toDF(), Seq("id"), id); ()
      }
      .start()
    try {
      q.processAllAvailable() // consumes the pre-evolution insert
      // evolve the base mid-stream: new column arrives WITH data, plus a
      // post-evolution plain insert
      cat.insertEvolve("src", src.filter(col("id") > 40 && col("id") <= 70)
        .withColumn("tag", concat(lit("t"), col("id") % 2)))
      cat.insert("src", src.filter(col("id") > 70).withColumn("tag", lit("x")))
      // the running (anchored) stream keeps applying EXACTLY, projected
      // through its start-time schema — no failure, no corruption
      q.processAllAvailable()
    } finally q.stop()
    val anchored = cat.read("src").select("id", "v")
    assert(cat.read("replica").exceptAll(anchored).isEmpty &&
      anchored.exceptAll(cat.read("replica")).isEmpty)
    // a FRESH stream re-anchors at the evolved schema: full history
    // replays with the new column (pre-evolution rows read its default)
    val ckpt2 = tmpDir("cdcevolve_ckpt2")
    cat.createTable("replica2", cat.read("src").schema)
    assert(ChangeFeed.applyPass(cat, "src", "replica2", Seq("id"), ckpt2) === 1L)
    assert(cat.read("replica2").exceptAll(cat.read("src")).isEmpty &&
      cat.read("src").exceptAll(cat.read("replica2")).isEmpty)
  }

  test("change-feed stream: vacuumed resume point and replace both refuse loudly") {
    import graft.streaming.ChangeFeed
    val cat = new graft.lake.LakeCatalog(spark, tmpDir("cdcvacuum"))
    val src = spark.range(1, 61).selectExpr("id", "id * 10 AS v")
    cat.createTable("src", src.schema, primaryKey = Seq("id"))
    cat.createTable("replica", src.schema)
    val ckpt = tmpDir("cdcvacuum_ckpt")
    cat.insert("src", src.filter(col("id") <= 20))
    assert(ChangeFeed.applyPass(cat, "src", "replica", Seq("id"), ckpt) === 1L)
    // pile up commits, then expire the stream's resume point
    (1 to 12).foreach(i => cat.insert("src",
      src.filter(col("id") === 20L + i)))
    cat.vacuum(keepLast = 3, orphanGraceMs = 0L)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      ChangeFeed.applyPass(cat, "src", "replica", Seq("id"), ckpt)
    }
    assert(ex.getCause.getMessage.contains("vacuumed"))
    // a REPLACE restarts column identity -> a fresh stream past it works,
    // but one whose window crosses it refuses
    val cat2 = new graft.lake.LakeCatalog(spark, tmpDir("cdcreplace"))
    cat2.createTable("t", src.schema, primaryKey = Seq("id"))
    cat2.createTable("r", src.schema)
    val ckpt3 = tmpDir("cdcreplace_ckpt")
    cat2.insert("t", src.filter(col("id") <= 10))
    assert(ChangeFeed.applyPass(cat2, "t", "r", Seq("id"), ckpt3) === 1L)
    cat2.transaction { tx =>
      tx.createTableAs("t_stage", src.filter(col("id") > 50))
      tx.replaceTable("t", "t_stage")
    }
    val ex2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      ChangeFeed.applyPass(cat2, "t", "r", Seq("id"), ckpt3)
    }
    assert(ex2.getCause.getMessage.contains("replaced"))
    // rename-AWAY + recreate under the old name: the rename header only
    // carries the new name, but the recreated table's restarted schema
    // history conflicts with the anchor's — the merge must refuse rather
    // than silently mis-align column ids
    val cat3 = new graft.lake.LakeCatalog(spark, tmpDir("cdcrename"))
    cat3.createTable("t", src.schema, primaryKey = Seq("id"))
    cat3.createTable("r", src.schema)
    val ckpt4 = tmpDir("cdcrename_ckpt")
    cat3.insert("t", src.filter(col("id") <= 10))
    assert(ChangeFeed.applyPass(cat3, "t", "r", Seq("id"), ckpt4) === 1L)
    cat3.transaction(_.renameTable("t", "t_old"))
    cat3.createTable("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.StringType))))
    cat3.insert("t", src.filter(col("id") > 50)
      .selectExpr("id", "cast(v AS string) AS label"))
    val ex3 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      ChangeFeed.applyPass(cat3, "t", "r", Seq("id"), ckpt4)
    }
    assert(ex3.getCause.getMessage.contains("replaced or recreated"))
  }

  test("streaming dedup collapses a duplicated stream back to the batch profile") {
    import spark.implicits._
    val streamed = EventStream.dedupProfile(spark, d)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // the stream saw every event TWICE; after dropDuplicatesWithinWatermark
    // its per-type profile must equal the single-copy batch profile exactly
    val batch = Tables.events(spark, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(streamed === batch)
  }
}
