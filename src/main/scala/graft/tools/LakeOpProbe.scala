package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.util.concurrent.atomic.AtomicInteger

/** Dev diagnostic: per-operation Spark JOB COUNTS for the lake commit
  * machinery — where the ~12 jobs/op floor in the l* scenarios comes
  * from. `sbt "runMain graft.tools.LakeOpProbe <sfDir>"` prints one
  * line per op; use it to target job-count cuts that pay across every
  * lake scenario. */
object LakeOpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val jobs = new AtomicInteger(0)
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val d = Option(js.properties).map { p =>
          import scala.jdk.CollectionConverters._
          val keys = p.stringPropertyNames().asScala
          keys.filter(k => k.contains("callSite") || k.contains("description"))
            .toSeq.sorted.map(k => p.getProperty(k)).headOption.getOrElse(
              js.stageInfos.lastOption.map(_.name).getOrElse("?"))
        }.getOrElse(js.stageInfos.lastOption.map(_.name).getOrElse("?"))
        sites.add(d)
      }
    })
    def op[T](name: String)(f: => T): T = {
      Thread.sleep(150) // let queued listener events drain
      val before = jobs.get(); val t0 = System.nanoTime()
      val r = f
      Thread.sleep(150)
      import scala.jdk.CollectionConverters._
      val mine = sites.asScala.toSeq
      sites.clear()
      println(f"OP $name%-28s jobs=${jobs.get() - before}%3d " +
        f"ms=${(System.nanoTime() - t0) / 1e6}%8.1f  " +
        mine.groupBy(identity).view.mapValues(_.size).toSeq
          .sortBy(-_._2).map { case (k, n) => s"$k x$n" }.mkString(", "))
      r
    }
    val root = java.nio.file.Files.createTempDirectory("opprobe").toString
    val cat = new graft.lake.LakeCatalog(spark, root)
    val src = graft.Tables.orders(spark, sfDir).selectExpr(
      "cast(o_orderkey AS bigint) AS id",
      "cast(o_custkey % 20 AS bigint) AS k",
      "cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint) AS v")
    op("createTable")(cat.createTable("t", StructType(Seq(
      StructField("id", LongType), StructField("k", LongType),
      StructField("v", LongType))), primaryKey = Seq("id")))
    op("insert1 (3k rows)")(cat.insert("t", src.filter(col("id") <= 3000)))
    op("insert2 (1k rows)")(cat.insert("t",
      src.filter(col("id") > 3000 && col("id") <= 4000)))
    op("update")(cat.update("t", col("id") <= 500,
      Map("v" -> (col("v") + 100L))))
    op("delete")(cat.delete("t", col("k") === 7L))
    op("createTableAs dim")(cat.createTableAs("dm", spark.range(20)
      .selectExpr("cast(id AS bigint) AS k", "cast(id % 4 AS bigint) AS grp")))
    op("mv createJoin")(graft.lake.Mv.createJoin(cat, "mv", "t", "dm",
      "k", "k", Some("id % 2 = 0"), Seq("grp"), sums = Seq("v"),
      mins = Seq("v"), maxs = Seq("v")))
    op("insert3 (fast-fold delta)")(cat.insert("t",
      src.filter(col("id") > 4000 && col("id") <= 5000)))
    op("mv refresh insert-only")(graft.lake.Mv.refresh(cat, "mv"))
    op("deleteMin")(cat.delete("t", col("v") < 10000000L))
    op("mv refresh delete")(graft.lake.Mv.refresh(cat, "mv"))
    op("dim update")(cat.update("dm", col("k") === 3L,
      Map("grp" -> lit(0L))))
    op("mv refresh dim-churn")(graft.lake.Mv.refresh(cat, "mv"))
    op("final read")(cat.read("mv").collect())
    // CDC streaming pass cost: a first pass draining the table's whole
    // history (one batch, N O(churn) windows), an incremental pass over
    // one new commit, and a noop pass (no new data → no batch)
    cat.createTable("rep", StructType(Seq(
      StructField("id", LongType), StructField("k", LongType),
      StructField("v", LongType))))
    val ckpt = java.nio.file.Files.createTempDirectory("opprobe_ckpt").toString
    op("cdc pass (full history)")(graft.streaming.ChangeFeed.applyPass(
      cat, "t", "rep", Seq("id"), ckpt))
    op("insert4 (1k rows)")(cat.insert("t",
      src.filter(col("id") > 5000 && col("id") <= 6000)))
    op("cdc pass (1 commit)")(graft.streaming.ChangeFeed.applyPass(
      cat, "t", "rep", Seq("id"), ckpt))
    op("cdc pass (noop)")(graft.streaming.ChangeFeed.applyPass(
      cat, "t", "rep", Seq("id"), ckpt))
    // O(churn) receipt: the SAME update churn against a small and a
    // full-size base, files range-clustered on id so the churn lands in
    // few files — the feed read must cost O(churned files), flat in
    // table size. (A hash-spread layout would smear the churn across
    // every file; clustering is what bounds it, exactly as at 100 TB.)
    val full = src.count()
    Seq(("small", 2000L), (s"big (${full} rows)", full + 10)).foreach {
      case (tag, n) =>
        val t = s"fs_${tag.takeWhile(_ != ' ')}"
        cat.createTable(t, StructType(Seq(
          StructField("id", LongType), StructField("k", LongType),
          StructField("v", LongType))))
        op(s"feed base insert $tag")(
          cat.insert(t, src.filter(col("id") <= n).orderBy("id")))
        val v0 = cat.currentVersion
        op(s"feed churn update $tag")(
          cat.update(t, col("id") < 200, Map("v" -> (col("v") + 1L))))
        op(s"feed read $tag")(
          cat.tableChanges(t, v0, cat.currentVersion, Seq("id")).count())
        // O(affected) merge receipt: the SAME 300-row net-change batch
        // (100 deletes + 100 updates + 100 inserts, carried change_type
        // routing — the fused CDC apply shape) against the small and the
        // full-size base. Jobs and wall must be ~flat in base size: the
        // NOT-MATCHED anti-join probes the AFFECTED files only, never
        // the full table.
        op(s"net merge 300 $tag") {
          val net = spark.range(0, 300).selectExpr(
            "id * 2 AS id", "id % 20 AS k", "id AS v",
            "CASE WHEN id < 100 THEN 'delete' ELSE 'insert' END AS change_type")
          cat.transaction(_.mergeClauses(t, net, Seq("id"),
            graft.lake.MergeClauses(
              matchedDelete = Some("s.change_type = 'delete'"),
              matchedUpdate = Some("s.change_type <> 'delete'"),
              notMatchedInsert = Some("change_type <> 'delete'")),
            carry = Seq("change_type")))
        }
    }
    // CONCURRENT-WRITER throughput ledger (the reference's "1000x more
    // concurrent writers" claim, README.md:244): K racing writers x M
    // single-row inserts each, (a) all into ONE table — every loser
    // re-runs its body (true write-write conflict), (b) each into its
    // OWN table — losers REBASE (republish on the new head, zero body
    // re-runs). Prints commits/s and the OCC retry (= body re-run)
    // count for each; the disjoint case's retries must be 0.
    def writerLedger(tag: String, k: Int, m: Int)(tableOf: Int => String): Unit = {
      (0 until k).foreach { w =>
        val t = tableOf(w)
        if (!cat.current.tables.contains(t))
          cat.createTable(t, StructType(Seq(StructField("id", LongType))))
      }
      graft.lake.LakeCatalog.occRetries.reset()
      val gate = new java.util.concurrent.CountDownLatch(1)
      val t0 = System.nanoTime()
      val ws = (0 until k).map { w =>
        new Thread(() => {
          gate.await()
          (0 until m).foreach { i =>
            cat.transaction(_.insert(tableOf(w),
              spark.range(w.toLong * 1000 + i, w.toLong * 1000 + i + 1).toDF("id")))
          }
        })
      }
      ws.foreach(_.start()); gate.countDown(); ws.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val retries = graft.lake.LakeCatalog.occRetries.sum()
      println(f"WRITERS $tag%-24s K=$k M=$m commits=${k * m} " +
        f"wall=${sec}%6.2fs rate=${k * m / sec}%6.2f commits/s " +
        f"bodyReruns=$retries")
    }
    Seq(1, 4, 8).foreach(k => writerLedger(s"conflicting(K=$k)", k, 4)(_ => "wc"))
    Seq(1, 4, 8).foreach(k => writerLedger(s"disjoint(K=$k)", k, 4)(w => s"wd$w"))
    // MANIFEST HEADER-HISTORY GROWTH: every snapshot document embeds the
    // full O(versions) header history (Manifest.scala) — this measures
    // the actual curve: document bytes, per-commit wall, and COLD
    // snapshot-load time at increasing commit depths, then the same
    // after vacuum (expiry trims snapshot DOCUMENTS but headers are the
    // expiry/tag ledger and persist — the probe quantifies what that
    // costs at depth). Uses inlined single-row inserts so the commit is
    // all metadata, no parquet churn.
    val groot = java.nio.file.Files.createTempDirectory("opprobe_growth").toString
    val gcat = new graft.lake.LakeCatalog(spark, groot)
    gcat.createTable("g", StructType(Seq(StructField("id", LongType))))
    var done = 0
    // HEAD document bytes (v{N}.json) — the per-commit metadata write
    def docBytes(): Long =
      new java.io.File(new java.io.File(groot, "_manifest"),
        s"v${gcat.currentVersion}.json").length()
    def coldLoadMs(): Double = {
      val t0 = System.nanoTime()
      val c = new graft.lake.LakeCatalog(spark, groot)
      c.current
      (System.nanoTime() - t0) / 1e6
    }
    Seq(250, 1000, 4000).foreach { depth =>
      val leg = depth - done
      val t0 = System.nanoTime()
      while (done < depth) {
        gcat.transaction(_.insertInlined("g",
          spark.range(done.toLong, done.toLong + 1).toDF("id")))
        done += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"GROWTH depth=$done%5d legMs=${sec * 1000}%9.1f " +
        f"perCommitMs=${sec * 1000 / math.max(1, leg)}%7.2f " +
        f"docKB=${docBytes() / 1024.0}%8.1f coldLoadMs=${coldLoadMs()}%8.1f")
    }
    gcat.vacuum(keepLast = 50, orphanGraceMs = 0L)
    println(f"GROWTH after vacuum(keepLast=50): docKB=${docBytes() / 1024.0}%8.1f " +
      f"coldLoadMs=${coldLoadMs()}%8.1f")
    // flush the fixture's inlined rows to parquet (compaction) so the
    // remaining doc bytes measure METADATA, not the 4k inlined rows the
    // fixture accumulated (inlining is a data-placement choice)
    gcat.compact("g")
    println(f"GROWTH after inline flush: docKB=${docBytes() / 1024.0}%8.1f " +
      f"coldLoadMs=${coldLoadMs()}%8.1f")
    // post-vacuum steady state: 50 more commits on the compacted tail —
    // per-commit wall and doc size must be FLAT now (O(retained tail)),
    // the receipt that header compaction closed the unbounded curve
    val t1 = System.nanoTime()
    (0 until 50).foreach { i =>
      gcat.transaction(_.insertInlined("g",
        spark.range(10000L + i, 10001L + i).toDF("id")))
    }
    val sec1 = (System.nanoTime() - t1) / 1e9
    println(f"GROWTH post-compact 50 commits: perCommitMs=${sec1 * 20}%7.2f " +
      f"docKB=${docBytes() / 1024.0}%8.1f coldLoadMs=${coldLoadMs()}%8.1f")
    spark.stop()
  }
}
