package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.LakeCatalog

/** Lake-operation benchmark mirroring the reference's harness
  * (ref exploration/benchmark_ducklake.sh:46-201 — table creation,
  * insert 1k, insert 50k, update with `id % 10 = 0`, delete with
  * `id % 5 = 0`, 5 metadata queries, 4 time-travel counts), plus the
  * inlined-write comparison (ref README.md:243 "sub-millisecond writes").
  * Prints ONE JSON line of seconds per op. */
object LakeBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_CBO=0 re-runs the A/B (plan-stats estimation off)
    val cboOn = (!sys.env.get("SPARK_GRAFT_CBO").contains("0")).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // cost-based optimization: lake-table scans carry exact manifest
      // statistics (rowCount/size/min-max/NDV via RelationStats), so the
      // INITIAL plan picks broadcast sides and join order from stats
      // instead of relying on AQE runtime repair; plain parquet reads
      // (no catalog stats) keep their default size-only estimates
      .config("spark.sql.cbo.enabled", cboOn)
      .config("spark.sql.cbo.planStats.enabled", cboOn)
      .config("spark.sql.cbo.joinReorder.enabled", cboOn)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // session warmup

    val cat = new LakeCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_lakebench_").toString)
    val results = collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      results(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    // 1. table creation (benchmark_ducklake.sh:46-61)
    timed("table_creation") {
      cat.createTable("bench_small", StructType(Seq(
        StructField("id", IntegerType), StructField("value", StringType))))
      cat.createTable("bench_large", StructType(Seq(
        StructField("id", LongType), StructField("name", StringType),
        StructField("amount", DoubleType), StructField("created_date", DateType),
        StructField("category", StringType)))) // :83-93 shape
    }
    // 2. insert 1k generated rows (:64-80)
    timed("insert_1k") {
      cat.insert("bench_small", spark.range(1000).selectExpr(
        "cast(id AS int) AS id", "concat('value_', id) AS value"))
    }
    // 3. insert 50k rows, 5 columns (:83-107)
    timed("insert_50k") {
      cat.insert("bench_large", spark.range(50000).selectExpr(
        "id", "concat('name_', id) AS name",
        "cast(id % 1000 AS double) / 10.0 AS amount",
        "date_add(date'2024-01-01', cast(id % 365 AS int)) AS created_date",
        "concat('cat_', id % 20) AS category"))
    }
    // 4. update 10% (id % 10 = 0) (:110-131)
    timed("update_10pct") {
      cat.update("bench_large", col("id") % 10 === 0,
        Map("amount" -> (col("amount") * 1.1)))
    }
    // 5. delete 20% (id % 5 = 0) (:134-152)
    timed("delete_20pct") {
      cat.delete("bench_large", col("id") % 5 === 0)
    }
    // 6. metadata queries x5 (:155-172)
    timed("metadata_5x") {
      (1 to 5).foreach { _ =>
        cat.snapshots().count(); cat.tableInfo().count()
      }
    }
    // 7. time-travel counts across 4 versions (:175-201)
    timed("time_travel_4x") {
      val cur = cat.currentVersion
      (cur - 3 to cur).foreach(v => cat.readAt("bench_large", v).count())
    }
    // 8. write-path comparison: 20 single-row appends, files vs inlined
    timed("append_20_files") {
      (0 until 20).foreach(i => cat.insert("bench_small",
        spark.range(1).selectExpr(s"cast(10000 + $i AS int) AS id",
          "'x' AS value")))
    }
    timed("append_20_inlined") {
      (0 until 20).foreach(i => cat.insertInlined("bench_small",
        spark.range(1).selectExpr(s"cast(20000 + $i AS int) AS id",
          "'x' AS value")))
    }
    // 9. layout maintenance: cluster the large table on its key, then a
    // stats-pruned range read over the clustered layout
    timed("cluster_50k") {
      cat.cluster("bench_large", Seq("id"), 256L << 10)
    }
    timed("range_read_pruned") {
      cat.readRange("bench_large", "id", "1000", "2000").count()
    }
    // 10. delete-path comparison on identical tables: copy-on-write
    // rewrites every affected file; merge-on-read writes only the
    // (file, pos) tombstones. The gap widens with file size — at 100 TB
    // it is the difference between terabytes rewritten and kilobytes
    // appended. A read over the DV'd table shows the anti-join cost.
    cat.createTableAs("del_cow", spark.range(200000).selectExpr(
      "id", "concat('payload_', id, '_', repeat('x', 64)) AS payload"))
    cat.cloneTable("del_cow", "del_mor") // identical zero-copy twin
    timed("delete_1pct_cow") {
      cat.delete("del_cow", col("id") % 100 === 0)
    }
    timed("delete_1pct_mor") {
      cat.deleteMor("del_mor", col("id") % 100 === 0)
    }
    timed("read_after_mor") {
      cat.read("del_mor").agg(sum(col("id"))).collect()
    }

    // 11. retention-delete comparison on a day-partitioned table: the
    // partition fast path touches ONE file (pure files drop metadata-
    // only) vs the generic CoW predicate delete scanning for affected
    // files. At 100 TB this is the daily retention sweep's cost model.
    def dayTable(name: String): Unit = {
      cat.createTable(name, StructType(Seq(
        StructField("id", LongType), StructField("day", StringType))),
        partitionBy = Seq("day"))
      cat.insert(name, spark.range(100000).selectExpr(
        "id", "concat('2024-01-', lpad(cast(id % 28 + 1 AS string), 2, '0')) AS day"))
    }
    dayTable("ret_fast"); dayTable("ret_cow")
    timed("retention_delete_partition") {
      cat.deletePartitions("ret_fast", Map("day" -> "2024-01-01"))
    }
    timed("retention_delete_predicate") {
      cat.delete("ret_cow", col("day") === "2024-01-01")
    }
    // 12. zero-copy import vs insert of the same external parquet
    val extDir = java.nio.file.Files.createTempDirectory("graft_lb_ext_").toString
    spark.range(200000).selectExpr("id", "concat('v_', id) AS value")
      .write.mode("overwrite").parquet(extDir)
    cat.createTable("imp_zero", StructType(Seq(
      StructField("id", LongType), StructField("value", StringType))))
    cat.createTable("imp_copy", StructType(Seq(
      StructField("id", LongType), StructField("value", StringType))))
    timed("import_add_files") {
      cat.addDataFiles("imp_zero", extDir)
    }
    timed("import_insert_copy") {
      cat.insert("imp_copy", spark.read.parquet(extDir))
    }
    // 13. concurrent-writer commit throughput vs K (README.md:244 claim):
    // K threads x 4 single-row inserts each — conflicting = one shared
    // table (every loser re-runs its body), disjoint = one table per
    // writer (losers take the zero-job REBASE republish). The ops map
    // carries wall seconds; throughput = K*4 / wall.
    def writerWall(k: Int, shared: Boolean): Double = {
      val tag = if (shared) "c" else "d"
      (0 until k).foreach { w =>
        val t = if (shared) s"w_${tag}_$k" else s"w_${tag}_${k}_$w"
        if (!cat.current.tables.contains(t))
          cat.createTable(t, StructType(Seq(StructField("id", LongType))))
      }
      val gate = new java.util.concurrent.CountDownLatch(1)
      val ws = (0 until k).map { w =>
        new Thread(() => {
          gate.await()
          (0 until 4).foreach { i =>
            val t = if (shared) s"w_${tag}_$k" else s"w_${tag}_${k}_$w"
            cat.transaction(_.insert(t,
              spark.range(w * 100L + i, w * 100L + i + 1).toDF("id")))
          }
        })
      }
      val t0 = System.nanoTime()
      ws.foreach(_.start()); gate.countDown(); ws.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    Seq(1, 4, 8).foreach { k =>
      results(s"writers_conflicting_k$k") = writerWall(k, shared = true)
      results(s"writers_disjoint_k$k") = writerWall(k, shared = false)
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"lake_ops_total","value":${results.values.sum},"unit":"sec","ops":$qs}""")
    spark.stop()
  }
}
