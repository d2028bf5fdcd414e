package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: end-to-end timings for the streaming queries. QTime cannot
  * measure these — a streaming query's builder BLOCKS inside drainToTable,
  * so the work happens before QTime's timer starts; here the whole
  * build+drain+count is timed. Two passes: pass 2 is the steady state
  * (codegen compiled, source tables warm). `SP=<n>` overrides the
  * stateful-operator partition count for A/B runs. */
object StBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // SPARK_GRAFT_CBO=0 re-runs the A/B (plan-stats estimation off)
    val cboOn = (!sys.env.get("SPARK_GRAFT_CBO").contains("0")).toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
      .config("spark.graft.streaming.statePartitions", sys.env.getOrElse("SP", "4"))
      // PROVIDER=rocksdb: A/B the state-store backend (the default
      // HDFSBackedStateStore clones the whole version map per batch)
      .config("spark.sql.streaming.stateStore.providerClass",
        if (sys.env.get("PROVIDER").contains("rocksdb"))
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        else
          "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // ST_STAGES=1: per-stage task-time vs wall for every stage in the
    // drains — attributes addBatch to data work vs state-store/commit
    // fixed cost (stage wall >> task/parallelism means fixed cost)
    if (sys.env.contains("ST_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val wall = (for {s <- si.submissionTime; e <- si.completionTime}
              yield e - s).getOrElse(0L)
            if (wall > 50)
              println(s"STSTAGE s${si.stageId} n=${si.numTasks} " +
                s"task=${si.taskMetrics.executorRunTime}ms wall=${wall}ms " +
                si.name.takeWhile(_ != '('))
          }
        })
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.warm(spark, sfDir)
    val qs = Seq("st1_stream_window", "st2_stream_sessions", "st3_stream_dedup",
      "st4_stream_join", "st5_stream_gap_sessions", "st6_stream_enrich",
      "st7_stream_outer_join", "st8_stream_sliding")
    // SPLIST=4,8: alternate the state-partition count per pass INSIDE one
    // session — cross-session host drift (±20%) swamps any A/B done as
    // two separate runs. statePartitions is re-read per drain (fresh
    // checkpoint each time), so it can vary at runtime.
    val spList = sys.env.get("SPLIST").map(_.split(",").toSeq)
      .getOrElse(Seq(spark.conf.get("spark.graft.streaming.statePartitions")))
    for (pass <- 1 to (if (spList.length > 1) spList.length else 2)) {
      val sp = spList(math.min(pass - 1, spList.length - 1))
      spark.conf.set("spark.graft.streaming.statePartitions", sp)
      var tot = 0.0
      for (q <- qs) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        tot += sec
        println(f"STBENCH pass=$pass sp=$sp $q sec=$sec%.2f")
      }
      println(f"STBENCH pass=$pass sp=$sp TOTAL sec=$tot%.2f")
    }
    spark.stop()
  }
}
