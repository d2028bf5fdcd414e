package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time one named query at a given SF dir.
  * usage: runMain graft.QTime <sfDir> <name> [<name>...] */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_CBO=0 re-runs the A/B (plan-stats estimation off)
    val cboOn = (!sys.env.get("SPARK_GRAFT_CBO").contains("0")).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // QTIME_SHUF=n: A/B the per-task scheduling cost of shuffle width
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("QTIME_SHUF", cpus))
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
      // QTIME_NOAQE=1: A/B the adaptive-execution overhead on tiny queries
      .config("spark.sql.adaptive.enabled",
        (!sys.env.contains("QTIME_NOAQE")).toString)
      // QTIME_PARFIRST=0: let AQE coalesce small shuffles by SIZE (down
      // to 1 partition) instead of protecting parallelism
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("QTIME_PARFIRST", "1") match {
          case "0" => "false"; case _ => "true" })
      // QTIME_MINPART=<bytes>: A/B AQE's shuffle-read coalescing floor —
      // the default 1 MB collapses CPU-heavy small-byte stages (a 1M-row
      // distinct of ints is ~3 MB compressed → 3 tasks on 32 cores)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("QTIME_MINPART", "1m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // QTIME_STATEPARTS=n: A/B the streaming state-store shard count
    sys.env.get("QTIME_STATEPARTS").foreach(
      spark.conf.set("spark.graft.streaming.statePartitions", _))
    spark.range(1000000).selectExpr("sum(id)").collect()
    // QTIME_WARM=1 reproduces Bench's conditions (tables persisted once)
    if (sys.env.contains("QTIME_WARM")) Tables.warm(spark, sfDir)
    val explain = sys.env.contains("QTIME_EXPLAIN")
    // QTIME_JOBS=1: per-job wall-clock + per-stage task-time breakdown for
    // each timed query — attributes a query's exec bucket to its scheduled
    // jobs (AQE runs each materialized query stage as its own job, so the
    // job COUNT times the ~70 ms local-mode job constant is often the
    // whole story for sub-second queries)
    val jobsMode = sys.env.contains("QTIME_JOBS")
    val jobLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    // jobId -> user-code callsite (from the job's local properties — the
    // stage name for SQL actions is the useless executor-pool frame)
    val jobSite = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    // (stageId, completionTime, nTasks, sum task executorRunTime ms,
    //  stage wall ms, callsite) — sum/32 is the ideal-parallel data time;
    // stage wall minus that is scheduling/launch/skew
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Long, Int, Long, Long, String)]()
    if (jobsMode) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(js.jobId, js.time)
          Option(js.properties).foreach { p =>
            val site = Seq("callSite.short", "spark.job.description",
              "spark.jobGroup.id")
              .flatMap(k => Option(p.getProperty(k))).headOption
            jobSite.put(js.jobId, site.getOrElse("?").take(90))
          }
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = Option(starts.remove(je.jobId)).getOrElse(je.time)
          jobLog.add((je.jobId, s, je.time))
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; e <- si.completionTime}
            yield e - s).getOrElse(0L)
          stageLog.add((si.stageId, si.completionTime.getOrElse(0L),
            si.numTasks, si.taskMetrics.executorRunTime, wall,
            si.name.replaceAll("\\s+", " ").take(60)))
        }
      })
    // QTIME_PHASE=1: decompose the per-query constant — plan build,
    // Catalyst analyze+optimize+physical planning, then execution — to
    // attribute the local-mode floor (~50-70 ms/query) to its source
    val phase = sys.env.contains("QTIME_PHASE")
    args.drop(1).foreach { name =>
      if (phase) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        // time the plan count() will actually RUN (df.count() builds a
        // fresh Aggregate-over-df QueryExecution — planning `df` itself
        // would push that second Catalyst pass into the exec bucket)
        val counted = df.groupBy().count()
        counted.queryExecution.executedPlan // forces analyze+optimize+plan
        val t2 = System.nanoTime()
        val n = counted.head().getLong(0)
        val t3 = System.nanoTime()
        println(f"QPHASE $name rows=$n build=${(t1 - t0) / 1e6}%.0fms " +
          f"plan=${(t2 - t1) / 1e6}%.0fms exec=${(t3 - t2) / 1e6}%.0fms")
      } else {
        // QTIME_BUILDJOBS=1: include jobs run DURING the builder call in
        // the QJOBS/QSTAGES windows — lake scenarios and driver-loop ops
        // (l*, dd6/dd7) do their work at build time
        val preEpoch = System.currentTimeMillis()
        val preT0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val buildSec = (System.nanoTime() - preT0) / 1e9
        if (explain) df.explain("formatted")
        else if (sys.env.contains("QTIME_FINAL")) {
          // post-execution adaptive plan: explain() shows the INITIAL
          // plan; AQE's runtime SMJ→BHJ conversions and coalesced
          // exchanges only appear in executedPlan after an action
          df.collect()
          println(s"QFINAL $name\n${df.queryExecution.executedPlan}")
        } else {
          // epoch-filter (not clear+sleep): late async listener events
          // from a previous query can't leak into this query's log, and
          // we poll until the count stabilizes instead of hoping 300 ms
          // is enough under load
          val buildMode = sys.env.contains("QTIME_BUILDJOBS")
          val epoch =
            if (buildMode) preEpoch else System.currentTimeMillis()
          val t0 = System.nanoTime()
          val n = df.count()
          val sec0 = (System.nanoTime() - t0) / 1e9
          val sec = if (buildMode) sec0 + buildSec else sec0
          println(f"QTIME $name rows=$n sec=$sec%.2f" +
            (if (buildMode) f" (build=$buildSec%.2f)" else ""))
          if (jobsMode) {
            def mine = jobLog.toArray(Array.empty[(Int, Long, Long)])
              .filter(_._2 >= epoch)
            var prev = -1
            var waited = 0
            while (mine.length != prev && waited < 1000) {
              prev = mine.length; Thread.sleep(100); waited += 100
            }
            val jobs = mine.sortBy(_._1)
            val busy = jobs.map { case (_, s, e) => e - s }.sum
            println(f"QJOBS $name n_jobs=${jobs.length} " +
              f"job_ms_sum=$busy gap_ms=${(sec * 1000).toLong - busy} " +
              jobs.map { case (id, s, e) => s"j$id=${e - s}ms" }
                .mkString(" "))
            val stages = stageLog.toArray(
              Array.empty[(Int, Long, Int, Long, Long, String)])
              .filter(_._2 >= epoch).sortBy(_._1)
            val taskSum = stages.map(_._4).sum
            println(f"QSTAGES $name n_stages=${stages.length} " +
              f"task_ms_sum=$taskSum " +
              f"ideal32_ms=${taskSum / 32} " +
              stages.map { case (id, _, n, t, w, _) =>
                s"s$id[n=$n task=${t}ms wall=${w}ms]" }.mkString(" "))
            // QTIME_STAGENAMES=1: group jobs by user-code callsite —
            // names which code path is spawning the job count
            if (sys.env.contains("QTIME_STAGENAMES"))
              jobs.groupBy { case (id, _, _) =>
                  Option(jobSite.get(id)).getOrElse("?") }.toSeq
                .map { case (nm, js) =>
                  (nm, js.length, js.map { case (_, s, e) => e - s }.sum) }
                .sortBy(-_._3)
                .foreach { case (nm, c, w) =>
                  println(s"QSITE $name x$c wall=${w}ms  $nm") }
          }
        }
      }
    }
    spark.stop()
  }
}
