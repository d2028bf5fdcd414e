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
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.streaming.statePartitions", sys.env.getOrElse("SP", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.warm(spark, sfDir)
    val qs = Seq("st1_stream_window", "st2_stream_sessions", "st3_stream_dedup",
      "st4_stream_join", "st5_stream_gap_sessions", "st6_stream_enrich",
      "st7_stream_outer_join")
    for (pass <- 1 to 2; q <- qs) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      println(f"STBENCH pass=$pass $q sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
