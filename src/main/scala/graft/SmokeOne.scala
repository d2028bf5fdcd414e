package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query smoke runner: `runMain graft.SmokeOne <name> <sfDir>`
  * prints the query's result — the fast inner loop while authoring a new
  * judged query (full Verify replays all of them). */
object SmokeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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
    val df = SparkEntry.queries(name)(spark, sfDir)
    // optional third arg: dump dir — write the result as Verify would, so a
    // single edited query can be oracle-compared without replaying all 224
    if (args.length > 2) {
      df.coalesce(1).write.mode("overwrite").parquet(s"${args(2)}/$name")
      println(s"[smokeone] wrote ${args(2)}/$name")
    } else df.show(50, false)
    spark.stop()
  }
}
