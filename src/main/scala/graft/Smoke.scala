package graft
import org.apache.spark.sql.SparkSession

/** Local smoke runner mirroring the driver's t1 check: entry() on sf0.001
  * must return >0 rows. Prints the rows so a human can eyeball them. */
object Smoke {
  def main(args: Array[String]): Unit = {
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
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(20, false)
    require(n > 0, "entry() returned 0 rows")
    spark.stop()
  }
}
