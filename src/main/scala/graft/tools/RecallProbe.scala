package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev diagnostic: per-query recall of the IVF / PQ ANN indexes against
  * exact top-R for several R, plus the worst best-rank over the query
  * set — the measurements that size [[graft.ops.Ivf.PerQueryRankFloor]]
  * (the judged `found_true_neighbor` floor). Re-run after touching the
  * index parameters or the embeddings fixture:
  * `sbt "runMain graft.tools.RecallProbe <sfDir>"`.
  * Measured 2026-08-15: worst best-rank ivf 5 (sf1) / 7 (sf3),
  * pq 7 (sf1) / 10 (sf3) — floor 20 keeps ≥2x margin. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.DotProduct.register(spark)
    val e = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding AS array<double>) AS v")
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
      .persist()
    val queries = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val wExact = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    val exact = queries.join(e, col("qid") =!= col("vec_id"))
      .selectExpr("qid", "vec_id AS nid",
        "round(graft_dot(qv, v) / (qnrm * nrm), 6) AS cos")
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= 20)
      .select("qid", "nid", "rank").persist()
    val nQ = queries.count()
    def report(name: String, ann: DataFrame): Unit = {
      for (r <- Seq(3, 5, 10, 20)) {
        val hits = ann.select("qid", "nid")
          .join(exact.filter(col("rank") <= r), Seq("qid", "nid"), "left_semi")
          .groupBy("qid").agg(count(lit(1)).as("h"))
        val zero = nQ - hits.count()
        println(s"PROBE $name R=$r zero_recall_queries=$zero / $nQ")
      }
      // worst best-rank: for each query, the best exact rank among its
      // ANN picks (within top-20); max over queries = the tightest R
      val best = ann.select("qid", "nid").join(exact, Seq("qid", "nid"))
        .groupBy("qid").agg(min("rank").as("best"))
      val worst = queries.select("qid")
        .join(best, Seq("qid"), "left")
        .agg(max(coalesce(col("best"), lit(99L)))).head().get(0)
      println(s"PROBE $name worst_best_rank=$worst")
    }
    report("ivf", graft.ops.Ivf.ivfTop3(spark, sfDir))
    report("pq", graft.ops.Pq.pqTop3(spark, sfDir))
  }
}
