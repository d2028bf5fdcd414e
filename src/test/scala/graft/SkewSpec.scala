package graft

import org.apache.spark.sql.functions._

/** Salting must not change join semantics, and must actually spread a
  * hot key across shuffle partitions. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join on heavily skewed data") {
    // 1 hot key with 50k rows + 1k cold keys
    val big = spark.range(50000).selectExpr("1 AS k", "id AS payload")
      .unionByName(spark.range(1000).selectExpr(
        "cast(id + 2 AS int) AS k", "id AS payload"))
      .withColumn("k", col("k").cast("int"))
    val small = (1 to 1001).map(i => (i, s"dim_$i")).toDF("k", "name")

    val plain = big.join(small, "k")
    val salted = ops.Skew.saltedJoin(big, small, "k", salt = 8)
    assert(salted.count() === plain.count())
    // exact multiset equality
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)

    // the hot key's rows now live under 8 distinct composite keys: the
    // shuffle distribution over (k, salt) has no partition holding more
    // than ~1/salt of the hot key (+ slack)
    val spread = big.withColumn("__salt",
        pmod(hash(big.columns.map(col): _*), lit(8)))
      .filter($"k" === 1)
      .groupBy("__salt").count()
      .agg(max("count")).as[Long].head()
    assert(spread < 50000 * 0.3, s"hot key should spread, max bucket=$spread")
  }

  test("AQE splits the skewed partition of a shuffle join at runtime") {
    // The no-code-change complement to manual salting: when BOTH join
    // sides are too big to broadcast, AQE's OptimizeSkewedJoin detects
    // the oversized shuffle partition from runtime stats and splits it
    // across tasks. This is the 100-TB default defense — salting (j6) is
    // only needed where AQE can't act (aggregations, forced partitioning).
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "131072")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~90% of the left side lands on one key -> one shuffle partition
      // dwarfs the median and must be split. The payload must ride the
      // shuffle and be incompressible (xxhash64), or lz4 shrinks the
      // hot partition's identical keys below the skew threshold and AQE
      // correctly sees nothing to split.
      val left = spark.range(2000000)
        .selectExpr("IF(id % 10 = 0, id, 0L) AS k", "xxhash64(id) AS v")
      val right = spark.range(20000).selectExpr("id AS k", "id AS w")
      val j = left.join(right, "k")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(38,0)")).as("sv"))
      // 1.8M hot-key rows match right k=0, plus the 2k multiples of 10
      // below 20000 that match their own key. collect(), not head() —
      // head() plans a separate limit query and would leave THIS plan
      // unexecuted (isFinalPlan=false, no runtime stats, no skew mark).
      assert(j.collect().head.getLong(0) === 1802000L)
      val s = j.queryExecution.executedPlan.toString()
      assert(s.contains("SortMergeJoin"), s.take(1500))
      assert(s.contains("skew=true"),
        "AQE must mark the skewed join side split\n" + s.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
