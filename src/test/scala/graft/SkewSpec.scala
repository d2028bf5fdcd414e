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
}
