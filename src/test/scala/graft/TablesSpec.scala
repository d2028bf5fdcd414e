package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.apache.spark.sql.Row

/** Pins the loader contract for the driver testdata — above all the events
  * timestamp, whose PHYSICAL parquet encoding has changed across driver
  * testdata generations (TIMESTAMP(NANOS) in rounds 1-6, TIMESTAMP(MICROS,
  * ntz) from round 7). The round-7 regression: assuming ns unconditionally
  * collapsed a µs timeline 1000×, so every streaming window/join/session
  * query silently answered a different question (0 emitted windows, every
  * click×purchase pair inside the join interval). These tests fail fast on
  * the NEXT encoding change instead. */
class TablesSpec extends SparkSpec {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("events.ts loads as TimestampType spanning a realistic timeline at every SF") {
    sfDirs.foreach { d =>
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType === TimestampType,
        s"$d: ts must normalize to TimestampType regardless of file encoding")
      val Row(mn: java.sql.Timestamp, mx: java.sql.Timestamp) =
        ev.agg(min("ts"), max("ts")).head()
      val spanH = (mx.getTime - mn.getTime) / 3600000.0
      // ns misread as µs (or vice versa) shrinks/stretches the span 1000×:
      // a real events table spans days; a collapsed one spans minutes
      assert(spanH > 24, f"$d: events span $spanH%.1f h — encoding misread?")
      assert(spanH < 24 * 3650, f"$d: events span $spanH%.1f h — encoding misread?")
      assert(mn.getTime > 0, s"$d: ts epoch-collapsed to 1970")
    }
  }

  test("bucketed warm cache: an orderkey join exchanges only the small side") {
    // Tables.warm hash-partitions lineitem/orders on orderkey (the cache
    // analog of CLUSTERED BY bucketing) precisely so the fact side of an
    // orderkey join needs NO exchange — q5's initial sort-merge plan used
    // to shuffle-write all of lineitem before AQE's broadcast conversion
    // could fire. Pin it: after warm, join the two on orderkey with
    // broadcast disabled (so the co-partitioning, not a broadcast, must
    // carry the plan) and count shuffle exchanges in the executed plan.
    // lineitem warms to more partitions than orders (65k rows/partition),
    // so exactly ONE side (orders) may exchange — never lineitem.
    val d = "/root/testdata/sf0.1"
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      Tables.warm(spark, d)
      val li = Tables.lineitem(spark, d)
      val o = Tables.orders(spark, d)
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // count only join-INSERTED exchanges (ENSURE_REQUIREMENTS) — the
      // plan string also prints the warm layout's own REPARTITION_BY_NUM
      // exchanges inside each cached relation's stored subtree
      val ensureReq = "Exchange hashpartitioning\\([^)]*\\), [0-9]+\\), ENSURE_REQUIREMENTS".r
        .findAllMatchIn(plan).length
      assert(ensureReq <= 1,
        s"expected at most one join-inserted exchange (orders side), got $ensureReq:\n$plan")
      assert("Exchange hashpartitioning\\(l_orderkey[^)]*\\), [0-9]+\\), ENSURE_REQUIREMENTS".r
        .findFirstIn(plan).isEmpty,
        s"the lineitem (fact) side must not re-exchange on its bucket key:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("warm spreads text/vector tables by per-row cost, not the relational row target") {
    // documents rows are ~350 chars of text (tokenize/regex downstream,
    // ~100x a lineitem row), so their cache must spread at a far smaller
    // rows/partition target — with the 65k relational default, the sf0.1
    // documents cache kept its raw 1-2 parquet partitions and the whole
    // text family ran serial on 32 cores (x20's sf1 pair-count stage:
    // 3.1 s of its 3.4 s wall on one task). Pin the layout: after warm,
    // documents and embeddings must spread to multiple partitions even
    // at sf0.1 row counts.
    val d = "/root/testdata/sf0.1"
    Tables.warm(spark, d)
    val docParts = Tables.documents(spark, d).rdd.getNumPartitions
    val embParts = Tables.embeddings(spark, d).rdd.getNumPartitions
    assert(docParts >= 4, s"documents cache spread too narrow: $docParts")
    assert(embParts >= 4, s"embeddings cache spread too narrow: $embParts")
  }

  test("streaming replay sees the same timeline as the batch loader") {
    val d = "/root/testdata/sf0.001"
    val batch = Tables.events(spark, d)
      .agg(min("ts"), max("ts"), count(lit(1))).head()
    val streamed = graft.streaming.EventStream.drainToTable(
      graft.streaming.EventStream.readEvents(spark, d),
      s"tbl_probe_${java.util.UUID.randomUUID().toString.replace("-", "")}",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .agg(min("ts"), max("ts"), count(lit(1))).head()
    assert(streamed === batch,
      "stream and batch loaders must agree on (min ts, max ts, row count)")
  }
}
