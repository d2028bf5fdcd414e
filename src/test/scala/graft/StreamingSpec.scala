package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Structured Streaming semantics: the streaming windowed aggregation over
  * a finite replay must agree with its batch equivalent (for all windows
  * the final watermark closed), and keyed state accumulates correctly. */
class StreamingSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("streaming windowed agg agrees with the batch plan on closed windows") {
    val streamed = EventStream.windowedProfile(spark, d)
    val batch = Tables.events(spark, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
    import spark.implicits._
    val sm = streamed.select("win_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map(r => (r._1.getTime, r._2) -> r._3).toMap
    val bm = batch
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map(r => (r._1.getTime, r._2) -> r._3).toMap
    assert(sm.nonEmpty, "stream emitted no closed windows")
    // append-mode stream emits only watermark-closed windows; each must
    // match the batch count exactly
    sm.foreach { case (k, n) => assert(bm(k) === n, s"window $k") }
    // and the stream must have closed all but the trailing lateness bound
    assert(sm.size >= bm.size - 3)
  }

  test("flatMapGroupsWithState accumulates per-user session state") {
    import spark.implicits._
    val sess = EventStream.sessionProfile(spark, d)
      .as[(Long, Long, Int, Long, Long)].collect()
    assert(sess.nonEmpty)
    val batch = Tables.events(spark, d).groupBy("user_id")
      .agg(count(lit(1)).as("n"), countDistinct("event_type").as("nt"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    sess.foreach { case (uid, n, nt, first, last) =>
      assert(batch(uid)._1 === n, s"user $uid event count")
      assert(batch(uid)._2 === nt.toLong, s"user $uid type count")
      assert(first <= last)
    }
  }
}
