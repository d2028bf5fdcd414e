package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic

/** The one constructor a v1 streaming `Source` needs and Spark keeps
  * `private[sql]`: `getBatch` must return a DataFrame whose logical plan
  * carries `isStreaming = true` (MicroBatchExecution asserts it), and the
  * only public-API ways to build a DataFrame all produce batch plans.
  * Spark's own v1 sources (FileStreamSource, MemoryStream) call
  * `internalCreateDataFrame(rdd, schema, isStreaming = true)` for exactly
  * this; this shim lives in a `org.apache.spark.sql` subpackage purely to
  * satisfy the `private[sql]` access check and re-export that call.
  *
  * The wrap is lazy end to end: `queryExecution.toRdd` is the planned
  * distributed RDD of the batch plan (scans, joins, shuffles all intact
  * and executor-side), so no rows touch the driver — the streaming flag
  * changes plan bookkeeping, not execution.
  */
object StreamFrame {
  def asStreaming(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }
}
