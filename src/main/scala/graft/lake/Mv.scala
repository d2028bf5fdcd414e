package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally maintained aggregate MATERIALIZED VIEWS over lake
  * tables (no direct reference analog — the reference's views,
  * demos/03_schema_evolution/demo.py:273-288, recompute on read; this is
  * the lakehouse-standard maintained-aggregate pattern on top of the
  * same snapshot machinery).
  *
  * An MV is a real lake table holding
  * `SELECT keys…, count(*) AS n_rows, sum(col) AS sum_<col>…` over a
  * base table, plus table properties recording its spec and the base
  * catalog version it reflects. `refresh` advances it by applying the
  * CHANGE FEED between that watermark and now:
  *
  *  - the delta rows ([[LakeCatalog.tableChanges]]) are aggregated per
  *    group with a +1/−1 sign (insert/update_postimage vs
  *    delete/update_preimage), one shuffle over the DELTA;
  *  - changed groups join the current MV on the group key (delta-sized
  *    build side) and merge back copy-on-write; groups whose count
  *    reaches zero are deleted.
  *
  * Work is O(changed rows + changed groups), never O(base table) — at
  * 100 TB a daily refresh costs the day's delta, not a table scan. When
  * the watermark version has been vacuumed away the change feed is
  * unreadable, so refresh falls back to a full recompute (correct,
  * proportional to the table — the documented cost of expiring history
  * an MV still needed). Only count/sum (and anything derivable: avg)
  * are maintained: min/max are not incrementally maintainable under
  * deletes without keeping per-group history.
  *
  * Counts and sums ride integer/decimal arithmetic end-to-end when the
  * summed columns are integral; for floating columns the caller should
  * pre-scale to integers (cents) if cross-engine exactness matters.
  */
object Mv {
  private val PBase = "mv.base"
  private val PKeys = "mv.keys"
  private val PSums = "mv.sums"
  private val PVersion = "mv.version"

  private def aggExprs(sums: Seq[String]): Seq[Column] =
    count(lit(1)).as("n_rows") +:
      sums.map(c => sum(col(c)).as(s"sum_$c"))

  /** Create `mv` as the materialized grouped aggregate of `base`,
    * atomically with its spec + watermark properties. */
  def create(cat: LakeCatalog, mv: String, base: String,
      keys: Seq[String], sums: Seq[String]): Unit = cat.transaction { tx =>
    require(keys.nonEmpty, "mv needs at least one group key")
    val df = tx.read(base).groupBy(keys.map(col): _*)
      .agg(aggExprs(sums).head, aggExprs(sums).tail: _*)
    tx.createTable(mv, df.schema, primaryKey = keys)
    tx.insert(mv, df)
    tx.setProperty(mv, PBase, base)
    tx.setProperty(mv, PKeys, keys.mkString(","))
    tx.setProperty(mv, PSums, sums.mkString(","))
    tx.setProperty(mv, PVersion, tx.commitVersion.toString)
  }

  /** Advance `mv` to the base table's current state. Returns "noop"
    * (already fresh), "incremental" (delta applied) or "full"
    * (watermark expired → recompute) — the path actually taken, so
    * callers and tests can assert the O(delta) contract. */
  def refresh(cat: LakeCatalog, mv: String): String = {
    object AlreadyFresh extends Exception
    var mode = "noop"
    try cat.transaction { tx =>
      val props = tx.properties(mv)
      val base = props.getOrElse(PBase,
        throw new IllegalArgumentException(s"$mv is not a materialized view"))
      val keys = props(PKeys).split(",").toSeq.filter(_.nonEmpty)
      val sums = props(PSums).split(",").toSeq.filter(_.nonEmpty)
      val lastV = props(PVersion).toLong
      val curV = tx.baseVersion
      if (lastV == curV) throw AlreadyFresh // no empty snapshot
      if (tx.versionExpired(lastV)) {
        // watermark vacuumed: the feed below it is gone — full reload
        mode = "full"
        tx.delete(mv, lit(true))
        val df = tx.read(base).groupBy(keys.map(col): _*)
          .agg(aggExprs(sums).head, aggExprs(sums).tail: _*)
        tx.insert(mv, df)
      } else {
        mode = "incremental"
        val delta = cat.tableChanges(base, lastV, curV)
        val sign = when(
          col("change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L)
        val dAggs = sum(sign).as("__dn") +:
          sums.map(c => sum(sign * col(c)).as(s"__d_$c"))
        val deltaAgg = delta.groupBy(keys.map(col): _*)
          .agg(dAggs.head, dAggs.tail: _*)
        // join changed groups against their CURRENT MV row (delta-sized)
        val cur = tx.read(mv)
        val joined = deltaAgg.join(cur, keys, "left_outer")
        val updated = joined.select(
          (keys.map(col) ++
            Seq((coalesce(col("n_rows"), lit(0L)) + col("__dn")).as("n_rows")) ++
            sums.map(c =>
              (coalesce(col(s"sum_$c"), lit(0L).cast(cur.schema(s"sum_$c").dataType)) +
                col(s"__d_$c")).as(s"sum_$c"))): _*)
        tx.merge(mv, updated, keys)
        tx.delete(mv, col("n_rows") <= 0L)
      }
      tx.setProperty(mv, PVersion, tx.commitVersion.toString)
    } catch { case AlreadyFresh => () }
    mode
  }
}
