package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: AQE's skew-join split (on by
  * default) handles most cases at runtime; this is the explicit salting
  * pattern for the cases AQE can't fix — e.g. a hot key that must
  * aggregate, or a build side too big to split.
  *
  * The probe side's rows fan out over `salt` sub-keys (deterministic in
  * the row, via hash-mod — no rand(), so replays/retries stay stable);
  * the build side replicates once per sub-key. The join key becomes
  * (key, salt), so one hot key's rows spread over `salt` shuffle
  * partitions instead of one straggler task.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salt` ways. Result is
    * exactly the plain join's (salting is internal). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt >= 1)
    val bigCols = big.columns
    val b = big.withColumn("__salt",
      pmod(hash(bigCols.map(col): _*), lit(salt)))
    val s = small
      .withColumn("__salt", explode(expr(s"sequence(0, ${salt - 1})")))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
