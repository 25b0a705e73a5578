package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the 100 TB tool the reference never
  * needed at sheet scale).
  *
  * Salted broadcast-side replication: the skewed (large) side gets a
  * random salt ∈ [0, factor); the small side is replicated `factor` times
  * with every salt value; the join key becomes (key, salt). One hot key
  * fans out across `factor` tasks instead of one straggler.
  *
  * AQE's skew-join split (spark.sql.adaptive.skewJoin.enabled) handles
  * sort-merge skew automatically; salting is the explicit form for
  * deliberate layouts or pre-AQE engines.
  */
object Skew {

  /** Deterministic pseudo-salt (hash of the whole row + key), so retries
    * and resumed jobs place rows identically — no RNG state.
    */
  private def salt(keyCol: Column, factor: Int): Column =
    pmod(xxhash64(keyCol, monotonically_increasing_id()), lit(factor)).cast("int")

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      factor: Int = 8,
      how: String = "inner"): DataFrame = {
    val saltedLarge = large.withColumn("__salt", salt(col(key), factor))
    val salts = explode(array((0 until factor).map(lit): _*)).as("__salt")
    val replicatedSmall = small.select(col("*"), salts)
    saltedLarge.join(replicatedSmall, Seq(key, "__salt"), how).drop("__salt")
  }

  /** Key histogram to decide whether salting is worth it: top-n keys with
    * their share of rows.
    */
  def keySkew(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / lit(total.toDouble))
      .orderBy(desc("n"))
      .limit(topN)
  }
}
