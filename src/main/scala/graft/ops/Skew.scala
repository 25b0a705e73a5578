package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the 100 TB tool the reference never
  * needed at sheet scale).
  *
  * Salting is applied ONLY to hot keys: the large side is split into a hot
  * slice (keys above a frequency threshold) and a cold slice. The cold
  * slice joins plainly — broadcast-eligible, no replication. The hot slice
  * gets a pseudo-random salt ∈ [0, factor) and joins against the small
  * side's matching rows replicated `factor` times, so one hot key fans out
  * across `factor` tasks instead of one straggler. Results union back.
  *
  * Salting every key (the naive form) replicates the ENTIRE small side
  * ×factor and forbids broadcast — at scale that turns a cheap broadcast
  * join into factor× shuffle traffic for the 99% of keys that were never
  * skewed. AQE's skew-join split (spark.sql.adaptive.skewJoin.enabled)
  * handles sort-merge skew automatically; salting is the explicit form for
  * deliberate layouts or pre-AQE engines.
  */
object Skew {

  /** Deterministic pseudo-salt (hash of the whole row + key), so retries
    * and resumed jobs place rows identically — no RNG state.
    */
  private def salt(keyCol: Column, factor: Int): Column =
    pmod(xxhash64(keyCol, monotonically_increasing_id()), lit(factor)).cast("int")

  /** Keys of `df` holding more than `minShare` of its rows, at most
    * `maxKeys` of them — the driver-side hot set. Output is bounded
    * (≤ maxKeys scalars), so the collect is contract-safe; the cost is two
    * aggregate-only scans of the key column (count + histogram), the same
    * shape as [[keySkew]].
    */
  def detectHotKeys(
      df: DataFrame,
      key: String,
      minShare: Double = 0.01,
      maxKeys: Int = 100): Seq[Any] = {
    val total = df.count()
    if (total == 0) Nil
    else df.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= lit(total * minShare))
      .orderBy(desc("__n")).limit(maxKeys)
      .select(col(key)).collect().map(_.get(0)).toSeq
  }

  /** Hot-key-only salted join. `hotKeys` may be supplied (e.g. from a
    * prior [[keySkew]] run or domain knowledge) to skip the detection
    * scans; `None` detects via [[detectHotKeys]]. With no hot keys the
    * result is exactly `large.join(small, key, how)` — same plan,
    * broadcast-eligible, zero salting overhead.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      factor: Int = 8,
      how: String = "inner",
      minShare: Double = 0.01,
      maxHotKeys: Int = 100,
      hotKeys: Option[Seq[Any]] = None): DataFrame = {
    require(how == "inner" || how == "left" || how == "left_outer",
      s"saltedJoin supports inner/left joins, got $how")
    val hot: Seq[Any] = hotKeys.getOrElse(detectHotKeys(large, key, minShare, maxHotKeys))
    if (hot.isEmpty) {
      large.join(small, Seq(key), how)
    } else {
      // NULL keys are never hot: isin(null) is NULL → coalesce to false
      // keeps them on the cold path (inner drops them there; left keeps
      // them unmatched there — either way exactly once).
      val isHot = coalesce(col(key).isin(hot: _*), lit(false))
      val cold = large.filter(!isHot).join(small, Seq(key), how)
      val saltedLarge = large.filter(isHot).withColumn("__salt", salt(col(key), factor))
      val salts = explode(array((0 until factor).map(lit): _*)).as("__salt")
      val replicatedSmall = small.filter(coalesce(col(key).isin(hot: _*), lit(false)))
        .select(col("*"), salts)
      val hotJoined = saltedLarge.join(replicatedSmall, Seq(key, "__salt"), how).drop("__salt")
      cold.unionByName(hotJoined)
    }
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
