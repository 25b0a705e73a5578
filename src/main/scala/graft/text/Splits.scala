package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Leakage-safe train/validation/test assignment.
  *
  * A per-document hash split leaks: a doc in train and its near-duplicate
  * in test score as held-out data the model has effectively seen. The fix
  * is to split by UNIT — hash the near-dup CLUSTER id (from
  * [[graft.graphs.ConnectedComponents.dedupClusters]]), so every member
  * of a cluster lands in the same split. The assignment is a stable md5
  * draw (engine-mirrorable, reproducible across runs); weights are
  * integer bucket counts, so the boundaries are exact.
  */
object Splits {

  /** `split` column from a stable hash of `unit`: bucket =
    * md5-draw mod Σweights, assigned to names in order by cumulative
    * weight. `Seq("train" -> 8, "val" -> 1, "test" -> 1)` ⇒ 80/10/10.
    */
  def splitColumn(unit: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive, got $weights")
    val total = weights.map(_._2).sum
    val bucket = pmod(Scrub.hashDraw(unit), lit(total.toLong))
    // first-match-wins when-chain over cumulative boundaries
    val cums = weights.scanLeft(0)(_ + _._2).tail
    weights.tail.zip(cums.tail).foldLeft(
      when(bucket < cums.head, lit(weights.head._1))) {
      case (chain, ((name, _), hi)) => chain.when(bucket < hi, lit(name))
    }
  }

  /** Assign every row a split by hashing `unitCol` (a cluster id, a
    * domain, a URL host — whatever must not straddle splits). One narrow
    * codegen'd expression: no shuffle, no RNG state, identical output on
    * every run and engine.
    */
  def byUnit(df: DataFrame, unitCol: String,
      weights: Seq[(String, Int)] = Seq("train" -> 8, "val" -> 1, "test" -> 1),
      out: String = "split"): DataFrame =
    df.withColumn(out, splitColumn(col(unitCol), weights))

  /** Deterministic training-order shuffle + shard assignment — the last
    * step before a curated corpus is written as training shards: every
    * run must see documents in a seed-reproducible pseudorandom order,
    * split into `nShards` files, with NO coordinated state (no RNG, no
    * global counter). The permutation key is `md5(seed "-" key)` — a
    * stable draw like [[splitColumn]]'s, so reshuffling is just a new
    * seed — the shard is the key's first 8 hex chars mod `nShards`
    * (uniform, so shards balance), and `pos` is the row's rank WITHIN
    * its shard (per-shard order is what a data loader consumes; loaders
    * interleave shards themselves).
    *
    * Plan: one narrow md5 projection, ONE shard-keyed exchange, and a
    * per-shard sort — no global window. Shard count is the scale lever:
    * at 100 TB pick nShards ≈ a few × cluster parallelism so each
    * shard's sort is an in-executor external sort (4096 shards ⇒ ~25 GB
    * each); the plan shape is invariant in nShards.
    */
  def shardShuffle(df: DataFrame, keyCol: String, nShards: Int, seed: String,
      shardOut: String = "shard", posOut: String = "pos"): DataFrame = {
    require(nShards > 0, s"need nShards > 0, got $nShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardOut)).orderBy(col("__skey"), col(keyCol))
    df.withColumn("__skey",
        md5(concat_ws("-", lit(seed), col(keyCol).cast(StringType))))
      .withColumn(shardOut,
        pmod(conv(substring(col("__skey"), 1, 8), 16, 10).cast(LongType),
          lit(nShards.toLong)).cast(IntegerType))
      .withColumn(posOut, row_number().over(w).cast(LongType))
      .drop("__skey")
  }
}
