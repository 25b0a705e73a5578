package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
  * 1996, the consistent-assignment primitive behind stable
  * repartitioning: key k goes to argmax over shards s of
  * hash(k, s). When the shard count grows n → n+1, ONLY the keys the
  * new shard wins move (≈ 1/(n+1) of them) — a plain `hash(k) mod n`
  * reshuffles almost everything. The data-layout op for incremental
  * stores: artifact shards, state stores, co-location domains that
  * must survive cluster resizes.
  *
  * Determinism: the weight is the first 8 hex chars of
  * md5(key ":" shard) as an int64 — the repo's established stable-draw
  * primitive, byte-identical in any engine — and the argmax breaks
  * (impossibly rare) ties toward the SMALLER shard id via max on a
  * (weight, −shard) struct.
  *
  * Scale shape: completely NARROW — the shard list is a literal array,
  * weights and the argmax are per-row expressions inside one
  * projection (no explode, no join, no shuffle). Assignment of a
  * 100 TB keyspace is a map stage.
  */
object Rendezvous {

  private def weight(key: Column, shard: Int): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":"), lit(shard))),
      1, 8), 16, 10).cast(LongType)

  /** Adds `shardCol` = the winning shard id in [0, nShards). */
  def assign(df: DataFrame, keyCol: String, nShards: Int,
      shardCol: String = "shard"): DataFrame = {
    require(nShards >= 1 && nShards <= 65536,
      s"nShards must be in [1, 65536], got $nShards")
    val packed = (0 until nShards).map { s =>
      // weight fits 32 bits: pack (weight << 16 | (maxShard - s)) so ONE
      // long max carries the argmax and the smaller-shard tiebreak
      (weight(col(keyCol), s) * 65536 + lit((65535 - s).toLong)).as(s"__w$s")
    }
    df.withColumn("__best", greatest(lit(Long.MinValue) +: packed: _*))
      .withColumn(shardCol,
        (lit(65535L) - col("__best") % 65536).cast("int"))
      .drop("__best")
  }
}
