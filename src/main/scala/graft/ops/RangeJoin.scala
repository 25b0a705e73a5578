package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized interval (range) join: points joined to the intervals
  * containing them, `point ∈ [start, end]`, optionally under equi-keys.
  *
  * Spark's native plan for a pure range predicate is a broadcast
  * nested-loop join — quadratic and driver-bound at scale. The classic
  * fix: quantize time into fixed-width buckets, replicate each interval
  * into the buckets it overlaps, and equi-join on (keys…, bucket) — a
  * plain shuffled hash/sort-merge join whose cost is linear in
  * points + intervals × (len/width + 1). A point lies in exactly one
  * bucket and an interval covers each bucket at most once, so no pair
  * duplicates and no post-dedup is needed.
  *
  * Interval-length skew guard: an interval longer than `maxBuckets`
  * buckets would fan out unboundedly (one pathological year-long
  * interval × 10-minute buckets = 52k replicas), so long intervals
  * route to a separate key-partitioned join with the raw range filter —
  * correct for any length, and cheap as long as such intervals are rare
  * (they are, by the bucket-width-≈-typical-length sizing rule).
  * Each interval takes exactly one path, so the union stays exact.
  *
  * All time columns must be integral (e.g. `unix_micros`); `div` keeps
  * bucketing in exact integer arithmetic.
  */
object RangeJoin {

  def overlapJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
      startCol: String, endCol: String, keys: Seq[String], bucketWidth: Long,
      maxBuckets: Int = 1024): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // exact integer floor division — a double `/` can round a quotient
    // sitting within an ulp of an integer across the bucket boundary
    def bucketOf(c: String) = expr(s"`$c` div ${bucketWidth}L")
    val pb = points.withColumn("__b", bucketOf(pointCol))
    val sb = bucketOf(startCol)
    // Malformed intervals (end < start) would still satisfy isShort and
    // sequence(sb, eb) DESCENDS when stop < start, silently fanning each
    // bad row into |sb-eb|+1 replicas that only the containment filter
    // kills. Fail loudly instead — the guard lives INSIDE eb (which every
    // interval row evaluates via isShort) so column pruning can't drop it;
    // a side-channel assert column would be pruned away as unreferenced.
    val eb = when(col(startCol) <= col(endCol), bucketOf(endCol))
      .otherwise(raise_error(
        lit(s"RangeJoin: interval with $endCol < $startCol")))
    val isShort = (eb - sb) < maxBuckets
    val contained = col(pointCol) >= col(startCol) &&
      col(pointCol) <= col(endCol)
    val short = intervals.filter(isShort)
      .withColumn("__b", explode(sequence(sb, eb)))
    val bucketed = pb.join(short, keys :+ "__b").filter(contained).drop("__b")
    val long = intervals.filter(!isShort)
    val fallback =
      if (keys.nonEmpty) pb.drop("__b").join(long, keys).filter(contained)
      else pb.drop("__b").crossJoin(long).filter(contained)
    bucketed.unionByName(fallback)
  }
}
