package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-spine densification — zero-fill the bucket gaps a sparse
  * aggregate leaves behind (hours with no events, days with no sales):
  * downstream window math (trailing means, rate-anomaly baselines like
  * q138's, forward fills) silently skips missing buckets unless someone
  * reinstates them, and "no events" IS a signal.
  *
  * Scale shape: the spine is generated, never joined into existence —
  * one map-side-combined (key → min/max bucket) aggregation, then a
  * narrow `sequence` + `explode` whose fan-out equals the output row
  * count, followed by a single (key, bucket) equi-join back onto the
  * aggregate. No calendar table ships to the cluster and no cross join
  * appears at any size.
  *
  * Contract: bucket spans are bounded by the caller's retention window
  * (a per-key `[min, max]` range of epoch-hours or epoch-days); a
  * corrupt far-future timestamp upstream would fan a key out by its
  * span, so parse-validate times before densifying (q136's gate).
  */
object TimeSpine {

  /** Densify `agg` (one row per (keys, bucket), integral bucket) to
    * every bucket in each key's `[min, max]` range, filling the named
    * columns with the given defaults on generated gap rows.
    */
  def densify(agg: DataFrame, keyCols: Seq[String], bucketCol: String,
      fills: Seq[(String, Column)]): DataFrame = {
    val spine = agg.groupBy(keyCols.map(col): _*)
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
      .select(keyCols.map(col) :+
        explode(sequence(col("__lo"), col("__hi"))).as(bucketCol): _*)
    val joined = spine.join(agg, keyCols :+ bucketCol, "left")
    fills.foldLeft(joined) { case (d, (c, dflt)) =>
      d.withColumn(c, coalesce(col(c), dflt))
    }
  }
}
