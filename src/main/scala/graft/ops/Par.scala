package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism floor for CPU-bound narrow stages.
  *
  * Small parquet inputs arrive as one or two file partitions
  * (spark.sql.files.maxPartitionBytes = 128 MB), which serializes any
  * compute-heavy map stage behind them — at sf0.1 the whole LSH signature
  * pass ran on one core. At 100 TB file splits provide parallelism
  * naturally and this is a no-op; below the threshold we pay one tiny
  * round-robin shuffle to light up every core.
  */
object Par {

  def fanOut(df: DataFrame, minPartitions: Int = 0): DataFrame = {
    val target =
      if (minPartitions > 0) minPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }

  /** Global sort of a compute-heavy ALL-NARROW pipeline: the range
    * partitioner's sampling pass re-executes the sort's child, so an
    * unguarded `orderBy` runs every per-row function twice (there is no
    * shuffle boundary upstream to replay from). Pinning the computed
    * rows first makes the sample read the cache. Callers own the cache
    * lifetime (Verify/Bench clear per query).
    *
    * Prefer [[sortEarly]] when the sort key's leading columns already
    * exist on the INPUT side of the expensive compute: it avoids both
    * the persist and the post-compute exchange.
    */
  def sortOnce(df: DataFrame, cols: Column*): DataFrame =
    df.persist().orderBy(cols: _*)

  /** Sort EARLY instead of persist+orderBy (round-14): when a narrow
    * compute's output must be globally ordered by keys whose LEADING
    * columns already exist on the input (secondary keys generated
    * within a leading-key group, e.g. posexplode indices), range-
    * partition the CHEAP input by those leading columns, run the
    * compute post-shuffle, and finish with sortWithinPartitions.
    *
    *   - the range sampler's second pass re-executes only the bare
    *     input (a pruned scan), never the compute — no persist needed;
    *   - the compute runs across the shuffle partitions instead of the
    *     scan's file splits (the [[fanOut]] effect, for free);
    *   - global order holds because range partitioning never splits
    *     equal leading keys across partitions.
    *
    * At scale this is strictly cheaper than persist+orderBy: one
    * exchange of the small input columns instead of a full cache
    * materialization plus an exchange of the computed (wider) rows.
    */
  def sortEarly(input: DataFrame, rangeKeys: Seq[Column],
      finalKeys: Seq[Column])(compute: DataFrame => DataFrame): DataFrame =
    compute(input.repartitionByRange(rangeKeys: _*))
      .sortWithinPartitions(finalKeys: _*)
}
