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
    */
  def sortOnce(df: DataFrame, cols: Column*): DataFrame =
    df.persist().orderBy(cols: _*)
}
