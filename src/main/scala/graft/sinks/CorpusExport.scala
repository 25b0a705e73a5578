package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus export: the parquet layout a curated 100 TB corpus
  * ships in.
  *
  *  - **Hive partitioning** on low-cardinality curation keys
  *    (`lang`, `source`): downstream mixture sampling reads only the
  *    partitions its recipe names — partition pruning at the directory
  *    level, before any file IO.
  *  - **`maxRecordsPerFile`** bounds file size so a skewed partition
  *    (one dominant language) still yields parallel-readable files.
  *  - **In-file ordering** by a caller-chosen column (e.g. quality
  *    score): parquet row-group stats then make "top decile only" reads
  *    skip whole row groups (zone-map locality). `sortWithinPartitions`
  *    — a local sort, never a global shuffle.
  *  - Blob/text columns stay out of the partition spec — only shipped as
  *    column data.
  *
  * Distinct from [[DumpToPath]] (the reference's CSV+datapackage
  * contract): this is the scale-side sink the reference never needed.
  */
object CorpusExport {

  /** Write `df` partitioned by `partitionCols`, each file internally
    * ordered by `orderCol`, at most `maxRecordsPerFile` rows per file.
    */
  def write(df: DataFrame, outDir: String, partitionCols: Seq[String],
      orderCol: String, maxRecordsPerFile: Long = 1000000L): Unit =
    df.sortWithinPartitions((partitionCols :+ orderCol).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(outDir)

  /** Read back with partition pruning: `filters` name partition columns
    * (e.g. "lang" -> "he"), so the scan's InMemoryFileIndex never lists
    * the other directories' files.
    */
  def read(spark: SparkSession, dir: String,
      filters: Map[String, String] = Map.empty): DataFrame =
    filters.foldLeft(spark.read.parquet(dir)) { case (df, (k, v)) =>
      df.filter(col(k) === v)
    }
}
