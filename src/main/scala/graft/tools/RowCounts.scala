package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: output-row counts of named queries at a given SF dir —
  * used to attribute bench scaling ratios to true output growth
  * (pair-producing queries on a near-dup-heavy corpus emit more PAIRS
  * per doc, which is work growth, not plan regression).
  *
  * Usage: runMain graft.tools.RowCounts <sfDir> <q1,q2,...>
  */
object RowCounts {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(',')
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.install(spark)
    names.foreach { n =>
      val c = graft.SparkEntry.queries(n)(spark, dir).count()
      spark.catalog.clearCache()
      println(s"[rowcounts] $dir $n $c")
    }
    spark.stop()
  }
}
