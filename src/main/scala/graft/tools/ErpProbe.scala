package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway attribution probe for q242's wall (round-13 dev tool):
  * times the payload-ER full recompute twice — once as shipped
  * (levenshtein agree) and once with the body compare swapped for
  * plain equality — so the comparison pass's share of the wall is a
  * measured number, not an assumption. */
object ErpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.install(spark)
    def force(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup
    force(graft.queries.DedupQueries.q242ErPayloadFull(spark, "/root/testdata/sf0.001"))
    force(graft.queries.DedupQueries.q242ErPayloadEq(spark, "/root/testdata/sf0.001"))
    spark.catalog.clearCache()
    val tEq = force(graft.queries.DedupQueries.q242ErPayloadEq(spark, sfDir))
    spark.catalog.clearCache()
    val tLev = force(graft.queries.DedupQueries.q242ErPayloadFull(spark, sfDir))
    spark.catalog.clearCache()
    println(f"""{"sf":"$sfDir","eq_sec":$tEq%.2f,"lev_sec":$tLev%.2f}""")
    spark.stop()
  }
}
