package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Wall decomposition of the incremental-ER probe vs the full recompute
  * (round-12 verdict #1: q236 ran 1.76×/1.42× q235's wall at sf0.1/sf1
  * and SCALING.md asserted the asymptotic win without a measured
  * breakdown). Runs the generation-0 build untimed (the prepare
  * contract), then q235 and q236 with per-stage taps — each tap forces
  * the stage's persisted output through a noop sink, so stage walls are
  * attributable and downstream stages reuse the cache instead of
  * re-executing. Prints one JSON line:
  *
  *   {"sf":…, "q235":{stage:sec,…,"total":…}, "q236":{…}}
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.ErDecomp"
  */
object ErDecomp {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.install(spark)
    import graft.queries.DedupQueries

    // warmup at sf0.001 so codegen/JIT never charges a measured stage
    val warm = "/root/testdata/sf0.001"
    DedupQueries.buildErGeneration(spark, warm)
    force(DedupQueries.q235DedupPipeline(spark, warm))
    force(DedupQueries.q236IncrementalEr(spark, warm))
    spark.catalog.clearCache()

    // generation-0 artifacts: the untimed prepare (Bench's contract)
    DedupQueries.buildErGeneration(spark, sfDir)
    spark.catalog.clearCache()

    def timed(run: ((String, DataFrame) => Unit) => DataFrame)
        : Seq[(String, Double)] = {
      val stages = scala.collection.mutable.ArrayBuffer[(String, Double)]()
      var last = System.nanoTime()
      val tap = (name: String, df: DataFrame) => {
        force(df)
        val now = System.nanoTime()
        stages += name -> (now - last) / 1e9
        last = now
      }
      val t0 = System.nanoTime()
      val out = run(tap)
      force(out)
      val now = System.nanoTime()
      stages += "final" -> (now - last) / 1e9
      stages += "total" -> (now - t0) / 1e9
      spark.catalog.clearCache()
      stages.toSeq
    }

    val w235 = timed(t =>
      DedupQueries.q235DedupPipelineTapped(spark, sfDir, Some(t)))
    val w236 = timed(t => {
      // prepare already ran: the probe is the nightly merge only
      DedupQueries.erMergeStep(spark, DedupQueries.erBase(sfDir),
        DedupQueries.fsRecords(spark, sfDir)
          .filter(DedupQueries.erIsDelta),
        rollTo = None, tap = t)
    })
    def jsFmt(w: Seq[(String, Double)]): String =
      w.map { case (k, v) =>
        "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f",
          Double.box(v)) }.mkString("{", ",", "}")
    spark.stop()
    println(s"""{"sf":"$sfDir","q235":${jsFmt(w235)},"q236":${jsFmt(w236)}}""")
  }

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
}
