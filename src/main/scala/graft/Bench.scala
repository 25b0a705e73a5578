package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    // dev convenience: comma-separated query subset (e.g. the round-3
    // 50-query set for regression isolation); absent = full suite
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    val benchQueries = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.install(spark) // strategy + rewrite rule + SQL functions
    // warmup outside the timed section: run EVERY query once at sf0.001
    // so codegen compilation + JIT for each query's operators happen
    // before its timed run — the timed section then measures steady-state
    // execution, not first-run compilation
    val warmDir = "/root/testdata/sf0.001"
    benchQueries.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // touch the target-SF tables so the timed section reads a warm page
    // cache instead of charging the first query per table with the disk I/O
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    // settle: let GC reclaim warmup garbage so the first timed query
    // doesn't absorb the collection pause
    System.gc()
    Thread.sleep(3000)

    val results = benchQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink forces full evaluation of every output column —
      // count() would let Catalyst prune the projection away
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
      val t = (System.nanoTime() - t0) / 1e9
      // intra-query persists are part of the measured time; dropping them
      // AFTER the clock keeps queries independent (no cross-query memory
      // pressure / eviction noise)
      spark.catalog.clearCache()
      (name, t, ok)
    }
    // ms precision on the stdout line keeps the 95-query record compact;
    // BENCH_LOCAL.json keeps full nanosecond-derived precision.
    // Locale.ROOT: the default-locale format would print "1,234" on
    // comma-decimal locales and break the JSON the driver tail-parses.
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // a failed query's wall time is meaningless — exclude it from the
    // total and name it in `failed` so a broken round can never read as a
    // speedup (round-6 advisor finding: 7 dead queries timed at ~0.06 s
    // silently "improved" the total)
    val failed = results.collect { case (k, _, false) => k }
    val total = results.collect { case (_, v, true) => v }.sum
    val qsFull = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qsShort = results.map { case (k, v, _) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val jsonFull =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsFull,"failed":$failedJson,"sf":"$sfDir"}"""
    val jsonDetail =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qsShort,"failed":$failedJson,"sf":"$sfDir"}"""
    // The driver's tail capture keeps only the last ~2 KB of stdout; a
    // 95-query detail line is bigger than that, so its head (with
    // "value":total) gets truncated and the round scores parsed:null
    // (round-4 verdict #1). Emit the detail line first, then a SHORT
    // self-contained total record as the very last line — whatever prefix
    // the tail loses, the final line always fits and always parses.
    val jsonTail =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_failed":${failed.size}}"""
    // Durable copy so a harness that misses the stdout line can still
    // recover the record from disk. Best-effort: an unwritable path must
    // not abort the run before the primary stdout metric line prints.
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
      java.nio.file.Files.write(out, jsonFull.getBytes("UTF-8"))
    } catch {
      // NonFatal only: an OOM/VM error must kill the run, not be masked
      // by a clean-looking metric line
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] durable write failed: $e")
    }
    // Stop Spark BEFORE emitting the metric lines so shutdown chatter can
    // never land after them — the short JSON must be the very last line.
    spark.stop()
    System.out.flush()
    println(jsonDetail)
    println(jsonTail)
    System.out.flush()
  }
}
