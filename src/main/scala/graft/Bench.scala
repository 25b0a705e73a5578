package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    GraftExtensions.install(spark) // strategy + rewrite rule + SQL functions
    // warmup outside the timed section: run EVERY query once at sf0.001
    // so codegen compilation + JIT for each query's operators happen
    // before its timed run — the timed section then measures steady-state
    // execution, not first-run compilation
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
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

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink forces full evaluation of every output column —
      // count() would let Catalyst prune the projection away
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      val t = (System.nanoTime() - t0) / 1e9
      // intra-query persists are part of the measured time; dropping them
      // AFTER the clock keeps queries independent (no cross-query memory
      // pressure / eviction noise)
      spark.catalog.clearCache()
      name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Durable copy so a harness that misses the stdout line can still
    // recover the record from disk. Best-effort: an unwritable path must
    // not abort the run before the primary stdout metric line prints.
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
      java.nio.file.Files.write(out, json.getBytes("UTF-8"))
    } catch {
      // NonFatal only: an OOM/VM error must kill the run, not be masked
      // by a clean-looking metric line
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] durable write failed: $e")
    }
    // Stop Spark BEFORE emitting the metric line so shutdown chatter can
    // never land after it — the JSON must be the very last stdout line.
    spark.stop()
    System.out.flush()
    println(json)
    System.out.flush()
  }
}
