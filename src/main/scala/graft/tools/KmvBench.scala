package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Kmv

/** Dev tool: measured cost of distinct-counting strategies at scale
  * (SCALING.md §"KMV"). NOT part of the library surface.
  *
  * Same question three ways over lineitem's ~11k-distinct-per-group
  * order keys: exact `count(distinct)` (shuffles every distinct value),
  * Spark's built-in `approx_count_distinct` (HLL++ — mergeable bounded
  * state, float estimator), and `Kmv.sketch` (mergeable bounded state,
  * integer estimator, cross-engine replayable). Wall-clock AND total
  * shuffle-write bytes per strategy — the bytes are the scale story:
  * bounded-state sketches shuffle O(tasks·groups·k) regardless of
  * cardinality, exact distinct shuffles the distinct pairs themselves.
  *
  * Usage: runMain graft.tools.KmvBench <sfDir> [reps]
  */
object KmvBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count() // warmup the scan

    def run(label: String)(f: => Unit): Unit = {
      var best = Double.MaxValue
      var bytes = 0L
      for (_ <- 1 to reps) {
        shuffleBytes.set(0L)
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        // listener events are async (the bus is private[spark]); a short
        // settle is enough for a dev measurement
        Thread.sleep(500)
        if (dt < best) { best = dt; bytes = shuffleBytes.get }
      }
      println(f"[kmv-bench] $label%-16s best=$best%6.2f s  shuffle=${bytes / 1024.0 / 1024.0}%8.2f MiB")
    }

    run("exact_distinct") {
      li.groupBy("l_returnflag")
        .agg(countDistinct("l_orderkey").as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    run("hll_approx") {
      li.groupBy("l_returnflag")
        .agg(approx_count_distinct("l_orderkey").as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    run("kmv_1024") {
      li.select(col("l_returnflag"),
          Kmv.hash62(col("l_orderkey").cast("string")).as("h"))
        .groupBy("l_returnflag")
        .agg(Kmv.sketch(col("h"), 1024).as("sk"))
        .select(col("l_returnflag"), Kmv.estimate(col("sk"), 1024))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
