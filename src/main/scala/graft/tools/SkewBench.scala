package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measured AQE-skew-join vs manual salting comparison
  * (SCALING.md §3). NOT part of the library surface.
  *
  * The driver testdata is uniform, so this synthesizes the skew the lever
  * exists for: lineitem's join key remapped so ~90% of rows funnel into
  * ONE hot supplier (the "celebrity key" shape — one crawl domain, one
  * null-ish default, one viral doc). Three strategies over the identical
  * skewed input, each in its own sequentially-created session so AQE flags
  * can differ:
  *
  *   plain_noAQE — sort-merge join, adaptive execution off: the straggler
  *                 baseline (one task carries 90% of probe rows)
  *   plain_AQE   — defaults: AQE skew-join splits oversized partitions at
  *                 runtime (spark.sql.adaptive.skewJoin.enabled)
  *   salted      — graft.ops.Skew.saltedJoin, factor 8, hot keys supplied
  *                 (detection scans excluded from the timed section —
  *                 measuring the join strategies, not the histogram)
  *
  * Broadcast is disabled (threshold -1) in ALL three sessions: at real
  * scale the build side of a skewed join does not fit in one executor, so
  * a broadcast plan would answer a different question.
  *
  * Usage: runMain graft.tools.SkewBench <sfDir> [hotShare] [reps]
  */
object SkewBench {

  private def session(aqe: Boolean, skewJoin: Boolean,
      tuned: Boolean = false): SparkSession = {
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.skewJoin.enabled", skewJoin)
      // force the shuffle-join path: skew mitigation is moot for broadcast
      .config("spark.sql.autoBroadcastJoinThreshold", -1)
    // defaults treat <256 MB partitions as healthy; at sub-cluster data
    // sizes the hot partition must clear a LOWERED bar before AQE splits
    (if (tuned) b
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    else b).getOrCreate()
  }

  /** 90% of lineitem rows → supplier 1; the remainder keeps its uniform
    * key. Deterministic in the row's own keys — no RNG.
    */
  private def skewed(spark: SparkSession, sfDir: String, hotShare: Double): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.withColumn("l_suppkey",
      when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(100)) <
        lit((hotShare * 100).toInt), lit(1L)).otherwise(col("l_suppkey")))
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val hotShare = if (args.length > 1) args(1).toDouble else 0.9
    val reps = if (args.length > 2) args(2).toInt else 3

    def run(label: String, aqe: Boolean, skewJoin: Boolean,
            tuned: Boolean = false)
           (join: (SparkSession, DataFrame, DataFrame) => DataFrame): Unit = {
      val spark = session(aqe, skewJoin, tuned)
      spark.sparkContext.setLogLevel("WARN")
      val li = skewed(spark, sfDir, hotShare)
      val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      def agg(j: DataFrame): DataFrame =
        j.groupBy("s_nationkey").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      // warmup run compiles codegen + primes the page cache; then `reps`
      // timed runs, min reported (ambient GC noise inflates, never deflates)
      agg(join(spark, li, supp)).write.format("noop").mode("overwrite").save()
      val ts = (1 to reps).map { _ =>
        time(agg(join(spark, li, supp)).write.format("noop").mode("overwrite").save())
      }
      println(f"$label%-12s min=${ts.min}%.2fs runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      spark.stop()
    }

    run("plain_noAQE", aqe = false, skewJoin = false)((_, li, supp) =>
      li.join(supp, Seq("l_suppkey"), "inner"))
    run("plain_AQE", aqe = true, skewJoin = true)((_, li, supp) =>
      li.join(supp, Seq("l_suppkey"), "inner"))
    run("AQE_tuned", aqe = true, skewJoin = true, tuned = true)((_, li, supp) =>
      li.join(supp, Seq("l_suppkey"), "inner"))
    run("salted", aqe = true, skewJoin = false)((_, li, supp) =>
      graft.ops.Skew.saltedJoin(li, supp, "l_suppkey", factor = 8,
        hotKeys = Some(Seq(1L))))
  }
}
