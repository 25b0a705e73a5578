package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measured Aho–Corasick multi_replace vs regex-alternation
  * replace as blocklist size grows (SCALING.md). NOT library surface.
  *
  * Same semantics both ways (longest-first alternation ≡ the kernel,
  * property-spec'd); the question is COST: regex alternation re-tries
  * every pattern at every character, the automaton is O(text).
  * Terms are synthetic (absent from the corpus) so both paths scan
  * without replacing — worst case for both.
  *
  * Usage: runMain graft.tools.ScrubBench <sfDir> [reps]
  */
object ScrubBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(lower(col("text")).as("t"))
    d.count() // warm the scan

    def time(f: => Unit): Double = {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime(); f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }

    for (n <- Seq(15, 100, 1000, 10000)) {
      val terms = (0 until n).map(i => s"zq${i}blocked")
      val ac = time {
        d.select(graft.functions.MultiReplaceExpr.multiReplace(col("t"), terms, "§"))
          .write.format("noop").mode("overwrite").save()
      }
      val pat = "(" + terms.sortBy(t => (-t.length, t)).mkString("|") + ")"
      val rx = time {
        d.select(regexp_replace(col("t"), pat, "§"))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[scrub-bench] terms=$n%5d  aho-corasick=$ac%6.2f s  regex-alternation=$rx%7.2f s  ratio=${rx / ac}%5.1fx")
    }
    spark.stop()
  }
}
