package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only plan inspection / profiling entry point (not library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val d = spark.read.parquet(s"$dir/documents.parquet")
    d.count() // warmup

    graft.GraftExtensions.install(spark)
    // profile any query twice (2nd iteration ~ bench steady state);
    // swap the target when hunting a regression
    val target = sys.env.getOrElse("SPARK_GRAFT_SCRATCH_Q", "q1_agg")
    val iters = sys.env.getOrElse("SPARK_GRAFT_SCRATCH_ITERS", "2").toInt
    for (i <- 1 to iters) {
      val df = time(s"$target $i build") {
        graft.SparkEntry.queries(target)(spark, dir)
      }
      time(s"$target $i plan") { df.queryExecution.executedPlan }
      if (sys.env.contains("SPARK_GRAFT_SCRATCH_DUMP"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(sys.env("SPARK_GRAFT_SCRATCH_DUMP")),
          df.queryExecution.executedPlan.toString)
      time(s"$target $i") {
        df.write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
