package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev profiler: run one named query at SPARK_GRAFT_SF_DIR with a
  * listener that records per-job wall and summed task time, so
  * driver-side gaps (planning, AQE re-optimization, job submit) are
  * separable from executor work. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.JobProbe q236_incremental_er"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.install(spark)
    val jobs = mutable.ArrayBuffer[(Int, Long, Long, String)]() // id, start, end, desc
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0)
    val nTasks = new java.util.concurrent.atomic.AtomicLong(0)
    val starts = mutable.Map[Int, (Long, String)]()
    val stages = mutable.ArrayBuffer[(Int, Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.synchronized {
          val d = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .filter(_.nonEmpty)
            // fall back to the job's terminal stage callsite — with no
            // description set this is the only clue to which operator
            // dispatched the job
            .orElse(j.stageInfos.lastOption.map(_.name))
            .getOrElse("").replace('\n', ' ').take(90)
          starts(j.jobId) = (j.time, d) }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(j.jobId).foreach { case (s, d) =>
            jobs += ((j.jobId, s, j.time, d)) } }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskInfo != null) {
          taskTime.addAndGet(t.taskInfo.duration)
          nTasks.incrementAndGet()
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        stages.synchronized {
          stages += ((i.stageId, i.numTasks, wall,
            i.name.replace('\n', ' ').take(70))) }
      }
    })
    def force(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val fn = graft.SparkEntry.queries(name)
    // warmup + prepare, like Bench
    graft.SparkEntry.prepare.get(name).foreach(p => p(spark, "/root/testdata/sf0.001"))
    try force(fn(spark, "/root/testdata/sf0.001")) catch { case _: Throwable => }
    spark.catalog.clearCache()
    graft.SparkEntry.prepare.get(name).foreach(p => p(spark, sfDir))
    spark.catalog.clearCache()
    jobs.clear(); taskTime.set(0); nTasks.set(0)
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir) // construction inside the clock, like Bench
    val tConstruct = (System.nanoTime() - t0) / 1e9
    val tForce = force(df)
    val wall = tConstruct + tForce
    Thread.sleep(500)
    println(f"[jobprobe] $name construct=$tConstruct%.2f s force=$tForce%.2f s")
    val jobWall = jobs.map(j => j._3 - j._2).sum / 1e3
    val nJobs = jobs.size
    val gaps = {
      val sorted = jobs.sortBy(_._2)
      var gap = 0L; var lastEnd = 0L
      sorted.foreach { j =>
        if (lastEnd > 0 && j._2 > lastEnd) gap += j._2 - lastEnd
        lastEnd = math.max(lastEnd, j._3) }
      gap / 1e3
    }
    println(f"[jobprobe] $name wall=$wall%.2f s jobs=$nJobs jobWallSum=$jobWall%.2f s interJobGap=$gaps%.2f s tasks=${nTasks.get()} taskTimeSum=${taskTime.get()/1e3}%.2f s")
    jobs.sortBy(j => -(j._3 - j._2)).take(15).foreach { j =>
      println(f"[jobprobe]   job ${j._1}%4d ${(j._3 - j._2)/1e3}%6.2f s  ${j._4}")
    }
    // callsite histogram: jobs and wall grouped by dispatching operator
    jobs.groupBy(_._4).map { case (d, js) =>
      (js.size, js.map(j => j._3 - j._2).sum / 1e3, d)
    }.toSeq.sortBy(-_._2).foreach { case (n, w, d) =>
      println(f"[jobprobe]   bysite n=$n%3d wall=$w%6.2f s  $d")
    }
    stages.sortBy(s => -s._3).take(15).foreach { s =>
      println(f"[jobprobe]   stage ${s._1}%4d tasks=${s._2}%4d ${s._3}%6.2f s  ${s._4}")
    }
    spark.stop()
  }
}
