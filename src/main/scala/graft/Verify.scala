package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // dev convenience: optional 3rd arg = comma-separated query subset
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS) which Spark rejects; read
      // as long and convert explicitly (Load.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.install(spark) // strategy + rewrite rule + SQL functions
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Crash-proofing (round-10 verdict #1: CORRECTNESS_r10.json landed as
    // {} even though every query passes — the run died somewhere in the
    // verify→compare chain and nothing partial survived). Two rules now:
    //   1. oracle_sql.json is written BEFORE the first query runs — the
    //      compare step needs it, and it depends on nothing but the static
    //      SparkEntry maps. A kill during query N still leaves a complete
    //      oracle map plus N finished result dirs → a PARTIAL artifact.
    //   2. manifest.json is REWRITTEN after every query (atomic tmp+move),
    //      so "attempted so far" is always on disk, never only in memory.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val attempted = scala.collection.mutable.ArrayBuffer[(String, String)]()
    def writeManifest(): Unit = {
      val manifest = attempted
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      val tmp = Paths.get(s"$outDir/manifest.json.tmp")
      Files.writeString(tmp, manifest)
      Files.move(tmp, Paths.get(s"$outDir/manifest.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val status =
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          "ok"
        } catch { case e: Throwable =>
          // a failed query must be VISIBLE to the compare, not vanish: a
          // missing result dir reads as "not attempted" and silently
          // shrinks the round's coverage (round-6: 7 broken event queries
          // produced an all-green 107-entry artifact). Leave an _ERROR
          // marker in the query's own dir plus a run-level manifest.
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          try {
            val d = new java.io.File(s"$outDir/$name")
            d.mkdirs()
            Files.writeString(Paths.get(s"$outDir/$name/_ERROR"),
              s"${e.getClass.getName}: ${e.getMessage}\n")
          } catch { case _: Throwable => () }
          "error"
        }
      spark.catalog.clearCache() // release intra-query persists (sortOnce etc.)
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[verify] $name $status in $sec%.1fs")
      attempted += (name -> status)
      writeManifest()
    }
    spark.stop()
  }
}
