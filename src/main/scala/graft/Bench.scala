package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Two modes:
  *
  *   - SHARDED (default for > trancheSize queries): the parent process
  *     creates NO SparkSession — it splits the sorted query list into
  *     tranches of ≤ SPARK_GRAFT_TRANCHE_SIZE (default 50), runs each
  *     tranche in its own child JVM (same flags, sequential), merges
  *     the per-tranche JSON files, and emits the usual artifact. One
  *     JVM running 200+ whole-stage-codegen'd queries saturates even a
  *     1 GB reserved code cache mid-run and the sweeper deoptimizes
  *     hot methods — round-8's artifact showed 16 queries timing
  *     SLOWER at sf0.1 in the full run than at sf1 in isolation, a
  *     2.3× phantom regression. Per-tranche JVMs keep every query's
  *     steady-state JIT within cache budget, so the artifact is
  *     comparable round-over-round.
  *   - INLINE (child mode, small SPARK_GRAFT_BENCH_ONLY subsets, or
  *     SPARK_GRAFT_TRANCHE_SIZE=0): the classic single-JVM timed loop.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    // bench lineup = oracled queries + the sketch-tier scale-path rows
    val names = (SparkEntry.queries.keys ++ SparkEntry.benchOnly.keys).toSeq
      .filter(n => only.forall(_.contains(n))).sorted
    val trancheSize = sys.env.getOrElse("SPARK_GRAFT_TRANCHE_SIZE", "50").toInt
    val isChild = sys.env.contains("SPARK_GRAFT_BENCH_TRANCHE")
    if (isChild || trancheSize <= 0 || names.size <= trancheSize)
      runInline(names)
    else
      runSharded(names, trancheSize)
  }

  // ---------------------------------------------------------------- sharded

  /** Current process RSS in MB from /proc/self/status (Linux only; -1 if
    * unreadable). Used by the tranche canary so a dead run says what died. */
  private def rssMb(pid: Long = -1): Long = {
    val path = if (pid < 0) "/proc/self/status" else s"/proc/$pid/status"
    try {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().collectFirst {
        case l if l.startsWith("VmRSS:") =>
          l.split("\\s+")(1).toLong / 1024
      }.getOrElse(-1L)
      finally src.close()
    } catch { case scala.util.control.NonFatal(_) => -1L }
  }

  private def runSharded(names: Seq[String], trancheSize: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tranches = names.grouped(trancheSize).toSeq
    val javaBin = System.getProperty("java.home") + "/bin/java"
    // replicate THIS JVM's flags (add-opens, -Xmx, code cache) verbatim —
    // the child must time under the same memory/JIT regime sbt gave us —
    // and ADD the heap pre-commit flags the slimmed parent deliberately
    // lacks (round-9 verdict: the do-nothing orchestrator was booting with
    // -Xms8g -XX:+AlwaysPreTouch, fully committing 8 GiB of dead weight
    // before the child committed its own 8 GiB — the run was SIGKILLed in
    // tranche 0 and the whole artifact vanished). Only JVMs that actually
    // run queries pre-touch their heap now.
    val baseArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
    val heapArgs = {
      val xmx = baseArgs.find(_.startsWith("-Xmx")).map(_.stripPrefix("-Xmx"))
        .getOrElse("8g")
      Seq(s"-Xms$xmx", "-XX:+AlwaysPreTouch")
        .filterNot(baseArgs.contains) // idempotent if build flags change back
    }
    val jvmArgs = baseArgs ++ heapArgs
    val cp = System.getProperty("java.class.path")
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench-")
    val perQuery = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    // (index, queries, wall, exit code, child peak RSS MB)
    val trancheInfo = scala.collection.mutable
      .ArrayBuffer[(Int, Seq[String], Double, Int, Long)]()
    // sibling-run reference for the ambient-load self-report
    // (SCALING.md §10): per-tranche geomean-vs-ref + suspect flags in
    // the artifact, so a crowded tranche is machine-readable instead of
    // a human reading band medians
    // ref must be a sibling run AT THIS SF (exact sf-string match inside
    // the loader); when the primary ref is for another sf, fall back to
    // the committed sf1 artifact so sf1 runs also self-report variance
    val refTimes = {
      val primary = tools.BenchVariance.loadQueryTimesForSf(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "BENCH_LOCAL.json"), sfDir)
      if (primary.nonEmpty) primary
      else tools.BenchVariance.loadQueryTimesForSf("BENCH_SF1.json", sfDir)
    }
    def trancheJson(): Seq[String] = {
      val verdicts: Seq[Option[tools.BenchVariance.TrancheVerdict]] =
        if (refTimes.isEmpty) trancheInfo.toSeq.map(_ => None)
        else tools.BenchVariance.annotate(
          trancheInfo.map(_._2).toSeq, perQuery.toMap, refTimes).map(Some(_))
      trancheInfo.toSeq.zip(verdicts).map { case ((i, qs, wall, code, rss), v) =>
        // no reference → no verdict fields at all: an unchecked tranche
        // must not read as "checked and clean"
        val vj = v.map { tv =>
          val vg = tv.geomean
            .map(g => s""","geomean_vs_ref":${ms(g)}""").getOrElse("")
          s"""$vg,"suspect":${tv.suspect}"""
        }.getOrElse("")
        s"""{"i":$i,"n":${qs.size},"first":"${qs.head}",""" +
          s""""last":"${qs.last}","wall_sec":${ms(wall)},"exit":$code,""" +
          s""""child_peak_rss_mb":$rss$vj}"""
      }
    }
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    tranches.zipWithIndex.foreach { case (qs, i) =>
      val outFile = tmp.resolve(s"tranche_$i.json")
      val cmd = (Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", cp, "graft.Bench")).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_BENCH_TRANCHE", i.toString)
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", qs.mkString(","))
      pb.environment().put("SPARK_GRAFT_BENCH_OUT", outFile.toString)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      System.err.println(
        s"[bench] tranche $i/${tranches.size}: ${qs.size} queries " +
          s"(${qs.head}..${qs.last})")
      val rssBefore = rssMb()
      val t0 = System.nanoTime()
      val proc = pb.start()
      // drain child stdout onto OUR stderr: the parent's final merged
      // lines must be the only JSON on stdout (driver tail-parses it)
      val pump = new Thread(() => {
        val in = proc.getInputStream
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { System.err.write(buf, 0, n); n = in.read(buf) }
      })
      pump.setDaemon(true); pump.start()
      // canary: sample the child's RSS once a second so a SIGKILLed run
      // records how big the child actually got before it died
      val childPeakRss = new java.util.concurrent.atomic.AtomicLong(-1)
      val sampler = new Thread(() => {
        while (proc.isAlive) {
          val r = rssMb(proc.pid())
          if (r > childPeakRss.get()) childPeakRss.set(r)
          try Thread.sleep(1000) catch { case _: InterruptedException => return }
        }
      })
      sampler.setDaemon(true); sampler.start()
      val code = proc.waitFor()
      pump.join(2000); sampler.interrupt()
      val wall = (System.nanoTime() - t0) / 1e9
      val rssAfter = rssMb()
      System.err.println(
        s"[bench] tranche $i done: exit=$code wall=${ms(wall)}s " +
          s"parent_rss_mb=$rssBefore->$rssAfter " +
          s"child_peak_rss_mb=${childPeakRss.get()}")
      if (code != 0 || !java.nio.file.Files.exists(outFile)) {
        // a dead tranche must surface as FAILURES, never vanish
        System.err.println(s"[bench] tranche $i exited $code without output")
        qs.foreach(failed += _)
      } else {
        // a child killed mid-write leaves a truncated file that EXISTS —
        // a parse failure must degrade this tranche to failures, exactly
        // like the missing-file path, never abort the merged run
        try {
          val node = om.readTree(java.nio.file.Files.readAllBytes(outFile))
          node.get("queries").fields().asScala
            .foreach(e => perQuery(e.getKey) = e.getValue.asDouble())
          node.get("failed").elements().asScala
            .foreach(f => failed += f.asText())
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[bench] tranche $i output unparseable ($e) — marking failed")
            qs.foreach(failed += _)
        }
      }
      trancheInfo += ((i, qs, wall, code, childPeakRss.get()))
      // Crash-proofing (the round-9 deliverable failure): rewrite the merged
      // partial artifact to the durable out-path and print a short
      // self-contained partial-total line after EVERY tranche, so a SIGKILL
      // at any point — including of this parent — leaves both a parseable
      // file on disk and a parseable last line on stdout. The final emit
      // below overwrites/supersedes these when the run completes.
      val doneSoFar = tranches.take(i + 1).flatten
      emit(doneSoFar.map(n => (n, perQuery.getOrElse(n, 0.0),
          !failed.contains(n) && perQuery.contains(n))),
        sfDir, Some(trancheJson()),
        partial = if (i + 1 < tranches.size)
          Some((i + 1, tranches.size, names.size)) else None)
    }
  }

  // ----------------------------------------------------------------- inline

  private def runInline(names: Seq[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val allQueries = SparkEntry.queries ++ SparkEntry.benchOnly
    val benchQueries = names.map(n => n -> allQueries(n))
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
    // cache instead of charging the first query per table with the disk
    // I/O. The OS page cache is shared across processes, so in sharded
    // mode only tranche 0 needs the touch — re-reading every table in all
    // five child JVMs was pure fixed overhead against a possible driver
    // wall-clock kill (round-9 verdict 1c).
    val trancheIdx = sys.env.get("SPARK_GRAFT_BENCH_TRANCHE")
    if (trancheIdx.forall(_ == "0"))
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

    val results = benchQueries.map { case (name, fn) =>
      // persisted-artifact queries: run the index build OUTSIDE the clock
      // (SparkEntry.prepare) — the timed section is reload + probe only.
      // A FAILED prepare must fail the row: the self-sufficient query fn
      // would otherwise rebuild the index INSIDE the clock and record a
      // silently-wrong number (the exact build-masks-probe distortion the
      // prepare hook exists to eliminate).
      val prepOk = SparkEntry.prepare.get(name).forall { p =>
        val r = try { p(spark, sfDir); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] prepare($name) FAILED: $e"); false }
        spark.catalog.clearCache()
        r
      }
      val t0 = System.nanoTime()
      // noop sink forces full evaluation of every output column —
      // count() would let Catalyst prune the projection away
      val ok = prepOk &&
        (try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false })
      val t = (System.nanoTime() - t0) / 1e9
      // intra-query persists are part of the measured time; dropping them
      // AFTER the clock keeps queries independent (no cross-query memory
      // pressure / eviction noise)
      spark.catalog.clearCache()
      (name, t, ok)
    }
    // optional JIT telemetry for SCALING.md: the high-water mark answers
    // "does the code cache still saturate mid-run?" without a JFR attach
    if (sys.env.contains("SPARK_GRAFT_CODECACHE_STATS"))
      codeCacheStats().foreach(s => System.err.println(s"[codecache] $s"))
    // Stop Spark BEFORE emitting the metric lines so shutdown chatter can
    // never land after them — the short JSON must be the very last line.
    val emitAfterStop = () => emit(results, sfDir, None)
    spark.stop()
    emitAfterStop()
  }

  private def codeCacheStats(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.toLowerCase.contains("code"))
      .map { p =>
        val u = p.getUsage; val pk = p.getPeakUsage
        s"${p.getName}: used=${u.getUsed / 1048576}MB " +
          s"peak=${pk.getUsed / 1048576}MB max=${u.getMax / 1048576}MB"
      }.toSeq
  }

  // ------------------------------------------------------------------- emit

  // ms precision on the stdout line keeps the 200-query record compact;
  // BENCH_LOCAL.json keeps full nanosecond-derived precision.
  // Locale.ROOT: the default-locale format would print "1,234" on
  // comma-decimal locales and break the JSON the driver tail-parses.
  private def ms(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Writes the merged artifact to the durable out-path and prints the
    * stdout record(s). `partial = Some((done, total, nQueriesPlanned))`
    * marks a mid-run checkpoint: the durable file is rewritten in full and
    * ONE short self-contained line (flagged `"partial":true`) goes to
    * stdout, so a kill between tranches still leaves the driver's
    * tail-parse a valid total for the completed prefix. */
  private def emit(results: Seq[(String, Double, Boolean)], sfDir: String,
      tranches: Option[Seq[String]],
      partial: Option[(Int, Int, Int)] = None): Unit = {
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
    val trancheJson = tranches
      .map(t => s""","tranches":${t.mkString("[", ",", "]")}""")
      .getOrElse("")
    val partialJson = partial
      .map { case (d, t, _) => s""","partial":true,"tranches_done":$d,"tranches_total":$t""" }
      .getOrElse("")
    val jsonFull =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsFull,"failed":$failedJson$trancheJson$partialJson,"sf":"$sfDir"}"""
    val jsonDetail =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qsShort,"failed":$failedJson$trancheJson$partialJson,"sf":"$sfDir"}"""
    // The driver's tail capture keeps only the last ~2 KB of stdout; a
    // 200-query detail line is bigger than that, so its head (with
    // "value":total) gets truncated and the round scores parsed:null
    // (round-4 verdict #1). Emit the detail line first, then a SHORT
    // self-contained total record as the very last line — whatever prefix
    // the tail loses, the final line always fits and always parses.
    val jsonTail =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_failed":${failed.size}$partialJson}"""
    // Durable copy so a harness that misses the stdout line can still
    // recover the record from disk. Best-effort: an unwritable path must
    // not abort the run before the primary stdout metric line prints.
    // Ad-hoc SUBSET runs must not default onto BENCH_LOCAL.json — a
    // 1-query sf0.01 smoke run silently clobbered the sf0.1 variance
    // reference in round 11 and the next full run self-compared against
    // nothing (no geomean_vs_ref fields, no suspect flags).
    val defaultOut =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) "BENCH_SUBSET.json"
      else "BENCH_LOCAL.json"
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut))
      java.nio.file.Files.write(out, jsonFull.getBytes("UTF-8"))
    } catch {
      // NonFatal only: an OOM/VM error must kill the run, not be masked
      // by a clean-looking metric line
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] durable write failed: $e")
    }
    System.out.flush()
    if (partial.isEmpty) println(jsonDetail) // checkpoints stay short
    println(jsonTail)
    System.out.flush()
  }
}
