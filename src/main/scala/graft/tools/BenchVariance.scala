package graft.tools

/** Variance-aware bench reading (SCALING.md §10, round-9 verdict #7):
  * three identical-code full runs spanned 230.7–314.4 s because ambient
  * host load inflates whole tranches (the 314.4 s run's burst tranche
  * showed a UNIFORM geomean ≈1.33 inflation and a 183 s wall vs ~125 s
  * siblings). A contaminated tranche must self-report in the artifact
  * instead of relying on a human reading band medians — per-query
  * times from a crowded tranche must never be read as plan regressions.
  *
  * The check: per tranche, the geometric mean of this-run/reference
  * per-query ratios. A tranche is `suspect` when its geomean is both
  * absolutely inflated (≥ [[AbsThreshold]]) and LOCALIZED — materially
  * above the artifact-wide geomean (≥ [[RelThreshold]] ×). A uniform
  * shift across all tranches is NOT flagged: that is a code or data
  * change, exactly what a bench exists to show.
  *
  * Used two ways: `graft.Bench` calls [[annotate]] at emit time when a
  * reference artifact is available (env `SPARK_GRAFT_BENCH_REF`,
  * default `BENCH_LOCAL.json` — the builder's committed sibling run at
  * the same sf), so the DRIVER artifact ships the flags; and the
  * [[main]] post-processor re-annotates any archived artifact against
  * one or more sibling runs.
  */
object BenchVariance {

  /** Minimum geomean inflation vs reference to consider a tranche hot.
    * §10's burst measured 1.33; normal sibling scatter stays well
    * under 1.15. */
  val AbsThreshold = 1.25

  /** The burst must also be localized: tranche geomean ≥ this × the
    * artifact-wide geomean. */
  val RelThreshold = 1.15

  /** Fewer comparable queries than this → no verdict (None). */
  val MinQueries = 5

  final case class TrancheVerdict(geomean: Option[Double], suspect: Boolean)

  private def geomean(rs: Seq[Double]): Option[Double] = {
    val ok = rs.filter(r => r > 0 && !r.isNaN && !r.isInfinite)
    if (ok.isEmpty) None
    else Some(math.exp(ok.map(math.log).sum / ok.size))
  }

  /** Pure core: per-tranche per-query (this, ref) second pairs →
    * verdicts. Queries with a sub-millisecond reference are dropped
    * (ratio of two timer reads, not of work). */
  def verdicts(tranches: Seq[Seq[(Double, Double)]]): Seq[TrancheVerdict] = {
    val ratios = tranches.map(_.collect {
      case (t, ref) if ref > 0.001 && t > 0 => t / ref
    })
    val overall = geomean(ratios.flatten).getOrElse(1.0)
    ratios.map { rs =>
      if (rs.size < MinQueries) TrancheVerdict(geomean(rs), suspect = false)
      else {
        val g = geomean(rs)
        TrancheVerdict(g, g.exists(v =>
          v >= AbsThreshold && v >= RelThreshold * overall))
      }
    }
  }

  /** Verdicts for named queries grouped into tranches, against a
    * reference per-query map. */
  def annotate(trancheQueries: Seq[Seq[String]],
      times: Map[String, Double],
      ref: Map[String, Double]): Seq[TrancheVerdict] =
    verdicts(trancheQueries.map(_.flatMap(q =>
      for (t <- times.get(q); r <- ref.get(q)) yield (t, r))))

  /** Geomean of this-tranche/reference ratios for ONE tranche in
    * isolation (no artifact-wide relative test — used mid-run, before the
    * other tranches exist, to decide an immediate retry). None when fewer
    * than [[MinQueries]] comparable pairs. */
  def trancheGeomeanVsRef(times: Map[String, Double],
      ref: Map[String, Double]): Option[Double] = {
    val ratios = times.toSeq.flatMap { case (q, t) =>
      ref.get(q).collect { case r if r > 0.001 && t > 0 => t / r } }
    if (ratios.size < MinQueries) None else geomean(ratios)
  }

  /** Immediate-retry trigger for a just-finished tranche: absolutely
    * inflated vs the sibling reference. The relative (localization) test
    * can't run mid-stream, so a uniform code slowdown WILL trigger one
    * retry — one wasted re-run, and the final artifact's two-sided
    * verdict still reports it honestly. */
  def shouldRetry(times: Map[String, Double],
      ref: Map[String, Double]): Boolean =
    trancheGeomeanVsRef(times, ref).exists(_ >= AbsThreshold)

  /** Two-kind suspect discriminator (round-12 verdict #3): the artifact
    * records `load1_before`/`load1_after` per tranche, but a suspect
    * verdict alone can't say WHY — a 1.3× tranche on an idle machine is
    * a code regression, the same tranche on a load-40 machine is noise.
    * `ambient` when the 1-minute load average around the tranche reached
    * the machine's core count (the bench's own threads can account for
    * at most `cpus`; anything at/above means contention from outside);
    * `unexplained` otherwise — treat as a regression. Unreadable load
    * (-1) can never read as ambient. */
  def suspectKind(load1Before: Double, load1After: Double,
      cpus: Int): String =
    if (math.max(load1Before, load1After) >= cpus) "ambient"
    else "unexplained"

  /** Retry keep-policy (round-12 advisor, medium tail): keep whichever
    * attempt's tranche geomean sits closer to the reference in LOG
    * distance — |log g|, not raw g. Raw `g2 < g1` would prefer a
    * spuriously-fast retry (0.6 from a warm page cache) over a first
    * attempt at 1.1 that was actually closer to truth, and record
    * optimistic times into a future reference. Returns true when the
    * SECOND attempt should replace the first; an unmeasurable second
    * attempt never wins. */
  def keepSecondAttempt(g1: Option[Double], g2: Option[Double]): Boolean =
    (for (a <- g2; b <- g1) yield
      math.abs(math.log(a)) < math.abs(math.log(b))).getOrElse(false)

  /** Reference-merge for suspect runs (round-11 verdict #1: an
    * ambient-inflated tranche's times overwrote `BENCH_LOCAL.json`, so
    * the NEXT round's geomean_vs_ref for ~50 queries compared against
    * ~3×-inflated references and a real regression there would have read
    * green). Per-query times from suspect tranches must never become the
    * comparison reference:
    *
    *   - non-suspect queries take this run's fresh time;
    *   - suspect-tranche queries KEEP the old reference entry;
    *   - suspect-tranche queries the old reference lacks are DROPPED —
    *     an inflated time in the reference silently masks a regression,
    *     a missing entry is merely unchecked (and visibly so: no
    *     geomean_vs_ref contribution next round).
    */
  def mergeReference(oldRef: Map[String, Double],
      fresh: Map[String, Double],
      suspectQueries: Set[String]): Map[String, Double] =
    fresh.filterNot { case (q, _) => suspectQueries(q) } ++
      oldRef.filter { case (q, _) => suspectQueries(q) && fresh.contains(q) }

  /** [[loadQueryTimes]] gated on the artifact's recorded sf matching —
    * a reference at a different scale factor would make every ratio
    * meaningless (the relative condition would mask it, but an
    * all-suspect-false annotation against the wrong sf still reads as
    * "checked and clean"). */
  def loadQueryTimesForSf(path: String, sfDir: String,
      cpus: Option[Int] = None): Map[String, Double] = {
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = om.readTree(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)))
      val sf = node.get("sf")
      // cpus gate (round-13 verdict #2): the driver re-runs the bench at a
      // lower core count, and that run's times must never become the
      // reference for (or be clobbered by) a full-core run — at sf0.1 the
      // 8-core run is FASTER than 32 cores (scheduling overhead dominates
      // toy stages), so cross-cpus ratios read as phantom regressions.
      // Artifacts now record "cpus"; a recorded mismatch rejects the file.
      // Files predating the field stay loadable (legacy back-compat).
      val recCpus = Option(node.get("cpus")).map(_.asInt())
      val cpusOk = (for (want <- cpus; got <- recCpus) yield got == want)
        .getOrElse(true)
      if (sf != null && sf.asText() == sfDir && cpusOk) loadQueryTimes(path)
      else Map.empty
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  /** Loads `{"queries": {...}}` from a bench artifact; empty map on any
    * parse problem (annotation is best-effort — it must never break an
    * emit). */
  def loadQueryTimes(path: String): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = om.readTree(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)))
      val qs = node.get("queries")
      if (qs == null) Map.empty
      else qs.fields().asScala
        .map(e => e.getKey -> e.getValue.asDouble()).toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  /** Post-processor: re-annotate an archived artifact against sibling
    * run(s). Usage: `runMain graft.tools.BenchVariance primary.json
    * sibling.json [sibling2.json ...]` — prints one line per tranche
    * and rewrites `primary` with `geomean_vs_ref` + `suspect` fields
    * in its `tranches` array. The reference time per query is the
    * MEDIAN across siblings.
    */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchVariance primary.json sibling.json [sibling2.json ...]")
    import scala.jdk.CollectionConverters._
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val primaryPath = java.nio.file.Paths.get(args(0))
    val root = om.readTree(java.nio.file.Files.readAllBytes(primaryPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val times = root.get("queries").fields().asScala
      .map(e => e.getKey -> e.getValue.asDouble()).toMap
    val sib = args.drop(1).map(loadQueryTimes)
    val ref = times.keys.flatMap { q =>
      val vs = sib.flatMap(_.get(q)).sorted
      if (vs.isEmpty) None else Some(q -> vs(vs.length / 2))
    }.toMap
    val tr = root.get("tranches")
    require(tr != null && tr.isArray, s"${args(0)} has no tranches array")
    // tranche membership from the sorted query list + recorded bounds
    val sortedQ = times.keys.toSeq.sorted
    val groups = tr.elements().asScala.toSeq.map { t =>
      val first = t.get("first").asText(); val last = t.get("last").asText()
      sortedQ.filter(q => q >= first && q <= last)
    }
    val vs = annotate(groups, times, ref)
    tr.elements().asScala.toSeq.zip(vs).zipWithIndex.foreach {
      case ((tn, v), i) =>
        val o = tn.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        v.geomean.foreach(g => o.put("geomean_vs_ref",
          math.rint(g * 1000) / 1000))
        o.put("suspect", v.suspect)
        println(f"tranche $i: geomean_vs_ref=${v.geomean.getOrElse(Double.NaN)}%.3f suspect=${v.suspect}")
    }
    java.nio.file.Files.write(primaryPath,
      om.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    println(s"annotated ${args(0)}")
  }
}
