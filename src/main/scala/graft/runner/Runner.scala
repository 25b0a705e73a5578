package graft.runner

import scala.collection.mutable

/** X3 pipeline registry + dependency-ordered execution (reference:
  * pipeline-spec.yaml + dpp's Celery orchestration — seven pipelines with
  * cron `schedule:` blocks and inter-pipeline `dependencies:`, e.g.
  * dataset-assets after datasets, publications after zotero_fetch).
  *
  * Cron firing is left to the external scheduler (the reference used
  * Celery beat); the Runner owns registration, topological ordering and
  * stats collection.
  */
object Runner {

  final case class Pipeline(
      name: String,
      run: () => Unit,
      dependsOn: Seq[String] = Nil,
      schedule: Option[String] = None) // crontab expression, informational

  final case class RunStats(name: String, seconds: Double, error: Option[String])

  final class Registry {
    private val pipelines = mutable.LinkedHashMap.empty[String, Pipeline]

    def register(p: Pipeline): this.type = { pipelines(p.name) = p; this }

    def topoOrder(targets: Seq[String] = Nil): Seq[Pipeline] = {
      val wanted =
        if (targets.isEmpty) pipelines.keys.toSeq
        else {
          // expand transitive deps of the requested targets
          val seen = mutable.LinkedHashSet.empty[String]
          def visit(n: String): Unit = if (!seen.contains(n)) {
            pipelines.get(n).foreach(_.dependsOn.foreach(visit))
            seen += n
          }
          targets.foreach(visit)
          seen.toSeq
        }
      // Kahn's algorithm, stable on registration order
      val order = mutable.ArrayBuffer.empty[Pipeline]
      val pending = mutable.LinkedHashSet(wanted: _*)
      var progressed = true
      while (pending.nonEmpty && progressed) {
        progressed = false
        for (n <- pending.toSeq) {
          val p = pipelines(n)
          if (p.dependsOn.forall(d => !pending.contains(d))) {
            order += p; pending -= n; progressed = true
          }
        }
      }
      require(pending.isEmpty, s"dependency cycle among: ${pending.mkString(", ")}")
      order.toSeq
    }

    /** Run targets (or everything) in dependency order; a failed pipeline
      * skips its dependents, like dpp marking downstream dirty.
      */
    def run(targets: Seq[String] = Nil): Seq[RunStats] = {
      val failed = mutable.Set.empty[String]
      topoOrder(targets).map { p =>
        if (p.dependsOn.exists(failed.contains)) {
          failed += p.name
          RunStats(p.name, 0.0, Some("skipped: upstream failure"))
        } else {
          val t0 = System.nanoTime()
          try {
            p.run()
            RunStats(p.name, (System.nanoTime() - t0) / 1e9, None)
          } catch {
            case e: Exception =>
              failed += p.name
              RunStats(p.name, (System.nanoTime() - t0) / 1e9,
                Some(e.getMessage))
          }
        }
      }
    }
  }
}
