package graft.core

import org.apache.spark.sql.SparkSession

/** The dataflow kernel: a Flow is an ordered chain of Stages over a package
  * of named resources (reference: dataflows `Flow(...)` processor chains,
  * e.g. datasets.py:436-465). Unlike the reference's pull-based row
  * generators, a Stage is a whole-plan transformation
  * `Ctx => Ctx` — Catalyst fuses the chain into one optimized plan, so
  * "streaming one row at a time" becomes whole-stage codegen for free.
  */
object Flow {

  /** The package: named resources in insertion order (Ctx preserves order
    * like the reference's ordered resource list — sitemap.py:52-69 relies
    * on resource ordering).
    */
  type Ctx = scala.collection.immutable.ListMap[String, Resource]

  type Stage = Ctx => Ctx

  val empty: Ctx = scala.collection.immutable.ListMap.empty

  def apply(stages: Stage*): Stage = stages.reduceLeft(_ andThen _)

  /** Run a stage chain from an empty package. */
  def run(spark: SparkSession)(stages: Stage*): Ctx =
    Flow(stages: _*)(empty)

  // ---- stage constructors ----------------------------------------------

  /** Add or replace one resource. */
  def resource(r: Resource): Stage = ctx => ctx.updated(r.name, r)

  /** Transform one named resource's DataFrame in place. */
  def on(name: String)(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Stage =
    ctx => ctx.updated(name, ctx(name).withDf(f))

  /** Transform every resource (reference: row processors default to all
    * resources, e.g. publications.py:66-72 null normalization).
    */
  def onAll(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Stage =
    ctx => ctx.map { case (k, r) => k -> r.withDf(f) }

  /** Drop resources (reference: concatenate consumes its sources). */
  def drop(names: String*): Stage = ctx => ctx -- names

  /** Rename a resource + optionally set path/pk (reference:
    * `update_resource` / `update_pk`, judges.py:131,134, dump_to_es.py:96-102).
    */
  def updateResource(
      name: String,
      newName: Option[String] = None,
      path: Option[String] = None,
      primaryKey: Option[Seq[String]] = None): Stage = ctx => {
    val r0 = ctx(name)
    val r1 = r0.copy(
      name = newName.getOrElse(r0.name),
      path = path.orElse(r0.path),
      primaryKey = primaryKey.getOrElse(r0.primaryKey))
    (ctx - name).updated(r1.name, r1)
  }
}
