package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Joins + the union/alias algebra (SURVEY.md §2.4–§2.5). */
object Joins {

  /** U1 `concatenate(field_map, target)` — UNION ALL of n sources, renaming
    * per-source alias columns to canonical names; unmapped columns dropped;
    * missing → null (reference: datasets.py:336 with the 40-key Hebrew
    * alias map at datasets.py:186-247; publications.py:95-118).
    *
    * `aliasMap`: canonical name → accepted source aliases (the canonical
    * name itself always matches). Each source gets an explicit `select`
    * (column pruning reaches the scan), then `unionByName` — no shuffle.
    */
  def concatenate(sources: Seq[DataFrame], aliasMap: Map[String, Seq[String]]): DataFrame = {
    require(sources.nonEmpty, "concatenate: no sources")
    val canon = aliasMap.keys.toSeq.sorted
    // canonical type = type in the first source that carries the column
    // (dataflows uses the declared target schema; string if never seen)
    val canonType: Map[String, org.apache.spark.sql.types.DataType] =
      canon.map { k =>
        val cands = k +: aliasMap(k)
        val dt = sources.iterator
          .flatMap(src => cands.collectFirst {
            case a if src.columns.contains(a) => src.schema(a).dataType
          })
          .nextOption()
          .getOrElse(org.apache.spark.sql.types.StringType)
        k -> dt
      }.toMap
    val aligned = sources.map { src =>
      val have = src.columns.toSet
      val cols = canon.map { k =>
        val cands = k +: aliasMap(k)
        cands.find(have.contains) match {
          case Some(a) => col(a).cast(canonType(k)).as(k)
          case None    => lit(null).cast(canonType(k)).as(k)
        }
      }
      src.select(cols: _*)
    }
    aligned.reduce(_ unionByName _)
  }

  /** U2 plain n-ary UNION ALL by name, tolerating missing columns
    * (reference: consecutive loads + concatenate, publications.py:86-94).
    */
  def unionAll(sources: Seq[DataFrame]): DataFrame =
    sources.reduce(_.unionByName(_, allowMissingColumns = true))

  /** J1 `join(source, src_keys, target, tgt_keys, fields, full)` — equi-join
    * pulling selected/renamed source columns into target rows (reference:
    * judges.py:137-143 joins tribunals into judges with renames;
    * obsolete/join_publications.py:13-16 inner with gd_* prefixes).
    *
    * `fields`: source column → output name. `how`: "left" (dataflows
    * full=True default) or "inner" (full=False). `broadcastSource=true` for
    * dimension-sized sources (the reference's build side was a local KV
    * store — broadcast is the cluster analogue and avoids the shuffle
    * entirely).
    */
  def joinResources(
      target: DataFrame,
      source: DataFrame,
      targetKeys: Seq[String],
      sourceKeys: Seq[String],
      fields: Map[String, String],
      how: String = "left",
      broadcastSource: Boolean = true): DataFrame = {
    val srcCols =
      sourceKeys.map(k => col(k).as("__k_" + k)) ++
        fields.toSeq.sortBy(_._2).map { case (from, to) => col(from).as(to) }
    val src0 = source.select(srcCols: _*)
    val src = if (broadcastSource) broadcast(src0) else src0
    val cond = targetKeys.zip(sourceKeys)
      .map { case (t, s) => target(t) === src("__k_" + s) }
      .reduce(_ && _)
    target.join(src, cond, how)
      .drop(sourceKeys.map("__k_" + _): _*)
  }

  /** J2 `join_self` — group-by-with-aggregation disguised as a self-join:
    * collapse rows sharing `keys`; per output field an aggregate spec
    * (reference: datasets.py:364-376 and :391-403).
    *
    * Order determinism: `Collect` sorts each collected array by the stamped
    * `__ord` (SURVEY §7 hard part 1) via struct-sort, never relying on
    * Spark's nondeterministic collect_list order. Aggregation is partial
    * (map-side combine) — scales without a single-task window.
    */
  sealed trait AggSpec
  case object First extends AggSpec
  case object Collect extends AggSpec
  case object Max extends AggSpec
  case object CountRows extends AggSpec

  def joinSelf(
      df: DataFrame,
      keys: Seq[String],
      spec: Map[String, AggSpec],
      ordCol: String = Ordering.ORD): DataFrame = {
    // ALL Collect fields ride in ONE collect_list of (ord, f1, f2, …)
    // structs, sorted once — the ord key crosses the shuffle once total
    // instead of once per collected field, and the per-group sort runs
    // once instead of N times.
    val collectFields = spec.toSeq.filter(_._2 == Collect).map(_._1).sorted
    val scalarAggs = spec.toSeq.sortBy(_._1).collect {
      case (f, First)     => min_by(col(f), col(ordCol)).as(f)
      case (f, Max)       => max(col(f)).as(f)
      case (f, CountRows) => count(lit(1)).as(f)
    }
    val packedAgg =
      if (collectFields.isEmpty) Nil
      else Seq(array_sort(collect_list(struct(
        col(ordCol).as("__o") +: collectFields.map(f => col(f).as(f)): _*)))
        .as("__packed"))
    val aggs = scalarAggs ++ packedAgg :+
      min(col(ordCol)).as(ordCol) // groups keep the order of first arrival
    val grouped = df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val unpacked = collectFields.foldLeft(grouped) { (g, f) =>
      g.withColumn(f, transform(col("__packed"), p => p.getField(f)))
    }
    // stable output shape: keys, spec fields (name-sorted), ord
    unpacked.select((keys ++ spec.keys.toSeq.sorted :+ ordCol).map(col): _*)
  }
}
