package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.{Flow, Resource}
import graft.ops.{Joins, Ordering, Reshape, RowOps}

/** Declarative pipeline-spec interpreter — the reference's user-facing
  * surface (datapackage-pipelines `pipeline-spec.yaml`: an ordered list
  * of named processors with params; reference pipeline-spec.yaml drives
  * every production pipeline this library re-implements). A reference
  * user ports their spec by converting YAML to the isomorphic JSON (the
  * one manual step — no YAML parser ships with Spark) and keeps the
  * processor names and params.
  *
  * Each step is `{"run": "<processor>", "params": {...}}`; the chain
  * folds over the [[Flow.Ctx]] package exactly like the reference's
  * processor chain folds over the datapackage. Interpretation builds ONE
  * Catalyst plan — steps are plan transformations, so a 40-step spec
  * still optimizes (pushdown through every step, fused codegen) as if it
  * were hand-written.
  */
object SpecInterpreter {

  private implicit val fmt: Formats = DefaultFormats

  /** Run a JSON pipeline spec against a base dir of parquet tables.
    * Returns the final package.
    */
  def run(spark: SparkSession, dir: String, specJson: String): Flow.Ctx = {
    val steps = (JsonMethods.parse(specJson) \ "pipeline").extract[List[JValue]]
    val stages: Seq[Flow.Stage] = steps.map(step => stage(spark, dir, step))
    Flow(stages: _*)(Flow.empty)
  }

  private def params(step: JValue): JValue = step \ "params"

  private def stage(spark: SparkSession, dir: String, step: JValue): Flow.Stage = {
    val p = params(step)
    def str(k: String): String = (p \ k).extract[String]
    def strs(k: String): Seq[String] = (p \ k).extract[Seq[String]]
    def resourceName: String = (p \ "resource").extractOpt[String].getOrElse("res")

    (step \ "run").extract[String] match {
      case "load" =>
        // {"table": "...", "name": "..."} — parquet table from the sf dir
        val name = (p \ "name").extractOpt[String].getOrElse(str("table"))
        ctx => ctx.updated(name,
          Resource(graft.ops.Load.table(spark, dir, str("table")), name))
      case "filter_rows" =>
        // {"resource": r, "equals": [{field: value, ...}, ...]} — OR of ANDs,
        // the reference's equals-spec form
        val conds = (p \ "equals").extract[List[Map[String, JValue]]]
        Flow.on(resourceName)(df => RowOps.filterRowsEquals(df,
          conds.map(_.map { case (k, v) => k -> jvalueToAny(v) })))
      case "select_fields" =>
        Flow.on(resourceName)(RowOps.selectFields(_, strs("fields")))
      case "delete_fields" =>
        Flow.on(resourceName)(RowOps.deleteFields(_, strs("fields")))
      case "add_computed_field" =>
        // {"target": f, "operation": "format", "with": "tmpl-{col}"} or
        // {"operation": "expr", "with": "<sql expression>"}
        (p \ "operation").extractOpt[String] match {
          case Some("expr") =>
            Flow.on(resourceName)(_.withColumn(str("target"),
              expr(str("with"))))
          case _ =>
            Flow.on(resourceName)(RowOps.addFormatField(_, str("target"),
              str("with")))
        }
      case "set_constant" =>
        Flow.on(resourceName)(_.withColumn(str("target"), lit(str("value"))))
      case "join" =>
        // {"source": a, "target": b, "keys": [...] | target_keys/source_keys,
        //  "fields": {out: in}, "mode": "left"}
        val fields = (p \ "fields").extract[Map[String, String]]
        val mode = (p \ "mode").extractOpt[String].getOrElse("left")
        val tks = (p \ "target_keys").extractOpt[Seq[String]].getOrElse(strs("keys"))
        val sks = (p \ "source_keys").extractOpt[Seq[String]].getOrElse(strs("keys"))
        ctx => {
          val joined = Joins.joinResources(
            ctx(str("target")).df, ctx(str("source")).df,
            tks, sks, fields.map(_.swap), how = mode)
          ctx.updated(str("target"), ctx(str("target")).copy(df = joined))
        }
      case "concatenate" =>
        // {"sources": [...], "target": t, "fields": {out: [aliases...]}}
        val fields = (p \ "fields").extract[Map[String, List[String]]]
        ctx => {
          val srcs = strs("sources").map(ctx(_).df)
          val out = Joins.concatenate(srcs, fields)
          (ctx -- strs("sources")).updated(str("target"),
            Resource(out, str("target")))
        }
      case "unwind" =>
        // {"resource": r, "field": f, "target": t} — full-row fan-out with
        // global first-seen-wins dedup on the target, matching the
        // reference generator (broken_links.py:34-43): every non-array
        // column rides along, and the first row (arrival order) to carry
        // a value owns it corpus-wide
        Flow.on(resourceName)(df =>
          Reshape.unwindFirstSeen(df, str("field"), str("target")))
      case "sort" =>
        Flow.on(resourceName)(_.orderBy(strs("by").map(col): _*))
      case "row_number" =>
        // arrival-order numbering: stamp the order first (parquet loads
        // don't carry the CSV loader's __ord), number, drop the stamp.
        // Optional {"partition_by": [...]} switches to per-key occurrence
        // numbering — the scale path. WITHOUT it this is dpp's global
        // arrival-order semantics: a single-task window, safe only on
        // already-reduced resources (the reference's order-dependent
        // tables are hand-edited sheets, ≤ thousands of rows).
        val partitionBy = (p \ "partition_by").extractOpt[Seq[String]]
        Flow.on(resourceName)(df => {
          val stamped = Ordering.stampOrder(df)
          val numbered = partitionBy match {
            case Some(keys) if keys.nonEmpty =>
              Ordering.occurrenceIndex(stamped, keys, str("target"))
                .withColumn(str("target"), col(str("target")).cast("long"))
            case _ => Ordering.orderIndex(stamped, str("target"))
          }
          numbered.drop(Ordering.ORD)
        })
      case "dedup" =>
        Flow.on(resourceName)(_.dropDuplicates(strs("keys")))
      case "unpivot" =>
        // {"resource": r, "regex": "^...$", "key": k, "value": v} — the
        // capture-group unpivot (R1; reference datasets.py:323-334 melts
        // year columns by regex)
        Flow.on(resourceName)(df => Reshape.unpivotRegex(
          df, str("regex"), str("key"), str("value")))
      case "set_type" =>
        // {"resource": r, "field": f, "type": t, "groupChar": ",",
        //  "stripPercent": bool, "bareNumber": bool, "on_error":
        //  "raise"|"nullify"} — P6 with the frictionless option surface
        val to: org.apache.spark.sql.types.DataType = str("type") match {
          case "integer" => org.apache.spark.sql.types.LongType
          case "number"  => org.apache.spark.sql.types.DoubleType
          case "string"  => org.apache.spark.sql.types.StringType
          case "date"    => org.apache.spark.sql.types.DateType
          case "boolean" => org.apache.spark.sql.types.BooleanType
          case t => sys.error(s"set_type: unknown type '$t'")
        }
        val onErr = (p \ "on_error").extractOpt[String] match {
          case Some("nullify") => graft.ops.SetType.Nullify
          case _               => graft.ops.SetType.Raise
        }
        Flow.on(resourceName)(df => graft.ops.SetType.setType(df,
          str("field"), to,
          groupChar = (p \ "groupChar").extractOpt[String].getOrElse(","),
          stripPercent = (p \ "stripPercent").extractOpt[Boolean].getOrElse(false),
          bareNumber = (p \ "bareNumber").extractOpt[Boolean].getOrElse(true),
          onError = onErr))
      case "checkpoint" =>
        // {"resource": r, "name": n} — K9: materialize to parquet under
        // the checkpoint root and resume the plan from the re-read copy
        Flow.on(resourceName)(graft.ops.Checkpoint(_, str("name")))
      case "dump_to_path" =>
        // {"out-path": dir} — K1: CSV-per-resource + datapackage.json for
        // EVERY resource in the package; the package flows on unchanged
        ctx => { graft.sinks.DumpToPath.dump(ctx, str("out-path")); ctx }
      case "join_self" =>
        // {"resource": r, "keys": [...], "spec": {field: first|collect|
        //  max|count}} — J2: group to one row per key, collecting in
        // arrival order (stamped HERE, like row_number: parquet loads
        // carry no __ord, so arrival = the resource's current order —
        // put a sort step before this one to pin it)
        val spec = (p \ "spec").extract[Map[String, String]].map {
          case (f, "first")   => f -> Joins.First
          case (f, "collect") => f -> Joins.Collect
          case (f, "max")     => f -> Joins.Max
          case (f, "count")   => f -> Joins.CountRows
          case (_, a) => sys.error(s"join_self: unknown agg '$a'")
        }
        Flow.on(resourceName)(df =>
          Joins.joinSelf(Ordering.stampOrder(df), strs("keys"), spec)
            .drop(Ordering.ORD))
      // ---- curation-tier processors (beyond the reference surface:
      // the LLM-pipeline operators, spec-drivable like any other step) --
      case "redact_pii" =>
        // {"resource": r, "field": f} — emails/phones/IPs → typed tokens
        Flow.on(resourceName)(df => df.withColumn(str("field"),
          graft.text.Scrub.redactPii(col(str("field")))))
      case "scrub_blocklist" =>
        // {"resource": r, "field": f, "terms": [...], "replacement": "§"}
        // — Aho–Corasick multi-pattern scrub (leftmost-longest); terms
        // are spec literals, the declarative form of a fixed blocklist
        val repl = (p \ "replacement").extractOpt[String].getOrElse("§")
        Flow.on(resourceName)(df => df.withColumn(str("field"),
          graft.functions.MultiReplaceExpr.multiReplace(
            col(str("field")), strs("terms"), repl)))
      case "repetition_gate" =>
        // {"resource": r, "field": f} — the nine Gopher self-repetition
        // statistics + keep_repetition flag (published §A1.1 bounds)
        Flow.on(resourceName)(df =>
          graft.text.QualityRules.repetitionFlags(df, str("field")))
      case "shard_shuffle" =>
        // {"resource": r, "key": c, "shards": 16, "seed": "42"} —
        // seed-reproducible training-order permutation + shard/pos
        Flow.on(resourceName)(df => graft.text.Splits.shardShuffle(
          df, str("key"),
          (p \ "shards").extractOpt[Int].getOrElse(16), str("seed")))
      case "block_spans" =>
        // {"resource": r, "id": c, "weight": c, "block_size": 256} —
        // token-stream blocking; the resource becomes per-(doc, block)
        // span rows (block_id, doc_off, block_off, span_len)
        Flow.on(resourceName)(df => graft.text.Sequences.blockSpans(
          df, str("id"), str("weight"),
          (p \ "block_size").extractOpt[Long].getOrElse(256L)))
      case "quantile_bucket" =>
        // {"resource": r, "value": c, "tie": c, "buckets": 10} — exact
        // equal-population bucketing (adds rank + bucket columns)
        Flow.on(resourceName)(df => graft.ops.Ordering.quantileBucket(
          df, str("value"), str("tie"),
          (p \ "buckets").extractOpt[Int].getOrElse(10)))
      case "golden_record" =>
        // {"resource": r, "cluster": c, "id": c, "precedence": [cols],
        //  "fields": [cols]} — duplicate clusters collapse to one merged
        // record, per-field latest-non-null with donor provenance
        Flow.on(resourceName)(df => graft.ops.Survivorship.golden(
          df, str("cluster"), str("id"), strs("precedence"),
          strs("fields")))
      case "densify" =>
        // {"resource": r, "keys": [cols], "bucket": c,
        //  "fills": {"cnt": 0, ...}} — time-spine gap zero-fill
        val fills = (p \ "fills").extract[Map[String, Long]].toSeq
          .map { case (c, v) => c -> lit(v) }
        Flow.on(resourceName)(df => graft.ops.TimeSpine.densify(
          df, strs("keys"), str("bucket"), fills))
      case "span_corrupt" =>
        // {"resource": r, "field": f, "id": idCol, "block_len": 3} —
        // deterministic denoising-pair construction; the resource becomes
        // (id, input_text, targets_text, n_spans, n_masked)
        val blockLen = (p \ "block_len").extractOpt[Int].getOrElse(3)
        Flow.on(resourceName)(df => graft.text.SpanCorruption.corrupt(
          df, str("field"), str("id"), blockLen))
      case other =>
        sys.error(s"SpecInterpreter: unknown processor '$other'")
    }
  }

  private def jvalueToAny(v: JValue): Any = v match {
    case JString(s) => s
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDouble(d) => d
    case JBool(b) => b
    case JNull => null
    case other => other.values
  }
}
