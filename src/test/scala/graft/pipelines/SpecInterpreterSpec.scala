package graft.pipelines

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.runner.SpecInterpreter

class SpecInterpreterSpec extends SparkSpec {

  test("concatenate + unwind + dedup + row_number processors") {
    val spec =
      """{"pipeline": [
        | {"run": "load", "params": {"table": "nation", "name": "n1"}},
        | {"run": "load", "params": {"table": "nation", "name": "n2"}},
        | {"run": "concatenate", "params": {"sources": ["n1", "n2"],
        |   "target": "all", "fields": {"n_name": [], "n_regionkey": []}}},
        | {"run": "dedup", "params": {"resource": "all", "keys": ["n_name"]}},
        | {"run": "sort", "params": {"resource": "all", "by": ["n_name"]}},
        | {"run": "row_number", "params": {"resource": "all", "target": "rn"}}
        |]}""".stripMargin
    val ctx = SpecInterpreter.run(spark, sf, spec)
    assert(ctx.keySet == Set("all"), "concatenate must consume its sources")
    val out = ctx("all").df
    assert(out.count() == 25, "dedup over the doubled nations")
    assert(out.columns.toSet == Set("n_name", "n_regionkey", "rn"))
    val rns = out.orderBy("rn").select("rn").collect().map(_.getLong(0)).toSeq
    assert(rns == (1L to 25L), s"row numbers not dense: $rns")
  }

  test("curation processors: redact_pii → scrub_blocklist → span_corrupt chain") {
    val spec =
      """{"pipeline": [
        | {"run": "load", "params": {"table": "documents", "name": "d"}},
        | {"run": "redact_pii", "params": {"resource": "d", "field": "text"}},
        | {"run": "scrub_blocklist", "params": {"resource": "d",
        |   "field": "text", "terms": ["data", "big data"],
        |   "replacement": "~"}},
        | {"run": "span_corrupt", "params": {"resource": "d",
        |   "field": "text", "id": "doc_id", "block_len": 3}}
        |]}""".stripMargin
    val out = SpecInterpreter.run(spark, sf, spec)("d").df
    assert(out.columns.toSet ==
      Set("doc_id", "input_text", "targets_text", "n_spans", "n_masked"))
    assert(out.count() ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    // the blocklist ran before corruption: no surviving 'data' outside a
    // masked span in either output stream
    val leaked = out.filter(col("input_text").contains("data") ||
      col("targets_text").contains("data"))
    assert(leaked.isEmpty)
    // and the whole chain is ONE declarative plan over the scan — the
    // interpreter contract
    assert(out.queryExecution.analyzed.collectLeaves().size == 1)
  }

  test("training-prep processors: repetition_gate → quantile_bucket → shard_shuffle → block_spans") {
    val spec =
      """{"pipeline": [
        | {"run": "load", "params": {"table": "documents", "name": "d"}},
        | {"run": "repetition_gate", "params": {"resource": "d", "field": "text"}},
        | {"run": "filter_rows", "params": {"resource": "d",
        |   "equals": [{"keep_repetition": 1}]}},
        | {"run": "quantile_bucket", "params": {"resource": "d",
        |   "value": "n_chars", "tie": "doc_id", "buckets": 4}},
        | {"run": "shard_shuffle", "params": {"resource": "d",
        |   "key": "doc_id", "shards": 4, "seed": "s1"}},
        | {"run": "block_spans", "params": {"resource": "d",
        |   "id": "doc_id", "weight": "n_chars", "block_size": 512}}
        |]}""".stripMargin
    val out = SpecInterpreter.run(spark, sf, spec)("d").df
    assert(out.columns.toSet ==
      Set("doc_id", "block_id", "doc_off", "block_off", "span_len"))
    // survivors only: every doc that reaches the blocker passed the gate
    val total = out.agg(sum("span_len")).collect()(0).getLong(0)
    assert(total > 0)
    // blocks tile: all but the last hold exactly 512 chars
    val lastBlock = (total - 1) / 512L
    val bad = out.groupBy("block_id").agg(sum("span_len").as("s"))
      .filter(col("block_id") < lastBlock && col("s") =!= 512L).count()
    assert(bad == 0)
  }

  test("golden_record and densify processors run from a spec") {
    val spec =
      """{"pipeline": [
        | {"run": "load", "params": {"table": "customer", "name": "c"}},
        | {"run": "add_computed_field", "params": {"resource": "c",
        |   "operation": "expr", "target": "cluster_id",
        |   "with": "c_custkey div 4"}},
        | {"run": "add_computed_field", "params": {"resource": "c",
        |   "operation": "expr", "target": "ver", "with": "c_custkey % 11"}},
        | {"run": "golden_record", "params": {"resource": "c",
        |   "cluster": "cluster_id", "id": "c_custkey",
        |   "precedence": ["ver"], "fields": ["c_name", "c_mktsegment"]}}
        |]}""".stripMargin
    val out = SpecInterpreter.run(spark, sf, spec)("c").df
    assert(out.columns.toSet == Set("cluster_id", "n_members",
      "c_name", "c_name_src", "c_mktsegment", "c_mktsegment_src"))
    assert(out.filter(col("c_name").isNull).isEmpty)

    val spec2 =
      """{"pipeline": [
        | {"run": "load", "params": {"table": "documents", "name": "d"}},
        | {"run": "add_computed_field", "params": {"resource": "d",
        |   "operation": "expr", "target": "bucket",
        |   "with": "CAST(n_chars AS BIGINT) div 200"}},
        | {"run": "densify", "params": {"resource": "d",
        |   "keys": ["lang"], "bucket": "bucket", "fills": {"doc_id": -1}}}
        |]}""".stripMargin
    val out2 = SpecInterpreter.run(spark, sf, spec2)("d").df
    // every (lang, bucket) in each lang's range exists; fills applied
    assert(out2.filter(col("doc_id") === -1).count() >= 0)
    val perLang = out2.groupBy("lang")
      .agg((max("bucket") - min("bucket") + 1).as("span"),
        countDistinct("bucket").as("nb"))
      .filter(col("span") =!= col("nb"))
    assert(perLang.isEmpty)
  }

  test("row_number with partition_by numbers per key (the scale path)") {
    val spec =
      """{"pipeline": [
        | {"run": "load", "params": {"table": "nation", "name": "n"}},
        | {"run": "row_number", "params": {"resource": "n", "target": "rn",
        |   "partition_by": ["n_regionkey"]}}
        |]}""".stripMargin
    val out = SpecInterpreter.run(spark, sf, spec)("n").df
    val perRegion = out.groupBy("n_regionkey")
      .agg(max("rn").as("mx"), count(lit(1)).as("n"))
      .collect()
    assert(perRegion.nonEmpty)
    perRegion.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"rn not dense within region: $r"))
  }

  test("set_constant and select_fields; unknown processor rejects") {
    val spec =
      """{"pipeline": [
        | {"run": "load", "params": {"table": "region", "name": "r"}},
        | {"run": "set_constant", "params": {"resource": "r",
        |   "target": "language", "value": "heb,eng"}},
        | {"run": "select_fields", "params": {"resource": "r",
        |   "fields": ["r_name", "language"]}}
        |]}""".stripMargin
    val out = SpecInterpreter.run(spark, sf, spec)("r").df
    assert(out.columns.toSeq == Seq("r_name", "language"))
    assert(out.select("language").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("heb,eng"))
    val bad = """{"pipeline": [{"run": "no_such_processor", "params": {}}]}"""
    val e = intercept[RuntimeException](SpecInterpreter.run(spark, sf, bad))
    assert(e.getMessage.contains("no_such_processor"))
  }
}
