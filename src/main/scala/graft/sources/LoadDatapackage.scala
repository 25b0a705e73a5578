package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.core.{Flow, Resource}

/** S1, descriptor path: load a Frictionless `datapackage.json` (the
  * format DumpToPath writes and the reference's `DF.load(url)` consumes —
  * reference: obsolete/join_publications.py:10-11 loads a datapackage by
  * URL) back into a Flow context: one Resource per descriptor entry, CSV
  * read with the EXPLICIT StructType from the declared Table Schema (no
  * re-inference — the descriptor is the contract), `es:*` field
  * annotations restored into StructField.Metadata, primaryKey restored
  * onto the Resource.
  *
  * Type mapping is the survey's (§1): `integer`→Long, `number`→
  * Decimal(38,10) (the reference compares exact Decimals), `array`/
  * `object`→String holding the JSON the CSV cell carries (callers
  * `from_json` with their element schema when they need structure).
  */
object LoadDatapackage {

  private val FrictionlessToSpark: Map[String, DataType] = Map(
    "string" -> StringType,
    "integer" -> LongType,
    "number" -> DecimalType(38, 10),
    "boolean" -> BooleanType,
    "date" -> DateType,
    "datetime" -> TimestampType,
    "array" -> StringType,
    "object" -> StringType,
    "any" -> StringType)

  private def fieldOf(node: JsonNode): StructField = {
    val name = node.get("name").asText()
    val tpe = Option(node.get("type")).map(_.asText()).getOrElse("any")
    val dataType = FrictionlessToSpark.getOrElse(tpe, StringType)
    // every extra key (es:keyword, es:boost, …) → field metadata
    val mb = new MetadataBuilder()
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey != "name" && e.getKey != "type") {
        val v = e.getValue
        if (v.isBoolean) mb.putBoolean(e.getKey, v.asBoolean())
        else if (v.isIntegralNumber) mb.putLong(e.getKey, v.asLong())
        else if (v.isFloatingPointNumber) mb.putDouble(e.getKey, v.asDouble())
        else mb.putString(e.getKey, v.asText())
      }
    }
    StructField(name, dataType, nullable = true, mb.build())
  }

  def load(spark: SparkSession, dir: String): Flow.Ctx = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(new java.io.File(s"$dir/datapackage.json"))
    val resources = root.get("resources").elements()
    var ctx = Flow.empty
    while (resources.hasNext) {
      val r = resources.next()
      val name = r.get("name").asText()
      val schemaNode = r.get("schema")
      val fieldsIt = schemaNode.get("fields").elements()
      val fields = scala.collection.mutable.ArrayBuffer.empty[StructField]
      while (fieldsIt.hasNext) fields += fieldOf(fieldsIt.next())
      val schema = StructType(fields.toSeq)
      val pk = Option(schemaNode.get("primaryKey")).map { pkNode =>
        val it = pkNode.elements()
        val keys = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) keys += it.next().asText()
        keys.toSeq
      }.getOrElse(Nil)
      val path = Option(r.get("path")).map(_.asText())
      // DumpToPath lays each resource out as a CSV directory named after it
      val df = spark.read
        .option("header", true)
        .schema(schema)
        .csv(s"$dir/$name")
      ctx = ctx + (name -> Resource(df, name, pk, path))
    }
    ctx
  }
}
