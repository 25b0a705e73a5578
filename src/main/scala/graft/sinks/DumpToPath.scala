package graft.sinks

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.core.{Flow, Resource}

/** K1 `dump_to_path` — write each resource as CSV plus a
  * `datapackage.json` descriptor mirroring the Frictionless layout the
  * reference emits (reference: datasets.py:465, zotero.py:116,
  * judges.py:150). Field `es:*` annotations round-trip through
  * StructField.Metadata.
  */
object DumpToPath {

  private def frictionlessType(dt: DataType): String = dt match {
    case StringType                       => "string"
    case _: IntegerType | LongType        => "integer"
    case _: DecimalType | DoubleType | FloatType => "number"
    case BooleanType                      => "boolean"
    case DateType                         => "date"
    case TimestampType                    => "datetime"
    case _: ArrayType                     => "array"
    case _: StructType | _: MapType       => "object"
    case _                                => "any"
  }

  private def fieldJson(f: StructField): String = {
    val extras = if (f.metadata == Metadata.empty) "" else {
      val m = f.metadata.json
      if (m == "{}") "" else "," + m.stripPrefix("{").stripSuffix("}")
    }
    s"""{"name":${quote(f.name)},"type":"${frictionlessType(f.dataType)}"$extras}"""
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  def resourceDescriptor(r: Resource): String = {
    val fields = r.df.schema.fields.map(fieldJson).mkString("[", ",", "]")
    val pk =
      if (r.primaryKey.isEmpty) ""
      else s""","primaryKey":${r.primaryKey.map(quote).mkString("[", ",", "]")}"""
    s"""{"name":${quote(r.name)},"path":${quote(r.path.getOrElse(r.name + ".csv"))},""" +
      s""""profile":"tabular-data-resource","schema":{"fields":$fields$pk}}"""
  }

  /** Write the whole package: one CSV directory per resource + a combined
    * datapackage.json at the root.
    */
  def dump(ctx: Flow.Ctx, outDir: String, packageName: String = "graft"): Unit = {
    Files.createDirectories(Paths.get(outDir))
    ctx.values.foreach { r =>
      flatForCsv(r.df).coalesce(1).write.mode("overwrite")
        .option("header", true)
        .csv(s"$outDir/${r.name}")
    }
    val resources = ctx.values.map(resourceDescriptor).mkString("[", ",", "]")
    val dp = s"""{"name":${quote(packageName)},"resources":$resources}"""
    Files.write(Paths.get(s"$outDir/datapackage.json"),
      dp.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
  }

  /** CSV can't hold arrays/structs — serialize them to JSON strings the
    * way the reference's CSV dumps render complex cells.
    */
  private def flatForCsv(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | _: StructType | _: MapType => to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }
}
