package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.MetadataBuilder

/** The reference's `es:*` schema annotation vocabulary (SURVEY §1):
  * set_type(..., **{'es:keyword': True}) etc. attach search-mapping hints
  * to fields; DocumentSink.mappingJson consumes them. Spark's per-field
  * `Metadata` is the exact analogue — these helpers attach the keys
  * without touching data.
  */
object EsMeta {

  private def withMeta(df: DataFrame, field: String, kv: (String, Any)*): DataFrame = {
    if (!df.columns.contains(field)) return df
    val existing = df.schema(field).metadata
    val b = new MetadataBuilder().withMetadata(existing)
    kv.foreach {
      case (k, v: Boolean) => b.putBoolean(k, v)
      case (k, v: Double) => b.putDouble(k, v)
      case (k, v: Long) => b.putLong(k, v)
      case (k, v: String) => b.putString(k, v)
      case (k, v) => b.putString(k, String.valueOf(v))
    }
    df.withColumn(field, col(field).as(field, b.build()))
  }

  def keyword(df: DataFrame, fields: String*): DataFrame =
    fields.foldLeft(df)((d, f) => withMeta(d, f, "es:keyword" -> true))

  def title(df: DataFrame, fields: String*): DataFrame =
    fields.foldLeft(df)((d, f) => withMeta(d, f, "es:title" -> true))

  def hebrew(df: DataFrame, fields: String*): DataFrame =
    fields.foldLeft(df)((d, f) => withMeta(d, f, "es:hebrew" -> true))

  def boost(df: DataFrame, fields: String*): DataFrame =
    fields.foldLeft(df)((d, f) => withMeta(d, f, "es:boost" -> 2.0))

  def noIndex(df: DataFrame, fields: String*): DataFrame =
    fields.foldLeft(df)((d, f) => withMeta(d, f, "es:index" -> false))

  def itemType(df: DataFrame, field: String, t: String): DataFrame =
    withMeta(df, field, "es:itemType" -> t)
}
