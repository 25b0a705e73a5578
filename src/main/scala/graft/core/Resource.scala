package graft.core

import org.apache.spark.sql.DataFrame

/** A named table flowing through a pipeline — the Spark analogue of a
  * Frictionless datapackage *resource* (reference: dataflows' package model,
  * see /root/reference .. flows carry (descriptor, row streams); e.g.
  * judges.py:128-152 carries three named resources through one Flow).
  *
  * The DataFrame carries the schema (StructType + per-field Metadata for the
  * reference's `es:*` annotation keys); Resource adds the descriptor-level
  * bits Spark has no slot for: resource name, primary key, output path and
  * free-form annotations.
  */
final case class Resource(
    df: DataFrame,
    name: String,
    primaryKey: Seq[String] = Nil,
    path: Option[String] = None,
    annotations: Map[String, String] = Map.empty) {

  def withDf(f: DataFrame => DataFrame): Resource = copy(df = f(df))
}

object Resource {
  def apply(name: String, df: DataFrame): Resource = Resource(df, name)
}
