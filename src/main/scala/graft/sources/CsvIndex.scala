package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Load, Ordering => Ord}

/** S7 authenticated CSV-index fan-out (reference:
  * obsolete/join_publications.py:26-36): read an index CSV, then load each
  * referenced records file, synthesizing `migdar_id = "<search_id>-<rownum>"`
  * from the per-file row number.
  */
object CsvIndex {

  /** `index` must have columns (search_id, path). Each referenced CSV is
    * loaded all-strings; per-file row numbers come from the stamped load
    * order (file order), exactly the reference's enumerate.
    */
  def fanOut(spark: SparkSession, index: Seq[(String, String)]): DataFrame = {
    val parts = index.map { case (searchId, path) =>
      Load.csv(spark, path)
        .withColumn("search_id", lit(searchId))
    }
    val uni = parts.reduce(_.unionByName(_, allowMissingColumns = true))
    val w = Window.partitionBy(col("search_id")).orderBy(col(Ord.ORD))
    uni.withColumn("migdar_id",
      format_string("%s-%d", col("search_id"), row_number().over(w)))
  }
}
