package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the delta pass of an incremental ingestion
  * pipeline: given two versions of a keyed table, classify every key as
  * `added` / `removed` / `changed` / `unchanged` by comparing a content
  * hash. This is what decides how much downstream work (re-embed,
  * re-dedup, re-index) a new crawl actually causes; combined with the
  * document sink's revision sweep (q45) and the incremental dedup index
  * probe (q36) it closes the incremental-update loop.
  *
  * Scale shape: each side reduces to (key, 16-byte hash) BEFORE the
  * full-outer join, so the join shuffles hashes, never content; with
  * both snapshots bucketed by key the exchange disappears entirely
  * ([[Bucketing]]).
  */
object SnapshotDiff {

  /** (keys..., status) for every key present in either snapshot.
    * `contentCols` is the column set whose change counts as `changed`
    * (null-safe: the hash treats NULL as empty, like
    * [[RowOps.rowHash]] everywhere else).
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      contentCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && contentCols.nonEmpty, "keys and contentCols required")
    val o = oldDf.select((keys.map(col) :+
      RowOps.rowHash(contentCols.map(col)).as("__oh")): _*)
    val n = newDf.select((keys.map(col) :+
      RowOps.rowHash(contentCols.map(col)).as("__nh")): _*)
    o.join(n, keys, "full_outer")
      .withColumn("status",
        when(col("__oh").isNull, lit("added"))
          .when(col("__nh").isNull, lit("removed"))
          .when(col("__oh") =!= col("__nh"), lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("__oh", "__nh")
  }
}
