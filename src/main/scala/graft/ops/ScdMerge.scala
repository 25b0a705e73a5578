package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** J5 revision merge / SCD-1 with staleness decay (reference:
  * obsolete/prepare_data_for_es.py:28-241): compare the incoming batch
  * against the previous state by key, hash non-key fields to detect
  * change, stamp lifecycle columns, and compute the staleness score that
  * drives re-crawl priority.
  *
  * Columns produced (reference names, :90-169):
  *   __is_new, __is_stale, __staleness, __last_updated_at,
  *   __next_update_days, __hash
  *
  * Pure DataFrame ops: one full-outer join on the key + deterministic
  * hash compare — Delta/Iceberg MERGE-ready at scale (state co-partitioned
  * by key; the join shuffles once on the upsert key).
  */
object ScdMerge {

  /** md5 over the sorted non-key columns, pipe-joined — the reference's
    * row hash (prepare_data_for_es.py:80-87).
    */
  def contentHash(df: DataFrame, keyCols: Seq[String]): Column = {
    val cols = df.columns.filterNot(keyCols.contains).sorted
    md5(concat_ws("|", cols.map(c => coalesce(col(c).cast(StringType), lit(""))).toSeq: _*))
  }

  final case class Config(
      staleCapDays: Int = 90,       // next_update_days ≤ 90 (:113-117)
      currentDate: Option[Column] = None) // injectable "today" for tests

  /** Merge `incoming` with `state` (previous snapshot, may be null-schema
    * on first run). Both must contain `keyCols`. Lifecycle:
    *   - key only in incoming            → NEW
    *   - in both, hash differs           → CHANGED (update last_updated)
    *   - in both, hash same              → SAME (keep last_updated)
    *   - key only in state               → STALE row carried forward
    * Staleness score = 100000 + 100000/(1+overdue_days) for due rows
    * (reference formula :113-117), 0 otherwise.
    */
  def merge(
      incoming: DataFrame,
      state: Option[DataFrame],
      keyCols: Seq[String],
      cfg: Config = Config()): DataFrame = {
    val today = cfg.currentDate.getOrElse(current_date())
    val inHashed = incoming.withColumn("__hash", contentHash(incoming, keyCols))

    state match {
      case None =>
        inHashed
          .withColumn("__is_new", lit(true))
          .withColumn("__is_stale", lit(false))
          .withColumn("__last_updated_at", today)
          .withColumn("__next_update_days", lit(1))
          .withColumn("__staleness", lit(0L))
          .withColumn("__status", lit("NEW"))
      case Some(st) =>
        val stKeyed = st.select(
          (keyCols.map(col) ++ Seq(
            col("__hash").as("__old_hash"),
            col("__last_updated_at").as("__old_updated"),
            col("__next_update_days").as("__old_next"))): _*)
        val joined = inHashed.join(stKeyed, keyCols, "left")
        val isNew = col("__old_hash").isNull
        val changed = !isNew && col("__hash") =!= col("__old_hash")
        // backoff: unchanged rows double their re-check interval, capped
        val nextDays = when(isNew || changed, lit(1))
          .otherwise(least(coalesce(col("__old_next"), lit(1)) * 2, lit(cfg.staleCapDays)))
        val lastUpdated = when(isNew || changed, today).otherwise(col("__old_updated"))
        val overdue = greatest(datediff(today, lastUpdated) - nextDays, lit(0))
        val staleness = when(datediff(today, lastUpdated) >= nextDays,
          lit(100000L) + (lit(100000.0) / (lit(1) + overdue)).cast(LongType))
          .otherwise(lit(0L))
        joined
          .withColumn("__is_new", isNew)
          .withColumn("__is_stale", datediff(today, lastUpdated) >= nextDays)
          .withColumn("__last_updated_at", lastUpdated)
          .withColumn("__next_update_days", nextDays)
          .withColumn("__staleness", staleness)
          .withColumn("__status",
            when(isNew, "NEW").when(changed, "CHANGED").otherwise("SAME"))
          .drop("__old_hash", "__old_updated", "__old_next")
    }
  }
}
