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

  /** SCD TYPE-2 history from a change log — the companion to the type-1
    * merge above: a (key, ts, value) stream becomes versioned validity
    * intervals
    *
    *   (key, value, effective_from, effective_to, version, is_current)
    *
    * with consecutive repeats of the same value COMPRESSED into one
    * interval (the warehouse "dimension history" build). Intervals are
    * half-open [from, to); the current row carries `openEnd` (a pinned
    * sentinel rather than NULL so downstream hashing and BETWEEN probes
    * never branch on null).
    *
    * Scale shape: everything is ONE key-partitioned shuffle — the lag
    * that finds change points, the lead that closes intervals, and the
    * version numbering all share the same (key × ts, tie) window, so
    * Spark plans a single Exchange + Sort and three window functions
    * over it. No self-join against the history, no global window.
    */
  def type2History(log: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String,
      openEnd: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val changes = log
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      // first row per key (null prev) is always a change point; a null
      // tracked value is modeled as its own state via null-safe compare
      .filter(!(col("__prev") <=> col(valueCol)))
    val wc = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to",
        coalesce(lead(col(tsCol), 1).over(wc), lit(openEnd)))
      .withColumn("version", row_number().over(wc).cast(LongType))
      .withColumn("is_current",
        (col("effective_to") === openEnd).cast(IntegerType))
      .select(col(keyCol), col(valueCol), col("effective_from"),
        col("effective_to"), col("version"), col("is_current"))
  }
}
