package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential path mining over an event stream: which k-step event
  * sequences (paths) do users actually walk inside a session? The
  * clickstream staple behind funnel discovery — where q162's transition
  * matrix sees one step of the Markov chain, this sees the chain's
  * actual frequent walks.
  *
  * Construction is pure window algebra on ONE user-keyed exchange:
  * sessionize (gap rule → boundary flag → running sum) and form the
  * k-grams with `lead` over the SAME user window, guarding that every
  * lead landed in the same session (lead(session_id) == session_id)
  * instead of re-windowing by (user, session) — partitioning by the
  * session subkey would force a second exchange that the equality guard
  * makes unnecessary. The path count is then one map-side-combined
  * aggregation; per-path user support is an exact distinct on the same
  * shuffle key.
  *
  * Scale: the window stack is a single hash-exchange on user_id + one
  * sort — user timelines are short and the heavy relation (one row per
  * k-gram) collapses immediately into the (path) aggregate, whose
  * cardinality is |event_type|^k (tiny). Skewed power users cost one
  * long sorted run, not a shuffle storm.
  */
object PathMining {

  /** Frequent within-session trigram paths.
    *
    * @param ev       events with `user_id`, `event_type`, `ts_ns`
    *                 (long nanos) and `event_id` (sort tiebreak)
    * @param gapNs    session gap threshold in nanoseconds
    * @param minCount paths seen fewer times are dropped
    * @return (path "a>b>c", cnt, n_users) ordered by cnt desc, path
    */
  def sessionTrigrams(ev: DataFrame, gapNs: Long = 1800L * 1000000000L,
      minCount: Long = 2L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ns"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grams = ev
      .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"))
      .withColumn("__brk",
        when(lag("ts_ns", 1).over(w).isNull ||
          col("ts_ns") - lag("ts_ns", 1).over(w) > gapNs, 1L).otherwise(0L))
      .withColumn("__sess", sum("__brk").over(wRun))
      .withColumn("__e1", lead("event_type", 1).over(w))
      .withColumn("__s1", lead("__sess", 1).over(w))
      .withColumn("__e2", lead("event_type", 2).over(w))
      .withColumn("__s2", lead("__sess", 2).over(w))
      .filter(col("__s1") === col("__sess") && col("__s2") === col("__sess"))
      .select(col("user_id"),
        concat_ws(">", col("event_type"), col("__e1"), col("__e2")).as("path"))
    grams.groupBy("path")
      .agg(count(lit(1)).as("cnt"), countDistinct("user_id").as("n_users"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("path"))
  }
}
