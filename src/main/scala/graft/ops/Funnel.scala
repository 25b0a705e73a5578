package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — how many users reach step k of a defined
  * step sequence IN ORDER (a later `view` never rescues an earlier
  * `purchase`)? The product-analytics staple behind q53's single-edge
  * funnel join, generalized to an arbitrary step list.
  *
  * The in-order constraint is a chain of running maxima on ONE
  * user-keyed window: r_k(t) = max over rows ≤ t of (is_step_k AND
  * r_{k−1}), so a step-k event only counts once every earlier step has
  * already fired for that user. Per-user reach flags then collapse in
  * one map-side-combined aggregation, and the k-row funnel relation
  * gets its conversion ratios (2^30 fixed point, floored) from `lag`
  * over the trivially small result.
  *
  * Scale: one hash exchange on user_id + one sort carries ALL k
  * running maxima (they share the window spec); the corpus collapses
  * to one row per user before anything else happens; the step relation
  * is |steps| rows. No self-joins, no per-step passes over the events.
  */
object Funnel {

  /** @param ev    events with `user_id`, `event_type`, `ts_ns`, `event_id`
    * @param steps ordered step event types (distinct, ≥ 2)
    * @return (step_no, step, n_users, conv_prev_fix, conv_first_fix)
    *         one row per step, 2^30 ratios, ordered by step_no
    */
  def ordered(ev: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2 && steps.distinct == steps,
      s"steps must be >= 2 distinct event types, got $steps")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = steps.zipWithIndex.foldLeft(
      ev.select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"))) {
      case (df, (s, i)) =>
        val hit = if (i == 0) (col("event_type") === s).cast("long")
          else ((col("event_type") === s) && col(s"__r${i - 1}") === 1L).cast("long")
        df.withColumn(s"__r$i", max(hit).over(w))
    }
    val perUser = flagged.groupBy("user_id")
      .agg(steps.indices.map(i => max(col(s"__r$i")).as(s"__u$i")).head,
        steps.indices.map(i => max(col(s"__r$i")).as(s"__u$i")).tail: _*)
    val funnel = perUser.select(
      steps.indices.map(i => sum(col(s"__u$i")).as(s"__n$i")): _*)
    val rows = steps.indices.map { i =>
      struct(lit(i + 1).as("step_no"), lit(steps(i)).as("step"),
        col(s"__n$i").as("n_users"))
    }
    funnel.select(explode(array(rows: _*)).as("s"))
      .select(col("s.step_no"), col("s.step"), col("s.n_users"))
      .withColumn("conv_prev_fix",
        expr(s"(n_users * ${1L << 30}L) div nullif(lag(n_users) over " +
          "(order by step_no), 0)"))
      .withColumn("conv_first_fix",
        expr(s"(n_users * ${1L << 30}L) div nullif(first(n_users) over " +
          "(order by step_no rows between unbounded preceding and current row), 0)"))
      .orderBy("step_no")
  }
}
