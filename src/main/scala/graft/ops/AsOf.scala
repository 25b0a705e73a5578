package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (inclusive) joins, both directions: [[joinBackward]] attaches
  * to each left row the LATEST right row with `right.time <= left.time`
  * per key — the point-in-time lookup every feature/training pipeline
  * needs (last price/state/label before an event); [[joinForward]] the
  * EARLIEST right row with `right.time >= left.time` (next event
  * after).
  *
  * Spark has no as-of join; the (a)-tier composition: tag both sides,
  * UNION, and forward-fill the right-side values with
  * `last(ignoreNulls)` over (key, time, tag). ONE shuffle on the key —
  * never the range-join row explosion of `l JOIN r ON l.t >= r.t` +
  * argmax, which produces O(|matches|) intermediates. Ties at equal
  * time: the right row sorts first (tag 0), so equality is inclusive —
  * the same contract as DuckDB's `ASOF JOIN ... ON l.t >= r.t`, which
  * oracles q72.
  *
  * `right` must be unique per (keys, timeCol) — pre-aggregate it
  * otherwise (which value "the" row carries is ill-defined under dups).
  */
object AsOf {

  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val rightTyped = right.schema
    // left side: carries its own columns, right-value slots start null
    val l = valueCols.foldLeft(left.withColumn("__tag", lit(1))) { (d, c) =>
      d.withColumn(s"__v_$c", lit(null).cast(rightTyped(c).dataType))
    }
    // right side: key + time + values, left-only columns null
    val r0 = right.select(
      (keys :+ timeCol).map(col) ++ valueCols.map(c => col(c).as(s"__v_$c")): _*)
      .withColumn("__tag", lit(0))
    val r = lCols.filterNot(c => keys.contains(c) || c == timeCol)
      .foldLeft(r0) { (d, c) =>
        d.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val shape = lCols.map(col) ++ valueCols.map(c => col(s"__v_$c")) :+ col("__tag")
    val uni = l.select(shape: _*).unionByName(r.select(shape: _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(uni) { (d, c) =>
      d.withColumn(s"__v_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__tag") === 1)
      .select(lCols.map(col) ++ valueCols.map(c => col(s"__v_$c").as(c)): _*)
  }

  /** Forward (inclusive) as-of: attach the EARLIEST right row with
    * `right.time >= left.time`, per key — "next event after" (next
    * maintenance after a reading, next fill after an order). Same
    * ONE-shuffle tagged-union shape as [[joinBackward]], with the
    * window frame flipped to `[current, unbounded following]` and
    * `first(ignoreNulls)`. Ties at equal time: the LEFT row sorts
    * first (tag 0 here), so an equal-time right row is inside the
    * frame — equality is inclusive, mirroring backward's contract.
    */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val rightTyped = right.schema
    val l = valueCols.foldLeft(left.withColumn("__tag", lit(0))) { (d, c) =>
      d.withColumn(s"__v_$c", lit(null).cast(rightTyped(c).dataType))
    }
    val r0 = right.select(
      (keys :+ timeCol).map(col) ++ valueCols.map(c => col(c).as(s"__v_$c")): _*)
      .withColumn("__tag", lit(1))
    val r = lCols.filterNot(c => keys.contains(c) || c == timeCol)
      .foldLeft(r0) { (d, c) =>
        d.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val shape = lCols.map(col) ++ valueCols.map(c => col(s"__v_$c")) :+ col("__tag")
    val uni = l.select(shape: _*).unionByName(r.select(shape: _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("__tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = valueCols.foldLeft(uni) { (d, c) =>
      d.withColumn(s"__v_$c", first(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__tag") === 0)
      .select(lCols.map(col) ++ valueCols.map(c => col(s"__v_$c").as(c)): _*)
  }
}
