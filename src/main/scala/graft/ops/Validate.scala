package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K10 `validate()` + the reference's runtime invariant checks — its de
  * facto test strategy (SURVEY.md §5): schema validation that fails the
  * run (datasets.py:348,451), hard asserts on domain invariants
  * (datasets.py:141-143 units whitelist), and soft anomaly counters that
  * only warn (datasets.py:150-164).
  *
  * Implemented as declarative expressions: a hard check is a
  * `raise_error` branch inside the plan (fails the first violating task —
  * no separate pass over the data); a soft check is a counting aggregate
  * the caller can log.
  */
object Validate {

  /** Hard assert: every row must satisfy `cond`, else fail the job with a
    * message including the offending value.
    */
  def assertRows(df: DataFrame, cond: Column, message: String): DataFrame = {
    val guard = when(!coalesce(cond, lit(false)),
      raise_error(concat(lit(s"validate: $message; row="),
        to_json(struct(df.columns.map(col): _*))))).otherwise(lit(true))
    df.withColumn("__valid", guard).drop("__valid")
  }

  /** P9 units whitelist + rescale (reference: datasets.py:140-147): assert
    * `unitsCol` ∈ whitelist; where units == `rescaleFrom`, multiply value
    * ×100 and rename to `rescaleTo`.
    */
  def validateUnits(
      df: DataFrame,
      unitsCol: String,
      valueCol: String,
      whitelist: Seq[String],
      rescaleFrom: String,
      rescaleTo: String): DataFrame = {
    val checked = assertRows(df,
      col(unitsCol).isNull || col(unitsCol).isin(whitelist: _*),
      s"unexpected units in $unitsCol")
    checked
      .withColumn(valueCol,
        when(col(unitsCol) === rescaleFrom, col(valueCol) * 100).otherwise(col(valueCol)))
      .withColumn(unitsCol,
        when(col(unitsCol) === rescaleFrom, lit(rescaleTo)).otherwise(col(unitsCol)))
  }

  /** Soft check: count rows violating `cond` (one aggregate, cheap); caller
    * decides to warn. Mirrors the reference's printed anomaly counters.
    */
  def countViolations(df: DataFrame, cond: Column): Long =
    df.filter(!coalesce(cond, lit(false))).count()

  /** Referential-integrity audit: child rows whose `childKey` has no
    * match in `parent`'s `parentKey` (FK orphans), grouped to (key,
    * cnt). A LEFT ANTI equi-join — the parent's key column alone
    * crosses the wire (broadcast when it fits, shuffle otherwise),
    * never parent payloads. NULL child keys SURFACE as orphans (an
    * anti-join keeps the never-matching null rows) — the opposite of
    * SQL `NOT IN`, which silently drops them; pre-filter nulls to a
    * separate bucket if the distinction matters.
    */
  def fkOrphans(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .groupBy(childKey).agg(count(lit(1)).as("cnt"))

  /** Key-uniqueness audit: composite keys appearing more than once,
    * with their multiplicities — one map-side-combined counting
    * aggregate.
    */
  def dupKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Schema conformance: every listed column must try_cast cleanly to its
    * target type; returns per-column violation counts in one pass.
    */
  def castability(df: DataFrame, expect: Map[String, org.apache.spark.sql.types.DataType]): Map[String, Long] = {
    val aggs = expect.toSeq.map { case (c, t) =>
      sum(when(col(c).isNotNull && col(c).try_cast(t).isNull, 1L).otherwise(0L)).as(c)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    expect.keys.toSeq.map(c => c -> row.getAs[Long](c)).toMap
  }
}
