package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordering discipline (SURVEY.md §7 hard part 1).
  *
  * The reference streams rows in file order and three behaviors depend on
  * it: forward-fill (datasets.py:303-309), order_index assignment
  * (datasets.py:340-341) and first-come dedup suffixing
  * (organisations.py:44-52). Spark DataFrames are unordered, so every
  * loader stamps a stable `__ord` column at the source and all
  * order-sensitive ops key on it explicitly.
  *
  * Scale note: `monotonically_increasing_id` is partition-local + offset —
  * stable within a file scan and computed without any shuffle. Global
  * `row_number` over an unpartitioned window IS a single-task bottleneck;
  * at 100 TB it must only ever run on already-reduced data (the reference's
  * order-sensitive tables are hand-edited sheets, ≤ thousands of rows) —
  * the partitioned variants below are the scale path.
  */
object Ordering {

  val ORD = "__ord"

  /** Stamp arrival order at the source. Monotonic per partition and across
    * partitions in partition-index order → reproduces file order for
    * ordered sources without any shuffle or driver pass.
    */
  def stampOrder(df: DataFrame): DataFrame =
    df.withColumn(ORD, monotonically_increasing_id())

  /** W2 global row numbering (reference: datasets.py:340-341 `order_index`).
    * Uses the stamped `__ord` so the window sort is deterministic.
    * Single-partition window — only for already-small data.
    */
  def orderIndex(df: DataFrame, out: String = "order_index", ordCol: String = ORD): DataFrame =
    df.withColumn(out, row_number().over(Window.orderBy(col(ordCol))).cast("long"))

  /** W3 per-key occurrence numbering — the scale-safe form: partitions by
    * key so the shuffle distributes; used by dedup suffixing.
    */
  def occurrenceIndex(df: DataFrame, key: Seq[String], out: String, ordCol: String = ORD): DataFrame =
    df.withColumn(out,
      row_number().over(Window.partitionBy(key.map(col): _*).orderBy(col(ordCol))))

  /** EXACT global rank WITHOUT a global window — the scale-safe
    * alternative to [[orderIndex]] for corpus tables, for measures with
    * a bounded value domain (token counts, scores, sizes): rank over
    * (value, tie) = rows-with-smaller-value + row_number within the
    * value. The value histogram (one map-side-combined aggregation,
    * ≤ |distinct values| tiny rows) is prefix-summed ALONE and
    * broadcast back; the exact tie-break window partitions BY VALUE —
    * the same two-tier scheme as `Sequences.packByBudget`, keyed on the
    * value itself so rank is order-exact, not just stable. Parallelism
    * is the distinct-value count: a single massively-repeated value
    * funnels its ties through one task — acceptable for integer
    * measures whose per-value populations are corpus fractions, not the
    * corpus (else bucket the tie space first).
    */
  def exactRank(df: DataFrame, valueCol: String, tieCol: String,
      out: String = "rank"): DataFrame = {
    val base = df.groupBy(col(valueCol)).agg(count(lit(1)).as("__c"))
      .withColumn("__base",
        coalesce(sum("__c").over(Window.orderBy(col(valueCol))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(valueCol), col("__base"))
    val w = Window.partitionBy(col(valueCol)).orderBy(col(tieCol))
    df.join(broadcast(base), Seq(valueCol))
      .withColumn(out, (col("__base") + row_number().over(w)).cast("long"))
      .drop("__base")
  }

  /** INCREMENTAL maintenance of [[exactRank]] — the "maintained sorted
    * index, delta-merged" SCALING.md §12 promised for sorted-neighborhood
    * blocking (round-12 verdict #4): given the previous generation's
    * ranked relation and its value histogram (both persisted artifacts),
    * rank history ∪ delta WITHOUT re-ranking history — no corpus-wide
    * shuffle-and-sort ever happens.
    *
    * [[exactRank]]'s rank is the 1-based position of (value, tie) in
    * lexicographic order, so after an insert-only delta:
    *
    *   rank'(h) = rank(h) + #{d ∈ delta : (d.value, d.tie) < (h.value, h.tie)}
    *   rank'(d) = rankΔ(d) + #{h ∈ hist : (h.value, h.tie) < (d.value, d.tie)}
    *
    * Each cross-count splits into a strictly-below-value term (one
    * prefix-sum window over the DISTINCT-KEY relation — the same
    * |distinct values| pass [[exactRank]]'s histogram already pays,
    * never the corpus) and a same-value smaller-tie term (nonzero only
    * for value collisions between the generations — computed with the
    * DELTA side broadcast, so history is only ever scanned map-side).
    * History pays: one narrow artifact scan per term, zero shuffles,
    * zero sorts. Delta pays one [[exactRank]] over itself.
    *
    * Contracts: `tieCol` is unique across history ∪ delta (doc ids);
    * `histRanked` carries (tieCol, valueCol, out) from the previous
    * generation; `histHist` carries (valueCol, c) — both exactly what a
    * generation build persists. Output columns: (tieCol, valueCol, out),
    * bit-equal to `exactRank(hist ∪ delta)` (pinned by
    * ExactRankMergeSpec, including that history ranks are CARRIED, not
    * recomputed).
    */
  def exactRankMerge(histRanked: DataFrame, histHist: DataFrame,
      delta: DataFrame, valueCol: String, tieCol: String,
      out: String = "rank"): DataFrame = {
    val dKeyed = delta.select(col(valueCol), col(tieCol))
    val dHist = dKeyed.groupBy(col(valueCol)).agg(count(lit(1)).as("__dc"))
    // strictly-below-value cumulatives for BOTH sides in one window over
    // the merged distinct-key relation (rows = |hist keys ∪ delta keys|)
    val w = Window.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val allKeys = histHist.select(col(valueCol), col("c").as("__hc"))
      .join(dHist, Seq(valueCol), "full_outer")
      .na.fill(0L, Seq("__hc", "__dc"))
      .withColumn("__dBelow", coalesce(sum("__dc").over(w), lit(0L)))
      .withColumn("__hBelow", coalesce(sum("__hc").over(w), lit(0L)))
      .select(col(valueCol), col("__dBelow"), col("__hBelow"))
    // same-value collisions: delta broadcast against the history scan —
    // group sizes are per-value populations, never the corpus. ONE
    // shared equi-value join feeds both correction aggregates (round
    // 14): the two branches used to broadcast differently-projected
    // copies of the delta, defeating exchange reuse
    val eqJoin = histRanked.select(col(valueCol), col(tieCol).as("__htie"))
      .join(broadcast(dKeyed.select(col(valueCol),
        col(tieCol).as("__dtie"))), Seq(valueCol))
    val dEq = eqJoin.filter(col("__dtie") < col("__htie"))
      .groupBy(col("__htie")).agg(count(lit(1)).as("__deq"))
      .withColumnRenamed("__htie", tieCol)
    val hEq = eqJoin.filter(col("__htie") < col("__dtie"))
      .groupBy(col("__dtie")).agg(count(lit(1)).as("__heq"))
      .withColumnRenamed("__dtie", tieCol)
    val histCorr = histRanked
      .join(broadcast(allKeys.select(col(valueCol), col("__dBelow"))),
        Seq(valueCol))
      .join(broadcast(dEq), Seq(tieCol), "left")
      .withColumn(out,
        col(out) + col("__dBelow") + coalesce(col("__deq"), lit(0L)))
    val deltaCorr = exactRank(dKeyed, valueCol, tieCol, out)
      .join(broadcast(allKeys.select(col(valueCol), col("__hBelow"))),
        Seq(valueCol))
      .join(broadcast(hEq), Seq(tieCol), "left")
      .withColumn(out,
        col(out) + col("__hBelow") + coalesce(col("__heq"), lit(0L)))
    val cols = Seq(col(tieCol), col(valueCol), col(out))
    histCorr.select(cols: _*).unionByName(deltaCorr.select(cols: _*))
  }

  /** Exact equal-population quantile bucketing on top of [[exactRank]]:
    * bucket = ⌊buckets · (rank−1) / total⌋ — populations differ by at
    * most one, boundaries are exact integers (not [[graft.functions
    * .QuantileSketch]] approximations), and `total` rides the same
    * broadcast histogram, so the corpus still shuffles exactly once (by
    * value). The curriculum-ordering primitive: bucket by difficulty,
    * then order within buckets however the loader wants.
    */
  def quantileBucket(df: DataFrame, valueCol: String, tieCol: String,
      buckets: Int, out: String = "bucket",
      rankOut: String = "rank"): DataFrame = {
    require(buckets > 0, s"need buckets > 0, got $buckets")
    val hist = df.groupBy(col(valueCol)).agg(count(lit(1)).as("__c"))
    val based = hist
      .withColumn("__base",
        coalesce(sum("__c").over(Window.orderBy(col(valueCol))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__total",
        sum("__c").over(Window.orderBy(col(valueCol))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col(valueCol), col("__base"), col("__total"))
    val w = Window.partitionBy(col(valueCol)).orderBy(col(tieCol))
    df.join(broadcast(based), Seq(valueCol))
      .withColumn(rankOut, (col("__base") + row_number().over(w)).cast("long"))
      .withColumn(out,
        expr(s"(${buckets}L * ($rankOut - 1L)) div __total").cast("long"))
      .drop("__base", "__total")
  }

  /** A2 dedup with suffix: repeated `key` values get `.1`, `.2`, … appended
    * in arrival order (reference: organisations.py:44-52 on doc_id).
    */
  def dedupSuffix(df: DataFrame, key: String, ordCol: String = ORD): DataFrame = {
    val occ = "__occ"
    occurrenceIndex(df, Seq(key), occ, ordCol)
      .withColumn(key,
        when(col(occ) > 1, concat(col(key), lit("."), (col(occ) - 1).cast("string")))
          .otherwise(col(key)))
      .drop(occ)
  }

  /** W1 forward-fill the previous non-null value in arrival order
    * (reference: datasets.py:303-309 fills chart_title). `partitionBy`
    * optional: reference scale is one partition; at scale fill within a
    * natural key (e.g. per sheet).
    */
  def forwardFill(
      df: DataFrame,
      field: String,
      ordCol: String = ORD,
      partitionBy: Seq[String] = Nil): DataFrame = {
    val w0 =
      if (partitionBy.isEmpty) Window.orderBy(col(ordCol))
      else Window.partitionBy(partitionBy.map(col): _*).orderBy(col(ordCol))
    val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(field, last(col(field), ignoreNulls = true).over(w))
  }
}
