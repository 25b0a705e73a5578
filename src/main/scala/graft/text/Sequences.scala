package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-sequence preparation: the step between a curated corpus and
  * the batches a trainer reads. Fixed-window token chunking (long docs →
  * overlapping context windows) and deterministic token-budget sequence
  * packing (corpus → contiguous fixed-budget sequence bins). Both are
  * exact, engine-mirrorable arithmetic — no RNG, no floats in the
  * decision path.
  */
object Sequences {

  /** Sliding-window chunking: split each document's whitespace tokens
    * into windows of `window` tokens advancing by `stride` tokens
    * (`stride < window` ⇒ overlapping context — the
    * return-overflowing-tokens shape). A doc of `len` tokens yields
    * `1 + ceil(max(0, len - window) / stride)` chunks; a doc shorter
    * than one window yields exactly one chunk covering all of it.
    *
    * Pure builtins — `sequence` + `posexplode` + `slice` + `array_join`
    * — one narrow codegen'd map stage: no shuffle at any scale, and the
    * fan-out is bounded per row (≈ len/stride), so task sizes stay
    * proportional to input splits.
    */
  def chunkTokens(df: DataFrame, textCol: String, idCol: String,
      window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val len = size(toks)
    // integer ceil: 1 + (max(0, len-window) + stride-1) div stride
    val nChunks = lit(1) +
      floor((greatest(len - window, lit(0)) + lit(stride - 1))
        .cast(DoubleType) / lit(stride)).cast(IntegerType)
    df.select(col(idCol), toks.as("__toks"),
        posexplode(sequence(lit(0), nChunks - 1)).as(Seq("chunk_ix", "__junk")))
      .select(col(idCol), col("chunk_ix").cast(LongType).as("chunk_ix"),
        slice(col("__toks"), col("chunk_ix") * stride + 1, lit(window)).as("__c"))
      .select(col(idCol), col("chunk_ix"),
        size(col("__c")).cast(LongType).as("chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** Deterministic sequence PACKING: walk the corpus in the stable
    * [[Scrub.hashDraw]] order and cut it into contiguous bins of
    * `budget` tokens — `seq_ix = floor(tokens-before-this-row / budget)`.
    * Every row is assigned (the row that straddles a boundary belongs to
    * the bin it started in). The hash order is a deterministic global
    * shuffle, so each bin is an unbiased corpus sample — the fixed-token
    * training-sequence layout, reproducible across runs AND engines.
    *
    * The textbook formulation is one global running-sum window — a
    * single task holding the corpus. This never windows the corpus
    * (same two-tier scheme as [[Scrub.takeByBudget]]): the draw space is
    * cut into 2¹⁶ buckets;
    *  1. a map-side-combined aggregation builds the per-bucket weight
    *    histogram (≤ 65 536 tiny rows cross the only full exchange);
    *  2. the histogram alone is prefix-summed to per-bucket base
    *    offsets;
    *  3. the exact running sum runs per bucket (windows partitioned by
    *    bucket — 65 536-way parallel), offset by the broadcast base.
    * Row-identical to the global window.
    */
  def packByBudget(df: DataFrame, idCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val bucketed = df
      .withColumn("__draw", Scrub.hashDraw(col(idCol)))
      .withColumn("__bkt", shiftright(col("__draw"), 16))
    val base = bucketed.groupBy(col("__bkt"))
      .agg(sum(col(weightCol)).as("__w"))
      .withColumn("__base",
        coalesce(sum("__w").over(
          Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bkt"), col("__base"))
    val exact = Window.partitionBy("__bkt")
      .orderBy(col("__draw"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(base), Seq("__bkt"))
      .withColumn("__before",
        col("__base") + coalesce(sum(col(weightCol)).over(exact), lit(0L)))
      .withColumn("seq_ix",
        expr(s"__before div ${budget}L").cast(LongType))
      .drop("__draw", "__bkt", "__base", "__before")
  }
}
