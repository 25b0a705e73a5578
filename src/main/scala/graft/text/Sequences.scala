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
    withStreamOffset(df, idCol, weightCol)
      .withColumn("seq_ix",
        expr(s"__before div ${budget}L").cast(LongType))
      .drop("__before")
  }

  /** Append `__before` — the exact global token offset of each row in
    * the stable [[Scrub.hashDraw]] stream order — WITHOUT a global
    * window (the two-tier bucket-histogram scheme [[packByBudget]]
    * documents; this is its factored core).
    */
  private def withStreamOffset(df: DataFrame, idCol: String,
      weightCol: String): DataFrame = {
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
      .drop("__draw", "__bkt", "__base")
  }

  /** GPT-style token-stream BLOCKING — the other half of the packing
    * story: [[packByBudget]] assigns each whole row to the bin it starts
    * in; real pretraining loaders instead concatenate the corpus into
    * one token stream and cut it at fixed `blockSize` boundaries, so a
    * document that straddles a boundary is SPLIT mid-doc. Emits one row
    * per (doc, block) span:
    *
    *   block_id  — which block the span lands in
    *   doc_off   — the span's first token within the document
    *   block_off — the span's first token within the block
    *   span_len  — tokens in the span (Σ per doc = its weight; Σ per
    *               block = blockSize except the final block)
    *
    * The stream offset is the same two-tier prefix sum (no global
    * window); the explode fans each row out to its ≤ 1 + w/blockSize
    * covered blocks — bounded per row, so task sizes stay flat at any
    * corpus size. Zero-weight rows contribute no spans.
    */
  def blockSpans(df: DataFrame, idCol: String, weightCol: String,
      blockSize: Long): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    val w = col(weightCol).cast(LongType)
    withStreamOffset(df, idCol, weightCol)
      .filter(w > 0)
      .select(col(idCol), w.as("__w"), col("__before"),
        explode(sequence(
          expr(s"__before div ${blockSize}L"),
          expr(s"(__before + ${weightCol} - 1) div ${blockSize}L")))
          .as("block_id"))
      .withColumn("__bstart", col("block_id") * lit(blockSize))
      .withColumn("__s", greatest(col("__before"), col("__bstart")))
      .select(col(idCol), col("block_id").cast(LongType).as("block_id"),
        (col("__s") - col("__before")).as("doc_off"),
        (col("__s") - col("__bstart")).as("block_off"),
        (least(col("__before") + col("__w"),
          col("__bstart") + lit(blockSize)) - col("__s")).as("span_len"))
  }
}
