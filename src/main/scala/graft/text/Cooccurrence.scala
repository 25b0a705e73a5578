package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Token co-occurrence statistics — the corpus pass behind PMI
  * association mining and word-embedding prep (skip-gram pair
  * extraction): count unordered token pairs appearing within `window`
  * positions of each other.
  *
  * Scale shape: pair GENERATION is a narrow per-row array expression
  * (no self-join of an exploded position table — that formulation
  * shuffles the corpus twice and explodes the join state); the only
  * corpus-wide exchanges are the two counting aggregations (pairs,
  * unigrams), both map-side combined. Unigram counts ride back
  * broadcast.
  *
  * PMI stays EXACT-integer (the ln-free trick): pmi > 0 ⟺
  * c(a,b)·N > c(a)·c(b), so the output carries the raw integer
  * counts and the cross-multiplied positivity flag — no transcendental
  * drift between engines.
  */
object Cooccurrence {

  /** Unordered within-`window` pairs of a token array, canonicalized
    * (least, greatest) — one narrow expression producing
    * array<struct<w1,w2>>.
    */
  def pairArray(tokens: Column, window: Int): Column = {
    require(window >= 1, "window must be >= 1")
    // idx runs to size (not size-1): Spark's sequence DESCENDS when
    // stop < start, so `sequence(1, size-1)` on a 1-token doc would
    // yield [1,0] and evaluate element_at(tokens, 0). With stop = size
    // the tail index just produces an empty slice, and on empty docs
    // the descending [1,0] only ever slices an empty array — the inner
    // lambda (where element_at lives) never runs.
    val idx = sequence(lit(1), size(tokens))
    flatten(transform(idx, i =>
      transform(slice(tokens, i + 1, lit(window)),
        x => struct(
          least(element_at(tokens, i), x).as("w1"),
          greatest(element_at(tokens, i), x).as("w2")))))
  }

  /** Per-pair counts with unigram counts and the exact PMI positivity
    * flag. Output: (w1, w2, c_pair, c1, c2, n_tokens, pmi_pos).
    */
  def pmiStats(df: DataFrame, textCol: String, window: Int): DataFrame = {
    val toks = df.select(Decontaminate.wordTokens(col(textCol)).as("__w"))
    val pairs = toks
      .select(explode(pairArray(col("__w"), window)).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c_pair"))
    val unigrams = toks
      .select(explode(col("__w")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val n = unigrams.agg(coalesce(sum("c"), lit(0L)).as("n_tokens"))
    pairs
      .join(broadcast(unigrams.select(col("tok").as("w1"), col("c").as("c1"))), Seq("w1"))
      .join(broadcast(unigrams.select(col("tok").as("w2"), col("c").as("c2"))), Seq("w2"))
      .crossJoin(broadcast(n))
      .withColumn("pmi_pos",
        (col("c_pair") * col("n_tokens") > col("c1") * col("c2")).cast(IntegerType))
      .select("w1", "w2", "c_pair", "c1", "c2", "n_tokens", "pmi_pos")
  }
}
