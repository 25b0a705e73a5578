package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T5/UL2-style span-corruption objective construction — the step that
  * turns a curated corpus into (input, target) denoising pairs: mask
  * contiguous token spans, replace each in the input with an ordered
  * sentinel, and emit the masked content behind the matching sentinels
  * as the target.
  *
  * T5 samples spans from an RNG; at pipeline scale that makes the
  * dataset unreproducible and partitioning-dependent, so this variant
  * derives every mask decision from a stable hash instead: position i
  * of doc d is masked iff
  *
  *   kmv_hash62(d || ':' || i div blockLen)  <  thrFix
  *
  * — fixed-size blocks, each masked independently with probability
  * thrFix/2^62. Mean span length ≈ blockLen (adjacent masked blocks
  * merge into one span/sentinel), masked fraction ≈ the probability,
  * and the SAME doc yields the SAME pair on any run, any partitioning,
  * any engine (the hash replays in SQL — q115's oracle). Changing the
  * "seed" = prefixing the id string.
  *
  * Scale shape: pure narrow map — tokenize, flag, and one O(n) fold
  * per document (builtin `aggregate`, no explode, no window, no
  * shuffle). The inverse law (splice each target span back over its
  * sentinel → the original token stream) is spec-asserted corpus-wide.
  */
object SpanCorruption {

  /** floor(0.15 · 2^62): the default 15% corruption rate as a 62-bit
    * hash threshold.
    */
  val Thr15Pct: Long = 691752902764108185L

  /** (idCol, input_text, targets_text, n_spans, n_masked). */
  def corrupt(df: DataFrame, textCol: String, idCol: String,
      blockLen: Int = 3, thrFix: Long = Thr15Pct): DataFrame = {
    require(blockLen >= 1, "blockLen must be >= 1")
    val toks = Decontaminate.wordTokens(col(textCol))
    // sequence() DESCENDS when stop < start (the KneserNey lesson):
    // guard the token-less doc explicitly. Hash once per BLOCK, then
    // index per position — 1/blockLen the string-building and hashing.
    val nToks = size(col("__toks"))
    val blockFlags = when(nToks > 0, transform(
      sequence(lit(0), floor((nToks - 1).cast("double") / blockLen).cast("int")),
      b => graft.functions.Kmv.hash62(concat(col("__id").cast("string"),
        lit(":"), b.cast("string"))) < lit(thrFix)))
      .otherwise(array().cast("array<boolean>"))
    // expand block flags to positions by repeat+flatten+slice — the
    // blocks array is referenced ONCE, so even if CollapseProject inlines
    // it the hashing stays O(blocks); an element_at-per-position lambda
    // would re-evaluate the inlined array construction per token
    // (quadratic — measured 2.6× slower at sf0.1)
    val flags = when(nToks > 0,
      slice(flatten(transform(col("__blocks"),
        b => array_repeat(b, blockLen))), lit(1), nToks))
      .otherwise(array().cast("array<boolean>"))
    // one linear pass per doc through the codegen'd kernel (a builtin
    // `aggregate` fold with array accumulators expresses the same thing
    // but copies both accumulators every step — O(n²) per document)
    val folded = graft.functions.SpanCorruptExpr.spanCorrupt(
      col("__toks"), col("__flags"))
    df.select(col(idCol).as("__id"), toks.as("__toks"))
      .withColumn("__blocks", blockFlags)
      .withColumn("__flags", flags)
      .withColumn("__st", folded)
      .select(col("__id").as(idCol),
        array_join(col("__st.inp"), " ").as("input_text"),
        array_join(col("__st.tgt"), " ").as("targets_text"),
        col("__st.k").cast("long").as("n_spans"),
        size(filter(col("__flags"), m => m)).cast("long").as("n_masked"))
  }

  /** The inverse: splice each target span back over its sentinel. Used
    * by the spec to assert corrupt() is lossless
    * (uncorrupt ∘ corrupt = identity on the token stream).
    */
  def uncorrupt(inputText: Column, targetsText: Column): Column = {
    // targets parse as: <extra_id_k> tok tok <extra_id_k+1> tok ... —
    // split on sentinels, then substitute in order
    val spans = filter(
      transform(split(targetsText, "<extra_id_[0-9]+>"), s => trim(s)),
      s => s =!= "")
    val inToks = filter(split(inputText, " "), t => t =!= "")
    val replaced = transform(inToks, t =>
      when(t.rlike("^<extra_id_[0-9]+>$"),
        element_at(spans,
          regexp_extract(t, "([0-9]+)", 1).cast("int") + 1))
        .otherwise(t))
    array_join(filter(replaced, s => s =!= ""), " ")
  }
}
