package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kneser–Ney-discounted bigram language model in fixed-point integer
  * arithmetic — the quality-filter ingredient (CCNet-style perplexity
  * gating trains an n-gram LM on a clean corpus and scores candidates)
  * with the float drift designed out.
  *
  * Probabilities are scaled integers (`scale` = probability 1) computed
  * by a FIXED formula with explicit floor divisions, discount d = 3/4:
  *
  *   t1 = (scale · (4·c(v,w) − 3)) div (4·c(v))            (seen mass)
  *   t2 = ((scale · 3 · N1+(v·)) div (4·c(v))) · N1+(·w) div N1+(··)
  *   p_fix(w|v) = t1 + t2
  *
  * t2 is interpolated continuation mass — λ(v)·p_cont(w) with the two
  * divisions floored in a fixed order, so every engine reproduces the
  * identical integer. The staged form also keeps every intermediate
  * below 2⁵⁰ for realistic vocabularies (a single fused numerator
  * scale·3·N1+(v·)·N1+(·w) would overflow int64 at web vocab sizes).
  *
  * Scale shape: one bigram-count shuffle (map-side combined) + two
  * aggregations of the ALREADY-REDUCED bigram relation (by v, by w) +
  * one broadcast scalar — the wordcount family, no corpus re-shuffle.
  */
object KneserNey {

  /** The model's sufficient statistic: (v, w, c_vw) bigram counts of the
    * lowercased whitespace tokenization. Everything else the KN formula
    * needs (c_v, N1+(v·), N1+(·w), N1+(··)) derives from this relation,
    * and counts merge across corpus slices by plain addition — so THIS
    * is the artifact an incremental pipeline persists (see
    * [[mergeCounts]]), never the derived probabilities.
    */
  def bigramCounts(df: DataFrame, textCol: String): DataFrame = {
    val toks = Decontaminate.wordTokens(col(textCol))
    // bind the token array once (HOF lambdas re-evaluate inline exprs
    // per element), guard docs with < 2 tokens (sequence() descends when
    // stop < start)
    val pairs = df
      .select(toks.as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__toks")) - 1),
        i => struct(
          element_at(col("__toks"), i).as("v"),
          element_at(col("__toks"), i + 1).as("w")))).as("bg"))
      .select(col("bg.v"), col("bg.w"))
    pairs.groupBy("v", "w").agg(count(lit(1)).as("c_vw"))
  }

  /** Merge bigram-count artifacts from disjoint corpus slices: counts
    * are a commutative monoid under per-key addition, so the merged
    * relation is bit-identical to counting the union corpus — history
    * is never re-tokenized. One (v, w)-keyed shuffle over the
    * ALREADY-REDUCED count relations (vocab², not corpus, sized).
    */
  def mergeCounts(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy("v", "w").agg(sum("c_vw").as("c_vw"))

  /** (v, w, c_vw, p_fix) for every observed bigram. */
  def bigramModel(df: DataFrame, textCol: String,
      scale: Long = 1L << 30): DataFrame =
    modelFromCounts(bigramCounts(df, textCol), scale)

  /** Derive the discounted model from a (v, w, c_vw) count relation —
    * the second half of [[bigramModel]], split out so merged artifacts
    * ([[mergeCounts]]) reuse it unchanged.
    */
  def modelFromCounts(cvw: DataFrame, scale: Long = 1L << 30): DataFrame = {
    val byV = cvw.groupBy("v").agg(
      sum("c_vw").as("c_v"), count(lit(1)).as("n1_v"))
    val byW = cvw.groupBy("w").agg(count(lit(1)).as("n1_w"))
    val total = cvw.select(count(lit(1)).as("n_bb"))
    cvw.join(byV, "v").join(byW, "w")
      .crossJoin(broadcast(total))
      .select(col("v"), col("w"), col("c_vw"),
        // ${scale}L: a bare int literal would multiply as 32-bit first
        // (ANSI overflow) before promotion to long
        (expr(s"(${scale}L * (4L * c_vw - 3L)) div (4L * c_v)") +
          expr(s"((${scale}L * 3L * n1_v) div (4L * c_v)) * n1_w div n_bb"))
          .as("p_fix"))
  }

  /** CCNet-style LM scoring, float-free: total surprisal of each
    * document under a trained bigram `model` (as produced by
    * [[bigramModel]]), in fixed-point bits — bits_fix = Σ −log₂ p(w|v)
    * · 2^fracBits over the document's bigram occurrences, computed with
    * the exact integer binary log ([[graft.functions.FixedLogKernel]]).
    * Perplexity gating is then an integer comparison:
    * keep ⇔ bits_fix ≤ τ · n_bigrams · 2^fracBits.
    *
    * A document bigram absent from the model scores the maximum-surprise
    * floor (probability 2^−scaleBits), so scoring a corpus the model was
    * NOT trained on degrades gracefully instead of dropping rows.
    *
    * Scale shape: the model relation first reduces to per-bigram
    * surprisal (narrow); documents reduce to per-doc DISTINCT bigrams
    * with multiplicity (one map-side-combined shuffle) before the
    * (v, w)-keyed join — so the join carries one row per distinct
    * doc-bigram, not one per token — then one per-doc aggregation.
    * No corpus re-shuffle, no driver collect: the model stays
    * distributed (at web scale it outgrows any broadcast).
    */
  def perplexityBits(model: DataFrame, docs: DataFrame, textCol: String,
      idCol: String, scaleBits: Int = 30, fracBits: Int = 16): DataFrame = {
    val scored = docBigramBits(model, docs, textCol, idCol, scaleBits,
        fracBits)
      .groupBy("doc_id")
      .agg(sum("__cnt").as("n_bigrams"),
        sum(col("__cnt") * col("__bits")).as("bits_fix"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("bits_fix"), lit(0L)).as("bits_fix"))
  }

  /** Per-(doc, bigram-TYPE) surprisal — the relation `perplexityBits`
    * aggregates, exposed for order-statistic consumers (q214's Min-K%
    * selection needs the individual bits, not their sum). Columns:
    * doc_id, v, w, __cnt (occurrences of the type in the doc), __bits
    * (16.16 surprisal; unseen bigrams take the scaleBits floor, so no
    * doc-bigram ever drops). Same scale shape as `perplexityBits`:
    * narrow bigram fan-out → one map-side-combined (doc,v,w) shuffle →
    * (v,w)-keyed join against the distributed model.
    */
  def docBigramBits(model: DataFrame, docs: DataFrame, textCol: String,
      idCol: String, scaleBits: Int = 30, fracBits: Int = 16): DataFrame = {
    val surprisal = model.select(col("v"), col("w"),
      (-graft.functions.FixedLogExprs.log2fix(col("p_fix"), scaleBits,
        fracBits)).as("__bits"))
    val toks = Decontaminate.wordTokens(col(textCol))
    val floorBits = (scaleBits.toLong << fracBits)
    docs
      .select(col(idCol).as("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), size(col("__toks")).as("__nt"), col("__toks"))
      .select(col("doc_id"), explode(when(col("__nt") >= 2,
        transform(sequence(lit(1), col("__nt") - 1),
          i => struct(element_at(col("__toks"), i).as("v"),
            element_at(col("__toks"), i + 1).as("w"))))
        .otherwise(array())).as("bg"))
      .groupBy(col("doc_id"), col("bg.v").as("v"), col("bg.w").as("w"))
      .agg(count(lit(1)).as("__cnt"))
      .join(surprisal, Seq("v", "w"), "left")
      .select(col("doc_id"), col("v"), col("w"), col("__cnt"),
        coalesce(col("__bits"), lit(floorBits)).as("__bits"))
  }
}
