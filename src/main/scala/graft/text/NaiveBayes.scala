package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FixedLogExprs

/** Multinomial Naive Bayes over word tokens in fixed-point integer
  * arithmetic — the model-based document-filter tier (reference scope:
  * the same labeled-classification role fastText-style quality/language
  * classifiers play in FineWeb-Edu/DCLM-style curation; the heuristic
  * tiers are `TextAnalysis.langId`/`qualityScore`), with the float
  * drift designed out the same way as [[KneserNey]]: probabilities are
  * scaled integers from a FIXED formula with floor divisions, and the
  * log-space scoring uses the exact integer binary log
  * ([[graft.functions.FixedLogKernel]]), so train + predict replay
  * bit-for-bit in any engine.
  *
  * Add-one smoothing, all integers (`scale` = probability 1):
  *
  *   p_fix(w|y)    = (scale · (c(w,y) + 1)) div (c(y) + V)
  *   default_fix(y)=  scale                 div (c(y) + V)   (unseen w)
  *   prior_fix(y)  = (scale · n(y))         div N
  *
  * Scoring is total surprisal (positive 16.16 fixed-point bits):
  * bits(d,y) = −log2fix(prior_fix(y)) + Σ_w tf_w · −log2fix(p_fix(w|y)),
  * and the prediction is the integer argmin with ties broken on the
  * smaller label — partition-count- and merge-order-invariant.
  *
  * Scale shape (the wordcount family — no corpus re-shuffle):
  * train = one map-side-combined (w, y) count shuffle + one per-class
  * reduction of the already-reduced relation + two broadcast scalars
  * (V, N). predict = one (doc, w) tf shuffle, a broadcast of the
  * CLASS table only (|Y| rows — the per-word model stays distributed;
  * at web scale it outgrows any broadcast), one (w, y)-keyed join
  * carrying one row per distinct doc-term per class, one (doc, y)
  * partial-sum, one (doc) argmin. Overflow: scale = 2^30 holds to
  * c(w,y) ≈ 2^33 token occurrences; past that drop `scale` (the
  * comparison is scale-free as long as both sides share it).
  */
object NaiveBayes {

  /** Trained model: `wordProbs` = (w, y, p_fix) for every word seen in
    * class y's training docs; `classStats` = (y, prior_fix, default_fix),
    * |Y| rows. Both plain DataFrames — persistable as parquet artifacts
    * and reloadable without loss (all-integer columns).
    */
  final case class Model(wordProbs: DataFrame, classStats: DataFrame)

  /** Train on (textCol, labelCol) rows; null labels are dropped. */
  def train(df: DataFrame, textCol: String, labelCol: String,
      scale: Long = 1L << 30): Model = {
    val toks = Decontaminate.wordTokens(col(textCol))
    val pairs = df
      .filter(col(labelCol).isNotNull)
      .select(col(labelCol).as("y"), explode(toks).as("w"))
    val cwy = pairs.groupBy("w", "y").agg(count(lit(1)).as("c_wy"))
    val cy = cwy.groupBy("y").agg(sum("c_wy").as("c_y"))
    // vocab size and doc total as 1-row broadcast relations, not driver
    // collects (the KneserNey pattern)
    val vocab = cwy.agg(countDistinct("w").as("v_sz"))
    val priors = df.filter(col(labelCol).isNotNull)
      .groupBy(col(labelCol).as("y")).agg(count(lit(1)).as("n_y"))
    val nTot = priors.agg(sum("n_y").as("n_tot"))
    val wordProbs = cwy.join(cy, "y").crossJoin(broadcast(vocab))
      .select(col("w"), col("y"),
        // ${scale}L literals: see KneserNey — int-first multiplication
        // would overflow under ANSI before promotion
        expr(s"(${scale}L * (c_wy + 1L)) div (c_y + v_sz)").as("p_fix"))
    val classStats = cy.join(priors, "y").crossJoin(broadcast(vocab))
      .crossJoin(broadcast(nTot))
      .select(col("y"),
        expr(s"(${scale}L * n_y) div n_tot").as("prior_fix"),
        expr(s"${scale}L div (c_y + v_sz)").as("default_fix"))
    Model(wordProbs, classStats)
  }

  private def bits(p: Column, scaleBits: Int, fracBits: Int): Column =
    -FixedLogExprs.log2fix(p, scaleBits, fracBits)

  /** Per-(doc, class) surprisal: (doc_id, y, bits_fix). Exposed for
    * calibration-style inspection; [[predict]] finishes the argmin.
    */
  def scoreBits(model: Model, docs: DataFrame, textCol: String,
      idCol: String, scaleBits: Int = 30, fracBits: Int = 16): DataFrame = {
    val wordBits = model.wordProbs.select(col("w"), col("y"),
      bits(col("p_fix"), scaleBits, fracBits).as("__wb"))
    val classBits = model.classStats.select(col("y"),
      bits(col("prior_fix"), scaleBits, fracBits).as("__pb"),
      bits(col("default_fix"), scaleBits, fracBits).as("__db"))
    val toks = Decontaminate.wordTokens(col(textCol))
    val docTf = docs
      .select(col(idCol).as("doc_id"), explode(toks).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("__tf"))
    // |Y| rows fan out each distinct doc-term; the per-word model joins
    // on (w, y) so an unseen (w, y) falls back to the class default
    docTf.crossJoin(broadcast(classBits))
      .join(wordBits, Seq("w", "y"), "left")
      .groupBy("doc_id", "y")
      .agg((first(col("__pb")) +
        sum(col("__tf") * coalesce(col("__wb"), col("__db"))))
        .as("bits_fix"))
  }

  /** Argmin prediction: (doc_id, pred, bits_fix). A doc with no tokens
    * still scores every class prior, so every input id gets a row.
    */
  def predict(model: Model, docs: DataFrame, textCol: String,
      idCol: String, scaleBits: Int = 30, fracBits: Int = 16): DataFrame = {
    val scored = scoreBits(model, docs, textCol, idCol, scaleBits, fracBits)
    // min(struct) orders (bits_fix, y) lexicographically — the
    // deterministic tie-break, no window needed
    val best = scored
      .groupBy("doc_id")
      .agg(min(struct(col("bits_fix"), col("y"))).as("__m"))
      .select(col("doc_id"), col("__m.y").as("pred"),
        col("__m.bits_fix").as("bits_fix"))
    // token-less docs produce no (doc, w) rows: score them as prior-only
    // via the same argmin over classStats alone
    val priorOnly = model.classStats
      .select(col("y"), bits(col("prior_fix"), scaleBits, fracBits).as("b"))
      .agg(min(struct(col("b"), col("y"))).as("__m"))
      .select(col("__m.y").as("__py"), col("__m.b").as("__pbits"))
    docs.select(col(idCol).as("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .crossJoin(broadcast(priorOnly))
      .select(col("doc_id"),
        coalesce(col("pred"), col("__py")).as("pred"),
        coalesce(col("bits_fix"), col("__pbits")).as("bits_fix"))
  }
}
