package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gopher/C4-style RULE-BASED quality gates — the standard document
  * filter bundle of web-scale training pipelines (Rae et al. 2021 §A1.1;
  * Raffel et al. 2020 §2.2), distinct from the learned/score-based
  * signals in [[TextAnalysis]]: each rule is a hard boolean on one
  * document statistic, and `keep` is their conjunction.
  *
  * Every statistic is a narrow codegen'd Column expression — integer
  * counts and at most ONE IEEE division each, so the whole bundle is
  * exactly reproducible cross-engine (oracle-safe) and runs as a pure
  * map stage over the scan: zero shuffles at any corpus size.
  */
object QualityRules {

  /** Lower-cased whitespace words (parity with
    * [[Decontaminate.wordTokens]] and its `list_filter` oracle mirror).
    */
  private def words(text: Column): Column = Decontaminate.wordTokens(text)

  /** Non-empty trimmed lines (parity with [[Boilerplate.contentLines]]). */
  private def lines(text: Column): Column = Boilerplate.contentLines(text)

  private def ratio(num: Column, den: Column): Column =
    when(den > 0, num.cast(DoubleType) / den.cast(DoubleType)).otherwise(lit(0.0))

  /** Append the rule statistics and flags to `df`:
    *  - n_words, mean_word_len, alpha_word_ratio, stopword_hits,
    *    dup_line_ratio, bullet_line_ratio, ellipsis_line_ratio
    *  - flag_* booleans per rule, `keep` = AND of all flags.
    * Bounds follow Gopher's published envelope scaled to this corpus's
    * short synthetic documents (the BOUNDS are parameters; the MECHANICS
    * are the point).
    */
  def flags(df: DataFrame, textCol: String,
      minWords: Long = 10L, maxWords: Long = 100000L,
      minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 12.0,
      minAlphaWordRatio: Double = 0.8, minStopwordHits: Long = 2L,
      maxDupLineRatio: Double = 0.5, maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3): DataFrame = {
    val t = col(textCol)
    // materialize the token/line arrays ONCE behind a projection barrier:
    // CollapseProject will not inline a non-cheap alias referenced many
    // times, so the regex split / line scan runs once per row instead of
    // once per statistic (~5x less tokenization work)
    val staged = df.withColumn("__w", words(t)).withColumn("__ls", lines(t))
    val w = col("__w")
    val ls = col("__ls")
    val nWords = size(w).cast(LongType)
    // Σ word lengths is exact-integer; the mean is one IEEE division.
    val sumLen = aggregate(w, lit(0L), (a, x) => a + length(x).cast(LongType))
    val meanWordLen = ratio(sumLen, nWords)
    val alphaWords = size(filter(w, x => x.rlike("[a-z]"))).cast(LongType)
    val alphaWordRatio = ratio(alphaWords, nWords)
    // distinct stopwords PRESENT (not instance count): Gopher's
    // "contains ≥2 of the stop list" phrasing.
    val stopHits = size(filter(
      typedLit(TextAnalysis.Stopwords), s => array_contains(w, s))).cast(LongType)
    val nLines = size(ls).cast(LongType)
    val dupLines = (nLines - size(array_distinct(ls)).cast(LongType))
    val dupLineRatio = ratio(dupLines, nLines)
    val bulletLines = size(filter(ls,
      l => l.startsWith("-") || l.startsWith("*") || l.startsWith("•"))).cast(LongType)
    val bulletRatio = ratio(bulletLines, nLines)
    val ellipsisLines = size(filter(ls, l => l.endsWith("..."))).cast(LongType)
    val ellipsisRatio = ratio(ellipsisLines, nLines)

    val fWordCount = nWords >= minWords && nWords <= maxWords
    val fMeanLen = meanWordLen >= minMeanWordLen && meanWordLen <= maxMeanWordLen
    val fAlpha = alphaWordRatio >= minAlphaWordRatio
    val fStop = stopHits >= minStopwordHits
    val fDupLines = dupLineRatio <= maxDupLineRatio
    val fBullet = bulletRatio <= maxBulletRatio
    val fEllipsis = ellipsisRatio <= maxEllipsisRatio

    staged.withColumn("n_words", nWords)
      .withColumn("mean_word_len", meanWordLen)
      .withColumn("alpha_word_ratio", alphaWordRatio)
      .withColumn("stopword_hits", stopHits)
      .withColumn("dup_line_ratio", dupLineRatio)
      .withColumn("bullet_line_ratio", bulletRatio)
      .withColumn("ellipsis_line_ratio", ellipsisRatio)
      .withColumn("flag_word_count", fWordCount)
      .withColumn("flag_mean_word_len", fMeanLen)
      .withColumn("flag_alpha_words", fAlpha)
      .withColumn("flag_stopwords", fStop)
      .withColumn("flag_dup_lines", fDupLines)
      .withColumn("flag_bullet", fBullet)
      .withColumn("flag_ellipsis", fEllipsis)
      .withColumn("keep",
        fWordCount && fMeanLen && fAlpha && fStop && fDupLines &&
          fBullet && fEllipsis)
      .drop("__w", "__ls")
  }

  /** Published Gopher self-repetition bounds (Rae et al. 2021 §A1.1),
    * as percent numerators of the char fractions: top-{2,3,4}-gram
    * coverage ≤ 20/18/16 %, duplicated-{5..10}-gram coverage ≤ 15..10 %.
    */
  val RepetitionBounds: Seq[(String, Int)] = Seq(
    "top2_chars" -> 20, "top3_chars" -> 18, "top4_chars" -> 16,
    "dup5_chars" -> 15, "dup6_chars" -> 14, "dup7_chars" -> 13,
    "dup8_chars" -> 12, "dup9_chars" -> 11, "dup10_chars" -> 10)

  /** Append the nine Gopher self-repetition statistics
    * ([[graft.functions.TextKernels.repetitionProfile]] — one codegen'd
    * pass, exact integers) plus `keepCol` = the conjunction of the
    * cross-multiplied percent bounds. Like [[flags]], a pure map stage:
    * zero shuffles at any corpus size.
    */
  def repetitionFlags(df: DataFrame, textCol: String,
      bounds: Seq[(String, Int)] = RepetitionBounds,
      keepCol: String = "keep_repetition"): DataFrame = {
    val staged = df.withColumn("__rp",
      graft.functions.TextExprs.repetitionProfile(col(textCol)))
    val names = "n_chars" +: bounds.map(_._1)
    val withStats = names.zipWithIndex.foldLeft(staged) {
      case (acc, (nm, i)) => acc.withColumn(nm, col("__rp")(i))
    }
    val keep = bounds.map { case (c, t) =>
      col(c) * lit(100L) <= lit(t.toLong) * col("n_chars")
    }.reduce(_ && _)
    withStats.withColumn(keepCol, keep.cast("int")).drop("__rp")
  }
}
