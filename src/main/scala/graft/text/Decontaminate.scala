package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with a (much smaller) evaluation/benchmark corpus — the
  * standard guard against test-set leakage when assembling training data
  * (GPT-3 App. C / PaLM-style 13-gram overlap; n is a parameter because
  * the right value depends on tokenization and corpus entropy).
  *
  * Scale shape (training side ~100 TB, benchmark side ~MBs):
  *  1. benchmark grams are hashed and DISTINCT'd — a tiny relation that
  *     Catalyst/AQE broadcasts;
  *  2. tier 1: the training side streams through a narrow explode of
  *     8-byte gram HASHES into a broadcast semi-join — no shuffle of
  *     training data, no gram strings materialized in the hot path;
  *  3. tier 2: only surviving (doc, gram) rows re-derive the gram STRING
  *     and exact-verify against the benchmark gram strings, so a 2⁻⁶⁴
  *     hash collision can never flag a clean document.
  *
  * Counting is per distinct gram (a doc repeating one leaked gram five
  * times scores 1), matching how overlap thresholds are quoted.
  */
object Decontaminate {

  /** Word n-grams of lowercased whitespace-split text (distinct). */
  def wordGrams(text: Column, n: Int): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    array_distinct(
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /** (doc_id, n_hit_grams) for every training doc sharing ≥1 word
    * n-gram with the benchmark corpus. Docs shorter than n words can't
    * leak an n-gram and are filtered before the explode.
    */
  def overlap(training: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int): DataFrame = {
    def grams(df: DataFrame) = df
      .filter(size(split(trim(lower(col(textCol))), "\\s+")) >= n)
      .select(col(idCol).as("doc_id"),
        explode(wordGrams(col(textCol), n)).as("gram"))
    val benchGrams = grams(benchmark).select("gram").distinct()
    val benchHashes = benchGrams.select(xxhash64(col("gram")).as("__gh")).distinct()
    grams(training)
      .withColumn("__gh", xxhash64(col("gram")))
      .join(benchHashes, Seq("__gh"), "left_semi")   // tier 1: hashes only
      .join(benchGrams, Seq("gram"), "left_semi")    // tier 2: exact strings
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram")).as("n_hit_grams"))
  }
}
