package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-document boilerplate removal (CCNet / RefinedWeb-style): a line
  * that recurs in many DISTINCT documents — nav bars, cookie banners,
  * "subscribe" footers, copyright stamps — is template chrome, not
  * content, and is stripped from every document that carries it. This is
  * the line-granularity sibling of whole-document dedup: dedup drops
  * copies of a document, boilerplate removal drops the copied PARTS of
  * otherwise-distinct documents.
  *
  * Scale shape (corpus ~100 TB, hot-line set ~MBs by definition —
  * boilerplate is the tiny head of the line-frequency distribution):
  *  1. the corpus streams through a narrow split/explode; only
  *     (xxhash64(line), doc_id) — 16 bytes/line, no strings — crosses
  *     the counting shuffle, with map-side partial aggregation;
  *  2. tier 2 re-derives line STRINGS for candidate lines alone and
  *     recounts exactly, so a 2⁻⁶⁴ hash collision can never delete an
  *     innocent line (same two-tier discipline as
  *     [[Decontaminate.overlap]]);
  *  3. the exact hot-line set broadcasts back; reassembly is one
  *     shuffle of the corpus keyed by doc id (order restored from the
  *     captured line position, not from shuffle order).
  */
object Boilerplate {

  /** Non-empty trimmed lines of `text`, in document order. */
  def contentLines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  /** Lines occurring in ≥ `minDocs` distinct documents, exactly
    * (hash-counted tier 1, string-verified tier 2). Returns a DataFrame
    * with a single `line` column — small by construction; callers
    * broadcast it.
    */
  def hotLines(df: DataFrame, textCol: String, idCol: String,
      minDocs: Int): DataFrame = {
    val lines = df.select(col(idCol).as("__doc"),
      explode(contentLines(col(textCol))).as("line"))
    // tier 1: count doc-frequency per 8-byte line hash — candidate hashes
    val hotHashes = lines
      .select(xxhash64(col("line")).as("__lh"), col("__doc"))
      .groupBy("__lh")
      .agg(count_distinct(col("__doc")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("__lh")
    // tier 2: exact recount over the candidate lines only (tiny relation;
    // a colliding innocent line enters here and is filtered back out)
    lines
      .join(broadcast(hotHashes), xxhash64(col("line")) === col("__lh"),
        "left_semi")
      .groupBy("line")
      .agg(count_distinct(col("__doc")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("line")
  }

  /** Strip boilerplate lines from every document. Output: one row per
    * input document — (doc_id, clean_text, n_kept, n_removed), where
    * `clean_text` is the surviving lines rejoined with '\n' in original
    * order (empty string when every line was boilerplate) and counts are
    * over non-empty trimmed lines.
    */
  def strip(df: DataFrame, textCol: String, idCol: String,
      minDocs: Int): DataFrame = {
    val hot = hotLines(df, textCol, idCol, minDocs)
    val lines = df.select(col(idCol).as("doc_id"),
      posexplode(contentLines(col(textCol))).as(Seq("pos", "line")))
    val keptAgg = lines
      .join(broadcast(hot), Seq("line"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_kept"))
    // keep fully-boilerplate documents in the output (empty clean_text)
    val base = df.select(col(idCol).as("doc_id"),
      size(contentLines(col(textCol))).cast(LongType).as("__n_total"))
    base.join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n_total") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }
}
