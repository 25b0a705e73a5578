package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-wide exact paragraph deduplication (RefinedWeb / Falcon-style):
  * a paragraph that already appeared in an EARLIER document (or earlier
  * in the same document) is dropped; the first occurrence wins. This is
  * the paragraph-granularity member of the dedup family — document dedup
  * drops whole copies, [[Boilerplate]] drops lines that recur across many
  * documents, and this drops any repeated paragraph even when it recurs
  * only once: quoted reposts, syndicated article bodies, copy-pasted
  * license blocks.
  *
  * Reference scope: the reference pipelines dedup at row granularity
  * (e.g. `datapackage_pipelines_migdar/flows/broken_links.py:34-43`
  * first-seen-wins on URLs); this extends the same first-wins contract to
  * sub-document text units for LLM corpus curation.
  *
  * Scale shape (corpus ~100 TB):
  *  1. one narrow split/posexplode — no shuffle — produces
  *     (doc, ord, pos, para);
  *  2. ONE shuffle, keyed by `xxhash64(para)`: a per-key window ranks
  *     occurrences by (ord, pos). Partitioning by the 8-byte hash (not
  *     the paragraph string) keeps the sort key fixed-width; the window
  *     is per-paragraph, never global.
  *  3. collision safety: a row that loses the window but whose STRING
  *     differs from the winner's is a 2⁻⁶⁴ hash collision and is KEPT —
  *     a collision can over-keep a duplicate of the colliding paragraph
  *     but can never delete distinct content (the fail-safe direction
  *     for dedup; same discipline as [[Boilerplate.hotLines]]'s tier 2).
  *  4. reassembly is one shuffle of surviving paragraphs keyed by doc id;
  *     order is restored from the captured position, not shuffle order.
  */
object ParagraphDedup {

  /** Non-empty trimmed paragraphs of `text` (blank-line separated), in
    * document order. */
  def paragraphs(text: Column): Column =
    filter(transform(split(text, "\n\n"), p => trim(p)), p => p =!= "")

  /** Drop every paragraph whose exact text already occurred at a smaller
    * (`ordCol`, position) and reassemble. Output: one row per input
    * document — (doc_id, clean_text, n_kept, n_dropped); `clean_text` is
    * the surviving paragraphs rejoined with a blank line in original
    * order (empty when every paragraph was a repeat).
    */
  def dedup(df: DataFrame, textCol: String, idCol: String,
      ordCol: String): DataFrame = {
    val paras = df.select(col(idCol).as("doc_id"), col(ordCol).as("__ord"),
      posexplode(paragraphs(col(textCol))).as(Seq("pos", "para")))
    // doc_id in the sort makes the winner deterministic when ordCol has
    // ties across documents (ord, pos) alone would leave the choice to
    // partition order
    val byPara = Window.partitionBy("__ph").orderBy("__ord", "doc_id", "pos")
    val kept = paras
      .withColumn("__ph", xxhash64(col("para")))
      .withColumn("__rn", row_number().over(byPara))
      .withColumn("__w0", first(col("para")).over(byPara))
      .filter(col("__rn") === 1 || col("para") =!= col("__w0"))
    val agg = kept.groupBy("doc_id").agg(
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("para")))),
          s => s.getField("para")), "\n\n").as("clean_text"),
      count(lit(1)).as("n_kept"))
    val base = df.select(col(idCol).as("doc_id"),
      size(paragraphs(col(textCol))).cast(LongType).as("__n_total"))
    base.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n_total") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
