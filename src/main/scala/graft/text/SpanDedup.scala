package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextExprs

/** Exact duplicated-SPAN detection at word-n-gram granularity — the
  * substring-level sibling of whole-document dedup (cf. Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better", ACL '22:
  * removing repeated ≥50-token spans, not just repeated documents).
  * A span is "duplicated" when every one of its n-grams occurs in
  * ≥ `minDocs` distinct documents; overlapping and contiguous duplicated
  * windows merge into maximal spans.
  *
  * Scale shape (corpus ~100 TB):
  *  1. tier 1 streams the corpus through the one-pass
  *     [[TextExprs.wordGramHash64]] kernel — 8-byte DISTINCT-within-doc
  *     hashes, no gram strings — so the doc-frequency count is a plain
  *     `count()` per hash with map-side partial aggregation; only
  *     (hash, partial count) crosses the one counting shuffle;
  *  2. candidate docs (those holding ≥1 hot hash) re-derive positioned
  *     gram STRINGS and recount exactly — every doc containing a given
  *     gram is by construction a candidate, so the within-candidate
  *     distinct-doc count equals the global count and a 2⁻⁶⁴ hash
  *     collision can never mark an innocent span (same two-tier
  *     discipline as [[Decontaminate.overlap]] / [[Boilerplate]]);
  *  3. span assembly is per-document array algebra after one doc-keyed
  *     groupBy — no window over the corpus, no global sort.
  *
  * Reference scope: the reference pipelines dedup whole rows
  * (`datapackage_pipelines_migdar/flows/datasets.py` join_self paths);
  * span-level dedup is part of the beyond-reference training-data tier.
  */
object SpanDedup {

  /** Maximal duplicated token spans per document:
    * (doc_id, span_start, span_len) in 0-based word positions, where the
    * span covers tokens [span_start, span_start + span_len).  Windows
    * whose starts are ≤ n apart merge (they overlap or touch).
    */
  def dupSpans(df: DataFrame, textCol: String, idCol: String,
      n: Int, minDocs: Int = 2): DataFrame = {
    val base = df.select(col(idCol).cast(LongType).as("doc_id"),
      col(textCol).as("__text"))

    // tier 1: hashes are distinct-within-doc, so count() == distinct-doc
    // count — no count_distinct state, pure map-side-combinable count.
    val docHashes = base.select(col("doc_id"),
      explode(TextExprs.wordGramHash64(col("__text"), n)).as("__gh"))
    val hotHashes = docHashes.groupBy("__gh")
      .agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("__gh")
    val candDocs = docHashes
      .join(broadcast(hotHashes), Seq("__gh"), "left_semi")
      .select("doc_id").distinct()

    // tier 2: positioned gram strings for candidate docs only; exact
    // recount (== global count, see scaladoc) kills hash collisions.
    val posGrams = base.join(candDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        posexplode(TextExprs.wordGrams(col("__text"), n)).as(Seq("pos", "gram")))
    val hotGrams = posGrams.select("doc_id", "gram").distinct()
      .groupBy("gram").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("gram")
    val hits = posGrams.join(hotGrams, Seq("gram"), "left_semi")
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"))

    hits.groupBy("doc_id")
      .agg(array_sort(collect_list(col("pos"))).as("__ps"))
      .select(col("doc_id"), explode(mergeStarts(col("__ps"), n)).as("__s"))
      .select(col("doc_id"),
        col("__s").getField("span_start").as("span_start"),
        col("__s").getField("span_len").as("span_len"))
  }

  /** Fold sorted window starts into maximal spans: starts ≤ n apart
    * merge. Pure array aggregate — runs inside the doc-keyed groupBy's
    * project, never a second shuffle.
    */
  private def mergeStarts(sortedStarts: Column, n: Int): Column = {
    val zero = array().cast("array<struct<s:bigint,e:bigint>>")
    aggregate(sortedStarts, zero,
      (acc, p) => {
        val last = element_at(acc, -1)
        when(size(acc) === 0, array(struct(p.as("s"), p.as("e"))))
          .when(p - last.getField("e") <= n,
            concat(slice(acc, lit(1), size(acc) - 1),
              array(struct(last.getField("s").as("s"), p.as("e")))))
          .otherwise(concat(acc, array(struct(p.as("s"), p.as("e")))))
      },
      acc => transform(acc, x =>
        struct(x.getField("s").as("span_start"),
          (x.getField("e") - x.getField("s") + lit(n.toLong)).as("span_len"))))
  }

  /** Remove every duplicated span from every document (the aggressive
    * Lee-et-al. policy applied symmetrically: all occurrences go; the
    * conservative keep-one variant needs a global occurrence election —
    * compose with [[graft.dedup.Dedup]] cluster survivors for that).
    * Output: (doc_id, clean_text, n_tokens, n_dup_tokens); documents
    * without duplicated spans pass through with n_dup_tokens = 0.
    */
  def stripSpans(df: DataFrame, textCol: String, idCol: String,
      n: Int, minDocs: Int = 2): DataFrame = {
    val spans = dupSpans(df, textCol, idCol, n, minDocs)
    val covered = spans.select(col("doc_id"),
      explode(sequence(col("span_start"),
        col("span_start") + col("span_len") - 1)).as("pos"))
    val toks = df.select(col(idCol).cast(LongType).as("doc_id"),
      posexplode(Decontaminate.wordTokens(col(textCol))).as(Seq("p", "tok")))
      .withColumn("pos", col("p").cast(LongType))
    toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
      .join(toks.groupBy("doc_id").agg(count(lit(1)).as("n_tokens")),
        Seq("doc_id"), "right")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_dup_tokens"))
  }
}
