package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact phrase retrieval over positional postings — the query shape
  * the bag-of-words probes ([[TfIdfSearch]], [[Bm25]]) cannot express:
  * term ORDER and adjacency matter ("new york times" ≠ "times new
  * york"). The classical positional-index formulation, declaratively:
  * a phrase of length L with terms tᵢ at offsets i matches doc d at
  * anchor a iff the postings contain (d, tᵢ, a + i) for every i — so
  * candidates group by (query, doc, anchor = pos − offset) and an
  * anchor fires when all L offsets are present. Candidate rows are
  * unique per (query, doc, anchor, offset) — pos = anchor + offset
  * pins the posting — so a plain count equals the distinct-offset
  * count and no distinct machinery is needed.
  *
  * Scale shape: postings are the one corpus shuffle (term-keyed, the
  * same layout the scoring indexes use — at 100 TB this relation is
  * the persisted index, not a per-query rebuild); the phrase-term set
  * is tiny by contract and BROADCASTS onto it, so the corpus never
  * re-partitions per query; anchor counting is a map-side-combinable
  * aggregate whose key includes doc_id, so no single reducer sees more
  * than one document's candidates for a term.
  */
object PhraseSearch {

  /** (doc_id, term, pos) — 1-based positions over the lowercased
    * whitespace tokenization.
    */
  def postings(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(graft.text.Decontaminate.wordTokens(col(textCol)))
          .as(Seq("__p0", "term")))
      .select(col("doc_id"), col("term"), (col("__p0") + 1).as("pos"))

  /** (query_id, term, off, plen) from a phrase-per-row relation with a
    * token-array column; offsets are 0-based within the phrase.
    */
  def phraseTerms(phrases: DataFrame, idCol: String, toksCol: String): DataFrame =
    phrases.select(col(idCol).as("query_id"),
        size(col(toksCol)).as("plen"),
        posexplode(col(toksCol)).as(Seq("off", "term")))

  /** (query_id, doc_id, n_anchors, first_pos): documents containing
    * the exact consecutive phrase, with the occurrence count and the
    * 1-based position of the first occurrence.
    */
  def matches(postings: DataFrame, terms: DataFrame): DataFrame =
    postings.join(broadcast(terms), "term")
      .select(col("query_id"), col("doc_id"),
        (col("pos") - col("off")).as("anchor"), col("plen"))
      .groupBy("query_id", "doc_id", "anchor", "plen")
      .agg(count(lit(1)).as("__k"))
      .filter(col("__k") === col("plen"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_anchors"),
        min("anchor").cast("long").as("first_pos"))
}
