package graft.similarity

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.text.Decontaminate

/** Inverted-index TF-IDF text retrieval: top-k documents per query by
  * Σ_{t ∈ q ∩ d} tf_d(t) · idf(t) — the lexical-search complement of the
  * embedding ANN tiers in [[Ann]] (BM25's shape without the length
  * normalization; the idf is the RSJ/BM25 one sans log, which preserves
  * its ordering).
  *
  * Exactness across engines: idf is kept LN-FREE and fixed-point —
  * `w(t) = floor((N − df + ½)/(df + ½) · 2²⁰)` — because `x.5` values,
  * IEEE division, and a power-of-two scale are all exactly rounded the
  * same everywhere, so scores are exact int64 sums and the whole
  * operator hash-matches a SQL oracle bit-for-bit (transcendental `ln`
  * is the one piece two engines may round differently; a monotone
  * substitute keeps the RANKING identical to BM25-idf's).
  *
  * Scale shape (corpus ~100 TB, query set ~thousands):
  *  1. postings (term, doc, tf) are built with ONE corpus shuffle
  *     (map-side combined groupBy); df-per-term and N derive from the
  *     same relation with tiny outputs;
  *  2. query terms broadcast; the postings side therefore never
  *     reshuffles for the probe — the semi-join prunes the posting list
  *     to query vocabulary at the scan;
  *  3. per-(query, doc) scores feed the bounded-heap
  *     [[graft.plans.TopKPerKey]] operator: each partition emits ≤ k
  *     rows per query before the final key shuffle — never a global
  *     sort, never the full score matrix.
  */
object TfIdfSearch {

  /** Fixed-point scale: exact power of two (no rounding in the scale
    * multiply itself).
    */
  val Scale: Long = 1L << 20

  /** Top-k corpus docs per query row. Queries carry (qidCol, textCol);
    * output: (query_id, doc_id, score) with score = Σ tf·w fixed-point
    * int64, ties broken by doc_id.
    *
    * ONE corpus pass, no cache: the postings relation is pruned to the
    * query vocabulary FIRST (broadcast semi-shape join), and df(t) is
    * read off the pruned relation with a window count — pruning by TERM
    * cannot change how many docs contain a surviving term, so the df is
    * exactly the full-corpus df. The old shape aggregated the full
    * corpus vocabulary a second time for the weight table; this one
    * aggregates nothing the probe didn't already keep, and leaves
    * nothing in executor storage after the result materializes (no
    * caller-owned cache lifetime — asserted by SearchOpsSpec).
    */
  def topK(corpus: DataFrame, queries: DataFrame, textCol: String,
      idCol: String, qidCol: String, k: Int): DataFrame = {
    val postings = corpus
      .select(col(idCol).cast(LongType).as("doc_id"),
        explode(Decontaminate.wordTokens(col(textCol))).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
    val qTerms = queries
      .select(col(qidCol).cast(LongType).as("query_id"),
        explode(array_distinct(Decontaminate.wordTokens(col(textCol)))).as("term"))
    val qVocab = qTerms.select("term").distinct()
    // docs total (tiny single-row relation)
    val n = corpus.select(count(lit(1)).as("__n"))
    // prune → df window → weight → probe: postings shuffle once on
    // (term, doc_id) for the combine, once on term (query-vocab-pruned,
    // tiny) for the df count; the corpus is scanned exactly once
    val scored = postings
      .join(broadcast(qVocab), Seq("term"))
      .withColumn("__df", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("term")))
      .crossJoin(broadcast(n))
      .withColumn("__w",
        floor(((col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5))) * lit(Scale.toDouble)).cast(LongType))
      .join(broadcast(qTerms), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("tf") * col("__w")).as("score"))
    graft.plans.TopKPerKey.topK(scored, Seq("query_id"),
      Seq(graft.plans.TopKPerKey.Sort("score", descending = true),
        graft.plans.TopKPerKey.Sort("doc_id")), k)
  }
}
