package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, functions => F}
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
  *     (map-side combined groupBy); every downstream branch reads the
  *     same exchange (ReuseExchange — the [[SemDedup]] discipline), so
  *     the corpus is tokenized exactly once and nothing is persisted;
  *  2. query terms broadcast; the postings side never reshuffles for the
  *     probe — the semi-join prunes the posting list to query vocabulary
  *     at the scan;
  *  3. the probe itself is TWO-TIER with an exact score bound (the
  *     term-at-a-time form of Broder et al.'s WAND pruning): high-df
  *     "common" terms never fan out query×postings. Measured at the 10×
  *     bench scale this is what keeps retrieval linear in the corpus —
  *     the one-tier form was 115× at 10× data (SCALING.md §8) because
  *     ~30 stopword-grade terms × every query × df≈N dominated the join;
  *  4. per-(query, doc) scores feed the bounded-heap
  *     [[graft.plans.TopKPerKey]] operator: each partition emits ≤ k
  *     rows per query before the final key shuffle — never a global
  *     sort, never the full score matrix.
  *
  * Two-tier exactness argument (spec-asserted equal to [[topKNaive]]):
  * terms split at df > commonDfShare·N. Phase A scores every doc on its
  * RARE query terms only (s_rare); B_q = Σ_{t ∈ q, common} w_t·tfmax_t
  * bounds what common terms can add to ANY doc; θ_q = k-th best s_rare.
  * Since scores only grow (w ≥ 0): the final k-th best ≥ θ_q, a doc with
  * s_rare + B_q < θ_q can never reach top-k, and a doc matching no rare
  * term tops out at B_q — so when B_q < θ_q strictly, only surviving
  * rare-matched candidates need their common-term completion, computed
  * by joining the candidates' OWN postings (small) instead of fanning
  * common postings across queries. Queries where the bound is not
  * conclusive (B_q ≥ θ_q, or fewer than k rare matches) fall back to the
  * one-tier probe — exact by construction, and rare because idf makes
  * common terms weigh little.
  */
object TfIdfSearch {

  /** Fixed-point scale: exact power of two (no rounding in the scale
    * multiply itself).
    */
  val Scale: Long = 1L << 20

  /** Terms in more than this share of corpus docs are "common": they are
    * bound-pruned, not fanned out per query. Any value is exact (the
    * bound logic is share-independent); the share only moves cost between
    * phase A (lower share → fewer rare terms to fan out, more queries at
    * risk of fallback) and the completion join.
    */
  val DefaultCommonDfShare: Double = 0.05

  /** Absolute df floor under which a term is never "common". At small
    * corpora a pure share cutoff classifies mid-frequency DISCRIMINATIVE
    * terms as common, inflating every query's bound until B_q ≥ θ_q and
    * the whole query set falls back; the floor pins "common" to
    * stopword-grade df there. Irrelevant at scale (share·N dominates).
    */
  val MinCommonDf: Long = 64L

  private def tok(textCol: String): Column =
    Decontaminate.wordTokens(col(textCol))

  /** Postings (term, doc_id, tf) — the single corpus shuffle. */
  private def buildPostings(corpus: DataFrame, textCol: String, idCol: String): DataFrame =
    corpus
      .select(col(idCol).cast(LongType).as("doc_id"),
        explode(tok(textCol)).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  private def finish(scored: DataFrame, k: Int): DataFrame =
    graft.plans.TopKPerKey.topK(scored, Seq("query_id"),
      Seq(graft.plans.TopKPerKey.Sort("score", descending = true),
        graft.plans.TopKPerKey.Sort("doc_id")), k)

  /** Query vocabularies at or under this size take the DENSE tier
    * ([[topKDense]]): small query vocab means the score matrix is cheap
    * per pair and — in the corpora where a small vocab arises (templated
    * or synthetic text) — dense enough that bound pruning cannot fire,
    * so the Q×N work is unavoidable and the win is doing it with ZERO
    * wide exchange. Large vocabs (real Zipfian text) take the two-tier
    * bound-pruned probe ([[topKTiered]]), which never materializes Q×N.
    */
  val DenseVocabMax: Long = 2048L

  /** Top-k corpus docs per query row. Queries carry (qidCol, textCol);
    * output: (query_id, doc_id, score) with score = Σ tf·w fixed-point
    * int64, ties broken by doc_id. Identical results to [[topKNaive]]
    * whichever strategy runs (spec-asserted); strategy choice is a COST
    * decision made from the query vocabulary size — one SMALL eager job
    * over the query set (contract: queries are the bounded side).
    */
  def topK(corpus: DataFrame, queries: DataFrame, textCol: String,
      idCol: String, qidCol: String, k: Int,
      commonDfShare: Double = DefaultCommonDfShare,
      minCommonDf: Long = MinCommonDf): DataFrame = {
    val vq = queries
      .select(explode(array_distinct(tok(textCol))).as("__t"))
      .agg(countDistinct(col("__t"))).head.getLong(0)
    if (vq <= DenseVocabMax)
      topKDense(corpus, queries, textCol, idCol, qidCol, k)
    else
      topKTiered(corpus, queries, textCol, idCol, qidCol, k,
        commonDfShare, minCommonDf)
  }

  /** Dense tier: vocab-indexed integer scoring in the [[Ann.bruteForceTopK]]
    * shape. Docs reduce to sorted (vocab-idx, tf) pair arrays over the
    * QUERY vocabulary; queries broadcast as sorted (vocab-idx, w) arrays;
    * each (doc, query) score is one codegen'd two-pointer merge
    * ([[graft.functions.VectorKernels.sparseDotLong]]); TopKPerKey's
    * partition-local heaps cut the score stream to ≤ k rows per query
    * BEFORE the only exchange. The Q×N score matrix is computed but never
    * shuffled, sorted, or hash-aggregated — on the 31-term bench corpus
    * this replaced a ~2·10⁹-row shuffle aggregate (SCALING.md §8).
    */
  def topKDense(corpus: DataFrame, queries: DataFrame, textCol: String,
      idCol: String, qidCol: String, k: Int): DataFrame = {
    val postings = buildPostings(corpus, textCol, idCol)
    val qTerms = queries
      .select(col(qidCol).cast(LongType).as("query_id"),
        explode(array_distinct(tok(textCol))).as("term"))
    val qVocab = qTerms.select("term").distinct()
    val n = corpus.select(count(lit(1)).as("__n"))
    val pruned = postings.join(broadcast(qVocab), Seq("term"))
    // (term → dense idx, w): ≤ DenseVocabMax rows, so the single-partition
    // ordering window is a bounded driver-scale sort, not a corpus one
    val stats = pruned.groupBy("term").agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(n))
      .withColumn("__w",
        floor(((col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5))) * lit(Scale.toDouble)).cast(LongType))
      .withColumn("__idx",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("term")) - 1).cast(IntegerType))
      .select("term", "__idx", "__w")
    val docVecs = pruned.join(broadcast(stats), Seq("term"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("__idx"), col("tf")))).as("__p"))
      .select(col("doc_id"),
        transform(col("__p"), p => p.getField("__idx")).as("__di"),
        transform(col("__p"), p => p.getField("tf")).as("__dt"))
    val qVecs = qTerms.join(broadcast(stats), Seq("term"))
      .groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("__idx"), col("__w")))).as("__p"))
      .select(col("query_id"),
        transform(col("__p"), p => p.getField("__idx")).as("__qi"),
        transform(col("__p"), p => p.getField("__w")).as("__qw"))
    val scored = docVecs.crossJoin(broadcast(qVecs))
      .select(col("query_id"), col("doc_id"),
        graft.functions.VectorExprs.sparseDotLong(
          col("__di"), col("__dt"), col("__qi"), col("__qw")).as("score"))
      // -1 sentinel = no shared term: that pair does not exist in the
      // inner-join semantics of the reference formulation
      .filter(col("score") >= 0)
    finish(scored, k)
  }

  /** Two-tier bound-pruned probe (see the object doc's exactness
    * argument). Identical results to [[topKNaive]] at every
    * commonDfShare (spec-asserted); the share is a COST knob.
    */
  def topKTiered(corpus: DataFrame, queries: DataFrame, textCol: String,
      idCol: String, qidCol: String, k: Int,
      commonDfShare: Double = DefaultCommonDfShare,
      minCommonDf: Long = MinCommonDf): DataFrame = {
    val postings = buildPostings(corpus, textCol, idCol)
    val qTerms = queries
      .select(col(qidCol).cast(LongType).as("query_id"),
        explode(array_distinct(tok(textCol))).as("term"))
    val qVocab = qTerms.select("term").distinct()
    val n = corpus.select(count(lit(1)).as("__n"))

    // postings pruned to query vocabulary — term-pruning cannot change
    // how many docs contain a surviving term, so df/tfmax read off the
    // pruned relation are exactly the full-corpus values
    val pruned = postings.join(broadcast(qVocab), Seq("term"))

    // per-term stats: query-vocab-sized → broadcastable by the same
    // contract that broadcasts the query terms themselves
    val stats = pruned.groupBy("term")
      .agg(count(lit(1)).as("__df"), max("tf").as("__tfmax"))
      .crossJoin(broadcast(n))
      .withColumn("__w",
        floor(((col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5))) * lit(Scale.toDouble)).cast(LongType))
      .withColumn("__common",
        col("__df") > greatest(col("__n") * lit(commonDfShare), lit(minCommonDf)))
      .withColumn("__u", col("__w") * col("__tfmax"))
      .select("term", "__w", "__common", "__u")

    val wPost = pruned.join(broadcast(stats), Seq("term"))

    // ---- phase A: rare-term fan-out (bounded by construction) ----
    val sRare = wPost.filter(!col("__common"))
      .join(broadcast(qTerms), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("tf") * col("__w")).as("__s_rare"))

    // per-query upper bound on what common terms can add to any doc
    val bounds = qTerms
      .join(broadcast(stats.filter(col("__common"))), Seq("term"))
      .groupBy("query_id").agg(sum(col("__u")).as("__bound"))

    // θ_q = k-th best rare score (min over the rare top-k rows)
    val theta = graft.plans.TopKPerKey.topK(sRare, Seq("query_id"),
        Seq(graft.plans.TopKPerKey.Sort("__s_rare", descending = true),
          graft.plans.TopKPerKey.Sort("doc_id")), k)
      .groupBy("query_id")
      .agg(min("__s_rare").as("__theta"), count(lit(1)).as("__cnt"))

    // classify queries: safe ⇔ k rare matches exist AND the common bound
    // is STRICTLY below θ (a tie could still enter top-k via the doc_id
    // tie-break, so equality is not safe)
    val qInfo = qTerms.select("query_id").distinct()
      .join(theta, Seq("query_id"), "left")
      .join(bounds, Seq("query_id"), "left")
      .withColumn("__bound", coalesce(col("__bound"), lit(0L)))
      .withColumn("__safe",
        col("__cnt").isNotNull && col("__cnt") === lit(k) &&
          col("__theta") > col("__bound"))
    val safeQ = qInfo.filter(col("__safe"))
      .select("query_id", "__theta", "__bound")
    val fallbackQ = qInfo.filter(!col("__safe")).select("query_id")

    // candidates: rare-matched docs that could still reach top-k
    // (≥ keeps bound-ties — a superset is exact, a subset would not be)
    val cand = sRare.join(broadcast(safeQ), Seq("query_id"))
      .filter(col("__s_rare") + col("__bound") >= col("__theta"))
      .select("query_id", "doc_id", "__s_rare")

    // ---- completion: common-term contribution of candidates only ----
    // join direction matters: candidates' own postings (|cand| × ~terms
    // per doc) — never common postings × queries (the 115× shape)
    val commonPost = wPost.filter(col("__common"))
      .select(col("term"), col("doc_id"), (col("tf") * col("__w")).as("__c"))
    val qtCommon = qTerms
      .join(broadcast(stats.filter(col("__common")).select("term")), Seq("term"))
    val sCommon = commonPost
      .join(cand.select("query_id", "doc_id"), Seq("doc_id"))
      .join(broadcast(qtCommon), Seq("query_id", "term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("__c")).as("__s_common"))
    val safeScored = cand
      .join(sCommon, Seq("query_id", "doc_id"), "left")
      .withColumn("score",
        col("__s_rare") + coalesce(col("__s_common"), lit(0L)))
      .select("query_id", "doc_id", "score")

    // ---- fallback: one-tier probe for the inconclusive queries ----
    val qtFall = qTerms.join(broadcast(fallbackQ), Seq("query_id"))
    val fallScored = wPost.join(broadcast(qtFall), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("tf") * col("__w")).as("score"))

    finish(safeScored, k).unionByName(finish(fallScored, k))
  }

  /** The one-tier reference formulation (what [[topK]] must equal —
    * SearchOpsSpec asserts row-for-row equality across commonDfShare
    * settings). Kept public as the executable spec of the semantics; it
    * fans every query term across the full posting list, which is
    * exactly quadratic when the query set grows with the corpus.
    */
  def topKNaive(corpus: DataFrame, queries: DataFrame, textCol: String,
      idCol: String, qidCol: String, k: Int): DataFrame = {
    val postings = buildPostings(corpus, textCol, idCol)
    val qTerms = queries
      .select(col(qidCol).cast(LongType).as("query_id"),
        explode(array_distinct(tok(textCol))).as("term"))
    val qVocab = qTerms.select("term").distinct()
    val n = corpus.select(count(lit(1)).as("__n"))
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
    finish(scored, k)
  }
}
