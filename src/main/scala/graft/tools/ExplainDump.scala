package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for the headline queries into
  * PLANS.md — the plan-shape audit trail (pushdown, broadcast, partial
  * agg, custom operators). Regenerate after plan-affecting changes:
  *   sbt "runMain graft.tools.ExplainDump"
  */
object ExplainDump {

  private val Headline = Seq(
    "q1_agg" -> "partial/final HashAggregate pair; decimal sums",
    "q2_filter_project" -> "PushedFilters + pruned ReadSchema at the parquet scan",
    "q3_join" -> "fact pre-agg before join; broadcast dims; COUNT(*) not COUNT(DISTINCT)",
    "q32_minhash_pairs" -> "codegen'd shingle+OPH sig; single-shuffle bounded-collect candidates",
    "q40_ann_brute" -> "TopKPerKeyPartial under Exchange under TopKPerKey; tiny rank Window after",
    "q42_ann_topk_heap" -> "custom physical operator path end-to-end",
    "q36_incremental_dedup" -> "index probe (no full-corpus re-hash) → est-sim prefilter → exact-Jaccard verify on candidates only",
    "q43_ann_ivf" -> "narrow NearestCentroid assignment; broadcast probe join",
    "q44_salted_join" -> "hot-key-only salting: detected-hot slice salted+replicated, cold slice plain join, union",
    "q5_window" -> "TopKViaWindowRewrite: declarative row_number<=k runs through the heap operator",
    "q26_curation" -> "composed curation pipeline: quality gate → redact → fingerprint dedup → tokens",
    "q48_decontaminate" -> "two-tier benchmark overlap: broadcast hash semi-join, string verify on survivors only",
    "q49_domain_cap" -> "per-source cap via TopKPerKeyPartial/final bounded heaps, no window sort",
    "q52_vocab" -> "wordcount shape: partial agg under Exchange; TakeOrderedAndProject top-100, no global sort",
    "q53_funnel_join" -> "interval join as equi-join on user_id + range post-filter, no range cross-product",
    "q54_training_mix" -> "full curation mix in 3 shuffles: narrow gate+sample, broadcast decontaminate, fp-dedup + cap exchanges only",
    "q72_asof_join" -> "as-of join as tagged union + last-over-window: one key shuffle, no range explosion",
    "q56_boilerplate" -> "hash-only line-frequency shuffle; exact hot-line recount on candidates; broadcast anti-join + one doc-keyed reassembly",
    "q57_bloom_decontaminate" -> "tier 1 is a NARROW bloom might_contain filter (no join/broadcast); exact string verify on survivors",
    "q58_token_budget" -> "no corpus window: (stratum,bucket) histogram exchange only; narrow broadcast cutoff filter; window on cutoff bucket rows alone",
    "q59_unigram_lm" -> "one corpus tf shuffle (exchange reused by the vocab agg); vocab broadcasts back; final doc agg",
    "q62_sparse_cosine" -> "inverted-index all-pairs cosine: df-pruned postings self-join on term; only (term,id,tf) shuffles; integer dot/norms",
    "q73_semdedup" -> "SemDeDup: narrow NearestCentroid assignment, ONE cluster-id shuffle for the within-cluster pair join, keep-min agg",
    "q74_zorder" -> "Morton2 stays inside WholeStageCodegen; one range exchange on the z key",
    "q76_dsir" -> "bucket-histogram exchange (tiny) broadcasts back; per-doc sum is the only corpus shuffle",
    "q78_stream_dedup" -> "fingerprint anti via left-outer + IS NULL; index side broadcast, stream side never shuffles",
    "q89_bpe_step" -> "one pair-count shuffle; the greedy rewrite is the codegen'd bpe_merge kernel in a narrow map stage",
    "q85_url_canonical" -> "sort-early: range exchange samples only the cheap concat child; URL-parse kernel runs ONCE, post-shuffle",
    "q96_bucketed_join" -> "zero-Exchange scan → sort-merge join → agg: bucket distribution satisfies join AND groupBy",
    "q97_pagerank" -> "three join+agg rounds; only (dst, contribution) pairs cross each exchange",
    "q98_kneser_ney" -> "wordcount family: one bigram shuffle, then aggs of the reduced relation; scalar total broadcasts",
    "q100_paragraph_dedup" -> "para-hash-partitioned window (fixed-width key) + one doc-keyed reassembly; no global window",
    "q101_bpe_encode" -> "narrow tokenize: bpe_encode kernel with the merge table as one reference object; the only exchange is the output sort",
    "q102_perplexity_gate" -> "model join keyed (v,w) over per-doc DISTINCT bigrams; integer log2fix surprisal; doc rollup",
    "q103_hard_negatives" -> "label filter + dup ceiling BEFORE TopKPerKey bounded heaps; queries broadcast",
    "q105_profile" -> "one scan, one Expand for all-column exact distincts; no per-column scan union",
    "q107_range_join" -> "interval join as equi-join on (user, bucket) + range post-filter; no nested loop",
    "q113_nb_classifier" -> "NB scoring: (doc,w) tf shuffle + distributed (w,y) model join; only the |Y|-row class table broadcasts; integer argmin finish",
    "q114_kmv_distinct" -> "partial_kmv_sketch ObjectHashAggregate pair: O(k) sketches are the only agg state crossing the group exchange",
    "q115_span_corrupt" -> "denoising-pair construction as a narrow map: per-block hash flags + one-pass span_corrupt kernel, no explode, no window, no shuffle before the output sort",
    "q116_stream_distinct" -> "windowed KMV: sketch-state aggregation (streaming-shaped), exact counts in a SEPARATE aggregation joined on the window key",
    "q117_multi_scrub" -> "Aho-Corasick multi_replace as one narrow codegen projection; blocklist rides as a reference object",
    "q118_quantile_sketch" -> "log-histogram quantiles: one (key, bucket) count shuffle, bounded per-key summary, window walk over <=496 rows/key",
    "q120_bm25_search" -> "BM25: one postings shuffle (dl rides the group key), scalar (N,tot) broadcast, query side broadcast, TopKPerKey finish",
    "q122_cms_frequency" -> "count-min: map-side-combined (depth,bucket) build, merge = re-aggregation, probe broadcast-joins the bounded sketch",
    "q123_unigram_encode" -> "narrow Viterbi tokenize: unigram_encode kernel with the vocab as one reference object; only exchange is the output sort",
    "q124_pq_codes" -> "PQ integer twin: narrow quantize+argmin codes, literal ADC table lookups, no exchange before the output sort",
    "q126_entropy_gate" -> "char_entropy_fix as one narrow codegen scan; histogram never leaves the row; only exchange is the output sort",
    "q127_bitext_mine" -> "forward scan broadcasts the batch into TopKPerKey heaps; backward k-NN and final assembly broadcast batch-bounded relations; corpus never reshuffles",
    "q128_edit_verify" -> "blocking equi-join on (source,prefix,bucket) with only ids+prefixes in the exchange; lev_bounded kernel on candidate texts fetched after",
    "q129_temperature_mix" -> "corpus work is one token-count aggregation; log2fix∘pow2_neg_fix waterline on the per-language relation",
    "q130_stream_neardup" -> "LSH index probe + candidate-only exact verify; arriving batch never re-hashes the corpus",
    "q131_chat_render" -> "in-row render + span arithmetic, no explode, no shuffle before the output sort",
    "q132_wordpiece_encode" -> "narrow greedy tokenize: wordpiece_encode kernel with the vocab as one reference object; only exchange is the output sort",
    "q133_sft_pipeline" -> "gate+render+count in one narrow stage; the packer's bounded histogram exchange is the only corpus shuffle",
    "q137_stream_trending" -> "MG summaries are the only aggregation state crossing the window exchange",
    "q141_triangles" -> "node-ordered triangle join: two id-keyed equi-joins, no dedup pass",
    "q142_label_prop" -> "per-round neighbor join + count; degree-bounded tie windows; labels stay (id, long)",
    "q143_repetition_gate" -> "repetition_profile: nine Gopher signals in one codegen'd narrow pass; only exchange is the output sort",
    "q144_train_shuffle" -> "seeded md5 permutation: narrow key projection, one shard-keyed exchange, per-shard rank windows — no global window",
    "q145_block_spans" -> "two-tier stream offset (bucket histogram + per-bucket window) + bounded per-row block explode; no corpus-wide window",
    "q146_curriculum" -> "exact rank with no corpus window: value-histogram prefix broadcasts back; tie windows partition by value",
    "q147_layout_pipeline" -> "spec-interpreted gate→filter→bucket→shuffle composes into one plan: narrow gate fused with the scan, two broadcast joins, shard/value-partitioned windows only",
    "q148_jsonl_shards" -> "JSONL export manifest: read-back scan → narrow from_json → map-side-combined shard aggregation; no second corpus shuffle",
    "q149_corpus_overlap" -> "one hash-keyed shuffle to per-shingle side flags; min-k estimator tier is a 256-row TakeOrdered, never a second corpus exchange",
    "q150_winnow_pairs" -> "winnow_hash64 narrow kernel → df-pruned inverted index → fingerprint equi-join; 8-byte fingerprints and ids are all that shuffles",
    "q151_sorted_neighborhood" -> "exact-rank sort with no corpus window (histogram base broadcast, per-key tie windows); window pairs by rank+j equi-join, never a range join",
    "q152_profile_merge" -> "three single-Expand profile scans; the merge itself is |cols|-row artifact algebra, kmv_union state crossing nothing wider than a 5-row group",
    "q153_fellegi_sunter" -> "u-stats are one Expand into two map-side-combined counting shuffles ending 4 rows; weights broadcast onto id-equi-joined candidate pairs; scoring narrow",
    "q154_golden_record" -> "one cluster-keyed shuffle; every field pick is a partial-aggregable max(struct), so members combine map-side and never collect",
    "q155_incremental_cc" -> "relabel runs over label-edges + delta only (|corpus| rows, diameter ~2 -> 1-2 rounds); history's pair set never re-mined or re-shuffled",
    "q156_incremental_index" -> "history postings arrive as a parquet scan (never re-tokenized); delta indexes alone; scalar merge is 2-row algebra; scoring rides the q120 probe",
    "q157_cube" -> "one Expand + map-side-combined aggregation builds all 8 grouping combos in a single scan and shuffle",
    "q158_asof_forward" -> "tagged union, ONE key shuffle; the flipped [current, following] frame replaces the qualifying-join row explosion",
    "q159_time_spine" -> "spine generated per key (sequence+explode fan-out = output rows) + one (key,bucket) equi-join; no calendar table, no cross join",
    "q160_psi_drift" -> "two map-side-combined histogram aggs; quantization, the exact log, and the total-sum window all run on the |buckets| relation",
    "q161_integrity_audit" -> "LEFT ANTI against the parent's distinct key column (keys only cross the wire); dup audit is one counting aggregate",
    "q162_transitions" -> "one user-key shuffle for the lead window; probabilities divide the 25-row count matrix via broadcast totals",
    "q163_incremental_lm" -> "history counts arrive as a parquet scan (never re-tokenized); delta counts alone; merge is one (v,w) shuffle over vocab-sized relations; model derivation reuses q98's three reduced-relation aggs",
    "q164_hll_distinct" -> "registers are plain groupBy(flag,bucket).max partials (map-side combined, <=512 rows/group cross the wire); merge is an idempotent max over register relations; estimator runs on the 3-row aggregate",
    "q165_phrase_search" -> "rare-first: candidates from the lowest-df term only; verify probes match at most one posting on (term,doc,pos) — hot terms cause no fan-out; phrase terms broadcast onto term-keyed postings (corpus never re-partitions per query); anchor counting is a map-side-combined agg keyed by (query,doc,anchor)",
    "q166_link_predict" -> "one z-keyed wedge shuffle; degree cap drops hub intermediates BEFORE the join; (a,b) aggregation partial; anti-join against the edge set ends the plan",
    "q167_scd2_history" -> "lag change-points, lead interval-close, and version numbering share ONE user-keyed Exchange (PlanShapeSpec pins exchanges == 1); no history self-join",
    "q168_cusum_shift" -> "CUSUM recursion rewritten as cumsum-minus-running-min: baseline window + 2 cumsums + 2 running mins all ride ONE event_type exchange; spine densification upstream is the q159 shape",
    "q169_containment" -> "inverted gram index is the one corpus shuffle; df>cap grams leave index AND denominators together (per-gram fan-out <= cap^2); pair counting map-side combined; both directions derive from one a<b count",
    "q170_stratified_sample" -> "Hamilton apportionment runs on the <=|strata| count relation (unpartitioned windows are deliberate there) and broadcasts back; membership rides TopKPerKey bounded heaps at k = max alloc — no corpus sort window",
    "q171_robust_outliers" -> "window-lift single pass: median and MAD lifted onto rows as whole-partition window aggregates — ONE key exchange, two in-partition sorts, zero joins, input executed once (was 3 executions + 2 joins; 26.1 s -> 7.8 s at sf1); 100 TB swap is the q118 sketch with the same cross-multiplied fences",
    "q172_woe_iv" -> "one map-side-combined (bin -> good/bad) aggregation; everything after runs on the <=|bins| relation (unpartitioned totals deliberate); every floor division on non-negative operands so div and // agree",
    "q173_path_mining" -> "sessionize + trigram leads all ride ONE user-keyed exchange (lead(session)==session guard replaces a (user,session) re-window); path count + exact user support partial map-side into one path-keyed exchange",
    "q174_assoc_rules" -> "A-priori item prune BEFORE the basket-keyed pair self-join bounds fan-out at C(k_freq,2); pair counts map-side combined; basket total is a broadcast 1-row aggregate, never a window",
    "q175_funnel" -> "all k running maxima share one user-keyed window spec (one exchange, one sort); corpus collapses to per-user flags map-side; ratio windows run on the |steps|-row relation",
    "q176_bfs_hops" -> "per round one frontier-keyed equi-join + one anti-join, only (id,hop) pairs cross exchanges; localCheckpoint truncates iterative lineage; early exit on frontier drain",
    "q177_hybrid_rrf" -> "fusion never sees the corpus: both retriever outputs are per-query bounded, one map-side-combined (query,doc) exchange, per-query window over <= lists*k rows",
    "q178_ks_drift" -> "corpus collapses map-side into one (key,value) histogram exchange; CDF window runs on the grid-bounded histogram, never the corpus; per-key max combines map-side",
    "q179_kcore" -> "per round: one map-side-combined degree count + two semi-joins on a shrinking edge list; only (id,cnt) pairs cross exchanges; localCheckpoint truncates lineage; early exit at the fixpoint",
    "q180_rfm_segments" -> "one map-side-combined per-customer aggregation is the only corpus exchange; the three ntile windows run on the collapsed |customers| relation (PB-scale swap: q118 sketch cutoffs)",
    "q181_ols_trend" -> "regression from five map-side-combinable sums: points never co-locate or sort; one aggregation exchange, narrow fixed-point arithmetic on the per-group relation",
    "q182_decayed_score" -> "narrow codegen pow2 weight projection (no shuffle) + one wordcount-shaped map-side-combined aggregation; scores mergeable at a common reference",
    "q183_winsor_mean" -> "one key sort window (rank+count share the spec), broadcast-back of the <=|groups| fence relation, one map-side-combined aggregation; PB swap = q118 sketch fences",
    "q184_benford" -> "one map-side-combined (key,digit) count is the only corpus touch; 9-row spine + rollup on the <=9*|keys| relation; expected shares are shared literals, no runtime log",
    "q185_streaks" -> "one user-keyed exchange carries distinct + island numbering + both rollups; only (user,day) pairs shuffle",
    "q186_funnel_outer" -> "equi-join on user_id + range post-filter (no range cross-product), left-outer; streaming twin bounds state by the two-sided time window",
    "q187_personalized_pr" -> "q97's per-round shape with a seeded restart vector; only (dst, contribution) pairs cross each round's exchange",
    "q188_quantile_norm" -> "one sort window per side + a 1:1 equi-join on (keys, target rank); the <=|keys| size relation broadcasts; PB swap = histogram cutoffs",
    "q189_chunking" -> "pure narrow: scan -> tokenize -> bounded explode -> slice; zero shuffle before the output sort; chunks at scan throughput",
    "q190_luhn_cards" -> "Luhn as codegen'd transform+aggregate builtins (no UDF); narrow scalar pass, zero shuffle before the output sort",
    "q191_templates" -> "LCP(set) = LCP(min, max): one map-side-combined min/max exchange collapses the corpus; the LCP itself touches two strings per cluster",
    "q192_rendezvous" -> "completely narrow: literal shard list, per-row md5 weights, argmax+tiebreak in one long max; no explode, no join, no shuffle - assignment is a map stage",
    "q193_twap" -> "one key-window exchange (lead) + one map-side-combined aggregation; holding intervals computed in-plan, scalar end broadcast",
    "q194_session_rules" -> "sessionizer + A-priori compose into one plan: user window exchange, then the basket-keyed pair join with the item prune ahead of it",
    "q195_percentile_rank" -> "one key sort window; rank and count share the spec; RANK (not row_number) keeps duplicate values identical with no tiebreak",
    "q196_inventory" -> "the CUSUM closed form reused: cumsum + running min ride one part-keyed exchange; no recursion, no UDF",
    "q197_orc_roundtrip" -> "write zlib ORC, vectorized read; one fingerprint aggregation after the scan — the round trip must be invisible to it",
    "q198_compaction_plan" -> "metadata-only: per-key sort window + prefix sum; closed-form bin = start-offset div target; no mutable bin state",
    "q199_next_event" -> "the rank window runs on the <=|types|^2 matrix relation, never the events; one user-keyed lead exchange upstream (q162's)",
    "q200_iban_audit" -> "mod-97 as a DECIMAL(38,0) modulo of the transliterated digit string: one narrow codegen projection, zero shuffles before the output sort",
    "q201_zipf_slope" -> "one corpus wordcount exchange; rank window + fixed-point log-log OLS run on the <=256*|langs| relation",
    "q202_seasonal_outliers" -> "one corpus-collapsing (type, day) count; the q171 window-lift median/MAD screen runs on the |types|*7-keyed daily relation",
    "q203_l_diversity" -> "one map-side-combined (cell, value) count touches the corpus; l/modal-share rollup runs on the <=|cells|*|values| relation",
    "q204_token_fertility" -> "narrow codegen'd BPE encode (merge table as reference object) + one language-keyed aggregation; the fixed-point ratio divides on the |langs| relation",
    "q205_perplexity_buckets" -> "q102's fixed-point KN surprisal verbatim; tercile = closed-form rank algebra under a lang-partitioned sort window (100 TB swap: q118 histogram cutoffs, q180 note)",
    "q206_video_scene_dedup" -> "narrow frame explode -> per-frame pHash BEFORE any wide op (blobs never shuffle); lag window + scene/video rollups ride ONE video exchange; dup grouping keys the 16-byte sequence fingerprint",
    "q207_voice_activity" -> "decode happens in the same narrow stage that emits (id, widx, energy) — audio bytes never reach an exchange; VAD islands + rollup + ratio ride ONE id exchange",
    "q208_doremi_step" -> "corpus collapses in q102's model pass + one source aggregation; the EG update (exact bit-factor 2^m) runs on the |sources| relation; scalar ref/denominator broadcast")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.install(spark)
    val dir = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of the headline queries\n\n")
    sb.append("Generated by `sbt \"runMain graft.tools.ExplainDump\"` at sf0.001\n")
    sb.append("with GraftExtensions installed. What to look for per query is\n")
    sb.append("noted above each plan; PlanShapeSpec asserts these properties in CI.\n")
    Headline.foreach { case (name, note) =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n*$note*\n\n```\n$plan```\n")
    }
    Files.write(Paths.get("PLANS.md"), sb.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    println(s"[explain] wrote PLANS.md (${Headline.size} plans)")
    spark.stop()
  }
}
