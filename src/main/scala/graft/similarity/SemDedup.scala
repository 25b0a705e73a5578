package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication — the SemDeDup shape (Abbas et al. 2023,
  * arXiv:2303.09540): cluster unit-normalized embeddings with a k-means
  * coarse quantizer, then compare documents ONLY within a cluster and
  * drop every document that has a more-canonical (smaller-id) neighbor
  * with cosine ≥ `threshold`.
  *
  * Scale shape (100 TB): the only corpus-wide exchange is ONE shuffle on
  * the cluster id; the within-cluster self-join is bounded by the largest
  * cluster (≈ corpus / nClusters with k-means balance — at real scale the
  * corpus is written bucketed by `__cluster` and the join is co-located,
  * with an oversized-cluster cap applied the way the LSH tier caps
  * buckets). Centroid training reads a seeded uniform SAMPLE of the
  * vector column ([[Ann.ivfTrain]]), never the full corpus; assignment is
  * the narrow one-pass argmin kernel ([[Ann.ivfListId]]) — no crossJoin,
  * no per-row centroid shuffle.
  *
  * Unlike near-dup LSH (shingle overlap) this catches SEMANTIC
  * duplicates — rewordings with the same embedding direction — which
  * n-gram tiers are blind to. Cosine is computed on the normalized
  * vectors ([[Embeddings.l2Normalize]]): clustering and comparison see
  * the same geometry, so a duplicated direction cannot straddle clusters.
  */
object SemDedup {

  /** (dropped_id, kept_id) for every document SemDeDup removes; kept_id
    * is the smallest same-cluster id with cosine ≥ threshold (the
    * canonical survivor the duplicate collapses into). Documents that
    * survive do not appear. Join `dropped_id` back as an anti-join key to
    * materialize the deduplicated corpus.
    *
    * No cache: the self-join consumes the cluster assignment twice, but
    * both join inputs reduce to the SAME hashpartitioning(__cluster)
    * exchange over an identical scan → normalize → argmin subtree
    * (projection aliases canonicalize away), so Catalyst's ReuseExchange
    * computes the assignment once and replays the shuffle files for the
    * second side (pinned by PlanShapeSpec). The function therefore
    * leaves nothing in executor storage after the result materializes —
    * no caller-owned cache lifetime to forget.
    */
  def droppedDocs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int,
      threshold: Double,
      iterations: Int = 5,
      sampleRows: Int = 2000,
      seed: Long = 42L): DataFrame = {
    // Par.fanOut: normalize + the nClusters-way argmin assignment are
    // narrow and otherwise run on the scan's file partitions (1-2 tasks
    // at bench scale); no-op at 100 TB. Both self-join sides derive from
    // the same fanned-out subtree, so ReuseExchange still holds.
    val normed = graft.ops.Par.fanOut(corpus).select(
      col(idCol), Embeddings.l2Normalize(col(vecCol)).as("__nv"))
    val centroids = Ann.ivfTrain(normed, "__nv", nClusters, iterations,
      sampleRows, seed)
    // no persist: both self-join sides reduce to the same
    // hashpartitioning(__cluster) exchange — ReuseExchange computes the
    // assignment once (at scale the assignment is still the thing you'd
    // write out bucketed by cluster between jobs). The repartition makes
    // that exchange EXPLICIT: without it, AQE may broadcast one join
    // side, and a broadcast side has no exchange to reuse — the scan →
    // normalize → argmin subtree then runs twice (measured 2.8× on q73).
    // The partitioning also satisfies the join's requirement, so the
    // shuffle count stays at the documented one.
    val assigned = normed
      .withColumn("__cluster", Ann.ivfListId(col("__nv"), centroids))
      .repartition(col("__cluster"))
    val a = assigned.select(col("__cluster"),
      col(idCol).as("kept_id"), col("__nv").as("__va"))
    val b = assigned.select(col("__cluster"),
      col(idCol).as("dropped_id"), col("__nv").as("__vb"))
    a.join(b, Seq("__cluster"))
      .filter(col("kept_id") < col("dropped_id"))
      .filter(Ann.cosine(col("__va"), col("__vb")) >= threshold)
      .groupBy("dropped_id")
      .agg(min("kept_id").as("kept_id"))
      .select("dropped_id", "kept_id")
  }

  /** Semantic DECONTAMINATION: flag every training document whose
    * embedding direction appears in the benchmark set at cosine ≥
    * threshold — the embedding-space complement of the n-gram overlap
    * tier ([[graft.text.Decontaminate]]), catching paraphrases that
    * share no surface n-grams. Same cluster-pruned shape as
    * [[droppedDocs]]: centroids train on the benchmark side (small),
    * BOTH relations assign with the same centroid table (identical
    * directions can't straddle), and comparison happens within a
    * cluster only. Output: (train_id, bench_id, one row per flagged
    * training doc with its closest-qualifying benchmark id = min id).
    */
  def crossFlagged(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int,
      threshold: Double,
      iterations: Int = 5,
      sampleRows: Int = 2000,
      seed: Long = 42L): DataFrame = {
    val bNorm = bench.select(
      col(idCol).as("bench_id"), Embeddings.l2Normalize(col(vecCol)).as("__bv"))
    val centroids = Ann.ivfTrain(bNorm, "__bv", nClusters, iterations,
      sampleRows, seed)
    val b = bNorm.withColumn("__cluster", Ann.ivfListId(col("__bv"), centroids))
    // Par.fanOut on the TRAIN side ([[droppedDocs]]'s round-13 fix,
    // extended here in round 14): normalize + argmin + the within-cluster
    // cosine probe are narrow and otherwise run on the scan's file
    // partitions (1-2 tasks at bench scale, where the bench side
    // broadcasts); no-op at 100 TB where file splits provide parallelism.
    val t = graft.ops.Par.fanOut(train).select(
      col(idCol).as("train_id"), Embeddings.l2Normalize(col(vecCol)).as("__tv"))
      .withColumn("__cluster", Ann.ivfListId(col("__tv"), centroids))
    t.join(b, Seq("__cluster"))
      .filter(Ann.cosine(col("__tv"), col("__bv")) >= threshold)
      .groupBy("train_id")
      .agg(min("bench_id").as("bench_id"))
      .select("train_id", "bench_id")
  }

  /** The deduplicated corpus: drop every [[droppedDocs]] row via an
    * anti-join on the dropped-id set (ids only cross the shuffle; AQE
    * broadcasts the side that turns out small — at aggressive thresholds
    * the dropped set can be a large corpus fraction, so it is not forced).
    */
  def dedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int,
      threshold: Double,
      iterations: Int = 5,
      sampleRows: Int = 2000,
      seed: Long = 42L): DataFrame = {
    val dropped = droppedDocs(corpus, idCol, vecCol, nClusters, threshold,
      iterations, sampleRows, seed)
      .select(col("dropped_id").as(idCol))
    corpus.join(dropped, Seq(idCol), "left_anti")
  }
}
