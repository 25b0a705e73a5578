package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based parallel-pair mining (Artetxe & Schwenk, ACL'19 — the
  * CCMatrix/LASER recipe): align a batch of "source-language" vectors
  * against a "target-language" corpus by RELATIVE similarity. Absolute
  * cosine thresholds fail at web scale (hubness: some vectors are close
  * to everything), so each candidate pair (x, y) is scored by its
  * margin over the local neighborhood density:
  *
  *   margin(x, y) = dot(x, y) / ((avgₖNN(x→tgt) + avgₖNN(y→src)) / 2)
  *
  * and kept when margin ≥ τ. All-integer on 2⁻¹⁶-quantized vectors
  * (the q110 discipline): dots are int64, the k-NN averages stay as
  * SUMS, and the ratio test clears to one cross-multiplied compare —
  * `2k·1000·dot ≥ τ_milli·(snn_src + snn_tgt)` — so pairs, ties and
  * keep flags replay exactly in SQL (q127).
  *
  * Scale shape: the corpus-sized work is ONE broadcast-batch linear
  * scan over `tgt` (the q40/q103 shape) finished by TopKPerKey bounded
  * heaps — only (src_id, tgt_id, dot) triples ever aggregate, vectors
  * never shuffle. The backward k-NN runs on the best-target set joined
  * against the batch: both sides bounded by the batch's size. CONTRACT:
  * `src` is the mining batch (a crawl increment / shard, ~10²–10⁴
  * rows, broadcastable); `tgt` is the corpus. At 100 TB you shard the
  * batch dimension and put the IVF/PQ tier (q43/q124) in front of the
  * forward scan; the margin arithmetic is unchanged.
  */
object Bitext {

  /** Mine the best target pair for every source vector in the batch.
    *
    * `src`/`tgt`: (idCol, vecCol: array<long>) — quantized integer
    * vectors, ids disjoint across the two relations. Returns one row
    * per src id: (src_id, tgt_id, dot, snn_src, snn_tgt, keep) where
    * snn_* are the k-NN dot SUMS the margin denominator uses and
    * keep = [2k·1000·dot ≥ tauMilli·(snn_src+snn_tgt)]. Ties break on
    * smaller id at every rank, so output is partitioning-invariant.
    *
    * Overflow bound: unit vectors quantized at 2¹⁶ give |dot| ≤ d·2³²
    * (≤ 2³⁸ at d = 64); the compare's sides stay ≤ 2k·1000·2³⁸ < 2⁵².
    */
  def minePairs(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int, tauMilli: Long): DataFrame = {
    require(k >= 1 && tauMilli >= 0)
    val dot = (a: String, b: String) =>
      aggregate(zip_with(col(a), col(b), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)

    val s = broadcast(src.select(col(idCol).cast("long").as("src_id"),
      col(vecCol).as("__sv")))
    val t = graft.ops.Par.fanOut(tgt)
      .select(col(idCol).cast("long").as("tgt_id"), col(vecCol).as("__tv"))

    // forward: one linear corpus scan; only id-pair + dot triples reach
    // the bounded heaps (k rows per src survive)
    val fwd = t.crossJoin(s)
      .select(col("src_id"), col("tgt_id"), dot("__sv", "__tv").as("d"))
    val fwdK = graft.plans.TopKPerKey.topK(fwd, Seq("src_id"),
      Seq(graft.plans.TopKPerKey.Sort("d", descending = true),
        graft.plans.TopKPerKey.Sort("tgt_id")), k)

    // pair = rank-1 of the k-NN list; denominator sum = the whole list.
    // The window runs over ≤ |batch|·k rows — batch-bounded by contract.
    val w = Window.partitionBy("src_id").orderBy(col("d").desc, col("tgt_id"))
    val ws = Window.partitionBy("src_id")
    val fwdAgg = fwdK
      .withColumn("__rn", row_number().over(w))
      .withColumn("snn_src", sum("d").over(ws))
      .filter(col("__rn") === 1)
      .select(col("src_id"), col("tgt_id"), col("d").as("dot"), col("snn_src"))

    // backward: the distinct best-target set (≤ |batch| rows) re-fetches
    // its vectors, then k-NN into the batch — bounded × bounded. The id
    // set broadcasts so the corpus streams through a hash probe instead
    // of reshuffling on tgt_id.
    val best = t.join(broadcast(fwdAgg.select(col("tgt_id")).distinct()),
      Seq("tgt_id"))
    val bwd = best.crossJoin(s)
      .select(col("tgt_id"), col("src_id").as("__s2"),
        dot("__sv", "__tv").as("d2"))
    val bwdK = graft.plans.TopKPerKey.topK(bwd, Seq("tgt_id"),
      Seq(graft.plans.TopKPerKey.Sort("d2", descending = true),
        graft.plans.TopKPerKey.Sort("__s2")), k)
    val bwdAgg = bwdK.groupBy("tgt_id").agg(sum("d2").as("snn_tgt"))

    // batch-bounded ⋈ batch-bounded: broadcast rather than letting the
    // planner sort-merge two relations that fit in one task
    fwdAgg.join(broadcast(bwdAgg), Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"), col("dot"),
        col("snn_src"), col("snn_tgt"),
        (lit(2L * k * 1000L) * col("dot") >=
          lit(tauMilli) * (col("snn_src") + col("snn_tgt")))
          .cast("int").as("keep"))
  }
}
