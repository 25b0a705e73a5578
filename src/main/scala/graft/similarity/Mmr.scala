package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance (MMR) — diversified top-k selection over
  * a retrieved candidate pool: pick k documents one at a time, each
  * maximizing λ·relevance − (1−λ)·max-similarity-to-already-picked.
  * The retrieval-quality step BETWEEN search and use: an ANN/BM25
  * top-100 is full of near-duplicates (by construction at 100 TB —
  * crawls repeat), and few-shot/RAG context windows want coverage, not
  * five copies of the best hit.
  *
  * All-integer: vectors arrive 2⁻¹⁶-quantized (the q110 discipline),
  * relevance and pairwise similarity are int64 dot products, and
  * λ = lamNum/lamDen clears to `lamNum·rel − (lamDen−lamNum)·maxSim`
  * — so selection, ties (by doc_id) and scores replay exactly in SQL
  * (q125 unrolls the k rounds as chained CTEs).
  *
  * Scale shape: the greedy is inherently sequential in k, so this is a
  * k-round driver loop — each round one narrow broadcast join
  * (candidates × the ≤ |Q|·k picked vectors so far), a (query, doc)
  * max-sim aggregation over ≤ |C|·k rows, and a top-1-per-query
  * bounded heap. CONTRACT: candidates are a per-query bounded pool
  * (the retrieval output, ~10²–10³ rows per query), not a corpus —
  * the corpus-sized work already happened in the retriever.
  */
object Mmr {

  /** Greedy-select `k` rows per query from `cands` (queryCol, idCol,
    * vecCol: array<long>, relCol: long). Returns (queryCol, rank,
    * doc_id, mmr_score) with rank 1..k in pick order; pools smaller
    * than k yield fewer rows.
    */
  def diversify(cands: DataFrame, queryCol: String, idCol: String,
      vecCol: String, relCol: String, k: Int,
      lamNum: Long, lamDen: Long): DataFrame = {
    require(k >= 1 && lamDen >= lamNum && lamNum >= 0)
    val spark = cands.sparkSession
    val penalty = lamDen - lamNum

    // INCREMENTAL max-sim: round t adds exactly one pick per query, and
    // max is associative, so each candidate needs ONE new dot product
    // per round — `__msim' = max(__msim, dot(v, newest pick))` — never a
    // (candidate × all-picked) re-aggregation. The running state
    // (pool minus taken docs, with __msim) is cached per round and the
    // previous round released after materialization (the Bpe.train
    // persist fold; the pool is retrieval-bounded by the operator's
    // contract, so the cache is small).
    var state = cands.select(
      col(queryCol).cast(LongType).as("query_id"),
      col(idCol).cast(LongType).as("doc_id"),
      col(vecCol).as("__v"), col(relCol).cast(LongType).as("__rel"))
      // null = "nothing picked yet": an empty selected set imposes NO
      // penalty, which a 0 start would get wrong for negative dots
      .withColumn("__msim", lit(null).cast(LongType))
      .persist()

    val pickSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("doc_id", LongType, nullable = false),
      StructField("__sv", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("rank", IntegerType, nullable = false),
      StructField("mmr_score", LongType, nullable = false)))
    var picked = Vector.empty[Row]

    var exhausted = false
    for (step <- 1 to k if !exhausted) {
      val scored = state.withColumn("__score",
        lit(lamNum) * col("__rel") -
          lit(penalty) * coalesce(col("__msim"), lit(0L)))
      val picks = graft.plans.TopKPerKey.topK(scored, Seq("query_id"),
          Seq(graft.plans.TopKPerKey.Sort("__score", descending = true),
            graft.plans.TopKPerKey.Sort("doc_id")), 1)
        .select("query_id", "doc_id", "__v", "__score").collect()
      if (picks.isEmpty) exhausted = true
      else {
        picked = picked ++ picks.map(r => Row(r.getLong(0), r.getLong(1),
          r.getSeq[Long](2), step, r.getLong(3)))
        if (step < k) {
          val newSel = spark.createDataFrame(
            spark.sparkContext.parallelize(picks.toSeq.map(r =>
              Row(r.getLong(0), r.getLong(1), r.getSeq[Long](2))), 1),
            StructType(pickSchema.fields.take(3)))
          val next = state
            .join(broadcast(newSel
              .select(col("query_id"), col("doc_id").as("__pd"), col("__sv"))),
              Seq("query_id"), "left")
            .filter(col("__pd").isNull || col("doc_id") =!= col("__pd"))
            .withColumn("__d", when(col("__sv").isNull, lit(null).cast(LongType))
              .otherwise(aggregate(zip_with(col("__v"), col("__sv"),
                (a, b) => a * b), lit(0L), (acc, v) => acc + v)))
            .withColumn("__msim", coalesce(
              greatest(col("__msim"), col("__d")), col("__msim"), col("__d")))
            .select("query_id", "doc_id", "__v", "__rel", "__msim")
            .persist()
          next.count() // materialize before dropping the parent cache
          state.unpersist()
          state = next
        }
      }
    }
    state.unpersist()
    spark.createDataFrame(spark.sparkContext.parallelize(picked, 1), pickSchema)
      .select(col("query_id"), col("rank"), col("doc_id"), col("mmr_score"))
  }
}
