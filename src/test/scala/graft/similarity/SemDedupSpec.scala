package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embeddings =
    spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")

  private def withScaledCopies = {
    def scaled(offset: Int, f: Float) = embeddings.select(
      ($"vec_id" + offset).as("vec_id"),
      transform($"embedding", v => v * lit(f)).as("embedding"))
    embeddings.unionByName(scaled(100000, 2.0f)).unionByName(scaled(200000, 0.5f))
  }

  test("droppedDocs removes every planted rescaled copy, keeps originals") {
    val ids = embeddings.select("vec_id").as[Long].collect().toSet
    val dropped = SemDedup.droppedDocs(withScaledCopies, "vec_id", "embedding",
      nClusters = 8, threshold = 0.98).collect()
    val droppedIds = dropped.map(_.getAs[Long]("dropped_id")).toSet
    assert(droppedIds == ids.map(_ + 100000) ++ ids.map(_ + 200000),
      "exactly the planted copies must be dropped")
    // survivor election: the smallest similar id, i.e. the original
    dropped.foreach { r =>
      assert(r.getAs[Long]("kept_id") == r.getAs[Long]("dropped_id") % 100000)
    }
  }

  test("no false positives on the raw corpus (no pair reaches 0.98)") {
    assert(SemDedup.droppedDocs(embeddings, "vec_id", "embedding",
      nClusters = 8, threshold = 0.98).isEmpty)
  }

  test("dedup materializes the surviving corpus") {
    val n = embeddings.count()
    val out = SemDedup.dedup(withScaledCopies, "vec_id", "embedding",
      nClusters = 8, threshold = 0.98)
    assert(out.count() == n)
    assert(out.agg(max("vec_id")).as[Long].head() < 100000)
  }

  test("crossFlagged: exactly the planted cross-relation matches") {
    val bench = embeddings.filter($"vec_id" % 4 === 0).select(
      ($"vec_id" + 5000).as("vec_id"),
      transform($"embedding", v => v * lit(2.0f)).as("embedding"))
    val flagged = SemDedup.crossFlagged(embeddings, bench, "vec_id",
      "embedding", nClusters = 8, threshold = 0.98)
      .collect().map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("bench_id")))
    val expect = embeddings.filter($"vec_id" % 4 === 0)
      .select("vec_id").as[Long].collect().map(id => (id, id + 5000))
    assert(flagged.sorted.toSeq == expect.sorted.toSeq)
  }

  test("droppedDocs / dedup / crossFlagged leave no blocks in executor storage") {
    // the functions persist nothing internally — the self-join sides
    // share one exchange (ReuseExchange) — so a long-running session
    // composing them repeatedly cannot accumulate cached partitions.
    // Delta assertion, not global-empty: suites share one session and
    // Bpe.train's CONTRACT is to return its final corpus cached, so an
    // earlier BpeSpec legitimately leaves blocks behind.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    SemDedup.droppedDocs(withScaledCopies, "vec_id", "embedding",
      nClusters = 8, threshold = 0.98).count()
    SemDedup.dedup(withScaledCopies, "vec_id", "embedding",
      nClusters = 8, threshold = 0.98).count()
    val bench = embeddings.limit(50)
    SemDedup.crossFlagged(embeddings, bench, "vec_id", "embedding",
      nClusters = 4, threshold = 0.98).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"SemDedup left persisted RDDs behind after results materialized: $leaked")
  }

  test("identical directions never straddle clusters (normalized assign)") {
    // the scaled copies must land in the original's cluster: normalization
    // of a ×2^n copy is bit-identical, so argmin ties break identically
    val normed = withScaledCopies.select($"vec_id",
      Embeddings.l2Normalize($"embedding").as("__nv"))
    val cents = Ann.ivfTrain(normed, "__nv", nLists = 8, iterations = 3,
      sampleRows = 500)
    val assigned = normed
      .select($"vec_id", Ann.ivfListId($"__nv", cents).as("c"))
      .withColumn("orig", $"vec_id" % 100000)
    assert(assigned.groupBy("orig").agg(countDistinct("c").as("nc"))
      .filter($"nc" > 1).isEmpty)
  }
}
