package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embeddings =
    spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")

  test("cosine of a vector with its scaled copy is 1") {
    val df = embeddings.limit(5)
      .select(Ann.cosine($"embedding", transform($"embedding", v => v * 3.0f)).as("c"))
    df.collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("bruteForceTopK returns k ranked neighbors per query") {
    val q = embeddings.filter($"vec_id" < 5)
    val out = Ann.bruteForceTopK(embeddings, q, "vec_id", "embedding", k = 4)
    val byQuery = out.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 5)
    byQuery.values.foreach { rows =>
      assert(rows.length == 4)
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("srpTopK recall vs exact baseline is reasonable") {
    val q = embeddings.filter($"vec_id" < 20)
    val exact = Ann.bruteForceTopK(embeddings, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Ann.srpTopK(embeddings, q, "vec_id", "embedding", dim = 64, k = 3, nBits = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"SRP recall $recall too low") // multi-probe 1-bit, 8 planes
  }

  test("ivfAssign gives every row a list and respects nLists bound") {
    val out = Ann.ivfAssign(embeddings.limit(200), "vec_id", "embedding", nLists = 4)
    assert(out.count() == 200)
    val lists = out.select("list_id").distinct().collect().map(_.getInt(0)).toSet
    assert(lists.nonEmpty && lists.size <= 4)
  }

  test("ivfAssign plan is narrow: no joins, no exchanges") {
    val out = Ann.ivfAssign(embeddings.limit(200), "vec_id", "embedding", nLists = 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
  }

  test("ivfTopK recall vs exact baseline is reasonable") {
    val q = embeddings.filter($"vec_id" < 20)
    val exact = Ann.bruteForceTopK(embeddings, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Ann.ivfTopK(embeddings, q, "vec_id", "embedding", k = 3,
      nLists = 8, nprobe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall too low")
  }

  test("ivfTrain samples uniformly: centroids span a CLUSTER-SORTED corpus") {
    // corpus sorted so that all of cluster A precedes cluster B: a
    // first-rows "sample" would only ever see cluster A and leave B
    // without any nearby centroid. 400 rows per cluster, sampleRows=100
    // ⪡ 800, so a biased sampler cannot pass.
    val mk = (base: Float, from: Int, n: Int) => (from until from + n).map { i =>
      (i.toLong, Array.tabulate(8)(d => base + (i % 7) * 0.01f + d * 0.001f))
    }
    val sorted = (mk(10f, 0, 400) ++ mk(-10f, 400, 400))
      .toDF("vec_id", "embedding")
      .coalesce(1).sortWithinPartitions("vec_id")
    val centroids = Ann.ivfTrain(sorted, "embedding", nLists = 4,
      iterations = 5, sampleRows = 100)
    val nearA = centroids.count(c => math.abs(c(0) - 10.0) < 2.0)
    val nearB = centroids.count(c => math.abs(c(0) + 10.0) < 2.0)
    assert(nearA >= 1 && nearB >= 1,
      s"centroids must cover both clusters, got A=$nearA B=$nearB: " +
        centroids.map(_.head).mkString(","))
    // determinism: same seed → same centroids
    val again = Ann.ivfTrain(sorted, "embedding", nLists = 4,
      iterations = 5, sampleRows = 100)
    assert(centroids.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
