package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImportanceSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha alpha beta", "t"),   // mostly target-vocab
    (2L, "alpha beta", "t"),
    (3L, "gamma delta gamma", "s"),  // disjoint source-vocab
    (4L, "gamma delta", "s"),
    (5L, "alpha gamma", "s")         // mixed source doc
  ).toDF("doc_id", "text", "kind")

  test("hand-computed masses and keep decisions") {
    // target tokens: alpha x3, beta x2 (N_tgt = 5)
    // source tokens: gamma x4, delta x2, alpha x1, (N_src = 7)
    // distinct words never share an md5 bucket here (checked below), so
    // per-token masses are exact global counts: alpha tc=3 sc=1,
    // beta tc=2 sc=0, gamma tc=0 sc=4, delta tc=0 sc=2
    val out = ImportanceSampling
      .importanceTag(docs, "doc_id", "text", $"kind" === "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    val buckets = Seq("alpha", "beta", "gamma", "delta")
      .map(w => ImportanceSampling.bucket(lit(w), 1 << 14))
    val distinctBuckets = docs.sparkSession.range(1)
      .select(array(buckets: _*).as("b"))
      .select(size(array_distinct($"b"))).as[Int].head()
    assert(distinctBuckets == 4, "test premise: no bucket collisions")
    // doc1: tgt = 3+3+2 = 8, src = 1+1+0 = 2 -> 8*7 > 2*5 keep
    assert(out(1L) == ((8L, 2L, 1)))
    // doc3: tgt = 0, src = 4+2+4 = 10 -> drop
    assert(out(3L) == ((0L, 10L, 0)))
    // doc5: tgt = 3+0 = 3, src = 1+4 = 5 -> 3*7=21 < 5*5=25 -> drop
    assert(out(5L) == ((3L, 5L, 0)))
    assert(out(2L)._3 == 1 && out(4L)._3 == 0)
  }

  test("layout-independent: same result after repartition") {
    val a = ImportanceSampling
      .importanceTag(docs, "doc_id", "text", $"kind" === "t")
      .orderBy("doc_id").collect().toSeq
    val b = ImportanceSampling
      .importanceTag(docs.repartition(7), "doc_id", "text", $"kind" === "t")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
