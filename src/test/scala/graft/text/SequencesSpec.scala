package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SequencesSpec extends SparkSpec {
  import spark.implicits._

  // ---- chunkTokens -----------------------------------------------------

  test("chunkTokens window math: counts, boundaries, overlap") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // short: one chunk
      (2L, (1 to 64).map(i => s"t$i").mkString(" ")), // exactly one window
      (3L, (1 to 65).map(i => s"t$i").mkString(" ")), // one token over
      (4L, (1 to 160).map(i => s"t$i").mkString(" ")), // 3 chunks
      (5L, ""), // empty doc: single empty chunk
      (6L, "  a  \n b\tc  ")) // messy whitespace
      .toDF("doc_id", "text")
    val got = Sequences.chunkTokens(docs, "text", "doc_id", 64, 48)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap

    assert(got.keys.count(_._1 == 1L) == 1 && got((1L, 0L))._1 == 10L)
    assert(got.keys.count(_._1 == 2L) == 1 && got((2L, 0L))._1 == 64L)
    // 65 tokens: ceil((65-64)/48)+1 = 2 chunks; second starts at token 49
    assert(got.keys.count(_._1 == 3L) == 2)
    assert(got((3L, 1L))._1 == 17L) // tokens 49..65
    assert(got((3L, 1L))._2.startsWith("t49 "))
    // 160 tokens: chunks at 0/48/96 → ceil(96/48)+1 = 3
    assert(got.keys.count(_._1 == 4L) == 3)
    assert(got((4L, 2L))._1 == 64L) // tokens 97..160
    assert(got((5L, 0L)) == ((0L, "")))
    assert(got((6L, 0L)) == ((3L, "a b c")))
    // overlap: chunk 0 ends with the 16 tokens chunk 1 starts with
    val c0 = got((4L, 0L))._2.split(" ").takeRight(16).toSeq
    val c1 = got((4L, 1L))._2.split(" ").take(16).toSeq
    assert(c0 == c1)
  }

  // ---- packByBudget ----------------------------------------------------

  test("packByBudget is row-identical to the global running-sum window") {
    val df = (1L to 500L).map(i => (i, 1L + i % 37)).toDF("doc_id", "n_tokens")
    val got = Sequences.packByBudget(df, "doc_id", "n_tokens", 100L)
    val w = Window.orderBy(Scrub.hashDraw(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val reference = df
      .withColumn("__before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("seq_ix", expr("__before div 100L"))
      .drop("__before")
    assert(got.collect().toSet == reference.collect().toSet)
    // bins are contiguous: every seq_ix from 0 to max is present
    val ixs = got.select("seq_ix").as[Long].collect().toSet
    assert(ixs == (0L to ixs.max).toSet)
  }

  test("packByBudget assignment is input-layout independent") {
    val df = (1L to 300L).map(i => (i, 5L)).toDF("doc_id", "n_tokens")
    val a = Sequences.packByBudget(df.repartition(1), "doc_id", "n_tokens", 64L)
    val b = Sequences.packByBudget(
      df.repartition(13, col("n_tokens")), "doc_id", "n_tokens", 64L)
    assert(a.collect().toSet == b.collect().toSet)
  }

  // ---- Splits ----------------------------------------------------------

  test("splitColumn boundaries: first-match-wins over cumulative buckets") {
    // craft unit values landing in each bucket 0..9 of an 8/1/1 split
    val units = (1L to 2000L).toDF("unit")
    val got = units
      .withColumn("bkt", pmod(Scrub.hashDraw(col("unit")), lit(10L)))
      .withColumn("split",
        Splits.splitColumn(col("unit"), Seq("train" -> 8, "val" -> 1, "test" -> 1)))
      .select("bkt", "split").distinct().as[(Long, String)].collect().toMap
    assert(got.size == 10) // all buckets hit, each maps to exactly one split
    (0L to 7L).foreach(b => assert(got(b) == "train", s"bucket $b"))
    assert(got(8L) == "val")
    assert(got(9L) == "test")
  }

  test("byUnit never splits a cluster across splits and is exhaustive") {
    val members = (1L to 900L).map(i => (i, i % 113)).toDF("id", "cluster_id")
    val got = Splits.byUnit(members, "cluster_id")
    assert(got.filter(col("split").isNull).count() == 0)
    val perCluster = got.groupBy("cluster_id")
      .agg(countDistinct("split").as("n"))
      .filter(col("n") > 1).count()
    assert(perCluster == 0)
    // all three splits materialize at this cluster count
    assert(got.select("split").distinct().count() == 3)
  }

  // ---- blockSpans ------------------------------------------------------

  test("blockSpans tiles the stream exactly: per-doc and per-block sums") {
    val docs = (1L to 120L).map(i => (i, 1L + (i % 37))).toDF("doc_id", "w")
    val spans = Sequences.blockSpans(docs, "doc_id", "w", 64L).cache()
    try {
      val total = docs.agg(sum("w")).as[Long].head()
      // every token lands in exactly one span of one block
      assert(spans.agg(sum("span_len")).as[Long].head() == total)
      val perDoc = spans.groupBy("doc_id").agg(sum("span_len").as("s"))
        .join(docs, "doc_id").filter(col("s") =!= col("w")).count()
      assert(perDoc == 0)
      // all blocks except the last hold exactly blockSize tokens
      val lastBlock = (total - 1) / 64L
      val badBlocks = spans.groupBy("block_id").agg(sum("span_len").as("s"))
        .filter(col("block_id") < lastBlock && col("s") =!= 64L).count()
      assert(badBlocks == 0)
      // spans tile each block contiguously from offset 0
      val badTile = spans.groupBy("block_id")
        .agg(min("block_off").as("mn"), sum("span_len").as("s"),
          max(col("block_off") + col("span_len")).as("hi"))
        .filter(col("mn") =!= 0L || col("hi") =!= col("s")).count()
      assert(badTile == 0)
      // a straddling doc is split: more span rows than docs
      assert(spans.count() > 120)
      // doc_off starts at 0 and chains within each doc
      val badChain = spans.groupBy("doc_id")
        .agg(min("doc_off").as("mn"), sum("span_len").as("s"),
          max(col("doc_off") + col("span_len")).as("hi"))
        .filter(col("mn") =!= 0L || col("hi") =!= col("s")).count()
      assert(badChain == 0)
    } finally spans.unpersist()
  }

  test("blockSpans first block agrees with packByBudget's assignment") {
    val docs = (1L to 200L).map(i => (i, 3L + (i % 11))).toDF("doc_id", "w")
    val first = Sequences.blockSpans(docs, "doc_id", "w", 32L)
      .groupBy("doc_id").agg(min("block_id").as("b"))
    val packed = Sequences.packByBudget(docs, "doc_id", "w", 32L)
    val diff = first.join(packed, "doc_id")
      .filter(col("b") =!= col("seq_ix")).count()
    assert(diff == 0)
  }

  test("blockSpans drops zero-weight rows and is layout independent") {
    val docs = ((1L to 50L).map(i => (i, i % 7)) :+ (99L, 0L))
      .toDF("doc_id", "w")
    val a = Sequences.blockSpans(docs, "doc_id", "w", 16L).collect().toSet
    val b = Sequences.blockSpans(docs.repartition(9), "doc_id", "w", 16L)
      .collect().toSet
    assert(a == b)
    assert(!a.exists(_.getLong(0) == 99L))
    assert(!docs.filter(col("w") === 0).isEmpty)
  }

  // ---- shardShuffle ----------------------------------------------------

  test("shardShuffle is a permutation: each row once, ranks contiguous") {
    val docs = (1L to 500L).toDF("doc_id")
    val got = Splits.shardShuffle(docs, "doc_id", 8, "seed-a").cache()
    try {
      assert(got.count() == 500)
      assert(got.select("doc_id").distinct().count() == 500)
      // per shard, pos must be exactly 1..count(shard)
      val bad = got.groupBy("shard")
        .agg(count("*").as("n"), max("pos").as("mx"), min("pos").as("mn"),
          countDistinct("pos").as("d"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("d") =!= col("n"))
      assert(bad.count() == 0)
      // 8 shards of 500 uniform draws all materialize
      assert(got.select("shard").distinct().count() == 8)
    } finally got.unpersist()
  }

  test("shardShuffle is deterministic in the seed and changes with it") {
    val docs = (1L to 300L).toDF("doc_id")
    val a1 = Splits.shardShuffle(docs, "doc_id", 8, "s1").collect().toSet
    val a2 = Splits.shardShuffle(docs.repartition(7), "doc_id", 8, "s1")
      .collect().toSet
    assert(a1 == a2) // layout-independent and run-reproducible
    val b = Splits.shardShuffle(docs, "doc_id", 8, "s2").collect().toSet
    assert(a1 != b) // a new seed is a new permutation
  }
}
