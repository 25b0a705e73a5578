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
}
