package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = {
    val base = spark.range(n).select($"id".as("doc_id"))
      .as[Long].collect()
      .map(id => (id, Multimodal.renderPng(id)))
    spark.createDataFrame(base.toSeq).toDF("doc_id", "blob")
  }

  test("finds exactly the planted byte-identical duplicates") {
    val base = corpus(30)
    val dup = base.filter($"doc_id" < 10)
      .select(($"doc_id" + 1000).as("doc_id"), $"blob")
    val pairs = ImageDedup.phashDupPairs(base.unionByName(dup),
      "doc_id", "blob", Multimodal.ImageIoDecoder)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 10L).map(i => (i, i + 1000)).toSet)
  }

  test("verify tier culls pHash collisions between distinct images") {
    // a decoder whose pHash is constant makes EVERY pair a tier-1
    // candidate; only byte-identical images survive the exact pixel
    // checksum, so the output is still just the planted duplicate
    object CollidingDecoder extends Multimodal.Decoder {
      def sniff(b: Array[Byte]) = Multimodal.ImageIoDecoder.sniff(b)
      def imageFeatures(b: Array[Byte]) =
        Multimodal.ImageIoDecoder.imageFeatures(b).copy(phash = 0L)
      def pixelStats(b: Array[Byte]) = Multimodal.ImageIoDecoder.pixelStats(b)
      def resize(b: Array[Byte], w: Int, h: Int) =
        Multimodal.ImageIoDecoder.resize(b, w, h)
      def sampleFrames(b: Array[Byte], everyMs: Long) =
        Multimodal.ImageIoDecoder.sampleFrames(b, everyMs)
    }
    val base = corpus(12)
    val dup = base.filter($"doc_id" === 3)
      .select(($"doc_id" + 1000).as("doc_id"), $"blob")
    val pairs = ImageDedup.phashDupPairs(base.unionByName(dup),
      "doc_id", "blob", CollidingDecoder)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((3L, 1003L)))
  }

  test("no pairs on an all-distinct corpus") {
    assert(ImageDedup.phashDupPairs(corpus(25), "doc_id", "blob",
      Multimodal.ImageIoDecoder).isEmpty)
  }
}
