package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VocabEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "b a b"),   // b x3 total -> id 0; a x2 -> id 1; c x1 -> id 2
    (2L, "a c b")
  ).toDF("doc_id", "text")

  test("vocab ids are frequency-sorted with lexical tie-break") {
    val v = VocabEncode.buildVocab(docs, "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v == Map("b" -> ((0L, 3L)), "a" -> ((1L, 2L)), "c" -> ((2L, 1L))))
  }

  test("encode maps positions faithfully; unknown tokens hit unkId") {
    val vocab = VocabEncode.buildVocab(docs, "text")
    val out = VocabEncode.encode(spark, docs, "text", vocab)
      .orderBy("doc_id")
      .select("token_ids").as[Seq[Long]].collect()
    assert(out(0) == Seq(0L, 1L, 0L) && out(1) == Seq(1L, 2L, 0L))
    val unseen = Seq((9L, "a zzz")).toDF("doc_id", "text")
    val enc = VocabEncode.encode(spark, unseen, "text", vocab, unkId = -7L)
      .select("token_ids").as[Seq[Long]].head()
    assert(enc == Seq(1L, -7L))
  }
}
