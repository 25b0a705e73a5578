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

  test("topK bounds the vocab to the most frequent tokens") {
    val v = VocabEncode.buildVocab(docs, "text", topK = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("b" -> 0L, "a" -> 1L)) // c (cnt 1) capped away
  }

  test("join-strategy encode matches the literal path incl. degenerate rows") {
    val vocab = VocabEncode.buildVocab(docs, "text")
    val in = Seq((1L, "b a b"), (2L, "a zzz c"), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
    // maxLiteralVocab=1 forces the broadcast-join strategy
    val out = VocabEncode.encode(spark, in, "text", vocab, unkId = -7L,
        maxLiteralVocab = 1, keyCol = Some("doc_id"))
      .orderBy("doc_id").select("token_ids").as[Option[Seq[Long]]].collect()
    val lit = VocabEncode.encode(spark, in, "text", vocab, unkId = -7L)
      .orderBy("doc_id").select("token_ids").as[Option[Seq[Long]]].collect()
    assert(out.toSeq == lit.toSeq)
    assert(out(0).get == Seq(0L, 1L, 0L) && out(1).get == Seq(1L, -7L, 2L))
    // no-key fallback (monotonically_increasing_id) on a narrow plan
    val noKey = VocabEncode.encode(spark, in, "text", vocab, unkId = -7L,
        maxLiteralVocab = 1)
      .orderBy("doc_id").select("token_ids").as[Option[Seq[Long]]].collect()
    assert(noKey.toSeq == lit.toSeq)
  }
}
