package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val longDocs = {
    // deterministic "documents": repeated token sentences, 200+ chars
    val base = (0 until 20).map { i =>
      (i.toLong, (0 until 40).map(j => s"tok${(i * 7 + j * 3) % 50}").mkString(" "))
    }
    base.toDF("doc_id", "text")
  }

  test("exactDedup groups identical texts") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exactDedup(df, "text", "doc_id").orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH finds every planted near-dup on long docs") {
    val mutated = longDocs.select(($"doc_id" + 1000).as("doc_id"),
      concat($"text", lit(" tail")).as("text"))
    val uni = longDocs.unionByName(mutated)
    val pairs = Dedup.minhashNearDupPairs(uni, "text", "doc_id", threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 20).foreach { i =>
      assert(pairs.contains((i.toLong, i + 1000L)), s"missing planted pair $i")
    }
  }

  test("signature similarity of identical docs is 1.0") {
    val sig = Dedup.minhashSignature(Dedup.shingles(lit("hello world document")))
    val df = spark.range(1).select(
      Dedup.signatureSimilarity(sig, sig).as("s"))
    assert(df.collect()(0).getDouble(0) == 1.0)
  }

  test("simhash: identical text -> distance 0; planted mutations within 12 bits") {
    val mutated = longDocs.select(($"doc_id" + 1000).as("doc_id"),
      concat($"text", lit(" tail")).as("text"))
    val uni = longDocs.unionByName(mutated)
    val pairs = Dedup.simhashNearDupPairs(uni, "text", "doc_id", maxDist = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 20).count(i => pairs.contains((i.toLong, i + 1000L)))
    assert(planted >= 15, s"only $planted/20 planted pairs within hamming 12")
    // identical doc -> identical simhash
    val h = longDocs.select(Dedup.simhash(Dedup.shingles($"text")).as("h"))
      .collect().map(_.getLong(0))
    assert(h.toSet.size >= 15) // near-unique fingerprints for distinct docs
  }

  test("incremental dedup: new batch finds dups against the index AND within itself") {
    // "history" = docs 0..19, indexed once; "new batch" = mutations of
    // docs 0..9 (cross-run dups) + two copies of a fresh doc (new-new dup)
    val index = Dedup.buildSignatureIndex(longDocs, "text", "doc_id")
    val crossDups = longDocs.filter($"doc_id" < 10)
      .select(($"doc_id" + 2000).as("doc_id"), concat($"text", lit(" tail")).as("text"))
    val freshText = (0 until 40).map(j => s"new${j % 9}").mkString(" ")
    val newNew = Seq((3001L, freshText), (3002L, freshText + " x")).toDF("doc_id", "text")
    val newBatch = crossDups.unionByName(newNew)

    val pairs = Dedup.incrementalNearDupPairs(newBatch, index, "text", "doc_id",
      threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted cross-run dup found
    (0 until 10).foreach { i =>
      assert(pairs.contains((i + 2000L, i.toLong)), s"missing cross pair for doc $i")
    }
    // the new-new pair found (ordered new_id < other_id)
    assert(pairs.contains((3001L, 3002L)), s"missing new-new pair in $pairs")
    // no pair claims two historical ids (history is never re-paired)
    assert(pairs.forall { case (a, _) => a >= 2000L })
  }

  test("jaccard exact values") {
    val df = spark.range(1).select(
      Dedup.jaccard(array(lit("a"), lit("b"), lit("c")), array(lit("b"), lit("c"), lit("d"))).as("j"))
    assert(df.collect()(0).getDouble(0) == 0.5)
  }

  test("ngramJaccardPairs verifies planted pairs with high exact jaccard") {
    val mutated = longDocs.select(($"doc_id" + 1000).as("doc_id"),
      concat($"text", lit(" t")).as("text"))
    val uni = longDocs.unionByName(mutated)
    val got = Dedup.ngramJaccardPairs(uni, "text", "doc_id", threshold = 0.8)
      .collect()
    assert(got.length >= 18)
    assert(got.forall(_.getDouble(2) >= 0.8))
  }
}
