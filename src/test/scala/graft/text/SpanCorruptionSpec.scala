package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpanCorruptionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")

  test("uncorrupt ∘ corrupt = identity on the token stream (corpus-wide law)") {
    val out = SpanCorruption.corrupt(docs, "text", "doc_id")
    val rejoined = out.select($"doc_id",
      SpanCorruption.uncorrupt($"input_text", $"targets_text").as("round"))
    val orig = docs.select($"doc_id",
      array_join(Decontaminate.wordTokens($"text"), " ").as("orig"))
    assert(rejoined.join(orig, "doc_id").filter($"round" =!= $"orig").isEmpty)
  }

  test("sentinels are ordered, consistent across both streams, and counted") {
    val r = SpanCorruption.corrupt(docs, "text", "doc_id")
      .filter($"n_spans" > 0).limit(20).collect()
    assert(r.nonEmpty, "expected some masked docs at 15%")
    r.foreach { row =>
      val n = row.getAs[Long]("n_spans").toInt
      val ids = "<extra_id_([0-9]+)>".r
        .findAllMatchIn(row.getAs[String]("input_text")).map(_.group(1).toInt).toSeq
      assert(ids == (0 until n), s"input sentinels $ids != 0..${n - 1}")
      val tids = "<extra_id_([0-9]+)>".r
        .findAllMatchIn(row.getAs[String]("targets_text")).map(_.group(1).toInt).toSeq
      assert(tids == (0 until n), s"target sentinels $tids != 0..${n - 1}")
    }
  }

  test("masked fraction tracks the threshold on a long document") {
    val long = Seq((1L, Seq.fill(30000)("tok").mkString(" "))).toDF("doc_id", "text")
    val r = SpanCorruption.corrupt(long, "text", "doc_id").head()
    val frac = r.getAs[Long]("n_masked").toDouble / 30000
    assert(math.abs(frac - 0.15) < 0.02, s"masked fraction $frac vs 0.15")
    // block masking: mean span length ~ blockLen (merges push it above)
    val meanSpan = r.getAs[Long]("n_masked").toDouble / r.getAs[Long]("n_spans")
    assert(meanSpan >= 3.0 && meanSpan < 5.0, s"mean span $meanSpan")
  }

  test("deterministic: same corpus, any partitioning, identical pairs") {
    val a = SpanCorruption.corrupt(docs.repartition(1), "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val b = SpanCorruption.corrupt(docs.repartition(13), "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("token-less doc produces the empty pair, not a crash or a drop") {
    val d = Seq((7L, ""), (8L, "   ")).toDF("doc_id", "text")
    val r = SpanCorruption.corrupt(d, "text", "doc_id").orderBy("doc_id").collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getAs[String]("input_text") == "")
      assert(row.getAs[String]("targets_text") == "")
      assert(row.getAs[Long]("n_spans") == 0L)
    }
  }
}
