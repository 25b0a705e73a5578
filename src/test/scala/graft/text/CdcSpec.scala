package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.CdcExprs

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(s: String): Seq[String] =
    Seq(s).toDF("t").select(CdcExprs.cdcChunks($"t")).as[Seq[String]].head()

  test("chunks reassemble to the document; empty input -> no chunks") {
    val doc = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].head()
    val cs = chunksOf(doc)
    assert(cs.mkString("") == doc, "chunks must partition the text exactly")
    assert(cs.forall(_.nonEmpty))
    assert(chunksOf("").isEmpty)
    assert(chunksOf("short") == Seq("short"), "sub-window docs are one chunk")
  }

  test("boundaries are content-defined: a prefix edit realigns locally") {
    val doc = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].collect().maxBy(_.length)
    val edited = "INSERTED PREFIX " + doc
    val a = chunksOf(doc)
    val b = chunksOf(edited)
    // fixed-size blocks would share ZERO blocks after a prefix shift;
    // content-defined cuts resynchronize, so most original chunks survive
    val shared = a.toSet.intersect(b.toSet).size
    assert(a.size >= 3, s"fixture doc too short for the property (got ${a.size} chunks)")
    assert(shared >= a.size - 2,
      s"expected resynchronization: ${shared}/${a.size} chunks shared")
  }

  test("duplicated paragraphs produce identical chunk hashes across docs") {
    val para = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].head()
    val d1 = s"$para unique-tail-one"
    val d2 = s"$para completely different continuation text here"
    val shared = chunksOf(d1).toSet.intersect(chunksOf(d2).toSet)
    assert(shared.nonEmpty,
      "common prefix must yield at least one shared chunk")
  }
}
