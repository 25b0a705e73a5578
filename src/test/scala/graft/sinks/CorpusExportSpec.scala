package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusExportSpec extends SparkSpec {

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("corpus_export")
    d.toFile.deleteOnExit()
    d.toString + "/out"
  }

  test("hive layout: one directory per (lang, source); read-back is lossless") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = freshDir()
    CorpusExport.write(docs, out, Seq("lang", "source"), orderCol = "n_chars")
    val langDirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(langDirs.nonEmpty && langDirs.forall(_.startsWith("lang=")))
    val back = CorpusExport.read(spark, out)
    assert(back.count() == docs.count())
    // partition columns survive the round trip as columns
    assert(back.columns.toSet == docs.columns.toSet)
  }

  test("partition filters prune at the scan, not post-scan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = freshDir()
    CorpusExport.write(docs, out, Seq("lang"), orderCol = "doc_id")
    val firstLang = docs.select("lang").distinct().limit(1)
      .collect()(0).getString(0)
    val filtered = CorpusExport.read(spark, out, Map("lang" -> firstLang))
    val expect = docs.filter(col("lang") === firstLang).count()
    assert(filtered.count() == expect)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected partition pruning in plan:\n$plan")
  }

  test("maxRecordsPerFile splits oversized partitions into parallel files") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").coalesce(1)
    val out = freshDir()
    CorpusExport.write(docs, out, Seq("lang"), orderCol = "doc_id",
      maxRecordsPerFile = 10L)
    val someLang = new java.io.File(out).listFiles()
      .filter(_.isDirectory).head
    val files = someLang.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1, s"expected multiple files, got ${files.length}")
  }
}
