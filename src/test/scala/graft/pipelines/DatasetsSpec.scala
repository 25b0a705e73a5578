package graft.pipelines

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.i18n.Translate

/** Golden test of the two-level pivot on a FIXTURES.md §F1-shaped sheet. */
class DatasetsSpec extends SparkSpec {

  private def sheet(rows: Seq[Seq[String]], headers: Seq[String]) = {
    val schema = StructType(headers.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq(_)), 1), schema)
  }

  test("two series collapse into one chart doc with nested series[].dataset[]") {
    // transposed sheet: one row per record, Hebrew headers, year columns
    val headers = Seq(
      "אזור באתר:", "כותרת התרשים (נשים וגברים ביחד):",
      "כותרת סדרת הנתונים (נשים או גברים):", "מגדר", "יחידות",
      "שנת אקסטרפולציה (טווח שנים או שנת התחלה):", "סוג התרשים",
      "2001", "2002", "2003")
    val rows = Seq(
      Seq("kindA", "תרשים ראשי", "נשים", "נשים", "מספר", "2002-2003", "תרשים קו",
        "10", "20", "30"),
      Seq("kindA", "תרשים ראשי", "גברים", "גברים", "מספר", null, "תרשים קו",
        "1", "2%", "3,000"))
    val dicts = Map(
      "tags" -> Map.empty[String, Translate.Entry],
      "life_areas" -> Map.empty[String, Translate.Entry],
      "languages" -> Map(
        "heb" -> Translate.Entry("heb", "Hebrew", "העברية"),
        "eng" -> Translate.Entry("eng", "English", "الإنجليزية"),
        "ara" -> Translate.Entry("ara", "Arabic", "العربية")))

    val out = Datasets.run(spark, Seq(sheet(rows, headers)), dicts)
    val docs = out.collect()
    assert(docs.length == 1, s"expected 1 chart doc, got ${docs.length}")
    val doc = docs(0)

    assert(doc.getAs[String]("chart_title") == "תרשים ראשי")
    assert(doc.getAs[Long]("num_datasets") == 2L)
    assert(doc.getAs[String]("chart_type") == "line")
    assert(doc.getAs[String]("doc_id").startsWith("dataset/"))
    assert(doc.getAs[Int]("year") == 2003) // max year string, cleanly parseable

    // series sorted by order_index: first series = first sheet record
    val series = doc.getAs[scala.collection.Seq[Row]]("series")
    assert(series.length == 2)
    val s1 = series.head
    assert(s1.getAs[String]("series_title") == "נשים")
    val ds1 = s1.getAs[scala.collection.Seq[Row]]("dataset")
    assert(ds1.map(p => (p.getAs[String]("x"), p.getAs[Double]("y"), p.getAs[Boolean]("q"))).toSeq ==
      Seq(("2001", 10.0, false), ("2002", 20.0, true), ("2003", 30.0, true)))
    // second series: '%' stripped, ',' group char stripped
    val ds2 = series(1).getAs[scala.collection.Seq[Row]]("dataset")
    assert(ds2.map(p => (p.getAs[String]("x"), p.getAs[Double]("y"))).toSeq ==
      Seq(("2001", 1.0), ("2002", 2.0), ("2003", 3000.0)))

    // language translated into three languages; outputs are CLEANED
    // (lowercased) per reference i18n.py:117-127
    assert(doc.getAs[scala.collection.Seq[String]]("language__en").toSeq ==
      Seq("hebrew", "english", "arabic"))
  }

  test("forward-fill carries chart_title; missing-title leading rows drop") {
    val headers = Seq(
      "אזור באתר:", "כותרת התרשים (נשים וגברים ביחד):",
      "כותרת סדרת הנתונים (נשים או גברים):", "מגדר", "יחידות", "2005")
    val rows = Seq(
      Seq("k", "כותרת", "ס1", "נשים", "מספר", "5"),
      Seq("k", null, "ס2", "גברים", "מספר", "6")) // title forward-filled
    val out = Datasets.run(spark, Seq(sheet(rows, headers)),
      Map("languages" -> Map.empty))
    val docs = out.collect()
    assert(docs.length == 1)
    assert(docs(0).getAs[Long]("num_datasets") == 2L)
  }

  test("percent units rescale and whitelist") {
    val headers = Seq(
      "אזור באתר:", "כותרת התרשים (נשים וגברים ביחד):",
      "כותרת סדרת הנתונים (נשים או גברים):", "מגדר", "יחידות", "2005")
    val rows = Seq(Seq("k", "t", "s", "נשים", "אחוזים עד 1", "0.25"))
    val out = Datasets.run(spark, Seq(sheet(rows, headers)),
      Map("languages" -> Map.empty))
    val doc = out.collect()(0)
    val series = doc.getAs[scala.collection.Seq[Row]]("series")
    val pt = series.head.getAs[scala.collection.Seq[Row]]("dataset").head
    assert(pt.getAs[Double]("y") == 25.0) // 0.25 × 100
    assert(series.head.getAs[String]("units") == "אחוזים עד 100")
  }
}
