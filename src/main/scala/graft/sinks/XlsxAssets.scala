package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** K6/K7 — the dataset-assets side-effect stage (reference:
  * dataset_assets.py): per chart doc, fill a template XLSX (metadata
  * cells B1-B6, series matrix from row 9) and shell out to a headless
  * browser for PNG cards.
  *
  * The engine-side contract is the per-row fan-out (foreachPartition over
  * docs, one writer per row, side effects isolated per partition). XLSX
  * rendering is REAL — [[Xlsx]] is a pure-JDK OOXML codec, and
  * [[XlsxAssets.XlsxTemplateWriter]] fills a template workbook the way
  * the reference fills template.xlsx via openpyxl. The PNG screenshot
  * step (`ScreenshotRunner`) stays a seam — it needs a headless browser.
  */
object XlsxAssets {

  /** (cell address, value) grid writer seam. */
  trait CellWriter extends Serializable {
    def write(outPath: String, cells: Seq[(String, String)]): Unit
    /** Output filename extension for [[writeAssets]]. */
    def ext: String = "cells.csv"
  }

  /** Deterministic stand-in: renders "A1,value" lines. */
  final class CsvCellWriter extends CellWriter {
    def write(outPath: String, cells: Seq[(String, String)]): Unit = {
      val p = java.nio.file.Paths.get(outPath)
      java.nio.file.Files.createDirectories(p.getParent)
      val body = cells.map { case (a, v) =>
        s"$a,${Option(v).getOrElse("").replace("\n", " ")}"
      }.mkString("\n")
      java.nio.file.Files.write(p, body.getBytes("UTF-8"))
    }
  }

  /** Real template writer (reference: dataset_assets.py:22-47 —
    * `load_workbook(XLSX_TEMPLATE)`, poke cells, save). The template's
    * first sheet is loaded once per writer (one writer per partition →
    * amortized, like openpyxl's per-row load is NOT), the doc's cells
    * overlay it, and the result is written as a real .xlsx. With no
    * template path, starts from an empty single-sheet workbook.
    */
  final class XlsxTemplateWriter(templatePath: Option[String] = None) extends CellWriter {
    override def ext: String = "xlsx"
    @transient private lazy val template: Xlsx.Sheet =
      templatePath.map(p => Xlsx.read(p).head)
        .getOrElse(Xlsx.Sheet("Chart", Map.empty))

    def write(outPath: String, cells: Seq[(String, String)]): Unit = {
      val filled = template.copy(cells = template.cells ++ cells.map {
        case (a, v) => Xlsx.parseAddress(a) -> Option(v).getOrElse("")
      })
      Xlsx.write(outPath, Seq(filled))
    }
  }

  /** Cell grid for one chart doc (reference: dataset_assets.py:8-48 —
    * metadata in B1-B6, series matrix from row 9).
    */
  def chartCells(doc: Row): Seq[(String, String)] = {
    def s(field: String): String =
      if (doc.schema.fieldNames.contains(field) && !doc.isNullAt(doc.fieldIndex(field)))
        String.valueOf(doc.getAs[Any](field))
      else ""
    val meta = Seq(
      "B1" -> s("chart_title"), "B2" -> s("chart_abstract"),
      "B3" -> s("source_description"), "B4" -> s("source_url"),
      "B5" -> s("units"), "B6" -> s("last_updated_at"))
    val series =
      if (!doc.schema.fieldNames.contains("series") || doc.isNullAt(doc.fieldIndex("series")))
        Seq.empty
      else doc.getAs[scala.collection.Seq[Row]]("series").zipWithIndex.flatMap {
        case (ser, si) =>
          val colLetter = ('B' + si).toChar
          val title = Seq(s"${colLetter}9" ->
            Option(ser.getAs[String]("series_title")).getOrElse(""))
          val points = Option(ser.getAs[scala.collection.Seq[Row]]("dataset"))
            .getOrElse(Seq.empty).zipWithIndex.flatMap { case (p, pi) =>
              Seq(
                s"A${10 + pi}" -> p.getAs[String]("x"),
                s"$colLetter${10 + pi}" -> String.valueOf(p.getAs[Double]("y")))
            }
          title ++ points
      }
    meta ++ series
  }

  /** The fan-out: one asset per doc row. */
  def writeAssets(docs: DataFrame, outDir: String, writer: CellWriter): Long = {
    val counter = docs.sparkSession.sparkContext.longAccumulator("assets_written")
    docs.foreachPartition { (rows: Iterator[Row]) =>
      rows.foreach { row =>
        val docId = row.getAs[String]("doc_id").replace("/", "_")
        writer.write(s"$outDir/$docId.${writer.ext}", chartCells(row))
        counter.add(1)
      }
    }
    counter.value
  }
}
