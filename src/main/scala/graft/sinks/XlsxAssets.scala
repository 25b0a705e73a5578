package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** K6/K7 — the dataset-assets side-effect stage (reference:
  * dataset_assets.py): per chart doc, fill a template XLSX (metadata
  * cells B1-B6, series matrix from row 9) and shell out to a headless
  * browser for PNG cards.
  *
  * The engine-side contract is the per-row fan-out (foreachPartition over
  * docs, one writer per row, side effects isolated per partition). The
  * XLSX/PNG renderers are environment seams: no POI or browser ships in
  * this container, so `CsvCellWriter` is the deterministic stand-in that
  * renders the same cell grid as CSV; swap `XlsxTemplateWriter` /
  * `ScreenshotRunner` in a full deployment.
  */
object XlsxAssets {

  /** (cell address, value) grid writer seam. */
  trait CellWriter extends Serializable {
    def write(outPath: String, cells: Seq[(String, String)]): Unit
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

  /** Real template writer — requires Apache POI on the classpath. */
  final class XlsxTemplateWriter(templatePath: String) extends CellWriter {
    def write(outPath: String, cells: Seq[(String, String)]): Unit =
      throw new UnsupportedOperationException(
        "XLSX rendering needs Apache POI on the classpath; use CsvCellWriter in this environment")
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
        writer.write(s"$outDir/$docId.cells.csv", chartCells(row))
        counter.add(1)
      }
    }
    counter.value
  }
}
