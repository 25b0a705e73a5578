package graft.sinks

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.immutable.ListMap

/** Minimal OOXML spreadsheet codec on `java.util.zip` + the JDK XML
  * parser — zero external dependencies. An .xlsx file is a zip of XML
  * parts; this module reads and writes the SpreadsheetML subset the
  * reference actually uses (reference: dataset_assets.py:22-47 template
  * fill via openpyxl; obsolete/load_publications_from_gdrive.py:30-67
  * multi-sheet read via tabulator):
  *
  *  - write: multi-sheet workbooks, inline strings + native number cells,
  *    deterministic bytes (fixed zip timestamps, sorted parts) — the same
  *    input always produces identical output, so sinks are hashable;
  *  - read: sheet names in workbook order resolved through the rels part,
  *    shared-string AND inline-string cells, numeric cells as their
  *    literal text. Styles/formulas/merges are out of scope (the
  *    reference's loader only consumes values).
  */
object Xlsx {

  /** One sheet: name + sparse 1-based (row, col) → string value grid. */
  final case class Sheet(name: String, cells: Map[(Int, Int), String]) {
    def nRows: Int = if (cells.isEmpty) 0 else cells.keysIterator.map(_._1).max
    def nCols: Int = if (cells.isEmpty) 0 else cells.keysIterator.map(_._2).max

    /** Dense row-major grid, "" for absent cells. */
    def grid: IndexedSeq[IndexedSeq[String]] =
      (1 to nRows).map(r => (1 to nCols).map(c => cells.getOrElse((r, c), "")))
  }

  // ---- A1-style addresses ---------------------------------------------

  /** 1-based column → letters: 1→A, 26→Z, 27→AA. */
  def colLetters(c: Int): String = {
    require(c >= 1, s"column $c")
    var n = c; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** "B12" → (12, 2). */
  def parseAddress(a: String): (Int, Int) = {
    val letters = a.takeWhile(_.isLetter).toUpperCase
    val digits = a.drop(letters.length)
    require(letters.nonEmpty && digits.nonEmpty && digits.forall(_.isDigit), s"bad address $a")
    val c = letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1))
    (digits.toInt, c)
  }

  def address(row: Int, col: Int): String = s"${colLetters(col)}$row"

  // ---- write -----------------------------------------------------------

  private def xmlEscape(s: String): String = s.flatMap {
    case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
    case '"' => "&quot;"; case '\'' => "&apos;"
    case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
    case c => c.toString
  }

  // Typeless <v> number cells only for values a spreadsheet reads back
  // unchanged: no leading zeros ("0123" would become 123), ≤15
  // significant digits (Excel's double mantissa — a 16-digit id would
  // silently round), no trailing-zero fractions ("1.10" would become
  // 1.1), and no "-0". Everything else ships as an inline string.
  private val NumberRe = "^-?(0|[1-9][0-9]{0,14})(\\.[0-9]*[1-9])?$".r
  private def safeAsNumber(v: String): Boolean =
    NumberRe.matches(v) && v.count(_.isDigit) <= 15 && v != "-0"

  private def sheetXml(s: Sheet): String = {
    val byRow = s.cells.groupBy(_._1._1).toSeq.sortBy(_._1)
    val rows = byRow.map { case (r, cm) =>
      val cells = cm.toSeq.sortBy(_._1._2).map { case ((_, c), v) =>
        val a = address(r, c)
        if (v != null && safeAsNumber(v))
          s"""<c r="$a"><v>$v</v></c>"""
        else
          s"""<c r="$a" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(Option(v).getOrElse(""))}</t></is></c>"""
      }.mkString
      s"""<row r="$r">$cells</row>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rows</sheetData></worksheet>""".stripMargin
  }

  /** Serialize a workbook to deterministic .xlsx bytes. */
  def writeWorkbook(sheets: Seq[Sheet]): Array[Byte] = {
    require(sheets.nonEmpty, "workbook needs at least one sheet")
    val contentTypes =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>${
        sheets.indices.map(i =>
          s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString
      }</Types>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""".stripMargin
    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>${
        sheets.zipWithIndex.map { case (s, i) =>
          s"""<sheet name="${xmlEscape(s.name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString
      }</sheets></workbook>""".stripMargin
    val workbookRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">${
        sheets.indices.map(i =>
          s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString
      }</Relationships>""".stripMargin

    val parts: Seq[(String, String)] =
      Seq("[Content_Types].xml" -> contentTypes,
        "_rels/.rels" -> rootRels,
        "xl/workbook.xml" -> workbook,
        "xl/_rels/workbook.xml.rels" -> workbookRels) ++
        sheets.zipWithIndex.map { case (s, i) =>
          s"xl/worksheets/sheet${i + 1}.xml" -> sheetXml(s)
        }

    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    parts.foreach { case (name, body) =>
      val e = new ZipEntry(name)
      e.setTime(0L) // fixed timestamp → byte-deterministic output
      zos.putNextEntry(e)
      zos.write(body.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  def write(path: String, sheets: Seq[Sheet]): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, writeWorkbook(sheets))
  }

  // ---- read ------------------------------------------------------------

  private def secureDocBuilder(): javax.xml.parsers.DocumentBuilder = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // XXE hardening: workbooks are untrusted input
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder()
  }

  private def parse(bytes: Array[Byte]): org.w3c.dom.Document =
    secureDocBuilder().parse(new ByteArrayInputStream(bytes))

  private def elems(n: org.w3c.dom.Document, local: String): Seq[org.w3c.dom.Element] = {
    val nl = n.getElementsByTagNameNS("*", local)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  private def childElems(e: org.w3c.dom.Element, local: String): Seq[org.w3c.dom.Element] = {
    val nl = e.getElementsByTagNameNS("*", local)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  /** Parse .xlsx bytes into sheets (workbook order). Handles shared and
    * inline strings, numbers, booleans; formulas surface as their cached
    * value.
    */
  def readWorkbook(bytes: Array[Byte]): Seq[Sheet] = {
    // 1. inflate all parts
    val parts = scala.collection.mutable.Map.empty[String, Array[Byte]]
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    var e = zis.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        val bos = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = zis.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = zis.read(buf) }
        parts(e.getName) = bos.toByteArray
      }
      e = zis.getNextEntry
    }
    zis.close()

    // 2. shared strings (si may hold rich-text runs — concatenate its t's)
    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml").map { b =>
      elems(parse(b), "si").map(si => childElems(si, "t").map(_.getTextContent).mkString).toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

    // 3. workbook sheet list (name, r:id) + rels (r:id → part)
    val wb = parse(parts.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("not an xlsx: missing xl/workbook.xml")))
    val relsDoc = parse(parts.getOrElse("xl/_rels/workbook.xml.rels",
      throw new IllegalArgumentException("missing workbook rels")))
    val relTarget: Map[String, String] = elems(relsDoc, "Relationship").map { r =>
      val t = r.getAttribute("Target")
      r.getAttribute("Id") -> (if (t.startsWith("/")) t.drop(1) else s"xl/$t")
    }.toMap

    elems(wb, "sheet").map { s =>
      val name = s.getAttribute("name")
      val rid = Option(s.getAttributeNS(
        "http://schemas.openxmlformats.org/officeDocument/2006/relationships", "id"))
        .filter(_.nonEmpty).getOrElse(s.getAttribute("r:id"))
      val partName = relTarget.getOrElse(rid,
        throw new IllegalArgumentException(s"sheet $name: unresolved rel $rid"))
      val doc = parse(parts.getOrElse(partName,
        throw new IllegalArgumentException(s"missing sheet part $partName")))
      val cells = elems(doc, "c").flatMap { c =>
        val (r, cl) = parseAddress(c.getAttribute("r"))
        val v = c.getAttribute("t") match {
          case "s" =>
            childElems(c, "v").headOption.map(v => shared(v.getTextContent.trim.toInt))
          case "inlineStr" =>
            Some(childElems(c, "t").map(_.getTextContent).mkString)
          case _ => // "", "n", "str", "b" — the literal <v> text
            childElems(c, "v").headOption.map(_.getTextContent)
        }
        v.map(value => (r, cl) -> value)
      }.toMap
      Sheet(name, cells)
    }
  }

  def read(path: String): Seq[Sheet] =
    readWorkbook(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  // ---- the reference's multi-sheet row reader (S6) ---------------------

  /** Iterate a workbook the way the reference's gdrive loader does
    * (load_publications_from_gdrive.py:30-67): skip sheets whose name
    * contains 'deleted'; the FIRST sheet's first row is the header; later
    * sheets reuse that header when their own first row lacks `migdar_id`
    * (continuation sheets), else declare their own. Emits
    * (sheetName, header, dataRows).
    */
  def sheetRows(sheets: Seq[Sheet]): Seq[(String, Seq[String], Seq[Seq[String]])] = {
    var firstHeader: Option[Seq[String]] = None
    sheets.filterNot(_.name.trim.toLowerCase.contains("deleted")).flatMap { s =>
      val g = s.grid
      if (g.isEmpty) None
      else {
        val first = g.head.map(_.trim)
        val ownHeader = first.contains("migdar_id") || firstHeader.isEmpty
        val header = if (ownHeader) first else firstHeader.get
        if (firstHeader.isEmpty) firstHeader = Some(first)
        val data = (if (ownHeader) g.tail else g)
          .map(row => row.padTo(header.length, "").take(header.length))
        Some((s.name, header, data))
      }
    }
  }

  /** Workbook → DataFrame: union of all (stitched-header) sheets, all
    * columns string-typed, plus provenance columns `__sheet` and
    * `__sheet_row`. Workbooks are single files read on the driver (the
    * reference streams them the same way); for MANY workbooks, fan out
    * paths per file exactly like CsvIndex.
    */
  def loadWorkbook(spark: org.apache.spark.sql.SparkSession, path: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val all = sheetRows(read(path))
    require(all.nonEmpty, s"no readable sheets in $path")
    val header = all.head._2
    val schema = StructType(
      header.map(h => StructField(h, StringType)) :+
        StructField("__sheet", StringType) :+ StructField("__sheet_row", IntegerType))
    require(header.distinct.length == header.length,
      s"duplicate header names in first sheet of $path: " +
        header.diff(header.distinct).distinct.mkString(", "))
    val rows = all.flatMap { case (sheet, hdr, data) =>
      // align this sheet's columns onto the first header by NAME; a
      // column the first sheet doesn't declare would be dropped
      // SILENTLY — refuse instead, the workbook needs consistent headers
      val unknown = hdr.filterNot(header.contains)
      require(unknown.isEmpty,
        s"sheet '$sheet' of $path has columns absent from the first " +
          s"sheet's header: ${unknown.mkString(", ")}")
      // a LATER sheet's own duplicated header would collapse two columns
      // onto one index (last value wins) — same silent loss, same refusal
      require(hdr.distinct.length == hdr.length,
        s"duplicate header names in sheet '$sheet' of $path: " +
          hdr.diff(hdr.distinct).distinct.mkString(", "))
      val idx = hdr.map(header.indexOf(_))
      data.zipWithIndex.map { case (r, i) =>
        val vals = new Array[Any](header.length)
        idx.zip(r).foreach { case (j, v) => if (j >= 0 && v.nonEmpty) vals(j) = v }
        org.apache.spark.sql.Row.fromSeq(vals.toSeq :+ sheet :+ (i + 1))
      }
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }
}
