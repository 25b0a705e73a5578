package graft.sinks

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K5 sitemap XML writer (reference: sitemap.py:8-26,73-79): per resource,
  * accumulate page URLs into `sitemap.<resource>.xml` plus a handwritten
  * index file. URL lists are portal-page scale (≤ thousands) — collect to
  * the driver and serialize, exactly like the reference.
  */
object Sitemap {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")

  def urlsetXml(urls: Seq[String]): String = {
    val entries = urls.map(u => s"  <url><loc>${esc(u)}</loc></url>").mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
       |$entries
       |</urlset>""".stripMargin
  }

  def indexXml(baseUrl: String, names: Seq[String]): String = {
    val entries = names
      .map(n => s"  <sitemap><loc>${esc(s"$baseUrl/sitemap.$n.xml")}</loc></sitemap>")
      .mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
       |$entries
       |</sitemapindex>""".stripMargin
  }

  /** Write one sitemap per (name → urlColumn DataFrame) plus the index. */
  def dump(resources: Map[String, DataFrame], urlCol: String, baseUrl: String,
      outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    resources.foreach { case (name, df) =>
      val urls = df.select(col(urlCol).cast("string")).na.drop()
        .collect().map(_.getString(0)).toSeq
      write(s"$outDir/sitemap.$name.xml", urlsetXml(urls))
    }
    write(s"$outDir/sitemap.xml", indexXml(baseUrl, resources.keys.toSeq))
  }

  private def write(path: String, content: String): Unit =
    Files.write(Paths.get(path), content.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
}
