package graft.text

import graft.SparkSpec

/** q131's chat-template render — the span law: every loss-mask span,
  * cut out of the rendered string by its integer codepoint offsets,
  * must be exactly an assistant turn's content, fenced by the template
  * markers. (Value equality vs DuckDB is the driver oracle; this pins
  * the SEMANTICS the offsets promise a trainer.)
  */
class ChatRenderSpec extends SparkSpec {

  test("mask spans cut exactly the assistant contents, fenced by markers") {
    val rows = graft.queries.TextQueries.q131ChatRender(spark, sf).collect()
    assert(rows.nonEmpty)
    var spansChecked = 0
    rows.foreach { r =>
      val nTurns = r.getLong(1)
      val rendered = r.getString(2)
      val spans = r.getString(3).split(";").filter(_.nonEmpty)
        .map { sp => val Array(a, b) = sp.split(":"); (a.toLong, b.toLong) }
      val starts = spans.map(_._1).toSeq
      val ends = spans.map(_._2).toSeq
      assert(starts.size === (nTurns / 2).toInt, s"doc ${r.getLong(0)}")
      assert(starts.size === ends.size)
      starts.zip(ends).foreach { case (s, e) =>
        val content = rendered.substring(s.toInt, e.toInt)
        // content is marker-free and the fences sit exactly outside it
        assert(!content.contains("<|"), content)
        assert(rendered.regionMatches(s.toInt - "<|assistant|>\n".length,
          "<|assistant|>\n", 0, 14), s"no assistant header before $s")
        assert(rendered.regionMatches(e.toInt, "\n<|end|>\n", 0, 9),
          s"no footer at $e")
        spansChecked += 1
      }
      // user turns are NEVER inside any mask span
      val masked = starts.zip(ends)
      val userStart = rendered.indexOf("<|user|>\n")
      assert(!masked.exists { case (s, e) => userStart >= s && userStart < e })
    }
    assert(spansChecked > 0, "corpus produced no assistant turns")
  }
}
