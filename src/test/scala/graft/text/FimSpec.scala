package graft.text

import graft.SparkSpec
import graft.queries.TextQueries

/** q218 FIM invariants — the sentinel markup must be losslessly
  * invertible: parsing the rendered string back into (pre, mid, suf)
  * and splicing pre·mid·suf must reproduce the whitespace-normalized
  * original for BOTH orderings. The DuckDB oracle pins bytes; this
  * pins the algebra.
  */
class FimSpec extends SparkSpec {

  test("q218: PSM and SPM render round-trips to the original tokens") {
    val out = TextQueries.q218FimTransform(spark, sf).collect()
    assert(out.nonEmpty)
    val modes = out.map(_.getString(1)).groupBy(identity).map {
      case (k, v) => k -> v.length
    }
    assert(modes.keySet == Set("plain", "psm", "spm"),
      s"all three modes exercised: $modes")
    out.foreach { r =>
      val (mode, n, a, b, s) = (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))
      mode match {
        case "plain" =>
          assert(a == -1L && b == -1L, "plain rows carry cut -1")
          assert(!s.contains("<fim_"), "plain rows carry no sentinels")
        case "psm" =>
          val m = "(?s)<fim_prefix>(.*)<fim_suffix>(.*)<fim_middle>(.*)".r
          s match {
            case m(pre, suf, mid) =>
              val joined = Seq(pre, mid, suf).filter(_.nonEmpty)
                .mkString(" ")
              assert(joined.split("\\s+").count(_.nonEmpty) == n,
                s"token count after splice: $joined")
              assert(pre.split("\\s+").count(_.nonEmpty) == a,
                s"prefix length $a")
              assert(mid.split("\\s+").count(_.nonEmpty) == b - a,
                s"middle length ${b - a}")
            case _ => fail(s"unparseable psm render: $s")
          }
        case "spm" =>
          val m = "(?s)<fim_suffix>(.*)<fim_prefix>(.*)<fim_middle>(.*)".r
          s match {
            case m(suf, pre, mid) =>
              assert(Seq(pre, mid, suf).map(
                _.split("\\s+").count(_.nonEmpty)).sum == n,
                "token partition covers the doc")
            case _ => fail(s"unparseable spm render: $s")
          }
      }
      if (mode != "plain") assert(a >= 0 && a <= b && b <= n,
        s"cut order: $a $b $n")
    }
  }
}
