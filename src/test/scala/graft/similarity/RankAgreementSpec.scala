package graft.similarity

import graft.SparkSpec
import graft.queries.SearchQueries

/** q224's agreement-algebra invariants on the real sf0.001 corpus:
  * pair counts must partition (concordant + discordant = C(overlap,2)
  * — ranks are strict, no ties possible), a zero footrule forces zero
  * discordance (identical rank vectors cannot cross), overlap is
  * bounded by k, and the probe spine is complete (every 37th doc
  * surfaces even when its lists are disjoint).
  */
class RankAgreementSpec extends SparkSpec {

  test("q224: pair partition, footrule/discordance link, full spine") {
    val rows = SearchQueries.q224RankAgreement(spark, sf).collect()
    val nProbes = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id % 37 = 0").count()
    assert(rows.length == nProbes, s"spine: ${rows.length} vs $nProbes")
    rows.foreach { r =>
      val (ov, fr, co, di) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ov <= 10, s"overlap $ov > k")
      assert(co + di == ov * (ov - 1) / 2,
        s"pair partition: $co + $di vs C($ov,2)")
      if (fr == 0) assert(di == 0, s"zero footrule but $di discordant")
      assert(fr <= ov * 18, "footrule bounded by overlap * (2k-2)")
    }
    assert(rows.exists(_.getLong(1) > 0), "at least one overlapping probe")
  }
}
