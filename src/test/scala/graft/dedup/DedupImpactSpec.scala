package graft.dedup

import graft.SparkSpec
import graft.queries.DedupQueries

/** q225's disparate-impact semantics on a planted corpus: a language
  * whose docs are mutual near-dups loses all but the canonical
  * (removal 667‰ of 3), a language of distinct docs loses nothing, and
  * the per-mille stays on the integer grid. Also pins keep-one = MIN
  * id: the removed docs are exactly the non-minimal cluster members.
  */
class DedupImpactSpec extends SparkSpec {

  test("q225: near-dup language pays, distinct language doesn't") {
    val s = spark
    import s.implicits._
    val base = (1 to 100).map("tok" + _)
    def doc(repl: Map[Int, String]) =
      base.zipWithIndex.map { case (w, i) => repl.getOrElse(i, w) }
        .mkString(" ")
    // lang aa: three one-token mutations of the same doc → one cluster
    // lang bb: three disjoint docs → three singletons
    val rows = Seq(
      (0L, doc(Map.empty), "aa"),
      (1L, doc(Map(50 -> "x1")), "aa"),
      (2L, doc(Map(51 -> "x2")), "aa"),
      (10L, (1 to 100).map("yyy" + _).mkString(" "), "bb"),
      (11L, (1 to 100).map("zzz" + _).mkString(" "), "bb"),
      (12L, (1 to 100).map("www" + _).mkString(" "), "bb"))
      .map { case (id, t, lang) => (id, t, lang, "s", 0L) }
    val dir = s"/tmp/graft_q225_spec_${ProcessHandle.current().pid()}"
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupQueries.q225DedupImpact(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set("aa", "bb"))
    assert(out("aa") == ((3L, 2L, 666L)),
      s"near-dup lang: 2 of 3 removed, 666 per-mille: ${out("aa")}")
    assert(out("bb") == ((3L, 0L, 0L)),
      s"distinct lang: nothing removed: ${out("bb")}")
  }
}
