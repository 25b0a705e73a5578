package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("decontamination flags exactly the docs sharing an n-gram") {
    val bench = Seq((100L, "the quick brown fox jumps over lazy dogs"))
      .toDF("doc_id", "text")
    val training = Seq(
      (1L, "totally unrelated text about spark plans and shuffles here"),
      (2L, "he said the quick brown fox appeared at dawn"), // 4-gram hit
      (3L, "quick brown fox jumps high and quick brown fox jumps far"), // 2 distinct? no: same gram repeated + 'fox jumps high and'... count distinct HIT grams
      (4L, "short text")) // < n words
      .toDF("doc_id", "text")
    val got = Decontaminate.overlap(training, bench, "text", "doc_id", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(2L, 3L))
    assert(got(2L) == 1L) // "the quick brown fox"
    // doc 3 shares "quick brown fox jumps" (repetition counts once)
    assert(got(3L) == 1L)
  }

  test("decontamination tier-2 string verify keeps counts exact vs naive join") {
    // brute-force reference on a slightly larger planted corpus
    val docs = (0L until 30L).map { i =>
      (i, (0 until 20).map(j => s"w${(i * 11 + j * 5) % 23}").mkString(" "))
    }
    val bench = docs.filter(_._1 % 7 == 0).toDF("doc_id", "text")
    val training = docs.filter(_._1 % 7 != 0).toDF("doc_id", "text")
    def gramsOf(t: String, n: Int) =
      t.toLowerCase.trim.split("\\s+").sliding(n).map(_.mkString(" ")).toSet
    val benchGrams = docs.filter(_._1 % 7 == 0)
      .flatMap(d => gramsOf(d._2, 4)).toSet
    val expect = docs.filter(_._1 % 7 != 0)
      .map(d => d._1 -> gramsOf(d._2, 4).count(benchGrams.contains).toLong)
      .filter(_._2 > 0).toMap
    val got = Decontaminate.overlap(training, bench, "text", "doc_id", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("wordGramHash64 kernel agrees with the string-gram formulation") {
    import graft.functions.TextExprs
    val texts = Seq(
      (1L, "  The   quick\tbrown FOX jumps\nover the lazy dog  "),
      (2L, "one two three four"),   // exactly n words
      (3L, "too short"),            // < n words → empty
      (4L, ""),
      (5L, "rep rep rep rep rep rep")) // duplicate grams collapse
      .toDF("id", "text")
    val got = texts.select($"id",
        size(TextExprs.wordGramHash64($"text", 4)).as("k"),
        size(array_distinct(Decontaminate.wordGrams($"text", 4))).as("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    got.foreach { case (id, kernelN, stringN) =>
      // string path emits one short gram for <n-word docs; kernel emits none
      if (id == 3L || id == 4L) assert(kernelN == 0 && stringN == 1, s"id=$id")
      else assert(kernelN == stringN, s"id=$id kernel=$kernelN string=$stringN")
    }
    // same normalized content ⇒ same hash set, regardless of spacing/case
    val pair = Seq((1L, "A  B\t C d e"), (2L, "a b c D E")).toDF("id", "text")
      .select(TextExprs.wordGramHash64($"text", 3).as("h"))
      .collect().map(_.getSeq[Long](0).toSet)
    assert(pair(0) == pair(1))
  }

  test("capPerKey keeps exactly cap rows per key, deterministically") {
    val df = (1L to 200L).map(i => (s"src${i % 4}", i)).toDF("source", "doc_id")
    val a = Scrub.capPerKey(df, "source", "doc_id", cap = 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Scrub.capPerKey(df.repartition(13), "source", "doc_id", cap = 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a.groupBy(_._1).forall(_._2.size == 7))
    assert(a == b, "survivor set must not depend on physical layout")
  }

  test("capPerKey leaves under-cap strata whole") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("source", "doc_id")
    assert(Scrub.capPerKey(df, "source", "doc_id", cap = 10).count() == 3)
  }
}
