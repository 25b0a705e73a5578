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

  test("wordGrams kernel equals the builtin slice/join formulation") {
    import graft.functions.TextExprs
    val texts = Seq(
      (1L, "  The   quick\tbrown FOX jumps\nover the lazy dog  "),
      (2L, "one two three four"),
      (3L, "too short"),
      (4L, ""),
      (5L, "rep rep rep rep rep rep")) // non-distinct: repeats preserved
      .toDF("id", "text")
    val builtin = {
      val toks = Decontaminate.wordTokens(lower($"text"))
      when(size(toks) >= 4,
        transform(sequence(lit(0), size(toks) - 4),
          i => array_join(slice(toks, i + 1, lit(4)), " ")))
        .otherwise(array_remove(array(lit("")), ""))
    }
    val rows = texts
      .select($"id", TextExprs.wordGrams($"text", 4).as("k"), builtin.as("s"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"id=${r.getLong(0)}")
    }
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

  test("weightedSample: under-k strata keep every positive-weight row") {
    val d = (1L to 8L).map(i => (i, "s", i)).toDF("id", "k", "w")
      .union(Seq((9L, "s", 0L)).toDF("id", "k", "w"))
    val out = Scrub.weightedSample(d, "k", "id", "w", k = 100)
    assert(out.count() == 8, "zero-weight row must drop; the rest stay")
  }

  test("weightedSample: selection frequency tracks the weights (ES property)") {
    // one stratum, 2000 rows: ids 0..999 weight 9, 1000..1999 weight 1;
    // a 200-sample should include heavy rows ~9x as often (ES: inclusion
    // prob ≈ k·w/Σw for k ≪ n → ≈180 heavy, ≈20 light)
    val d = (0L until 2000L).map(i =>
      (i, "s", if (i < 1000) 9L else 1L)).toDF("id", "k", "w")
    val heavy = Scrub.weightedSample(d, "k", "id", "w", k = 200)
      .filter($"id" < 1000).count()
    assert(heavy > 150 && heavy < 199, s"heavy count $heavy far from ~180")
  }

  test("weightedSample: deterministic and partition-invariant") {
    val d = (0L until 500L).map(i => (i, s"s${i % 3}", 1L + i % 7))
      .toDF("id", "k", "w")
    val a = Scrub.weightedSample(d.repartition(1), "k", "id", "w", 20)
      .orderBy("id").collect().toSeq
    val b = Scrub.weightedSample(d.repartition(11), "k", "id", "w", 20)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("weightedSample: raising a row's weight never worsens its rank") {
    val base = (0L until 300L).map(i => (i, "s", 5L)).toDF("id", "k", "w")
    val bumped = base.withColumn("w",
      when($"id" === 123L, lit(500L)).otherwise($"w"))
    val inBase = Scrub.weightedSample(base, "k", "id", "w", 50)
      .filter($"id" === 123L).count() == 1
    val inBumped = Scrub.weightedSample(bumped, "k", "id", "w", 50)
      .filter($"id" === 123L).count() == 1
    // monotone: selected under weight 5 ⇒ still selected under 500
    assert(!inBase || inBumped)
    assert(inBumped, "a 100x weight bump on 300 rows/k=50 must select")
  }

  test("boilerplate strip removes exactly the hot lines, keeps order") {
    val docs = Seq(
      (1L, "HEADER\nalpha beta\ngamma\nFOOTER"),
      (2L, "HEADER\ndelta\nFOOTER"),
      (3L, "HEADER\n  \nepsilon\nFOOTER"),  // blank line is not content
      (4L, "HEADER\nFOOTER"),               // fully boilerplate
      (5L, "zeta\nHEADER\neta\nFOOTER"))    // hot line mid-document
      .toDF("doc_id", "text")
    val got = Boilerplate.strip(docs, "text", "doc_id", minDocs = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == (("alpha beta\ngamma", 2L, 2L)))
    assert(got(2L) == (("delta", 1L, 2L)))
    assert(got(3L) == (("epsilon", 1L, 2L)))
    assert(got(4L) == (("", 0L, 2L)))       // kept in output, emptied
    assert(got(5L) == (("zeta\neta", 2L, 2L)))
  }

  test("boilerplate threshold counts DISTINCT docs, not occurrences") {
    // "dup" appears 5 times but only in 2 distinct docs → NOT boilerplate
    val docs = Seq(
      (1L, "dup\ndup\ndup\nunique one"),
      (2L, "dup\ndup\nunique two"),
      (3L, "other"), (4L, "other2"), (5L, "other3"))
      .toDF("doc_id", "text")
    val hot = Boilerplate.hotLines(docs, "text", "doc_id", minDocs = 3)
      .collect().map(_.getString(0)).toSet
    assert(hot.isEmpty)
    val hot2 = Boilerplate.hotLines(docs, "text", "doc_id", minDocs = 2)
      .collect().map(_.getString(0)).toSet
    assert(hot2 == Set("dup"))
  }

  test("overlapBloom output is bit-equal to exact overlap at any fpp") {
    val docs = (0L until 40L).map { i =>
      (i, (0 until 25).map(j => s"w${(i * 7 + j * 3) % 19}").mkString(" "))
    }
    val bench = docs.filter(_._1 % 9 == 0).toDF("doc_id", "text")
    val training = docs.filter(_._1 % 9 != 0).toDF("doc_id", "text")
    val exact = Decontaminate.overlap(training, bench, "text", "doc_id", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a deliberately sloppy 30% fpp filter must still verify exactly
    for (fpp <- Seq(0.3, 0.01)) {
      val got = Decontaminate
        .overlapBloom(training, bench, "text", "doc_id", n = 4, fpp = fpp)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == exact, s"fpp=$fpp")
    }
    assert(exact.nonEmpty) // the planted corpus must actually overlap
  }

  test("takeByBudget equals the running-sum window formulation") {
    val rows = (1L to 300L).map(i => (s"lang${i % 3}", i, (i % 17) + 1))
    val df = rows.toDF("lang", "doc_id", "w")
    for (budget <- Seq(1L, 50L, 300L, 100000L)) {
      val got = Scrub.takeByBudget(df, "lang", "doc_id", "w", budget)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // reference: greedy prefix in (md5(id), id) order per stratum
      def md5hex(s: String): String = java.security.MessageDigest
        .getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val expect = rows.groupBy(_._1).flatMap { case (_, g) =>
        var cum = 0L
        g.sortBy(r => (md5hex(r._2.toString), r._2)).takeWhile { r =>
          val keep = cum < budget; cum += r._3; keep
        }
      }.map(r => (r._1, r._2)).toSet
      assert(got == expect, s"budget=$budget")
    }
  }

  test("takeByBudget survivors are layout-independent") {
    val df = (1L to 500L).map(i => (s"s${i % 2}", i, 5L)).toDF("k", "id", "w")
    val a = Scrub.takeByBudget(df, "k", "id", "w", 200L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Scrub.takeByBudget(df.repartition(17), "k", "id", "w", 200L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
    // 5 tokens each, budget 200 → exactly 40 docs per stratum
    assert(a.groupBy(_._1).forall(_._2.size == 40))
  }

  test("unigramScore: exact counts on a planted corpus") {
    val docs = Seq(
      (1L, "a a b"),     // tf: a=2,b=1; corpus: a=3,b=2,c=1
      (2L, "b c A"))     // lowercased: a=1,b=1,c=1
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramScore(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: 2·cnt(a)+1·cnt(b) = 2·3+1·2 = 8 over 3 tokens
    assert(got(1L) == ((3L, 8L, 8.0 / 3.0)))
    // doc 2: 2+3+1... b=2, c=1, a=3 → 2+1+3 = 6 over 3 tokens
    assert(got(2L) == ((3L, 6L, 2.0)))
  }

  test("paragraph dedup: first occurrence wins across and within docs") {
    val docs = Seq(
      (1L, "alpha\n\nbeta\n\nalpha"),   // within-doc repeat of alpha drops
      (2L, "beta\n\ngamma"),            // beta seen in doc 1 → drops
      (3L, "alpha\n\nbeta"),            // fully duplicate → emptied
      (4L, "  \n\n\n\ndelta"))          // blank paragraphs filtered
      .toDF("doc_id", "text")
    val got = ParagraphDedup.dedup(docs, "text", "doc_id", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == (("alpha\n\nbeta", 2L, 1L)))
    assert(got(2L) == (("gamma", 1L, 1L)))
    assert(got(3L) == (("", 0L, 2L)))
    assert(got(4L) == (("delta", 1L, 0L)))
  }

  test("paragraph dedup: ord column (not doc_id) decides the winner") {
    // doc 10 arrives FIRST (ord 0) so its copy of 'x' wins over doc 1's
    val docs = Seq((10L, 0L, "x\n\nten"), (1L, 1L, "x\n\none"))
      .toDF("doc_id", "ord", "text")
    val got = ParagraphDedup.dedup(docs, "text", "doc_id", "ord")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(10L) == "x\n\nten")
    assert(got(1L) == "one")
  }

  test("paragraph dedup: ord TIES resolve deterministically by doc id") {
    // both docs share ord 0 and the paragraph 'x' at pos 0 — the smaller
    // doc_id must win regardless of partition layout
    val docs = Seq((7L, 0L, "x\n\nseven"), (3L, 0L, "x\n\nthree"))
      .toDF("doc_id", "ord", "text")
    for (parts <- Seq(1, 5)) {
      val got = ParagraphDedup.dedup(docs.repartition(parts), "text",
        "doc_id", "ord")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got(3L) == "x\n\nthree", s"parts=$parts")
      assert(got(7L) == "seven", s"parts=$parts")
    }
  }
}
