package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextKernels.repetitionProfile]] — the Gopher self-repetition
  * signals, hand-computed on constructed texts: top-n-gram coverage
  * products, interval-union exactness for duplicated-n-gram coverage
  * (adjacent-overlap chains and gapped repeats), normalization, and
  * degenerate inputs. q143 carries the DuckDB oracle (a window-based
  * interval-union replay over the full corpus).
  */
class RepetitionSpec extends SparkSpec {

  private def profile(text: String): Seq[Long] = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("t")
      .select(TextExprs.repetitionProfile(col("t")))
      .collect()(0).getSeq[Long](0)
  }

  test("alternating bigram text: products and span lengths by hand") {
    // "a b a b a b": bigrams "a b"×3 (len 3) / "b a"×2 → top2 = 9;
    // trigrams "a b a"×2, "b a b"×2 (len 5) → 10; 4-grams "a b a b"×2
    // (len 7) → 14; both 5-grams distinct → dup5 = 0; one 6-gram → 0.
    assert(profile("a b a b a b") ===
      Seq(11L, 9L, 10L, 14L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("fully periodic text: overlapping dup chains union to the whole") {
    // "x y"×5: every 5..8-gram occurs ≥2×, and the overlapping spans
    // chain into one interval covering all 19 chars; the two 9-grams
    // are distinct and the single 10-gram can't repeat.
    assert(profile("x y x y x y x y x y") ===
      Seq(19L, 15L, 20L, 28L, 19L, 19L, 19L, 19L, 0L, 0L))
  }

  test("gapped repeat: union counts the gap out") {
    // "m n o p q" repeats at word 0 and word 5 with a 5-word tail after;
    // dup5 spans [0,9) ∪ [10,19) = 18 of 29 chars — an exact interval
    // union, not occurrences × length (which would double-count 0).
    val p = profile("m n o p q m n o p q x y z w v")
    assert(p(0) === 29L)
    assert(p(4) === 18L)
    assert(p.drop(5).forall(_ === 0L))
  }

  test("normalization: case, whitespace runs, and surrounding space fold") {
    // "  A  B\ta  b  " normalizes to "a b a b": den 7, top2 = "a b"×2×3.
    assert(profile("  A  B\ta  b  ").take(2) === Seq(7L, 6L))
  }

  test("degenerate inputs: empty, blank, single word") {
    assert(profile("") === Seq.fill(10)(0L))
    assert(profile("   \t\n ") === Seq.fill(10)(0L))
    assert(profile("hello") === Seq(5L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("null text yields null, not a crash") {
    val s = spark
    import s.implicits._
    val out = Seq(Option.empty[String]).toDF("t")
      .select(TextExprs.repetitionProfile(col("t")))
      .collect()(0)
    assert(out.isNullAt(0))
  }

  test("interpreted eval agrees with the codegen path") {
    val texts = Seq("a b a b a b", "x y x y x y x y x y",
      "m n o p q m n o p q x y z w v", "one two three four five six")
    val viaKernel = texts.map(t =>
      TextKernels.repetitionProfile(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
        .toLongArray().toSeq)
    assert(texts.map(profile) === viaKernel)
  }
}
