package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** [[TextKernels.charEntropyFix]] — the fixed-point codepoint-entropy
  * quality gate (q126). Exactness on closed-form alphabets, the float
  * bound on arbitrary text, codepoint (not UTF-16 unit) counting, and
  * codegen parity through the Column API.
  */
class EntropySpec extends SparkSpec {

  private def h(s: String): Long =
    TextKernels.charEntropyFix(UTF8String.fromString(s))

  /** Double-precision reference, for the approximation-bound test. */
  private def hRef(s: String): Double = {
    val cps = s.codePoints().toArray
    if (cps.isEmpty) return 0.0
    val n = cps.length.toDouble
    cps.groupBy(identity).values.map { g =>
      val p = g.length / n
      -p * math.log(p) / math.log(2)
    }.sum
  }

  test("uniform alphabets are exact powers: log2(k) bits") {
    assert(h("abcd") === 2L << 16) // 4 symbols, p = 1/4 each
    assert(h("aabbccdd") === 2L << 16) // counts scale out
    assert(h("ab") === 1L << 16)
    assert(h("abcdefgh") === 3L << 16)
  }

  test("degenerate text scores zero") {
    assert(h("") === 0L)
    assert(h("a") === 0L)
    assert(h("aaaaaaaaaa") === 0L)
  }

  test("codepoints, not UTF-16 units: surrogate pairs count once") {
    // U+1F600 is two chars but one codepoint; two distinct codepoints at
    // p = 1/2 each must give exactly 1.0 bit, which the UTF-16-unit
    // histogram (4 units: 2 distinct surrogates + 'a' …) cannot.
    assert(h("😀a") === 1L << 16)
    assert(h("😀😀") === 0L)
  }

  test("fixed-point tracks the float entropy within floor error") {
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val s = (0 until (10 + rnd.nextInt(400)))
        .map(_ => ('a' + rnd.nextInt(20)).toChar).mkString
      val d = math.abs(h(s).toDouble / 65536.0 - hRef(s))
      // each symbol's surprisal floors twice (prob quantization + log
      // truncation); the weighted mean stays within ~1e-3 bits here
      assert(d < 0.01, s"fix=${h(s)} ref=${hRef(s)} on $s")
    }
  }

  test("entropy separates repetition from prose from noise") {
    val rep = "spam spam spam spam spam spam spam spam"
    val prose = "the quick brown fox jumps over the lazy dog near banks"
    val rnd = new scala.util.Random(3)
    val noise = (0 until 300).map(_ => (33 + rnd.nextInt(90)).toChar).mkString
    assert(h(rep) < h(prose) && h(prose) < h(noise))
  }

  test("Column API matches the kernel (codegen path)") {
    import spark.implicits._
    val docs = Seq("abcd", "", "mixed entropy text 123", "😀a")
    val out = docs.toDF("t")
      .select(TextExprs.charEntropyFix(col("t")).as("e"))
      .as[Long].collect()
    assert(out.toSeq === docs.map(h))
  }
}
