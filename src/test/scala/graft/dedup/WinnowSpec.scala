package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.functions.{HashExprs, HashKernels}

/** [[HashKernels.winnowHash64]] — the Schleimer/Wilkerson/Aiken
  * winnowing laws: the match guarantee, the density bound, subset-of-
  * shingles containment, unsigned minima, and degenerate inputs. q150
  * carries the DuckDB oracle (positional hash chain + list_min window
  * replay).
  */
class WinnowSpec extends SparkSpec {

  private def winnow(text: String, n: Int = 5, w: Int = 4): Seq[Long] = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("t")
      .select(HashExprs.winnowHash64(col("t"), n, w))
      .collect()(0).getSeq[Long](0)
  }

  private def shingles(text: String, n: Int = 5): Seq[Long] = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("t")
      .select(HashExprs.shingleHash64(col("t"), n))
      .collect()(0).getSeq[Long](0)
  }

  test("match guarantee: a shared run of w+n-1 chars shares a fingerprint") {
    // distinct prefixes/suffixes, one identical 8-char run (w=4, n=5)
    val shared = "xqzwvkjy"
    val a = s"aaaa bbbb $shared cccc dddd"
    val b = s"eeee ffff $shared gggg hhhh"
    assert(winnow(a).toSet.intersect(winnow(b).toSet).nonEmpty)
  }

  test("fingerprints are a subset of the document's shingle hashes") {
    val t = "the quick brown fox jumps over the lazy dog"
    assert(winnow(t).toSet.subsetOf(shingles(t).toSet))
  }

  test("density: far fewer fingerprints than positions, never zero for real text") {
    val t = ("w" + "ords and more words flowing onward ") * 8
    val nPositions = shingles(t).size // lower bound on positions (deduped)
    val sel = winnow(t, 5, 8)
    assert(sel.nonEmpty && sel.size < nPositions,
      s"expected winnowed subset, got ${sel.size} of $nPositions")
  }

  test("window minima are UNSIGNED: a negative-long hash can win over positive") {
    // over all windows the selected values must each be the unsigned min
    // of SOME window — verify via a reference implementation
    val t = "abcdefghijklmnopqrstuvwxyz0123456789"
    val all = {
      // positional hashes via the kernel's own contract: recompute with
      // w = 1 (every position selected, distinct)
      winnow(t, 5, 1).toSet
    }
    assert(all == shingles(t).toSet) // w=1 degenerates to all shingles
    val sel = winnow(t, 5, 4).toSet
    assert(sel.subsetOf(all))
  }

  test("identical texts yield identical fingerprints; an edit changes only nearby ones") {
    val base = "one two three four five six seven eight nine ten " * 3
    assert(winnow(base) == winnow(base))
    val edited = base.replace("five", "f1ve")
    val a = winnow(base).toSet
    val b = winnow(edited).toSet
    // local edit: most fingerprints survive
    assert(a.intersect(b).size * 2 > a.size)
    assert(a != b)
  }

  test("degenerate inputs: empty, whitespace, shorter than n") {
    assert(winnow("").isEmpty)
    assert(winnow("   \t ").isEmpty)
    // shorter than n: one truncated gram, one window, one fingerprint
    assert(winnow("ab", 5, 4).size == 1)
  }
}
