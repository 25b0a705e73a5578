package graft.graphs

import scala.collection.mutable

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find reference for small fixtures. */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress everything, then label by component min
    val byRoot = parent.keys.toSeq.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two triangles plus a bridge merge into one component") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L),
      (12L, 10L), (3L, 10L))
    val got = run(e)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L))
  }

  test("disjoint components keep distinct min labels; self-loops tolerated") {
    val e = Seq((5L, 6L), (6L, 5L), (7L, 7L), (20L, 21L))
    val got = run(e)
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 7L, 20L -> 20L, 21L -> 20L))
  }

  test("a 300-node chain converges (log-round algorithm, not propagation)") {
    // min-label propagation needs ~300 rounds here; large/small-star must
    // finish within the default maxIter=50 or components() throws
    val e = (0L until 300L).map(i => (i, i + 1L))
    val got = run(e)
    assert(got.size == 301 && got.values.toSet == Set(0L))
  }

  test("pseudo-random graph matches a driver-side union-find") {
    // deterministic LCG so the fixture never varies across runs
    var seed = 12345L
    def next(mod: Long): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; seed % mod }
    val e = (0 until 400).map(_ => (next(500), next(500)))
    assert(run(e) == reference(e))
  }

  test("dedupClusters labels non-paired docs as singleton canonicals") {
    val pairs = Seq((1L, 2L), (2L, 9L)).toDF("id_a", "id_b")
    val corpus = (1L to 10L).toDF("id")
    val got = ConnectedComponents.dedupClusters(pairs, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got.contains((1L, 1L, true)) && got.contains((2L, 1L, false)) &&
      got.contains((9L, 1L, false)))
    ((3L to 8L) :+ 10L).foreach(i => assert(got.contains((i, i, true))))
  }

  test("empty edge list yields no labels") {
    assert(run(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("incremental: label-artifact ∪ delta equals from-scratch, incl. component fusion") {
    // t0: two separate chains {1-2-3} and {10-11}, plus isolated pair {20-21}
    val t0 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val labels0 = ConnectedComponents.components(
      t0.toDF("a", "b"))
    // delta: fuses the two chains (3-10), grows one (11-12), and adds a
    // brand-new component (30-31) — all three incremental cases
    val delta = Seq((3L, 10L), (11L, 12L), (30L, 31L))
    val inc = ConnectedComponents.incremental(labels0, delta.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == reference(t0 ++ delta))
  }

  test("incremental: randomized law — labels(A) ∪ B relabels exactly as A ∪ B") {
    var seed = 777L
    def next(mod: Long): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; seed % mod }
    val a = (0 until 200).map(_ => (next(300), next(300)))
    val b = (0 until 100).map(_ => (next(300), next(300)))
    val labels0 = ConnectedComponents.components(a.toDF("a", "b"))
    val inc = ConnectedComponents.incremental(labels0, b.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == reference(a ++ b))
  }

  test("dedupClusters elects a surviving canonical when the min id left the corpus") {
    // stale pairs mention doc 5, which the corpus no longer contains: the
    // cluster must keep ONE of its surviving members (7), not zero
    val pairs = Seq((5L, 7L), (7L, 9L)).toDF("id_a", "id_b")
    val corpus = Seq(7L, 9L, 10L).toDF("id")
    val got = ConnectedComponents.dedupClusters(pairs, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((7L, 5L, true), (9L, 5L, false), (10L, 10L, true)))
  }
}
