package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch laws ([[Cms]]); q122 carries the DuckDB oracle and
  * the parquet round-trip gate.
  */
class CmsSpec extends SparkSpec {

  private val D = 4
  private val W = 256

  private def keysDf(ks: Seq[String]): DataFrame = {
    val s = spark
    import s.implicits._
    ks.toDF("k")
  }

  /** skewed fixture: "heavy" 50x, "warm" 7x, hundreds of singletons */
  private def corpus: DataFrame = keysDf(
    Seq.fill(50)("heavy") ++ Seq.fill(7)("warm") ++
      (1 to 400).map(i => s"single_$i"))

  private def estimates(sk: DataFrame, ks: Seq[String]): Map[String, Long] =
    Cms.estimate(sk, keysDf(ks).distinct(), "k", D, W)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimates never under-count, and bound the over-shoot by N") {
    val sk = Cms.sketch(corpus, col("k"), D, W)
    val est = estimates(sk, Seq("heavy", "warm", "single_1", "single_399"))
    assert(est("heavy") >= 50L && est("heavy") <= 50L + 457L)
    assert(est("warm") >= 7L)
    assert(est("single_1") >= 1L)
    assert(est("single_399") >= 1L)
  }

  test("a never-inserted key estimates to its collision mass only") {
    val sk = Cms.sketch(corpus, col("k"), D, W)
    val est = estimates(sk, Seq("absent-key-xyz"))
    // min over 4 depths of collision mass: overwhelmingly below the
    // heavy key's count on a 457-row corpus over 256 buckets
    assert(est("absent-key-xyz") < 50L)
  }

  test("merge of two halves equals the sketch of the union, exactly") {
    val a = corpus.filter(length(col("k")) % 2 === 0)
    val b = corpus.filter(length(col("k")) % 2 === 1)
    val merged = Cms.merge(
        Cms.sketch(a, col("k"), D, W), Cms.sketch(b, col("k"), D, W))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val whole = Cms.sketch(corpus, col("k"), D, W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(merged === whole)
  }

  test("the sketch is partitioning-invariant") {
    val p1 = Cms.sketch(corpus.repartition(1), col("k"), D, W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val p13 = Cms.sketch(corpus.repartition(13), col("k"), D, W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(p1 === p13)
  }

  test("weighted sketch sums weights; zero-weight rows add nothing") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 5L), ("a", 3L), ("b", 2L), ("c", 0L)).toDF("k", "wt")
    val sk = Cms.sketchWeighted(df, col("k"), col("wt"), D, W)
    val est = Cms.estimate(sk, keysDf(Seq("a", "b", "c")).distinct(), "k", D, W)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") >= 8L && est("b") >= 2L)
    // c's own contribution is 0; any mass it sees is collisions from a/b
    assert(est("c") <= 10L)
  }

  test("sketch stays within depth*width rows no matter the key cardinality") {
    val many = keysDf((1 to 5000).map(i => s"k$i"))
    assert(Cms.sketch(many, col("k"), D, W).count() <= (D * W).toLong)
  }
}
