package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")
    .select(col("l_returnflag").as("k"),
      floor(col("l_extendedprice") * 100).cast("long").as("v"))

  test("every estimate lands within the 12.5% relative-error bound of exact") {
    val est = Quantiles.approxQuantiles(li, Seq("k"), "v",
      Seq((1, 2), (95, 100), (99, 100)))
      .select($"k", $"q_num", $"q_den", $"quantile").collect()
    est.foreach { r =>
      val q = r.getInt(1).toDouble / r.getInt(2)
      val exact = li.filter($"k" === r.getString(0))
        .stat.approxQuantile("v", Array(q), 0.0).head // relErr 0 = exact
      val got = r.getLong(3).toDouble
      // rank conventions differ by at most one element between the two
      // definitions; the bucket bound is 12.5% — allow one width both ways
      assert(got <= exact * 1.14 + 1 && got >= exact / 1.14 - 1,
        s"k=${r.getString(0)} q=$q: $got vs exact $exact beyond the bound")
    }
  }

  test("small values (< 8) are exact, not bucketed") {
    val d = Seq(0L, 1L, 2L, 7L, 7L, 7L).toDF("v").withColumn("k", lit("x"))
    val p50 = Quantiles.approxQuantiles(d, Seq("k"), "v", Seq((1, 2)))
      .select("quantile").as[Long].head()
    assert(p50 == 2L)
  }

  test("histograms are bounded and merge by addition (cross-run law)") {
    val h1 = Quantiles.histogram(li.filter($"v" % 2 === 0), Seq("k"), "v")
    val h2 = Quantiles.histogram(li.filter($"v" % 2 =!= 0), Seq("k"), "v")
    // merge = plain re-aggregation of persisted rows, no special operator
    val merged = h1.unionByName(h2)
      .groupBy("k", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Quantiles.histogram(li, Seq("k"), "v")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
    // bounded summary: well under 61 octaves × 8 subs + 8
    val maxBuckets = whole.groupBy("k").count().agg(max("count")).as[Long].head()
    assert(maxBuckets <= 496, s"unbounded histogram? $maxBuckets buckets")
  }

  test("quantile picks are partition-invariant") {
    val a = Quantiles.approxQuantiles(li.repartition(1), Seq("k"), "v",
      Seq((9, 10))).orderBy("k").collect().toSeq
    val b = Quantiles.approxQuantiles(li.repartition(13), Seq("k"), "v",
      Seq((9, 10))).orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("bucket encoding is monotone and lower bounds invert it") {
    val vs = (Seq(0L, 1L, 7L, 8L, 9L, 15L, 16L, 100L, 1000L, 123456789L) ++
      (0 until 200).map(i => math.abs(new scala.util.Random(i).nextLong()) % (1L << 40)))
      .distinct.sorted
    val df = vs.toDF("v")
      .select($"v", Quantiles.bucketOf($"v").as("b"))
      .select($"v", $"b", Quantiles.bucketLowerBound($"b").as("lb"))
      .orderBy("v").collect()
    var prevB = -1L
    df.foreach { r =>
      val (v, b, lb) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(b >= prevB, s"bucket not monotone at v=$v")
      assert(lb <= v, s"lower bound $lb above its value $v")
      assert(v < 8 || v <= lb + lb / 8, s"v=$v too far above lb=$lb")
      prevB = b
    }
  }
}
