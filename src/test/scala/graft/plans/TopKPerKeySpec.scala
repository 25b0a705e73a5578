package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKPerKeySpec extends SparkSpec {

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")
    .select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")

  test("heap top-k matches the window row_number formulation exactly") {
    val k = 3
    val windowed = {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      li.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
    }
    val heap = TopKPerKey.topK(li, Seq("l_suppkey"),
      Seq(TopKPerKey.Sort("l_shipdate"), TopKPerKey.Sort("l_orderkey"),
        TopKPerKey.Sort("l_linenumber")), k)

    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
    assert(keyset(heap) == keyset(windowed))
  }

  test("physical plan uses TopKPerKeyExec with no Sort/Window") {
    val out = TopKPerKey.topK(li, Seq("l_suppkey"), Seq(TopKPerKey.Sort("l_quantity")), 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), "window operator must not appear")
    assert(!plan.toLowerCase.contains("sortexec"), "no full sort expected")
  }

  test("map-side partial pass shrinks the shuffle: partial under exchange under final") {
    val out = TopKPerKey.topK(li, Seq("l_suppkey"), Seq(TopKPerKey.Sort("l_quantity")), 2)
    val plan = out.queryExecution.executedPlan.toString
    // expect: TopKPerKey … Exchange … TopKPerKeyPartial (reading top-down)
    val exch = plan.indexOf("Exchange")
    val part = plan.indexOf("TopKPerKeyPartial")
    assert(part >= 0, s"partial node missing:\n$plan")
    assert(exch >= 0 && exch < part, s"exchange must sit above the partial pass:\n$plan")
    assert(out.count() > 0)
  }

  test("descending sort and global (keyless) top-k work") {
    val topGlobal = TopKPerKey.topK(li, Nil,
      Seq(TopKPerKey.Sort("l_quantity", descending = true),
        TopKPerKey.Sort("l_orderkey"), TopKPerKey.Sort("l_linenumber")), 5)
    val got = topGlobal.select("l_quantity").collect().map(_.getDouble(0))
    val expect = li.orderBy(col("l_quantity").desc).limit(5)
      .select("l_quantity").collect().map(_.getDouble(0))
    assert(got.sorted.toSeq == expect.sorted.toSeq)
  }

  test("partial-pass epoch flushing (memory bound) does not change results") {
    spark.conf.set("spark.graft.topk.partialFlushKeys", "2")
    try {
      val flushed = TopKPerKey.topK(li, Seq("l_suppkey"),
        Seq(TopKPerKey.Sort("l_quantity"), TopKPerKey.Sort("l_orderkey"),
          TopKPerKey.Sort("l_linenumber")), 3)
        .collect().map(_.toString).sorted
      spark.conf.unset("spark.graft.topk.partialFlushKeys")
      val normal = TopKPerKey.topK(li, Seq("l_suppkey"),
        Seq(TopKPerKey.Sort("l_quantity"), TopKPerKey.Sort("l_orderkey"),
          TopKPerKey.Sort("l_linenumber")), 3)
        .collect().map(_.toString).sorted
      assert(flushed.sameElements(normal))
    } finally spark.conf.unset("spark.graft.topk.partialFlushKeys")
  }

  test("null sort values order exactly as the window formulation (nulls first asc)") {
    import spark.implicits._
    val df = Seq(
      ("k1", Some(5L), 1L), ("k1", None, 2L), ("k1", Some(1L), 3L),
      ("k2", None, 4L), ("k2", None, 5L), ("k2", Some(9L), 6L)
    ).toDF("k", "v", "id")
    val w = Window.partitionBy(col("k")).orderBy(col("v"), col("id"))
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
      .collect().map(_.toString).sorted
    val heap = TopKPerKey.topK(df, Seq("k"),
      Seq(TopKPerKey.Sort("v"), TopKPerKey.Sort("id")), 2)
      .collect().map(_.toString).sorted
    assert(heap.sameElements(windowed))
  }

  test("k larger than group size returns whole groups") {
    val out = TopKPerKey.topK(li.limit(50), Seq("l_suppkey"),
      Seq(TopKPerKey.Sort("l_quantity")), 1000)
    assert(out.count() == 50)
  }
}
