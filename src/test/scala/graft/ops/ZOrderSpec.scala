package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ZOrderKernels

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton2 kernel matches the naive bit loop") {
    val rnd = new scala.util.Random(7)
    def naive(a: Long, b: Long): Long = {
      var out = 0L
      for (i <- 0 until 32) {
        out |= ((a >> i) & 1L) << (2 * i)
        out |= ((b >> i) & 1L) << (2 * i + 1)
      }
      out
    }
    for (_ <- 0 until 200) {
      val a = rnd.nextLong() & 0xffffffffL
      val b = rnd.nextLong() & 0xffffffffL
      assert(ZOrderKernels.morton2(a, b) == naive(a, b))
    }
    assert(ZOrderKernels.morton2(0, 0) == 0L)
    assert(ZOrderKernels.morton2(1, 0) == 1L)
    assert(ZOrderKernels.morton2(0, 1) == 2L)
    assert(ZOrderKernels.morton2(0xffffffffL, 0xffffffffL) == -1L)
  }

  test("zValue column expression agrees with the kernel and handles null") {
    val df = Seq((5L, 9L), (0L, 0L), (123456L, 654321L))
      .toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue($"a", $"b").as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == ZOrderKernels.morton2(r.getLong(0), r.getLong(1)))
    }
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b").as("z"))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("z-clustered layout bounds BOTH dimensions per partition") {
    // 128x128 grid -> 16 range slices of the z-curve. A z-ordered layout
    // keeps each slice compact in a AND b, so a predicate on EITHER
    // column touches a minority of partitions; a row-major (sort by a)
    // layout fails this for the trailing column.
    val grid = spark.range(128L * 128L)
      .select(($"id" % 128).as("a"), ($"id" / 128).cast("long").as("b"))
    def touched(df: org.apache.spark.sql.DataFrame, pred: org.apache.spark.sql.Column) =
      df.withColumn("p", spark_partition_id()).filter(pred)
        .select("p").distinct().count()
    val z = ZOrder.cluster(grid, "a", "b", numFiles = 16).cache()
    try {
      val zA = touched(z, $"a" < 32)
      val zB = touched(z, $"b" < 32)
      assert(zA <= 8, s"z-order should prune on a, touched $zA/16")
      assert(zB <= 8, s"z-order should prune on b, touched $zB/16")
      val rowMajor = grid.repartitionByRange(16, $"a", $"b")
      assert(touched(rowMajor, $"b" < 32) > 8,
        "sanity: the single-column sort does NOT bound the trailing dim")
    } finally z.unpersist()
  }

  test("morton2 is registered as a SQL function") {
    graft.GraftExtensions.install(spark)
    val r = spark.sql("SELECT morton2(3L, 1L) AS z").as[Long].head()
    assert(r == ZOrderKernels.morton2(3, 1)) // 3->0b0101, 1->0b0010 => 0b0111
  }
}
