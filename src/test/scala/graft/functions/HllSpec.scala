package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, tag: String = "g") =
    (1 to n).map(i => (tag, s"key_$i")).toDF("g", "k")

  test("registers are a set-function: partition- and duplicate-invariant") {
    val base = corpus(2000)
    val dup = base.unionAll(base).repartition(17)
    val a = Hll.registers(base, Seq("g"), $"k").orderBy("bucket").collect().toSeq
    val b = Hll.registers(dup, Seq("g"), $"k").orderBy("bucket").collect().toSeq
    assert(a == b)
    assert(a.size <= Hll.M)
    assert(a.forall { r => val x = r.getLong(2); x >= 1 && x <= Hll.WBITS + 1 })
  }

  test("merge law: slice-union registers == direct; merge is idempotent") {
    val all = corpus(3000)
    val sliceA = all.filter(substring($"k", 5, 10).cast("int") % 3 === 0)
    val sliceB = all.filter(substring($"k", 5, 10).cast("int") % 3 =!= 0)
    val direct = Hll.registers(all, Seq("g"), $"k")
    val merged = Hll.mergeRegisters(Seq(
      Hll.registers(sliceA, Seq("g"), $"k"),
      Hll.registers(sliceB, Seq("g"), $"k")), Seq("g"))
    assert(merged.orderBy("bucket").collect().toSeq ==
      direct.orderBy("bucket").collect().toSeq)
    // idempotent: merging a sketch with itself changes nothing
    val self = Hll.mergeRegisters(Seq(direct, direct), Seq("g"))
    assert(self.orderBy("bucket").collect().toSeq ==
      direct.orderBy("bucket").collect().toSeq)
  }

  test("raw branch: large cardinalities estimate within ~4σ of exact") {
    for (n <- Seq(3000, 12000)) {
      val est = Hll.estimate(
        Hll.registers(corpus(n, s"n$n"), Seq("g"), $"k"), Seq("g"))
        .select("est").as[Long].head()
      // σ ≈ 1.04/√512 ≈ 4.6%; allow 4σ
      assert(math.abs(est - n) < n * 0.19, s"n=$n est=$est")
    }
  }

  test("linear-counting branch: small cardinalities are near-exact") {
    for (n <- Seq(10, 100, 400)) {
      val r = Hll.estimate(
        Hll.registers(corpus(n, s"s$n"), Seq("g"), $"k"), Seq("g"))
        .select("v_zeros", "est").as[(Long, Long)].head()
      assert(r._1 > 0, s"n=$n expected empty registers")
      // LC error at V/m this high is a few percent
      assert(math.abs(r._2 - n) <= math.max(2, n * 0.1), s"n=$n est=${r._2}")
    }
  }

  test("estimator formula: hand-built registers reproduce the staged integers") {
    // all 512 registers at r=1: S = 512·2^29, raw = α·m²·2^30/S = α·2·512
    val regs = (0 until Hll.M).map(b => ("g", b.toLong, 1L))
      .toDF("g", "bucket", "r")
    val row = Hll.estimate(regs, Seq("g"))
      .select("v_zeros", "s_fix", "est").as[(Long, Long, Long)].head()
    assert(row._1 == 0L)
    assert(row._2 == 512L * (1L << 29))
    val est1 = math.min(1L << 42, (1L << 60) / row._2)
    val expected = ((Hll.ALPHA_FIX20 * est1) / 4096) / 1048576
    assert(row._3 == expected)
  }
}
