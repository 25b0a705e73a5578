package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.FixedLogKernel

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._
  import RecordLinkage.Field

  // m = 0.9 / 0.1 at 2^30 scale
  private val M9 = 966367641L
  private val M1 = 107374182L

  test("fieldWeights: u from exact value frequencies, weights hand-computed") {
    // 4 records: `k` has 2+2 equal values -> u_num = 2·1 + 2·1 = 4,
    // u_den = 4·3 = 12 -> u = 1/3; `id` all distinct -> u_num = 0 -> floor 1
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b")).toDF("id", "k")
    val fields = Seq(Field("id", col("id"), M9, M1),
      Field("k", col("k"), M9, M1))
    val w = RecordLinkage.fieldWeights(df, fields)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    def lg(p: Long) = FixedLogKernel.log2fix(p, 30, 16)
    val uK = 4L * 1073741824L / 12L // floor
    assert(w("k") == ((lg(M9) - lg(uK), lg(M1) - lg((8L * 1073741824L) / 12L))))
    // unique field: u floors to 1 (2^-30) -> agreement weight ~ 30 bits,
    // far above the k field's ~1.4 bits — the informativeness asymmetry
    assert(w("id")._1 == lg(M9) - lg(1L))
    assert(w("id")._1 > w("k")._1)
    // disagreement on a unique field costs ~nothing (1-u ≈ 1)
    assert(w("id")._2 == lg(M1) - lg((12L * 1073741824L) / 12L))
  }

  test("scorePairs: score is the sum of the chosen weights; decisions split") {
    val recs = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "x"),
      (4L, "b", "z")).toDF("id", "k", "t")
    val fields = Seq(Field("k", col("k"), M9, M1),
      Field("t", col("t"), M9, M1))
    val w = RecordLinkage.fieldWeights(recs, fields)
    val wm = w.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val pairs = Seq(
      (1L, 2L, "a", "a", "x", "y"), // k agrees, t disagrees
      (1L, 3L, "a", "b", "x", "x"), // k disagrees, t agrees
      (2L, 4L, "a", "b", "y", "z")) // both disagree
      .toDF("id_a", "id_b", "k_a", "k_b", "t_a", "t_b")
    val out = RecordLinkage.scorePairs(pairs, w, fields, thresholdBits = 2)
      .orderBy("id_a", "id_b")
      .select("n_agree", "score_fix", "decision").as[(Long, Long, Int)]
      .collect()
    assert(out(0) == ((1L, wm("k")._1 + wm("t")._2,
      decide(wm("k")._1 + wm("t")._2))))
    assert(out(1) == ((1L, wm("k")._2 + wm("t")._1,
      decide(wm("k")._2 + wm("t")._1))))
    assert(out(2) == ((0L, wm("k")._2 + wm("t")._2, -1)))
  }

  test("scorePairs: a NULL on either side is zero evidence, not disagreement") {
    val recs = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "x"),
      (4L, "b", "z")).toDF("id", "k", "t")
    val fields = Seq(Field("k", col("k"), M9, M1),
      Field("t", col("t"), M9, M1))
    val w = RecordLinkage.fieldWeights(recs, fields)
    val wm = w.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val pairs = Seq(
      (1L, 2L, Some("a"), Some("a"), None, Some("y")),    // t missing left
      (1L, 3L, None, Some("b"), Some("x"), Some("x")),    // k missing left
      (2L, 4L, Option.empty[String], None, None, None))   // all missing
      .toDF("id_a", "id_b", "k_a", "k_b", "t_a", "t_b")
    val out = RecordLinkage.scorePairs(pairs, w, fields, thresholdBits = 2)
      .orderBy("id_a", "id_b")
      .collect()
    // agree flags: NULL where a side is missing
    assert(out(0).isNullAt(out(0).fieldIndex("agree_t")))
    assert(out(0).getInt(out(0).fieldIndex("agree_k")) == 1)
    // score: only the observed field contributes
    assert(out(0).getLong(out(0).fieldIndex("score_fix")) == wm("k")._1)
    assert(out(0).getLong(out(0).fieldIndex("n_agree")) == 1L)
    assert(out(1).getLong(out(1).fieldIndex("score_fix")) == wm("t")._1)
    // an all-missing pair scores exactly 0 -> "possible", never non-link
    assert(out(2).getLong(out(2).fieldIndex("score_fix")) == 0L)
    assert(out(2).getLong(out(2).fieldIndex("n_agree")) == 0L)
    assert(out(2).getInt(out(2).fieldIndex("decision")) == 0)
  }

  private def decide(s: Long): Int =
    if (s >= 131072L) 1 else if (s >= -131072L) 0 else -1
}
