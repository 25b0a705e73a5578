package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, exact distincts, min/max as strings, one row per column") {
    val df = Seq(
      (1L, Some("x"), Some(10)),
      (2L, None, Some(20)),
      (3L, Some("y"), None),
      (4L, Some("x"), Some(20)))
      .toDF("id", "s", "v")
    val got = Profile.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5)))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("s") == ((4L, 1L, 2L, "x", "y")))
    assert(got("v") == ((4L, 1L, 2L, "10", "20")))
  }

  test("profile plan scans the input once (a single Expand, no union of scans)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val plan = Profile.profile(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"expected one Expand-based plan:\n$plan")
    assert(!plan.contains("Union"), s"must not union per-column scans:\n$plan")
  }

  test("unicode_normalize: NFC recomposes, NFD decomposes, ASCII fast path") {
    import java.text.Normalizer
    import graft.functions.NormalizeExprs.unicodeNormalize
    val decomposed = "e\u0301cole"
    val composed = "\u00e9cole"
    val df = Seq(decomposed, composed, "plain ascii").toDF("s")
    val got = df.select(
      unicodeNormalize(col("s"), "NFC").as("nfc"),
      unicodeNormalize(col("s"), "NFD").as("nfd"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got(0) == ((composed, decomposed)))
    assert(got(1) == ((composed, decomposed)))
    assert(got(2) == (("plain ascii", "plain ascii")))
    // parity with the JDK reference on compatibility forms (ligature,
    // vulgar fraction)
    val sMixed = "\ufb01n \u00bd"
    val viaExpr = Seq(sMixed).toDF("s")
      .select(unicodeNormalize(col("s"), "NFKC")).as[String].head()
    assert(viaExpr == Normalizer.normalize(sMixed, Normalizer.Form.NFKC))
  }

  test("drift: planted null and distinct shifts fire; clean columns stay silent") {
    // side A: no nulls, all-distinct vals; side B: 30% nulls, collapsed vals
    val a = (1L to 100L).map(i => (i, Some(s"v$i"))).toDF("id", "v")
    val b = (1L to 100L)
      .map(i => (i, if (i % 10 < 3) None else Some(s"w${i % 5}")))
      .toDF("id", "v")
    val out = graft.ops.Profile.drift(a, b, Seq("id", "v"))
      .orderBy("column").collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Int]("null_drift"), r.getAs[Int]("distinct_drift"),
          r.getAs[Int]("range_shift")))).toMap
    // id: identical on both sides -> nothing fires
    assert(out("id") === ((0, 0, 0)))
    // v: 0% -> 30% nulls (fires at 5%), 100 -> 5 distinct (fires at 20%),
    // and the min/max strings differ
    assert(out("v") === ((1, 1, 1)))
  }

  test("psiFix: identical histograms score zero; planted shift fires; floors stay finite") {
    val a = Seq((0L, 100L), (1L, 200L), (2L, 100L)).toDF("bucket", "cnt")
    val same = Profile.psiFix(a, a, "bucket", "cnt")
      .select("psi_fix", "drift").distinct().as[(Long, Int)].collect()
    assert(same.toSeq == Seq((0L, 0)))
    // mild shift: well under the 0.25 threshold
    val b = Seq((0L, 110L), (1L, 190L), (2L, 100L)).toDF("bucket", "cnt")
    val mild = Profile.psiFix(a, b, "bucket", "cnt")
      .select("psi_fix", "drift").distinct().as[(Long, Int)].collect()(0)
    assert(mild._1 > 0L && mild._2 == 0)
    // a bucket emptied on one side: contribution is finite (2^-30 floor)
    // and large enough to fire on its own
    val c = Seq((1L, 300L), (2L, 100L)).toDF("bucket", "cnt")
    val gone = Profile.psiFix(a, c, "bucket", "cnt").orderBy("bucket")
      .select("bucket", "contrib_fix", "drift")
      .as[(Long, Long, Int)].collect()
    assert(gone.head._1 == 0L && gone.head._2 > 0L)
    assert(gone.forall(_._3 == 1))
  }

  test("sketchProfile merge law: 3-part merge equals the direct profile exactly") {
    val df = (1L to 900L).map(i =>
      (i, if (i % 7 == 0) None else Some(s"v${i % 131}"), i % 13))
      .toDF("id", "s", "m")
    val cols = Seq("id", "s", "m")
    val k = 64
    val parts = Seq(
      df.filter(col("id") % 3 === 0), df.filter(col("id") % 3 === 1),
      df.filter(col("id") % 3 === 2))
      .map(Profile.sketchProfile(_, cols, k))
      .reduce(_ unionByName _)
    val merged = Profile.mergeProfiles(parts, k).orderBy("column")
    val direct = Profile.sketchProfile(df, cols, k).orderBy("column")
    // state equality, not just estimate equality: every field including
    // the sketch arrays must match element for element
    assert(merged.collect().toSeq == direct.collect().toSeq)
    // and the null-bearing column counted its nulls additively
    val nulls = merged.filter(col("column") === "s")
      .select("n_nulls").as[Long].head()
    assert(nulls == (1L to 900L).count(_ % 7 == 0))
  }
}
