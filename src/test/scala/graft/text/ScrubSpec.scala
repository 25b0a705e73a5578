package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails, phones, ips") {
    val got = Seq("mail a@b.org call +1 (555) 123-4567 from 192.168.0.1 ok")
      .toDF("t").select(Scrub.redactPii($"t")).collect()(0).getString(0)
    assert(got == "mail <EMAIL> call <PHONE> from <IP> ok")
  }

  test("duplicateLineFraction and topTokenFraction") {
    val r = Seq("a b\na b\nc d", "x x x y").toDF("t")
      .select(Scrub.duplicateLineFraction($"t").as("d"),
        Scrub.topTokenFraction($"t").as("f"))
      .collect()
    assert(math.abs(r(0).getDouble(0) - 1.0 / 3) < 1e-12)
    assert(r(1).getDouble(0) == 0.0)
    assert(r(1).getDouble(1) == 0.75) // 'x' is 3 of 4 tokens
  }

  test("distinctNgramRatio low for repetitive text") {
    val r = Seq("abcdefghij klmnop qrstu", "ababababababababab").toDF("t")
      .select(Scrub.distinctNgramRatio($"t").as("r")).collect()
    assert(r(0).getDouble(0) > 0.9)
    assert(r(1).getDouble(0) < 0.3)
  }

  test("sampleByHash is deterministic and rate-proportional") {
    val df = spark.range(10000).toDF("id")
    val a = Scrub.sampleByHash(df, "id", 0.3).count()
    val b = Scrub.sampleByHash(df, "id", 0.3).count()
    assert(a == b)
    assert(math.abs(a / 10000.0 - 0.3) < 0.03)
    assert(Scrub.sampleByHash(df, "id", 0.0).count() == 0)
    assert(Scrub.sampleByHash(df, "id", 1.0).count() == 10000)
  }

  test("compressionRatio separates repetition from prose; SQL-registered") {
    import spark.implicits._
    graft.GraftExtensions.install(spark)
    val rep = ("spam ham " * 300).trim
    val prose = (1 to 120).map(i =>
      s"sentence $i mixes engine${i * 7 % 13} shuffle${i * 11 % 17} terms").mkString(". ")
    val df = Seq((1L, rep), (2L, prose), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = df.select($"id",
        TextAnalysis.compressionRatio($"text").as("cr"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val repCr = out(1L).asInstanceOf[Double]
    val proseCr = out(2L).asInstanceOf[Double]
    assert(repCr < 0.1, s"repetition should crush: $repCr")
    assert(proseCr > repCr * 3, s"prose $proseCr vs repetition $repCr")
    assert(out(3L) == 1.0 && out(4L) == null)
    // same kernel through the SQL registration
    df.createOrReplaceTempView("cr_docs")
    val viaSql = spark.sql(
      "SELECT compression_ratio(text) FROM cr_docs WHERE id = 1")
      .collect()(0).getDouble(0)
    assert(viaSql == repCr)
  }

  test("epochMix: whole epochs replicate, fractions draw, subunit subsamples") {
    val df = (1L to 400L).map(i =>
      (i, if (i <= 200) "rare" else "common")).toDF("id", "source")
    val out = Scrub.epochMix(df, "source", "id",
        Map("rare" -> 2500L, "common" -> 500L))
      .groupBy("id", "source").agg(count(lit(1)).as("n"), max("copy_idx").as("mx"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val rare = out.filter(_._2 == "rare")
    val common = out.filter(_._2 == "common")
    // every rare doc appears 2 or 3 times; copy_idx is dense 1..n
    assert(rare.length == 200)
    assert(rare.forall(r => (r._3 == 2L || r._3 == 3L) && r._4 == r._3))
    // ~half the rare docs get the third epoch (fraction 0.5) — loose bound
    val thirds = rare.count(_._3 == 3L)
    assert(thirds > 60 && thirds < 140, s"fractional draw off: $thirds/200")
    // common subsamples to ~half, never replicates
    assert(common.forall(r => r._3 == 1L && r._4 == 1L))
    assert(common.length > 60 && common.length < 140, s"${common.length}/200")
    // determinism: same input -> identical output
    val again = Scrub.epochMix(df, "source", "id",
        Map("rare" -> 2500L, "common" -> 500L))
      .groupBy("id", "source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again == out.map(r => (r._1, r._3)).toSet)
  }
}
