package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("expandYearList handles ranges, singles, mixed, junk") {
    val df = Seq("2001-2003,2005", "1999", "", "n/a", "2010-2010").toDF("s")
      .select(RowOps.expandYearList(col("s")).as("ys"))
    val got = df.collect().map(_.getSeq[Int](0))
    assert(got(0) == Seq(2001, 2002, 2003, 2005))
    assert(got(1) == Seq(1999))
    assert(got(2) == Seq())
    assert(got(3) == Seq())
    assert(got(4) == Seq(2010))
  }

  test("deleteFields removes regex-matched columns only") {
    val df = Seq((1, 2, 3, 4)).toDF("alt_name1", "alt_name2", "keep", "alt_other")
    val out = RowOps.deleteFields(df, Seq("alt_name[0-9]"))
    assert(out.columns.toSeq == Seq("keep", "alt_other"))
  }

  test("unpivotRegex melts matching columns, capture group becomes key") {
    val df = Seq(("a", 1.0, 2.0, 9.9)).toDF("id", "y2001", "y2002", "other")
    val out = Reshape.unpivotRegex(df, "^y([0-9]{4})$", "year", "value")
    val rows = out.select("year", "value").orderBy("year").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq == Seq(("2001", 1.0), ("2002", 2.0)))
    assert(out.columns.contains("other"))
  }

  test("unwindFirstSeen keeps all columns; first row owns each element") {
    val df = Seq(
      (1L, "a", Seq("u1", "u2", "u2")), // u2 twice in-row: one output
      (2L, "b", Seq("u2", "u3")),       // u2 already owned by row 1
      (3L, "c", Seq.empty[String]),     // no elements: no output rows
      (4L, "d", Seq("u3", "u4"))        // u3 owned by row 2
    ).toDF("id", "payload", "urls")
      .withColumn(Ordering.ORD, col("id")) // explicit arrival order
    val out = Reshape.unwindFirstSeen(df, "urls", "url")
      .orderBy("url")
      .select("id", "payload", "url").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq((1L, "a", "u1"), (1L, "a", "u2"),
      (2L, "b", "u3"), (4L, "d", "u4")))
    // caller-stamped __ord is preserved; auto-stamped one is dropped
    assert(Reshape.unwindFirstSeen(df, "urls", "url").columns.contains(Ordering.ORD))
    assert(!Reshape.unwindFirstSeen(df.drop(Ordering.ORD), "urls", "url")
      .columns.contains(Ordering.ORD))
  }

  test("dedupSuffix appends .1, .2 in arrival order") {
    val df = Seq(("x", 1L), ("x", 2L), ("y", 3L), ("x", 4L)).toDF("doc_id", "ord")
    val out = Ordering.dedupSuffix(df, "doc_id", "ord")
      .orderBy("ord").collect().map(_.getString(0))
    assert(out.toSeq == Seq("x", "x.1", "y", "x.2"))
  }

  test("forwardFill carries last non-null in order") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, None), (4L, Some("b")), (5L, None))
      .toDF("ord", "v")
    val out = Ordering.forwardFill(df, "v", "ord")
      .orderBy("ord").collect().map(_.getString(1))
    assert(out.toSeq == Seq("a", "a", "a", "b", "b"))
  }

  test("concatenate maps aliases to canonical, missing -> null") {
    val a = Seq(("n1", 10)).toDF("shem", "erech")
    val b = Seq(("n2", "x")).toDF("name", "extra_ignored")
    val out = Joins.concatenate(Seq(a, b), Map(
      "name" -> Seq("shem"), "value" -> Seq("erech")))
    val rows = out.select("name", "value").orderBy("name").collect()
    assert(out.columns.sorted.toSeq == Seq("name", "value"))
    assert(rows(0).getString(0) == "n1" && rows(0).getInt(1) == 10)
    assert(rows(1).getString(0) == "n2" && rows(1).isNullAt(1))
  }

  test("joinSelf collects in __ord order with first/max/count") {
    val df = Seq(("k", 3L, "c"), ("k", 1L, "a"), ("k", 2L, "b"), ("j", 9L, "z"))
      .toDF("key", Ordering.ORD, "v")
    val out = Joins.joinSelf(df, Seq("key"), Map(
      "v" -> Joins.Collect, "n" -> Joins.CountRows))
    val k = out.filter($"key" === "k").collect()(0)
    assert(k.getAs[scala.collection.Seq[String]]("v").toSeq == Seq("a", "b", "c"))
    assert(k.getAs[Long]("n") == 3L)
  }

  test("transposeSheet: columns become records, stops at empty column") {
    val sheet = Seq(
      ("name", "r1", "r2", null),
      ("age", "30", "40", null)).toDF("h", "c1", "c2", "c3")
    val out = Reshape.transposeSheet(sheet)
    assert(out.columns.toSeq == Seq("name", "age"))
    val rows = out.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("r1", "30"), ("r2", "40")))
  }

  test("setType Raise policy fails the job on bad cells") {
    val df = Seq("12", "xx").toDF("v")
    val typed = SetType.setType(df, "v", IntegerType, onError = SetType.Raise)
    intercept[Exception] { typed.collect() }
  }

  test("repairUrl prepends scheme only to bare domains") {
    val df = Seq("example.com", "https://ok.org", "not a url").toDF("u")
      .select(RowOps.repairUrl(col("u")).as("u"))
    val got = df.collect().map(_.getString(0))
    assert(got.toSeq == Seq("http://example.com", "https://ok.org", "not a url"))
  }

  test("validateUnits raises on non-whitelisted unit") {
    val df = Seq(("bogus", 1.0)).toDF("units", "value")
    intercept[Exception] {
      Validate.validateUnits(df, "units", "value", Seq("ok"), "ok", "ok2").collect()
    }
  }

  test("preferOverride: gd_ value wins when present, override column dropped") {
    val df = Seq(
      ("base1", Some("gd1")), ("base2", None)
    ).toDF("title", "gd_title")
    val out = RowOps.preferOverride(df, "title", "gd_title")
    assert(out.columns.toSeq == Seq("title"))
    assert(out.collect().map(_.getString(0)).toSeq == Seq("gd1", "base2"))
  }

  test("exactRank equals the global window it avoids, ties and skew included") {
    import spark.implicits._
    // skewed values: value 7 holds a third of the rows; ties broken by id
    val df = ((1L to 300L).map(i => (i, (i % 13) + 1)) ++
      (301L to 450L).map(i => (i, 7L))).toDF("id", "v")
    val got = Ordering.exactRank(df, "v", "id")
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("v", "id")).cast("long"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(got == want)
    // layout independence
    val re = Ordering.exactRank(df.repartition(11), "v", "id")
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(re == want)
  }

  test("quantileBucket: exact equal-population buckets, sizes differ by at most one") {
    import spark.implicits._
    val df = (1L to 457L).map(i => (i, i % 23)).toDF("id", "v")
    val got = Ordering.quantileBucket(df, "v", "id", 10, out = "b")
    val sizes = got.groupBy("b").count().as[(Long, Long)].collect().toMap
    assert(sizes.keySet == (0L to 9L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    // bucket is monotone in rank and matches the closed form
    val bad = got.filter(col("b") =!= expr("(10 * (rank - 1)) div 457")).count()
    assert(bad == 0)
  }
}
