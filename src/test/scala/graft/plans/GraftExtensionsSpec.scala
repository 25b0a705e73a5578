package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  private def installed = { graft.GraftExtensions.install(spark); spark }

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")
    .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")

  test("window row_number <= k rewrites to TopKPerKey under the Window") {
    installed
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    val q = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), s"rewrite did not fire:\n$plan")
    assert(plan.contains("Window"), "Window must remain (it produces rn)")
  }

  test("rewritten window top-k returns exactly the unrewritten result") {
    installed
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    val rewritten = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).collect().map(_.toString).sorted
    // reference result: same window, rewrite disabled via a >= guard the
    // rule does not match (k bound on the other side of a non-literal)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    val plain = try
      li.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).collect().map(_.toString).sorted
    finally spark.experimental.extraOptimizations = prev
    assert(rewritten.sameElements(plain))
  }

  test("rewrite leaves rank()/unbounded filters alone") {
    installed
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity"))
    val ranked = li.withColumn("rn", rank().over(w)).filter(col("rn") <= 2)
    assert(!ranked.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val lower = li.withColumn("rn", row_number().over(w)).filter(col("rn") >= 2)
    assert(!lower.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("native expressions are callable from SQL") {
    installed
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("docs_ext")
    val row = spark.sql(
      """SELECT doc_id,
        |  simhash64(shingle_hash64(text, 5)) AS sh,
        |  size(minhash_sig_oph(shingle_hash64(text, 5), 64)) AS sig_len
        |FROM docs_ext LIMIT 1""".stripMargin).collect().head
    assert(row.getLong(1) != 0L)
    assert(row.getInt(2) == 64)
    val cos = spark.sql(
      "SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val bc = spark.sql(
      """SELECT bounded_collect_long(v, 10) AS vs
        |FROM VALUES (1L), (2L), (3L) t(v)""".stripMargin)
      .collect().head.getSeq[Long](0).sorted
    assert(bc == Seq(1L, 2L, 3L))
    // the round-4 additions: morton2, freq_items, url_parts, bpe_merge,
    // cdc_chunks — each callable and behaviorally sane from SQL
    assert(spark.sql("SELECT morton2(3L, 1L)").collect().head.getLong(0) == 7L)
    val hh = spark.sql(
      """SELECT freq_items(t, 8) FROM VALUES (array('a','a','b')) v(t)""")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(hh.map(r => (r.getString(0), r.getLong(1))) == Seq(("a", 2L), ("b", 1L)))
    val up = spark.sql(
      "SELECT url_parts('https://Ex.com:8443/p?a=1').host").collect().head
    assert(up.getString(0) == "Ex.com")
    val bm = spark.sql(
      """SELECT bpe_merge(array('a','b','c'), 'a', 'b', '_')""")
      .collect().head.getSeq[String](0)
    assert(bm == Seq("a_b", "c"))
    val cc = spark.sql("SELECT size(cdc_chunks('tiny'))").collect().head
    assert(cc.getInt(0) == 1)
  }

  test("cdc_chunks is codepoint-indexed — non-BMP text cannot shift cuts") {
    import spark.implicits._
    // emoji (U+1F600, a surrogate pair in UTF-16) mixed into the text:
    // positions must count it as ONE character, like DuckDB substr/ord
    val text = (0 until 40).map(i => s"ab😀cd${('a' + i % 26).toChar}").mkString
    val got = Seq(text).toDF("t")
      .selectExpr("cdc_chunks(t) AS cs").as[Seq[String]].head()
    // independent recompute over codepoints (the oracle's view of strings)
    val cps = text.codePoints().toArray
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- 0 to cps.length - 8) {
      var h = 0L; var p = 1L
      for (j <- 0 until 8) { h += cps(i + j).toLong * p; p *= 31 }
      if (h % 64 == 0 && i + 8 < cps.length) cuts += (i + 8)
    }
    val bounds: Seq[Int] = (0 +: cuts.toSeq) :+ cps.length
    val expected = bounds.sliding(2).map {
      case Seq(a, b) => new String(cps, a, b - a)
    }.toSeq
    assert(got == expected)
    assert(got.mkString == text)
    assert(cuts.nonEmpty, "fixture produced no cuts — strengthen it")
  }

  test("GraftExtensions class applies cleanly at session build time") {
    // the shared session already exists, so exercise the extensions
    // object directly against a fresh SparkSessionExtensions
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    // building the extensions must at minimum not throw; behavior is
    // covered by the live-install tests above
    assert(graft.GraftExtensions.sqlFunctions.size == 12)
  }
}
