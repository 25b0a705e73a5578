package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.SinkQueries

class SinkQueriesSpec extends SparkSpec {

  test("q45: sweep keeps only re-indexed docs; create_timestamp carries over") {
    val out = SinkQueries.q45SinkLifecycle(spark, sf).collect()
    assert(out.nonEmpty)
    // every survivor is a %3 doc at revision 2
    assert(out.forall(r => r.getAs[Long]("doc_id") % 3 == 0))
    assert(out.forall(r => r.getAs[Long]("revision") == 2L))
    // the value JSON holds the v2 title but the CARRIED v1 stamp
    // (created_s == custkey, not custkey + 1e9)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("value") ==
        s"""{"title":"v2 Study $id","created_s":$id}""")
    }
  }

  test("q45 is idempotent across re-runs in one process") {
    val a = SinkQueries.q45SinkLifecycle(spark, sf).collect().toSeq
    val b = SinkQueries.q45SinkLifecycle(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("q46: scrub drops no-title rows and strips %; arrays round-trip as JSON") {
    val out = SinkQueries.q46DumpRoundtrip(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("row_id") % 9 != 0))
    assert(rows.forall(r => !r.getAs[String]("value").contains("%")))
    assert(rows.forall(r => r.getAs[String]("tags").startsWith("""["a",""")))
    // reload is schema'd by the DESCRIPTOR, not inference
    assert(out.schema("row_id").dataType.typeName == "long")
  }
}
