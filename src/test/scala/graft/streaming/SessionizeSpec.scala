package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {

  test("flatMapGroupsWithState sessionization matches the batch window formulation") {
    implicit val s = spark
    import spark.implicits._

    // batch ground truth from the same events table
    val batch = graft.queries.MiscOps.q51Sessionize(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap

    val events = graft.ops.Load.events(spark, sf)
      .selectExpr("event_id", "user_id", "ts_ns div 1000000000 as ts_s")
      .as[Streams.Event]

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Event]
    mem.addData(events.collect().toSeq)
    val q = Streams.sessionize(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sessions")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sessions")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("session_id"))).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch)
  }
}
