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

  test("bounded-state sessionization (event-time timeout) matches batch session starts") {
    implicit val s = spark
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val gap = 1800L
    val events = graft.ops.Load.events(spark, sf)
      .selectExpr("event_id", "user_id", "ts_ns div 1000000000 as ts_s")

    // batch twin: session_start = forward-fill of each gap-break's ts
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    val fillW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val batch = events
      .withColumn("prev", lag(col("ts_s"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("ts_s") - col("prev") > gap, col("ts_s")))
      .withColumn("session_start", last(col("brk"), ignoreNulls = true).over(fillW))
      .select("event_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Event]
    mem.addData(events.as[Streams.Event].collect().toSeq)
    val q = Streams.sessionizeBounded(mem.toDS(), gap)
      .writeStream.outputMode("append").format("memory").queryName("sessions_bounded")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sessions_bounded")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("session_start"))).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch)
  }
}
