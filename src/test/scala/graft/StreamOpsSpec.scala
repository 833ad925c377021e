package graft

import java.sql.Timestamp
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamOpsSpec extends SparkSpec {

  test("streaming sessionize closes a session after the gap timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val sessions = StreamOps.sessionize(input.toDS(), gapMinutes = 30)
    val query = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      input.addData(
        Event(1L, 1L, new Timestamp(t0), "click", 1.0),
        Event(1L, 2L, new Timestamp(t0 + 60000), "click", 2.0),
        Event(2L, 3L, new Timestamp(t0), "view", 5.0))
      query.processAllAvailable()
      // push watermark past the session gap: a much later event
      input.addData(Event(9L, 99L, new Timestamp(t0 + 3 * 3600 * 1000L), "click", 0.0))
      query.processAllAvailable()
      val out = spark.table("sessions_out").as[SessionOut].collect()
      val u1 = out.find(_.user_id == 1L)
      assert(u1.isDefined, s"expected a closed session for user 1, got ${out.toSeq}")
      assert(u1.get.n_events == 2 && u1.get.sum_value == 3.0)
      assert(out.exists(_.user_id == 2L))
    } finally query.stop()
  }

  test("windowedCounts groups into tumbling windows (batch mode)") {
    import spark.implicits._
    val t0 = 1700000000000L // 2023-11-14 22:13:20 UTC
    val df = Seq(
      (new Timestamp(t0), "a", 1.0),
      (new Timestamp(t0 + 10 * 60 * 1000), "a", 2.0),
      (new Timestamp(t0 + 65 * 60 * 1000), "a", 4.0))
      .toDF("ts", "event_type", "value")
    // batch path: same groupBy(window) expression works without a stream
    val out = df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .collect()
    assert(out.map(_.getAs[Long]("n")).sorted.toSeq == Seq(1L, 2L))
  }
}
