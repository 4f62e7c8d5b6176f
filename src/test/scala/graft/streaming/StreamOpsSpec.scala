package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamOpsSpec extends SparkSpec {

  private val SEC = 1000000000L // nanos

  test("sessionize closes sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.Event]
    val sessions = StreamOps.sessionize(input.toDS(), gapNanos = 30 * SEC)
    val query = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // user 1: events at t=0,10s (one session), then t=100s (new session)
      input.addData(
        StreamOps.Event(1, 0L, 1L, "a", 1.0),
        StreamOps.Event(2, 10 * SEC, 1L, "a", 1.0))
      query.processAllAvailable()
      input.addData(StreamOps.Event(3, 100 * SEC, 1L, "b", 1.0))
      query.processAllAvailable()
      val out = spark.sql("SELECT user_id, start, `end`, n_events FROM sessions_out")
        .as[(Long, Long, Long, Int)].collect().toSet
      // first session (0..10s, 2 events) must have closed when t=100s arrived
      assert(out.contains((1L, 0L, 10 * SEC, 2)))
    } finally query.stop()
  }

  test("hourlyCounts windowed aggregation over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.Event]
    val counts = StreamOps.hourlyCounts(input.toDF())
    val query = counts.writeStream
      .format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      val H = 3600L * SEC
      input.addData(
        StreamOps.Event(1, 10 * SEC, 1L, "click", 2.0),
        StreamOps.Event(2, 20 * SEC, 2L, "click", 3.0),
        StreamOps.Event(3, H + 5 * SEC, 1L, "buy", 1.0))
      query.processAllAvailable()
      val out = spark.sql("SELECT event_type, n, sv FROM hourly_out")
        .as[(String, Long, Double)].collect().toSet
      assert(out == Set(("click", 2L, 5.0), ("buy", 1L, 1.0)))
    } finally query.stop()
  }
}
