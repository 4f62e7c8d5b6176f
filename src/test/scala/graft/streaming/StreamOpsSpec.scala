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

  test("streaming index ingest: appended vectors become searchable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(51)
    val base = (0L until 100L).map(i => i -> Seq.fill(6)(rng.nextFloat()))
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-idx").toString
    val idx = graft.index.IvfIndex.build(
      base.toDF("id", "vec"), "id", "vec", dir, graft.index.IvfConfig(lists = 4))
    val input = MemoryStream[(Long, Seq[Float])]
    val query = StreamOps.indexIngest(
      input.toDF().toDF("id", "vec"), "id", "vec", idx, compactEvery = 2)
    try {
      val newVec = Seq.fill(6)(0.123f)
      input.addData((1000L, newVec), (1001L, Seq.fill(6)(0.9f)))
      query.processAllAvailable()
      val top = idx.searchExact(newVec.toArray, 1).select("id").as[Long].head()
      assert(top == 1000L, "streamed row must be the nearest neighbor of itself")
      // second batch triggers compaction (batchId 1 -> no, but ensures append path repeats)
      input.addData((1002L, Seq.fill(6)(0.5f)))
      query.processAllAvailable()
      input.addData((1003L, Seq.fill(6)(0.7f)))
      query.processAllAvailable()
      assert(idx.prewarm() == 104L, "all streamed rows visible after compaction cycles")
    } finally query.stop()
  }

  test("streaming graph ingest: streamed vectors searchable in the live graph") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(67)
    val base = (0L until 200L).map(i => i -> Array.fill(8)(rng.nextFloat() * 2 - 1))
    val g0 = graft.index.VamanaGraph.build(
      base.map(_._1).toArray, base.map(_._2).toArray, graft.index.VamanaConfig(m = 16))
    val ref = new java.util.concurrent.atomic.AtomicReference(g0)
    val input = MemoryStream[(Long, Seq[Float])]
    val query = StreamOps.graphIngest(
      input.toDF().toDF("id", "vec"), "id", "vec", ref)
    try {
      val v1 = Seq.fill(8)(0.111f)
      input.addData((1000L, v1), (1001L, Seq.fill(8)(0.9f)))
      query.processAllAvailable()
      // live handle swapped: streamed row is its own nearest neighbor
      assert(ref.get().ids.length == 202)
      assert(ref.get().search(v1.toArray, 1).head._1 == 1000L)
      // a second micro-batch extends the SAME live graph
      input.addData((1002L, Seq.fill(8)(-0.8f)))
      query.processAllAvailable()
      assert(ref.get().ids.length == 203)
      assert(ref.get().search(Array.fill(8)(-0.8f), 1).head._1 == 1002L)
      // original snapshot untouched (readers holding it are unaffected)
      assert(g0.ids.length == 200)
    } finally query.stop()
  }

  test("streaming SHARDED graph ingest: routed inserts become searchable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(73)
    val base = (0L until 400L).map(i => i -> Array.fill(8)(rng.nextFloat()))
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-gshard").toString
    graft.index.ShardedVamana.build(
      base.toDF("id", "vec"), "id", "vec", dir,
      graft.index.VamanaConfig(), shards = 4)
    val h0 = graft.index.ShardedVamana.load(spark, dir)
    val ref = new java.util.concurrent.atomic.AtomicReference(h0)
    val input = MemoryStream[(Long, Seq[Float])]
    val query = StreamOps.shardedGraphIngest(
      input.toDF().toDF("id", "vec"), "id", "vec", ref)
    try {
      val v1 = Array.fill(8)(0.111f)
      input.addData((1000L, v1.toSeq), (1001L, Seq.fill(8)(0.9f)))
      query.processAllAvailable()
      val top = ref.get().search(spark, Array(0L -> v1), 1)
        .select("id").as[Long].head()
      assert(top == 1000L, "streamed row must be its own nearest neighbor")
      // second micro-batch extends the live handle again
      input.addData((1002L, Seq.fill(8)(-0.8f)))
      query.processAllAvailable()
      val top2 = ref.get().search(spark, Array(0L -> Array.fill(8)(-0.8f)), 1)
        .select("id").as[Long].head()
      assert(top2 == 1002L)
    } finally { query.stop(); ref.get().unpersist() }
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
