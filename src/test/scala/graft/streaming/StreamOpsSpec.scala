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

  test("sessionize idleTimeoutMs closes and emits the open session of an idle user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // ProcessingTimeTimeout queries re-trigger continuously, so poll the
    // sink with deadlines instead of processAllAvailable (see dedup TTL)
    val input = MemoryStream[StreamOps.Event]
    val sessions = StreamOps.sessionize(input.toDS(), gapNanos = 30 * SEC,
      idleTimeoutMs = 300L)
    val query = sessions.writeStream
      .format("memory").queryName("sessions_ttl")
      .outputMode(OutputMode.Append())
      .start()
    def rows(): Set[(Long, Long, Long, Int)] =
      spark.sql("SELECT user_id, start, `end`, n_events FROM sessions_ttl")
        .as[(Long, Long, Long, Int)].collect().toSet
    def await(cond: => Boolean, what: String, ms: Long = 60000L): Unit = {
      val t0 = System.currentTimeMillis
      while (!cond && System.currentTimeMillis - t0 < ms) Thread.sleep(50)
      assert(cond, s"$what not observed within ${ms}ms: ${rows()}")
    }
    try {
      // user 7 sends two events then goes idle — WITHOUT the timeout this
      // session would never emit (the round-6 sessionize gap)
      input.addData(
        StreamOps.Event(1, 0L, 7L, "a", 1.0),
        StreamOps.Event(2, 5 * SEC, 7L, "a", 1.0))
      await(rows().contains((7L, 0L, 5 * SEC, 2)), "idle-session close on timeout")
      // the user returns after expiry: a FRESH session starts (state was
      // freed), closing normally by gap when a later event arrives
      input.addData(StreamOps.Event(3, 200 * SEC, 7L, "b", 1.0))
      input.addData(StreamOps.Event(4, 500 * SEC, 7L, "b", 1.0))
      await(rows().contains((7L, 200 * SEC, 200 * SEC, 1)),
        "post-expiry session closes independently")
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

  test("streaming postings ingest: streamed docs keyword-searchable, compaction cycles") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-post").toString
    val base = Seq((0L, "cat dog"), (1L, "dog dog")).toDF("doc_id", "text")
    val ref = new java.util.concurrent.atomic.AtomicReference(
      graft.ops.Search.buildPostings(base, "doc_id", "text", dir, nBuckets = 2))
    val input = MemoryStream[(Long, String)]
    val query = StreamOps.postingsIngest(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", ref,
      compactEvery = 2)
    try {
      input.addData((10L, "whale cat"), (11L, "whale whale"))
      query.processAllAvailable()
      input.addData((12L, "cat"))
      query.processAllAvailable() // batchId 1
      input.addData((13L, "dog whale"))
      query.processAllAvailable() // batchId 2 -> compaction fires
      val live = ref.get()
      assert(live.nDocs == 6)
      val hits = live.search(spark, Seq("whale"), 10)
        .select("doc_id").as[Long].collect().toSet
      assert(hits == Set(10L, 11L, 13L))
      // the live index equals a fresh batch build over everything seen
      val allDocs = base.unionByName(Seq((10L, "whale cat"),
        (11L, "whale whale"), (12L, "cat"), (13L, "dog whale"))
        .toDF("doc_id", "text"))
      val freshDir = java.nio.file.Files.createTempDirectory("graft-stream-post2").toString
      val fresh = graft.ops.Search.buildPostings(allDocs, "doc_id", "text",
        freshDir, nBuckets = 2)
      val a = live.score(spark, Seq("cat", "dog", "whale"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val b = fresh.score(spark, Seq("cat", "dog", "whale"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(a == b)
    } finally query.stop()
  }

  test("postings ingest replay: a re-executed batch id is skipped, not double-counted") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-replay-post").toString
    val cp = Some("/tmp/graft-replay-cp-1")
    val base = Seq((0L, "cat dog")).toDF("doc_id", "text")
    val ref = new java.util.concurrent.atomic.AtomicReference(
      graft.ops.Search.buildPostings(base, "doc_id", "text", dir, nBuckets = 2))
    val batch = Seq((10L, "whale cat"), (11L, "whale")).toDF("doc_id", "text")
    StreamOps.applyPostingsBatch(batch, 0L, "doc_id", "text", ref, 0, cp)
    assert(ref.get().nDocs == 3)
    assert(StreamOps.lastAppliedBatch(dir, cp.get) == 0L)
    // the crash-replay case: foreachBatch re-executes batch 0 after a
    // restart from the SAME checkpoint whose commit never landed — no-op
    StreamOps.applyPostingsBatch(batch, 0L, "doc_id", "text", ref, 0, cp)
    assert(ref.get().nDocs == 3, "replayed batch must not double-count")
    val scores = ref.get().score(spark, Seq("whale"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // a new batch id still applies
    StreamOps.applyPostingsBatch(
      Seq((12L, "whale dog")).toDF("doc_id", "text"), 1L,
      "doc_id", "text", ref, 0, cp)
    assert(ref.get().nDocs == 4 && StreamOps.lastAppliedBatch(dir, cp.get) == 1L)
    // and the replayed batch changed no postings: doc scores only moved
    // because of the legitimate batch 1 (df/avgdl shift), set-wise the
    // whale matches are exactly the three expected docs
    val hits = ref.get().score(spark, Seq("whale"))
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(10L, 11L, 12L))
    assert(scores.keySet == Set(10L, 11L))
    // a FRESH ingest (new checkpoint, batch ids restarting at 0) into
    // the same index must NOT be skipped against the old watermark —
    // that would silently drop new data
    StreamOps.applyPostingsBatch(
      Seq((13L, "whale")).toDF("doc_id", "text"), 0L,
      "doc_id", "text", ref, 0, Some("/tmp/graft-replay-cp-2"))
    assert(ref.get().nDocs == 5, "fresh-checkpoint batch 0 must apply")
    // ...and with NO durable checkpoint there is no cross-run replay:
    // every batch applies, nothing is recorded or compared
    StreamOps.applyPostingsBatch(
      Seq((14L, "whale")).toDF("doc_id", "text"), 0L,
      "doc_id", "text", ref, 0, None)
    assert(ref.get().nDocs == 6, "uncheckpointed batch must always apply")
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

  test("streaming dedup ingest: near-dups detected across micro-batches, state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(29)
    val vocab = Vector("spark", "scan", "join", "sort", "hash", "merge", "row",
      "batch", "query", "filter", "group", "window", "stream", "key", "value")
    def mk(): String = Seq.fill(30)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 40L).map(i => i -> mk())
    val input = MemoryStream[(Long, String)]
    val hits = StreamOps.dedupIngest(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.6)
    val query = hits.writeStream
      .format("memory").queryName("dedup_hits")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(base: _*)
      query.processAllAvailable()
      // LATER micro-batch: near-dup of doc 3 (one token changed) and an
      // exact copy of doc 7 — both must pair against state from batch 1
      val nd = { val w = base(3)._2.split(' '); w(w.length - 1) = "changed"; w.mkString(" ") }
      input.addData((100L, nd), (101L, base(7)._2))
      query.processAllAvailable()
      val got = spark.sql("SELECT da, db, est_jac FROM dedup_hits")
        .as[(Long, Long, Double)].collect()
      val pairs = got.map(h => (h._1, h._2)).toSet
      assert(pairs.contains((3L, 100L)), s"near-dup missed: $pairs")
      assert(pairs.contains((7L, 101L)), s"exact dup missed: $pairs")
      // exact copy estimates jaccard 1.0 (identical signatures)
      assert(got.filter(h => (h._1, h._2) == (7L, 101L)).forall(_._3 == 1.0))
      // unrelated random docs must not pair at 0.6
      assert(got.forall(h => Set((3L, 100L), (7L, 101L)).contains((h._1, h._2))),
        s"false pairs: ${got.toSeq}")
    } finally query.stop()
  }

  test("streaming dedup ingest: full bucket degrades to anchor-star, state capped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // identical docs all land in the same buckets; cap 4 residents
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val input = MemoryStream[(Long, String)]
    val hits = StreamOps.dedupIngest(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.6, maxBucket = 4)
    val query = hits.writeStream
      .format("memory").queryName("dedup_hits_cap")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((0L until 10L).map(i => i -> text): _*)
      query.processAllAvailable()
      // a straggler copy arrives after the bucket filled: it must still
      // pair against the ANCHOR (min id 0), preserving connectivity
      input.addData((50L, text))
      query.processAllAvailable()
      val pairs = spark.sql("SELECT da, db FROM dedup_hits_cap")
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((0L, 50L)), s"anchor link missing: $pairs")
      // every doc is connected to the component (via anchor or full pairs)
      val reachable = pairs.flatMap(p => Seq(p._1, p._2))
      assert((0L until 10L).forall(reachable.contains), s"disconnected: $pairs")
    } finally query.stop()
  }

  test("dedupIngest exactVerify rejects estimate-only false pairs, emits exact jaccard") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.{Dedup => D}
    val thr = 0.5; val n = 3; val nh = 64; val bands = 16; val r = nh / bands
    // hunt (deterministically) a doc pair whose minhash ESTIMATE clears
    // the threshold while the exact shingle Jaccard does not (estimator
    // sd ~0.06 at nh=64), sharing >= 1 LSH band so the stream compares it
    def mk(seed: Int): (Array[String], Array[String]) = {
      val rng = new scala.util.Random(seed)
      val base = Array.fill(30)("w" + rng.nextInt(1000000))
      val variant = base.clone()
      (0 until 10).foreach(i => variant(base.length - 1 - i) = "x" + rng.nextInt(1000000))
      (base, variant)
    }
    def stats(a: Array[String], b: Array[String]): (Double, Double, Boolean) = {
      val ta = a.map(D.hash64); val tb = b.map(D.hash64)
      val sa = D.sigFromTokens(ta, n, nh); val sb = D.sigFromTokens(tb, n, nh)
      val est = (0 until nh).count(i => sa(i) == sb(i)).toDouble / nh
      val exact = D.jaccardSorted(D.sortedShingleSet(ta, n), D.sortedShingleSet(tb, n))
      val shared = D.bandKeys(sa, bands, r).toSet
        .intersect(D.bandKeys(sb, bands, r).toSet).nonEmpty
      (est, exact, shared)
    }
    val seed = (0 until 5000).find { s =>
      val (a, b) = mk(s); val (est, exact, shared) = stats(a, b)
      est >= thr && exact < thr && shared
    }.getOrElse(sys.error("no estimate-only false pair found in 5000 seeds"))
    val (aw, bw) = mk(seed)
    val (aStr, bStr) = (aw.mkString(" "), bw.mkString(" "))
    val exactJ = stats(aw, bw)._2
    // ESTIMATE mode (default): the false pair IS emitted — the documented
    // streaming divergence this option exists to close
    val in1 = MemoryStream[(Long, String)]
    val q1 = StreamOps.dedupIngest(in1.toDF().toDF("doc_id", "text"),
        "doc_id", "text", thr)
      .writeStream.format("memory").queryName("dedup_est_mode")
      .outputMode(OutputMode.Append()).start()
    try {
      in1.addData((1L, aStr), (2L, bStr))
      q1.processAllAvailable()
      val pairs = spark.sql("SELECT da, db FROM dedup_est_mode")
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)),
        s"estimate mode must emit the planted over-estimated pair: $pairs")
    } finally q1.stop()
    // EXACT mode: same arrivals, the false pair is REJECTED (batch
    // minhashDedup semantics); a genuine dup still emits, carrying the
    // EXACT jaccard value
    val in2 = MemoryStream[(Long, String)]
    val q2 = StreamOps.dedupIngest(in2.toDF().toDF("doc_id", "text"),
        "doc_id", "text", thr, exactVerify = true)
      .writeStream.format("memory").queryName("dedup_exact_mode")
      .outputMode(OutputMode.Append()).start()
    try {
      in2.addData((1L, aStr), (2L, bStr), (3L, aStr)) // 3 = exact copy of 1
      q2.processAllAvailable()
      val got = spark.sql("SELECT da, db, est_jac FROM dedup_exact_mode")
        .as[(Long, Long, Double)].collect()
      val pairs = got.map(h => (h._1, h._2)).toSet
      assert(!pairs.contains((1L, 2L)),
        s"exactVerify must reject the estimate-only pair (exact=$exactJ < $thr): $pairs")
      assert(!pairs.contains((2L, 3L)), s"copy of 1 vs 2 must be rejected too: $pairs")
      assert(pairs.contains((1L, 3L)), s"exact copy must still pair: $pairs")
      assert(got.filter(h => (h._1, h._2) == (1L, 3L)).forall(_._3 == 1.0),
        "exact mode carries the true jaccard")
    } finally q2.stop()
  }

  test("dedupIngest stateTtlMs expires idle buckets; fresh pairs still hit inside TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // NOTE: a ProcessingTimeTimeout query re-triggers batches continuously
    // (every batch "requires another batch" to sweep timeouts), so
    // processAllAvailable() never observes quiescence and would HANG —
    // the test polls the memory sink with deadlines instead
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val trc = "one two three four five six seven eight nine ten eleven twelve"
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.dedupIngest(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.6, stateTtlMs = 300L)
      .writeStream.format("memory").queryName("dedup_ttl")
      .outputMode(OutputMode.Append()).start()
    def pairs(): Set[(Long, Long)] = spark.sql("SELECT da, db FROM dedup_ttl")
      .as[(Long, Long)].collect().toSet
    def await(cond: => Boolean, what: String, ms: Long = 60000L): Unit = {
      val t0 = System.currentTimeMillis
      while (!cond && System.currentTimeMillis - t0 < ms) Thread.sleep(50)
      assert(cond, s"$what not observed within ${ms}ms: ${pairs()}")
    }
    try {
      // same micro-batch: identical docs pair (robust to slow boxes —
      // cross-batch TTL survival is timing-dependent by definition)
      input.addData((1L, text), (2L, text))
      await(pairs().contains((1L, 2L)), "inside-TTL pair")
      // idle past the TTL — the continuously-running batches sweep the
      // timed-out buckets; then a late copy plus a TRACER pair arrive:
      // when the tracer shows up in the sink, doc 3's batch is committed
      Thread.sleep(900)
      input.addData((3L, text), (60L, trc), (61L, trc))
      await(pairs().contains((60L, 61L)), "tracer pair")
      assert(!pairs().exists(p => p._1 == 3L || p._2 == 3L),
        s"doc 3 arrived after expiry and must not pair: ${pairs()}")
    } finally q.stop()
  }

  test("dedupIngest dropOversized excludes poison docs without killing the query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val small = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // >12 distinct 3-shingles with a tiny maxShingles forces the oversized path
    val big = (1 to 40).map(i => s"tok$i").mkString(" ")
    val acc = spark.sparkContext.longAccumulator("dedup.oversizedDropped")
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.dedupIngest(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.6, exactVerify = true,
        maxShingles = 12, dropOversized = true, droppedDocs = Some(acc))
      .writeStream.format("memory").queryName("dedup_drop_oversized")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, small), (2L, small), (3L, big), (4L, big))
      q.processAllAvailable()
      val pairs = spark.sql("SELECT da, db FROM dedup_drop_oversized")
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)), s"small exact pair must still emit: $pairs")
      assert(!pairs.exists(p => p._1 >= 3L || p._2 >= 3L),
        s"oversized docs must not participate: $pairs")
      assert(acc.value == 2L, s"both oversized docs counted, got ${acc.value}")
      // the query is still alive — a later batch processes normally
      input.addData((5L, small))
      q.processAllAvailable()
      assert(spark.sql("SELECT da, db FROM dedup_drop_oversized").count() >= 2)
    } finally q.stop()
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
