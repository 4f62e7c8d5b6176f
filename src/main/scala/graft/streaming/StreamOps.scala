package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming surface — the streaming analogs of the engine's
 * batch event operators, plus the incremental-ingest shape the reference
 * implements as `aminsert` + compaction (reference:
 * crates/vchordrq/src/insert.rs:38-212, maintain.rs:38-316): in Spark the
 * same lifecycle is `foreachBatch` delta appends + a periodic compaction
 * rewrite.
 */
object StreamOps {

  final case class Event(event_id: Long, ts: Long /* nanos */, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class SessionOut(user_id: Long, start: Long, end: Long, n_events: Int)

  /**
   * Gap-based sessionization with per-key state: a session closes when no
   * event arrives within `gapNanos`. Emits closed sessions.
   *
   * `idleTimeoutMs > 0` arms a ProcessingTimeTimeout per user: a user with
   * no arrivals within the timeout has their OPEN session emitted and
   * their state removed. Without it (the default, kept for the batch-like
   * finite-stream tests) per-user state lives forever and an idle user's
   * last session never emits — exactly the unbounded-state class
   * `dedupIngest.stateTtlMs` already defends against, so a long-running
   * stream over a growing user population should always set it. The
   * timeout doubles as the idle-session close: sessions end
   * deterministically after ~idleTimeoutMs of silence instead of waiting
   * for the user's next event (which may never come).
   */
  def sessionize(events: Dataset[Event], gapNanos: Long,
                 idleTimeoutMs: Long = 0L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val timeout =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append(), timeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            // idle user: close and emit every open session, free the state
            val open = state.getOption.getOrElse(Nil)
            state.remove()
            open.reverseIterator.map(s => SessionOut(uid, s.start, s.last, s.n))
          } else {
          // order within the micro-batch for determinism
          val evs = it.toSeq.sortBy(e => (e.ts, e.event_id))
          var sessions = state.getOption.getOrElse(Nil)
          val closed = scala.collection.mutable.ListBuffer[SessionOut]()
          evs.foreach { e =>
            sessions match {
              case cur :: rest if e.ts - cur.last <= gapNanos =>
                sessions = cur.copy(last = e.ts, n = cur.n + 1) :: rest
              case cur :: rest =>
                closed += SessionOut(uid, cur.start, cur.last, cur.n)
                sessions = SessionState(e.ts, e.ts, 1) :: rest
              case Nil =>
                sessions = SessionState(e.ts, e.ts, 1) :: Nil
            }
          }
          state.update(sessions)
          if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
          closed.iterator
          }
      }
  }

  /**
   * Streaming index ingestion — the reference's `aminsert` + periodic
   * compaction lifecycle (reference: crates/vchordrq/src/insert.rs,
   * maintain.rs) as Structured Streaming: each micro-batch of (id, vec)
   * rows is encoded against the existing centroids and appended to the
   * index delta area; every `compactEvery` batches the delta folds into a
   * new generation. Returns the StreamingQuery (caller stops it).
   */
  def indexIngest(vectors: DataFrame, idCol: String, vecCol: String,
                  index: graft.index.IvfIndex,
                  compactEvery: Int = 10,
                  checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // NOTE: appendDelta is not idempotent — for replayable sources ALWAYS
    // pass a durable checkpointLocation so restarts resume from the last
    // committed batch instead of re-ingesting (duplicate row keys).
    val writer = vectors.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) index.appendDelta(batch.toDF(), idCol, vecCol)
        // compaction slot fires regardless of this batch's emptiness
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          index.compact()
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /**
   * Streaming KEYWORD-index ingestion — the postings analogue of
   * [[indexIngest]]: each micro-batch appends its docs' postings/norms
   * into the live index (`PostingsIndex.append` — parquet append of the
   * batch only, exact meta extension; per-batch cost is proportional to
   * the batch, never the standing index), and every `compactEvery`
   * batches the accumulated small files collapse (`compact`). The
   * AtomicReference tracks the current handle for the INGEST pipeline
   * and for readers that query BETWEEN maintenance slots. Unlike
   * [[graphIngest]]'s immutable in-memory graph, this index is an
   * on-disk directory: plain appends are safe to race (a reader's
   * planned file list just misses the newest batch), but `compact`
   * swaps the directory out from under an in-flight scan — a reader
   * concurrent with a compaction slot can fail and should retry, or
   * disable compaction here (`compactEvery = 0`) and run `compact()` in
   * a quiesced window, exactly like any on-disk index maintenance.
   */
  def postingsIngest(docs: DataFrame, idCol: String, textCol: String,
                     indexRef: java.util.concurrent.atomic.AtomicReference[graft.ops.Search.PostingsIndex],
                     compactEvery: Int = 10,
                     checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // IDEMPOTENT SINK: append is not idempotent (a replayed doc double-
    // counts), and a streaming checkpoint only skips FULLY-acknowledged
    // batches — after a crash the in-flight batch is RE-EXECUTED, even
    // with a durable checkpointLocation. So the applied batch id is
    // recorded in a sidecar next to the index (atomic rename) and a
    // replayed batch with id <= lastApplied is skipped — the standard
    // idempotent-foreachBatch pattern. Residual window: a crash AFTER
    // append() returns but BEFORE the sidecar rename still double-counts
    // that one batch on replay (data + marker are two files, not one
    // transaction); the window is a single ~100-byte atomic rename
    // instead of the whole batch write. Pair with a durable
    // checkpointLocation so restarts resume at the right batch at all.
    val writer = docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applyPostingsBatch(batch, batchId, idCol, textCol, indexRef,
          compactEvery, checkpointLocation)
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** The [[postingsIngest]] per-batch body, factored out so the
    * replay-skip contract is directly testable. The watermark is keyed
    * to the CHECKPOINT, not just the index: batch ids are
    * per-streaming-query, so a fresh ingest (new or absent checkpoint)
    * into an existing index restarts them at 0 — comparing those
    * against an older run's watermark would silently DROP new data.
    * Only a batch replayed under the SAME durable checkpoint is a
    * crash re-execution of work already in the index; without a
    * durable checkpoint no cross-run replay exists, so no skip logic
    * applies (and none is recorded). */
  private[streaming] def applyPostingsBatch(
      batch: Dataset[org.apache.spark.sql.Row], batchId: Long,
      idCol: String, textCol: String,
      indexRef: java.util.concurrent.atomic.AtomicReference[graft.ops.Search.PostingsIndex],
      compactEvery: Int, checkpointLocation: Option[String]): Unit = {
    val dir = indexRef.get().dir
    val replayed = checkpointLocation.exists(cp =>
      batchId <= lastAppliedBatch(dir, cp))
    if (!replayed) {
      // append evaluates the batch three times (count agg, postings
      // write, norms write) — persist so the source transformation
      // runs once per trigger
      val b = batch.persist()
      try {
        if (!b.isEmpty)
          indexRef.set(indexRef.get().append(b.toDF(), idCol, textCol))
        checkpointLocation.foreach(cp => recordAppliedBatch(dir, cp, batchId))
      } finally { b.unpersist(); () }
    }
    // compaction slot fires regardless (compact is idempotent)
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      indexRef.set(indexRef.get().compact(batch.sparkSession))
  }

  /** Last batch id [[postingsIngest]] fully applied to the index at
    * `dir` under `checkpoint` (-1 if none recorded, or if the recorded
    * watermark belongs to a DIFFERENT checkpoint — a fresh query's
    * batch ids restart and must not be skipped against an old run's). */
  def lastAppliedBatch(dir: String, checkpoint: String): Long = {
    val f = java.nio.file.Paths.get(dir, "ingest.properties")
    if (!java.nio.file.Files.exists(f)) -1L
    else {
      val p = new java.util.Properties()
      val r = java.nio.file.Files.newBufferedReader(f)
      try p.load(r) finally r.close()
      if (p.getProperty("checkpoint") != checkpoint) -1L
      else Option(p.getProperty("lastAppliedBatchId")).map(_.toLong).getOrElse(-1L)
    }
  }

  private def recordAppliedBatch(dir: String, checkpoint: String,
                                 batchId: Long): Unit = {
    val p = new java.util.Properties()
    p.setProperty("checkpoint", checkpoint)
    p.setProperty("lastAppliedBatchId", batchId.toString)
    val tmp = java.nio.file.Paths.get(dir, "ingest.properties.tmp")
    val w = java.nio.file.Files.newBufferedWriter(tmp)
    try p.store(w, "graft postings ingest watermark") finally w.close()
    java.nio.file.Files.move(tmp,
      java.nio.file.Paths.get(dir, "ingest.properties"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /**
   * Streaming GRAPH ingestion — the reference vchordg `aminsert` lifecycle
   * (reference: crates/vchordg/src/insert.rs:34-395) as Structured
   * Streaming: each micro-batch beam-searches the LIVE graph for its
   * rows' neighborhoods and links them in (`VamanaGraph.insertAll`), no
   * rebuild. The graph is an immutable in-memory value, so the live
   * handle is an AtomicReference the caller shares with readers — every
   * batch swaps in the extended graph; concurrent searches keep using the
   * snapshot they grabbed (the same MVCC-flavored economics as the
   * reference's live index).
   *
   * `maxBatchRows` bounds the per-batch driver collect the same way
   * `VamanaGraph.build` bounds its build collect — loudly.
   */
  def graphIngest(vectors: DataFrame, idCol: String, vecCol: String,
                  graphRef: java.util.concurrent.atomic.AtomicReference[graft.index.VamanaGraph],
                  maxBatchRows: Int = 100000,
                  checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // NOTE: insertAll rejects duplicate ids — for replayable sources pass
    // a durable checkpointLocation so restarts resume, not re-ingest.
    val writer = vectors.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        import batch.sparkSession.implicits._
        val rows = batch.select(col(idCol).cast("long"), col(vecCol))
          .limit(maxBatchRows + 1)
          .as[(Long, Seq[Float])].collect()
        require(rows.length <= maxBatchRows,
          s"graph ingest micro-batch exceeds $maxBatchRows rows: size the " +
          "trigger interval down, or use IvfIndex + indexIngest for this tier")
        if (rows.nonEmpty)
          graphRef.updateAndGet(
            _.insertAll(rows.map { case (id, v) => (id, v.toArray) }))
        ()
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /**
   * Streaming ingest into the SHARDED graph tier: each micro-batch is
   * hash-routed to its shards and inserted inside executor tasks via
   * `ShardedVamana.Handle.insertAll` — the distributed analogue of
   * [[graphIngest]], with no whole-graph driver state. The batch still
   * collects to the driver first (the routing table for insertAll is a
   * broadcast of the batch, which is small by construction) — bounded
   * loudly like graphIngest.
   */
  def shardedGraphIngest(vectors: DataFrame, idCol: String, vecCol: String,
                         handleRef: java.util.concurrent.atomic.AtomicReference[graft.index.ShardedVamana.Handle],
                         maxBatchRows: Int = 100000,
                         checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = vectors.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        import batch.sparkSession.implicits._
        val rows = batch.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
          .limit(maxBatchRows + 1)
          .as[(Long, Array[Float])].collect()
        require(rows.length <= maxBatchRows,
          s"sharded graph ingest micro-batch exceeds $maxBatchRows rows: " +
          "size the trigger interval down, or use IvfIndex + indexIngest " +
          "for this tier")
        if (rows.nonEmpty)
          handleRef.updateAndGet(_.insertAll(batch.sparkSession, rows))
        ()
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  final case class DedupHit(da: Long, db: Long, est_jac: Double)

  /**
   * Streaming near-duplicate detection — the incremental form of
   * `Dedup.minhashDedup` for a document stream: each arriving doc's
   * MinHash signature is banded into LSH bucket keys, and per-bucket
   * state (flatMapGroupsWithState keyed by the bucket) holds the
   * residents seen so far; an arrival emits a [[DedupHit]] against every
   * resident whose SIGNATURE-estimated Jaccard (fraction of equal
   * signature components — the unbiased MinHash estimator) reaches
   * `threshold`.
   *
   * Two deliberate divergences from the batch path, both inherent to
   * streaming and documented here rather than hidden:
   *  - by default the verify is the signature ESTIMATE, not exact shingle
   *    Jaccard (at numHashes=64 the estimator's sd is ~0.06 at j=0.5), so
   *    the stream can emit pairs the batch path's exact verify rejects.
   *    Pass `exactVerify=true` to carry each resident's sorted distinct
   *    shingle-hash set in state (bounded by `maxShingles`, loud past it)
   *    and verify candidates with EXACT Jaccard — batch `minhashDedup`
   *    semantics: bucket collision is the only candidate filter, the
   *    exact value gates and fills `est_jac`. COST: the shingle array
   *    rides every band-key row, so exact mode multiplies both the
   *    per-batch shuffle and the resident state by `bands` (default 16)
   *    relative to signatures alone — worst case maxBucket x maxShingles
   *    x 8 bytes per bucket. Size maxShingles/maxBucket to the executor,
   *    or stay in estimate mode and batch-verify downstream.
   *  - a pair sharing several buckets may be emitted more than once
   *    (append-mode state is per-bucket); consumers dedup on (da, db).
   *
   * Skew defense matches the batch star-cap: a bucket stores at most
   * `maxBucket` residents (kept sorted by id, the minimum first); once
   * full, new arrivals still compare against the bucket's ANCHOR (min
   * id) — connectivity through the anchor survives, per-bucket state
   * stays bounded. TOTAL state still grows with the number of DISTINCT
   * band keys ever seen (unbounded over an infinite stream of novel
   * docs): pass `stateTtlMs > 0` to expire buckets not touched within
   * the TTL (ProcessingTimeTimeout) — expiry trades recall against old
   * residents for bounded total state, the standard streaming-retention
   * trade.
   *
   * Oversized docs in exact mode: by default a doc with more than
   * `maxShingles` distinct shingles FAILS the query loudly (bounded state
   * is a hard invariant). A long-running production stream usually cannot
   * afford one poison doc killing it: `dropOversized=true` instead
   * excludes that doc from dedup entirely (no band keys emitted — never a
   * resident, never compared) and counts it in `droppedDocs` when
   * provided, so the operator can alert on the side channel and
   * batch-verify the oversized tail separately.
   *
   * CHECKPOINT COMPATIBILITY: exact mode's state rows carry the resident
   * shingle array (a third tuple element added when `exactVerify` landed).
   * A checkpoint written by the earlier signature-only build has a
   * different state encoder schema and CANNOT be resumed by this version
   * — restart exact-mode streams from a fresh checkpoint.
   */
  def dedupIngest(docs: DataFrame, idCol: String, textCol: String,
                  threshold: Double, n: Int = 3, numHashes: Int = 64,
                  bands: Int = 16, maxBucket: Int = 1024,
                  exactVerify: Boolean = false, maxShingles: Int = 8192,
                  stateTtlMs: Long = 0L,
                  dropOversized: Boolean = false,
                  droppedDocs: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[DedupHit] = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    import docs.sparkSession.implicits._
    val nn = n; val nh = numHashes
    val keyed = docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val th = text.split(' ').map(graft.ops.Dedup.hash64)
        if (th.length < nn) Iterator.empty
        else {
          val sig = graft.ops.Dedup.sigFromTokens(th, nn, nh)
          val shOpt: Option[Array[Long]] =
            if (!exactVerify) Some(Array.emptyLongArray)
            else {
              val s = graft.ops.Dedup.sortedShingleSet(th, nn)
              if (s.length <= maxShingles) Some(s)
              else if (dropOversized) {
                // poison-doc defense: exclude from dedup, count and move on
                droppedDocs.foreach(_.add(1L))
                None
              } else throw new IllegalArgumentException(
                s"dedupIngest(exactVerify): doc $id has ${s.length} distinct " +
                s"shingles > maxShingles=$maxShingles — exact streaming state " +
                "must stay bounded; raise maxShingles, set dropOversized=true, " +
                "or use estimate mode + batch jaccardPairs for giant docs")
            }
          shOpt match {
            case None => Iterator.empty
            case Some(sh) =>
              graft.ops.Dedup.bandKeys(sig, bands, r).iterator
                .map(k => (k, id, sig, sh))
          }
        }
      }
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Array[Long], Array[Long])], DedupHit](
        OutputMode.Append(), timeout) {
        (_: Long, it: Iterator[(Long, Long, Array[Long], Array[Long])],
         state: GroupState[List[(Long, Array[Long], Array[Long])]]) =>
          if (state.hasTimedOut) { // TTL expiry: drop the idle bucket
            state.remove()
            Iterator.empty
          } else {
          val arrivals = it.map { case (_, id, sig, sh) => (id, sig, sh) }
            .toSeq.sortBy(_._1) // deterministic within the micro-batch
          var residents = state.getOption.getOrElse(Nil) // sorted by id
          val out = scala.collection.mutable.ListBuffer[DedupHit]()
          arrivals.foreach { case (id, sig, sh) =>
            if (!residents.exists(_._1 == id)) {
              val pool =
                if (residents.size >= maxBucket) residents.headOption.toList
                else residents
              pool.foreach { case (rid, rsig, rsh) =>
                if (exactVerify) {
                  val jac = graft.ops.Dedup.jaccardSorted(rsh, sh)
                  if (jac >= threshold)
                    out += DedupHit(math.min(rid, id), math.max(rid, id), jac)
                } else {
                  var eq = 0; var k = 0
                  while (k < nh) { if (rsig(k) == sig(k)) eq += 1; k += 1 }
                  val est = eq.toDouble / nh
                  if (est >= threshold)
                    out += DedupHit(math.min(rid, id), math.max(rid, id), est)
                }
              }
              if (residents.size < maxBucket) {
                val (lt, ge) = residents.span(_._1 < id)
                residents = lt ::: ((id, sig, sh) :: ge)
              }
            }
          }
          state.update(residents)
          if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
          out.iterator
          }
      }
  }

  /**
   * Watermarked tumbling-window counts per event type — the streaming
   * equivalent of the q_events_hourly batch query.
   */
  def hourlyCounts(events: DataFrame, tsCol: String = "ts"): DataFrame = {
    val withTs = events.withColumn("event_time",
      timestamp_micros((col(tsCol) / 1000L).cast("long")))
    withTs
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
  }
}
