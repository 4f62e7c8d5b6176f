package graft.ops

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/**
 * Crash injection for the postings append's staged commit
 * (Search.healStage): an append stages data + a COMMIT marker, then
 * promotes. Both crash sides must reconverge to a state score-identical
 * to a fresh build — the marker decides whether the batch logically
 * landed (reference analogue: the vector tiers' generation pointers;
 * Lucene's segments_N commit point plays the same role for its postings).
 */
class PostingsCrashSpec extends SparkSpec {
  import spark.implicits._

  private lazy val batch1 = Seq(
    (0L, "cat dog cat"),
    (1L, "dog dog dog dog"),
    (2L, "cat fish")
  ).toDF("doc_id", "text")

  private lazy val batch2 = Seq(
    (3L, "bird bird bird"),
    (4L, "cat dog fish bird cat")
  ).toDF("doc_id", "text")

  private def freshDir(): String =
    Files.createTempDirectory("graft-postings-crash").toString

  private def scores(idx: Search.PostingsIndex): Seq[(Long, Double)] =
    idx.score(spark, Seq("cat", "dog", "bird"))
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq

  private lazy val want: Seq[(Long, Double)] = {
    val d = freshDir()
    scores(Search.buildPostings(batch1.unionByName(batch2),
      "doc_id", "text", d, nBuckets = 4))
  }

  test("crash AFTER the commit marker: rerun (load) finishes the promote — " +
       "no lost batch, no double count") {
    val dir = freshDir()
    val idx = Search.buildPostings(batch1, "doc_id", "text", dir, nBuckets = 4)
    // stageAppend = append up to and including the COMMIT marker, then
    // "crash" before the promote
    val staged = idx.stageAppend(batch2, "doc_id", "text")
    assert(Files.exists(Paths.get(dir, "stage", "COMMIT")), "marker missing")
    // live meta still shows the OLD counts (the window under test)
    assert(Search.loadPostings(dir).nDocs == 5,
      "load after post-commit crash must finish the promote")
    val healed = Search.loadPostings(dir)
    assert(healed.nDocs == staged.nDocs && healed.nTokens == staged.nTokens)
    assert(!Files.exists(Paths.get(dir, "stage")), "stage not cleaned")
    assert(scores(healed) == want, "post-commit heal broke score parity")
    // healing again is a no-op (idempotent recovery)
    assert(scores(Search.loadPostings(dir)) == want)
  }

  test("RACING healer: a concurrent reader promoting the freshly-committed " +
       "stage must not fail the writer's commit step") {
    // the deterministic form of the race: writer stages + commits, a
    // READER (loadPostings) heals first, then the writer's own heal runs
    // against the already-cleared stage — it must report 'nothing to
    // heal' (false), NOT throw, and the on-disk meta must already carry
    // the marker's absolute counts (append()'s acceptance condition)
    val dir = freshDir()
    val idx = Search.buildPostings(batch1, "doc_id", "text", dir, nBuckets = 4)
    val staged = idx.stageAppend(batch2, "doc_id", "text")
    val reader = Search.loadPostings(dir) // the racing reader's heal
    assert(reader.nDocs == staged.nDocs && reader.nTokens == staged.nTokens)
    assert(!Files.exists(Paths.get(dir, "stage")), "reader heal left the stage")
    // writer side: heal finds nothing, returns false without throwing
    assert(!Search.healStage(dir),
      "writer heal after a racing reader must report nothing-to-heal")
    // and the full append() path accepts the same interleaving end to
    // end: stage, let a reader heal, then append's own verification
    val dir2 = freshDir()
    val idx2 = Search.buildPostings(batch1, "doc_id", "text", dir2, nBuckets = 4)
    // append() heals any prior stage first, stages, commits, then heals;
    // a reader racing BETWEEN those steps is emulated by the scenario
    // above — here we assert the normal path still converges and is
    // score-identical to the fresh build
    val appended = idx2.append(batch2, "doc_id", "text")
    assert(scores(appended) == want)
  }

  test("crash BEFORE the commit marker: the batch never landed — a LOAD " +
       "leaves the stage alone (it could be a live writer's), the rerun " +
       "APPEND discards it and lands exactly once") {
    val dir = freshDir()
    val idx = Search.buildPostings(batch1, "doc_id", "text", dir, nBuckets = 4)
    // manufacture a mid-write crash: staged parquet present, NO marker
    batch2.select($"doc_id", $"text").write
      .parquet(s"$dir/stage/postings")
    val reloaded = Search.loadPostings(dir)
    assert(reloaded.nDocs == 3, "uncommitted stage must not change counts")
    // read path must NOT delete the stage — a concurrent reader cannot
    // distinguish crash leftovers from an in-flight append, and deleting
    // a live writer's stage would corrupt its commit
    assert(Files.exists(Paths.get(dir, "stage")),
      "read path destroyed an uncommitted stage")
    // the caller reruns the append (single-writer) — the write path
    // discards the dead stage and lands the batch exactly once
    val after = reloaded.append(batch2, "doc_id", "text")
    assert(after.nDocs == 5)
    assert(!Files.exists(Paths.get(dir, "stage")), "stage not cleaned")
    assert(scores(after) == want, "rerun after discard broke score parity")
  }

  test("append onto a crashed-after-commit index: heal first, then land " +
       "the new batch (counts include BOTH batches once)") {
    val dir = freshDir()
    val idx = Search.buildPostings(batch1, "doc_id", "text", dir, nBuckets = 4)
    idx.stageAppend(batch2, "doc_id", "text") // crash after commit
    // the next APPEND (not a load) must also heal before staging
    val more = Seq((5L, "fish fish")).toDF("doc_id", "text")
    val after = idx.append(more, "doc_id", "text")
    assert(after.nDocs == 6, s"expected 6 docs, got ${after.nDocs}")
    val freshAll = Search.buildPostings(
      batch1.unionByName(batch2).unionByName(more),
      "doc_id", "text", freshDir(), nBuckets = 4)
    assert(scores(after) == scores(freshAll))
  }
}
