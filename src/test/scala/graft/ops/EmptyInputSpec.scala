package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Empty-input robustness across the pipeline operators: a real ingest
 * pipeline routinely hands an operator an empty slice (empty partition,
 * empty day, filtered-out shard), and every operator must return an
 * empty, correctly-shaped result rather than fail — the batch analogue
 * of the issue_427 empty-index lifecycle.
 */
class EmptyInputSpec extends SparkSpec {

  private def emptyDocs = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  private def emptyVecs = {
    import spark.implicits._
    Seq.empty[(Long, Seq[Float])].toDF("id", "vec")
  }

  test("dedup operators over empty input return empty") {
    import spark.implicits._
    assert(Dedup.exactDupGroups(emptyDocs, "doc_id", md5(col("text"))).isEmpty)
    assert(Dedup.minhashDedup(emptyDocs, "doc_id", "text", 0.7).isEmpty)
    assert(Dedup.simhashDedup(emptyDocs, "doc_id", "text").isEmpty)
    assert(Dedup.embeddingNearDup(emptyVecs, "id", "vec", tau = 0.1).isEmpty)
    assert(Dedup.embeddingNearDup(emptyVecs, "id", "vec", tau = 0.1,
      lshBits = 8, lshTables = 4).isEmpty)
    val noPairs = Seq.empty[(Long, Long)].toDF("da", "db")
    assert(Dedup.components(noPairs).isEmpty)
    val p = Dedup.pipeline(emptyDocs, "doc_id",
      d => Dedup.minhashDedup(d, "doc_id", "text", 0.7))
    try {
      assert(p.pairs.isEmpty && p.labels.isEmpty && p.cleaned.isEmpty)
    } finally p.unpersist()
  }

  test("round-8 curation/dedup additions over empty input return empty") {
    import spark.implicits._
    val ref = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    assert(Dedup.semDedup(emptyVecs, "id", "vec", 0.2,
      Array(Array.fill(4)(0.1f))).isEmpty)
    assert(Dedup.minhashDedupAgainst(emptyDocs, "doc_id", "text",
      ref, "doc_id", "text", 0.5).isEmpty)
    assert(Dedup.minhashDedupAgainst(ref, "doc_id", "text",
      emptyDocs, "doc_id", "text", 0.5).isEmpty)
    assert(Dedup.minhashDedupAgainstIngest(emptyDocs, "doc_id", "text",
      ref, "doc_id", "text", 0.5).isEmpty)
    assert(Dedup.minhashDedupAgainstIngest(ref, "doc_id", "text",
      emptyDocs, "doc_id", "text", 0.5).isEmpty)
    assert(Curation.importanceWeights(emptyDocs, "doc_id", "text",
      ref, "text").isEmpty)
    assert(Curation.dsirResample(emptyDocs, "doc_id", "text",
      ref, "text", nKeep = 5).isEmpty)
    assert(Curation.ngramCrossEntropy(emptyDocs, "doc_id", "text",
      ref, "text").isEmpty)
    assert(Curation.importanceIngest(emptyDocs, "doc_id", "text",
      Curation.importanceModel(ref, "text", emptyDocs, "text",
        buckets = 64)).isEmpty)
    assert(emptyDocs.select(TextOps.normalizeText(col("text"))).isEmpty)
  }

  test("search, tokenizer, and shard operators over empty input") {
    // BM25 scan path: stats degrade to (0, 0.0, no df rows); scores empty
    val st = Search.bm25Stats(emptyDocs, "text", Seq("cat"))
    assert(st.nDocs == 0 && st.avgDl == 0.0 && st.df.isEmpty)
    assert(Search.bm25Score(emptyDocs, "doc_id", "text", Seq("cat")).isEmpty)
    // postings path: the create-then-insert lifecycle — an empty build
    // must load and serve (explicit-schema reads over fileless dirs)
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-postings").toString
    val idx = Search.buildPostings(emptyDocs, "doc_id", "text", dir)
    assert(Search.loadPostings(dir) == idx)
    assert(idx.score(spark, Seq("cat")).isEmpty)
    assert(idx.search(spark, Seq("cat"), 5).isEmpty)
    // BPE: empty corpus -> empty merge table; encoding still works
    val m = Bpe.train(emptyDocs, "text", nMerges = 5)
    assert(m.merges.isEmpty)
    assert(m.encodeWord("ab") == Seq("a", "b", "</w>"))
    assert(Bpe.pairCounts(Bpe.wordFreq(emptyDocs, "text")).isEmpty)
    assert(Bpe.tokenCounts(emptyDocs, "doc_id", "text", m).isEmpty)
    // reporting + sharding
    assert(Curation.corpusStats(emptyDocs, "text", Seq("doc_id")).isEmpty)
    assert(Curation.shuffleShards(emptyDocs, "doc_id", 8).isEmpty)
  }

  test("text and multimodal operators over empty input return empty") {
    import spark.implicits._
    val t = emptyDocs.select(
      TextOps.langId(col("text")).as("lang"),
      TextOps.tokenCount(col("text")).as("toks"),
      TextOps.qualityScore(col("text")).as("q"),
      TextOps.fingerprint(col("text")).as("fp"))
    assert(t.isEmpty && t.columns.length == 4)
    val blobs = Seq.empty[(Long, Array[Byte])].toDF("doc_id", "blob")
    assert(Multimodal.imageStats(blobs, "doc_id", "blob").isEmpty)
    assert(Multimodal.extractFeatures(blobs, "doc_id", "blob").isEmpty)
    assert(Multimodal.audioStats(blobs, "doc_id", "blob").isEmpty)
  }
}
