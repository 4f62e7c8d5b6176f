package graft.dsl

import graft.SparkSpec
import graft.core.{VectorKernels => K}
import java.nio.file.Files

class DslSpec extends SparkSpec {

  private lazy val data: Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(17)
    (0L until 200L).map(i => i -> Seq.fill(6)(rng.nextFloat() * 2 - 1))
  }

  test("DSL surface composes end-to-end") {
    import spark.implicits._
    val df = data.toDF("id", "vec")
    val q = data.head._2.toArray

    val top = df.annTopK("vec", q, 5).select("id").as[Long].collect().toSeq
    val want = data.map { case (id, v) => (K.l2(v.toArray, q), id) }
      .sorted.take(5).map(_._2)
    assert(top == want)

    val inRange = df.annRange("vec", q, 1.0).select("id").as[Long].collect().toSet
    assert(inRange == data.filter(r => K.l2(r._2.toArray, q) < 1.0).map(_._1).toSet)

    val joined = df.knnJoin("id", "vec", Array(0L -> q), 3, excludeSelf = true)
    assert(joined.count() == 3)

    val idx = df.buildIvfIndex("id", "vec",
      Files.createTempDirectory("graft-dsl").toString)
    assert(idx.searchExact(q, 1).select("id").as[Long].head() == 0L)

    val toks = data.take(30).flatMap { case (id, v) =>
      Seq((id, v), (id, v.map(x => -x)))
    }.toDF("doc", "v")
    assert(toks.annMaxsim("doc", "v", Array(q), 3).count() == 3)

    val docs = Seq((1L, "a b c d e f g"), (2L, "a b c d e f h"), (3L, "x y z w v u t"))
      .toDF("doc_id", "text")
    val dups = docs.nearDupPairs("doc_id", "text", 0.3)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(dups == Set((1L, 2L)))

    val kept = docs.dedupeBy("doc_id", dups.toSeq.toDF("da", "db"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))

    val pipe = docs.dedupPipeline("doc_id",
      d => d.nearDupPairs("doc_id", "text", 0.3))
    try {
      assert(pipe.cleaned.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
      assert(pipe.labels.as[(Long, Long)].collect().toMap ==
        Map(1L -> 1L, 2L -> 1L))
    } finally pipe.unpersist()

    // index-served range through the DSL (single + batch forms)
    val rangeIds = idx.annRange(q, 1.0).select("id").as[Long].collect().toSet
    assert(rangeIds == inRange)
    val batchIds = idx.annRangeBatch(Array((7L, q, 1.0)))
      .select("id").as[Long].collect().toSet
    assert(batchIds == inRange)

    val h = df.buildShardedGraph("id", "vec",
      Files.createTempDirectory("graft-dsl-gshard").toString, shards = 2)
    try {
      val sg = h.search(spark, Array(0L -> q), 5)
        .select("id").as[Long].collect().toSeq
      assert(sg == want)
    } finally h.unpersist()

    // multimodal through the DSL: real decoders end-to-end
    import graft.ops.Multimodal
    val media = Seq(
      (1L, Multimodal.syntheticPng(1L)),
      (2L, Multimodal.syntheticWav(2L)),
      (3L, Multimodal.syntheticMjpeg(3L, frames = 4))).toDF("doc_id", "blob")
    // 2: the PNG, plus the MJPEG clip whose FIRST frame ImageIO reads
    assert(media.imageStats("doc_id", "blob").count() == 2)
    assert(media.audioStats("doc_id", "blob").count() == 1)
    assert(media.sampleFrames("doc_id", "blob", everyN = 1).count() == 4)
    assert(media.mediaFeatures("doc_id", "blob", dim = 16).count() == 3)

    // curation surface: per-key cap, corpus line dedup, model scoring
    val srcDocs = Seq((1L, "s0", "dup line"), (2L, "s0", "dup line"),
      (3L, "s0", "third"), (4L, "s1", "solo")).toDF("doc_id", "source", "text")
    assert(srcDocs.capPerKey("source", "doc_id", 2)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    assert(srcDocs.dedupLines("doc_id", "text")
      .filter($"n_removed" > 0).select("doc_id").as[Long].head() == 2L)
    val w = Seq(("dup", 1.0)).toDF("term", "weight")
    assert(srcDocs.scoreQuality("doc_id", "text", w).count() == 4)
  }
}
