package graft.ops

import graft.SparkSpec
import graft.core.{VectorKernels => K}

class MultimodalSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq((0L, "alpha beta gamma"), (1L, "delta epsilon"), (2L, "zeta"))
      .toDF("doc_id", "text")
  }

  test("attachBlob schema: binary blob + typed metadata struct") {
    val b = Multimodal.attachBlob(docs, "doc_id", "text")
    val schema = b.schema
    assert(schema("blob").dataType.typeName == "binary")
    val meta = schema("mm_meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("kind", "width", "height", "sampleRate", "durationMs"))
  }

  test("extractFeatures: deterministic, unit-norm, batch-size independent") {
    import spark.implicits._
    val b = Multimodal.attachBlob(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(b, "doc_id", "blob", 32, batchSize = 1)
      .as[(Long, Seq[Float])].collect().toMap
    val f2 = Multimodal.extractFeatures(b.repartition(3), "doc_id", "blob", 32, batchSize = 256)
      .as[(Long, Seq[Float])].collect().toMap
    assert(f1 == f2, "features must not depend on batching or partitioning")
    f1.values.foreach(v => assert(math.abs(K.norm(v.toArray) - 1.0) < 1e-5))
  }

  test("resize rewrites metadata, preserves blob") {
    import spark.implicits._
    val b = Multimodal.attachBlob(docs, "doc_id", "text")
    val r = Multimodal.resize(b, 128, 128)
    val metas = r.select("mm_meta.width", "mm_meta.height").as[(Int, Int)].collect()
    assert(metas.forall(_ == ((128, 128))))
    assert(r.select("blob").collect().toSeq == b.select("blob").collect().toSeq)
  }

  test("sampleFrames explodes deterministic frame rows") {
    import spark.implicits._
    val b = Multimodal.attachBlob(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(b, "doc_id", "blob", everyN = 4, maxFrames = 3)
    val byDoc = frames.select("id", "frame_no").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.length).toMap
    // "alpha beta gamma" = 16 bytes -> min(3, 16/4) = 3 frames; "zeta" = 4 -> 1
    assert(byDoc(0L) == 3 && byDoc(2L) == 1)
  }

  test("features compose with KNN (media-embedding plumbing end-to-end)") {
    import spark.implicits._
    val b = Multimodal.attachBlob(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(b, "doc_id", "blob", 16)
    val q = feats.filter($"id" === 0L).select("features").as[Seq[Float]].head().toArray
    val top = Knn.topK(feats, "id", "features", q, 1).select("id").as[Long].head()
    assert(top == 0L) // self is its own nearest neighbor
  }
}
