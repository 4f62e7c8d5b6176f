package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling for training-data pipelines: media travels
 * as an opaque `binary` column plus a typed metadata struct; decode /
 * feature-extraction / resize / frame-sampling run as partition-local
 * batch kernels.
 *
 * The Spark-side plumbing — schema, batch shape, partitioning, join-back
 * by id — is real and tested. The actual media DECODING is a clearly
 * marked STUB (this environment ships no image/audio codecs): the stub
 * derives deterministic fake features from the blob bytes, so every
 * downstream operator (ANN index over media embeddings, near-dup, etc.)
 * exercises realistically shaped data. Swap `stubDecode` for a codec
 * call to productionize; nothing else changes.
 */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int,
                             sampleRate: Int, durationMs: Long)

  /** Demo helper for testdata without real media: pack a string's UTF-8
    * bytes as the blob and synthesize plausible metadata. */
  def attachBlob(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      col(textCol).cast("binary").as("blob"),
      struct(
        lit("image").as("kind"),
        (pmod(col(idCol), lit(4)) * 256 + 256).cast("int").as("width"),
        (pmod(col(idCol), lit(3)) * 256 + 256).cast("int").as("height"),
        lit(0).as("sampleRate"),
        lit(0L).as("durationMs")).as("mm_meta"))

  /**
   * STUB decode: deterministic pseudo-features from blob bytes.
   * Production: replace body with a real decoder (JPEG -> pixels ->
   * model features). Signature and batch shape stay identical.
   */
  private[ops] def stubDecode(blob: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake for plumbing tests:
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < blob.length) { h = (h ^ (blob(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    val out = new Array[Float](dim)
    var j = 0
    var x = h
    while (j < dim) {
      x = Dedup.mix(x, j)
      out(j) = ((x >>> 11).toDouble / (1L << 53).toDouble - 0.5).toFloat
      j += 1
    }
    graft.core.VectorKernels.normalize(out)
  }

  /**
   * Feature extraction over blobs, batch-shaped: rows stream through a
   * partition-local kernel in fixed-size batches (the JVM analog of an
   * Arrow-batched vectorized UDF — amortizes any per-batch codec setup).
   * Output: (id, features: Array[Float]) with unit norm.
   */
  def extractFeatures(df: DataFrame, idCol: String, blobCol: String, dim: Int = 64,
                      batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch setup would init the codec/model session here
          batch.iterator.map { case (id, blob) => (id, stubDecode(blob, dim).toSeq) }
        }
      }
      .toDF("id", "features")
  }

  /** STUB resize: metadata transform is real, pixel work is the stub. */
  def resize(df: DataFrame, targetW: Int, targetH: Int): DataFrame =
    df.withColumn("mm_meta",
      struct(
        col("mm_meta.kind"),
        lit(targetW).as("width"),
        lit(targetH).as("height"),
        col("mm_meta.sampleRate"),
        col("mm_meta.durationMs")))

  /**
   * STUB frame sampling for video blobs: emits (id, frame_no, frame_blob)
   * rows — the explode shape a real decoder would produce; frame content
   * is a deterministic slice of the blob.
   */
  def sampleFrames(df: DataFrame, idCol: String, blobCol: String, everyN: Int = 10,
                   maxFrames: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol)).as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        val n = math.min(maxFrames, math.max(1, blob.length / math.max(1, everyN)))
        (0 until n).map { f =>
          val start = f * everyN
          val end = math.min(blob.length, start + everyN)
          (id, f, java.util.Arrays.copyOfRange(blob, math.min(start, blob.length), end))
        }
      }
      .toDF("id", "frame_no", "frame_blob")
  }
}
