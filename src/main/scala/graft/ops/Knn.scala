package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{VectorKernels => K}

/**
 * Exact k-nearest-neighbor primitives.
 *
 * `topK` is the brute-force oracle the reference uses as ground truth in
 * its recall harness (reference: sql/install/vchord--1.1.1.sql:1021-1092,
 * the `exact_search` branch). `knnJoin` generalizes it to a query *set* —
 * the batch capability a Spark engine gains for free (SURVEY.md §2.6).
 *
 * Scale design: `knnJoin` never shuffles the data side. Each input
 * partition keeps one bounded binary heap per query (Q·k entries), emits
 * only its local top-k, and the global merge runs over ≤ partitions·Q·k
 * rows — a thousand-executor scan reduces to a trivial driver-side-sized
 * merge. Ties break on (distance, id) so results are deterministic.
 */
object Knn {

  /** Distance function by name: l2 | negdot | cosdist (double precision). */
  def metricFn(metric: String): (Array[Float], Array[Float]) => Double = metric match {
    case "l2"      => K.l2
    case "negdot"  => K.negdot
    case "cosdist" => K.cosdist
    case m         => throw new IllegalArgumentException(s"unknown metric: $m")
  }

  /** Brute-force top-k of `df` rows nearest to `q`. Output: (id, dist). */
  def topK(df: DataFrame, idCol: String, vecCol: String, q: Array[Float], k: Int,
           metric: String = "l2"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fn = metricFn(metric)
    // Array[Float] deserializes through the primitive fast path (zero
    // boxing) — Seq[Float] boxes every component, which dominates a
    // whole-table scan (see IvfIndex.encodeRows)
    val data = df.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
    // per-partition heap, then tiny global merge — same shape as knnJoin
    val local = data.mapPartitions { it =>
      val heap = new graft.core.BoundedTopK(k)
      val qa = q
      it.foreach { case (id, v) => heap.offer(fn(v, qa), id) }
      heap.sorted().iterator
    }.toDF("dist", "id")
    local
      .orderBy($"dist", $"id")
      .limit(k)
      .select($"id", $"dist")
  }

  /**
   * For every (qid, qvec) in `queries` (small, driver-side), the k nearest
   * rows of `df`. Output: (qid, id, dist, rn) with rn in 1..k.
   */
  def knnJoin(df: DataFrame, idCol: String, vecCol: String,
              queries: Array[(Long, Array[Float])], k: Int,
              metric: String = "l2",
              excludeSelf: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fn = metricFn(metric)
    val bq = spark.sparkContext.broadcast(queries)
    val data = df.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
    val local: Dataset[(Long, Long, Double)] = data.mapPartitions { it =>
      val qs = bq.value
      val heaps = qs.map(_ => new graft.core.BoundedTopK(k))
      it.foreach { case (id, v) =>
        val va = v
        var i = 0
        while (i < qs.length) {
          if (!(excludeSelf && qs(i)._1 == id)) heaps(i).offer(fn(va, qs(i)._2), id)
          i += 1
        }
      }
      qs.iterator.zip(heaps.iterator).flatMap { case ((qid, _), h) =>
        h.sorted().map { case (d, id) => (qid, id, d) }
      }
    }
    val w = Window.partitionBy($"qid").orderBy($"dist", $"id")
    local.toDF("qid", "id", "dist")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
  }

}
