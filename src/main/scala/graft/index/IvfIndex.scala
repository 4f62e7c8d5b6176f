package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{RaBitQ, VectorKernels => K}
import graft.kmeans.KMeans

/**
 * IVF + quantized-code ANN index, persisted as partitioned Parquet.
 *
 * The Spark re-expression of the reference's `vchordrq` access method
 * (reference: index layout crates/vchordrq/src/tuples.rs:50-84, build
 * lifecycle src/index/vchordrq/am/am_build.rs:208-443, search
 * crates/vchordrq/src/search.rs:36-196):
 *
 *   page "tapes" per cell      ->  Parquet files partitioned by cluster_id
 *   meta page                  ->  small `config` + `centroids` Parquet
 *   multi-probe tree descent   ->  driver-side centroid scoring + Parquet
 *                                  PARTITION PRUNING on cluster_id
 *   RaBitQ LUT leaf scoring    ->  code-only column scan (column pruning:
 *                                  the estimate phase never reads vectors)
 *   eps-lower-bound + rerank   ->  top (k*refine) by (est - eps*err), then
 *                                  exact re-score of just those rows
 *
 * Scale design: the only full-data pass at build is one assignment +
 * shuffle-on-cluster write; k-means runs on a bounded sample
 * (lists x samplingFactor rows) on the driver, as in the reference.
 * Search reads only probed partitions, and only (id, meta, codes) columns
 * until the rerank step touches the handful of candidate vectors.
 */
final case class IvfConfig(
    lists: Int = 16,
    bits: Int = 8,
    residual: Boolean = true,
    metric: String = "l2", // l2 | cosdist | negdot
    samplingFactor: Int = 256,
    kmeansIters: Int = 10)

final case class IvfMeta(dim: Int, cfg: IvfConfig, centroids: Array[Array[Float]])

object IvfIndex {

  private def spherical(cfg: IvfConfig): Boolean = cfg.metric == "cosdist"

  /** Build the index from `df(idCol, vecCol)` into `dir`. */
  def build(df: DataFrame, idCol: String, vecCol: String, dir: String,
            cfg: IvfConfig = IvfConfig()): IvfIndex = {
    val spark = df.sparkSession
    import spark.implicits._
    val cap = math.max(cfg.lists * cfg.samplingFactor, cfg.lists)
    val sample = df.select(col(vecCol)).as[Seq[Float]]
      .limit(cap).collect().map(_.toArray)
    require(sample.nonEmpty, "cannot build an index over an empty table")
    val dim = sample(0).length
    val centroids = KMeans.lloyd(sample, cfg.lists, cfg.kmeansIters, spherical(cfg))
    val bc = spark.sparkContext.broadcast(centroids)
    val residual = cfg.residual
    val bits = cfg.bits
    val sph = spherical(cfg)
    val rows = df.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Seq[Float])]
      .map { case (id, v) =>
        val raw = v.toArray
        val vec = if (sph) K.normalize(raw) else raw
        val cs = bc.value
        val cid = KMeans.nearest(vec, cs)
        val toCode =
          if (residual) {
            val c = cs(cid)
            val r = new Array[Float](vec.length)
            var j = 0
            while (j < vec.length) { r(j) = vec(j) - c(j); j += 1 }
            r
          } else vec
        val code = RaBitQ.quantize(toCode, bits)
        (cid, id, vec.toSeq, code.meta.toSeq, code.codes)
      }
      .toDF("cluster_id", "id", "vec", "cmeta", "codes")
    rows.write.mode("overwrite").partitionBy("cluster_id").parquet(s"$dir/data")
    // meta: tiny parquet tables (config row + centroid rows)
    Seq((dim, cfg.lists, cfg.bits, cfg.residual, cfg.metric))
      .toDF("dim", "lists", "bits", "residual", "metric")
      .write.mode("overwrite").parquet(s"$dir/config")
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster_id", "centroid")
      .write.mode("overwrite").parquet(s"$dir/centroids")
    new IvfIndex(spark, dir, IvfMeta(dim, cfg, centroids))
  }

  def load(spark: SparkSession, dir: String): IvfIndex = {
    import spark.implicits._
    val (dim, lists, bits, residual, metric) =
      spark.read.parquet(s"$dir/config")
        .as[(Int, Int, Int, Boolean, String)].head()
    val centroids = spark.read.parquet(s"$dir/centroids")
      .as[(Int, Seq[Float])].collect().sortBy(_._1).map(_._2.toArray)
    new IvfIndex(spark, dir,
      IvfMeta(dim, IvfConfig(lists, bits, residual, metric), centroids))
  }
}

final class IvfIndex(spark: SparkSession, dir: String, val meta: IvfMeta) {
  import spark.implicits._

  private def prepQuery(q: Array[Float]): Array[Float] =
    if (meta.cfg.metric == "cosdist") K.normalize(q) else q

  /** User-visible distance UDF from internal stored vectors (already
    * normalized for cosine), matching reference output mapping
    * (reference: src/index/vchordrq/opclass.rs:244-262). Captures only the
    * metric string and a broadcast query — never `this`. */
  private def exactDistUdf(qq: Array[Float]) = {
    val bq = spark.sparkContext.broadcast(qq)
    meta.cfg.metric match {
      case "l2"      => udf((v: Seq[Float]) => K.l2(v.toArray, bq.value))
      case "negdot"  => udf((v: Seq[Float]) => K.negdot(v.toArray, bq.value))
      case "cosdist" => udf((v: Seq[Float]) => 1.0 + K.negdot(v.toArray, bq.value))
    }
  }

  /** Probed cluster ids: nearest `probes` centroids to the query. */
  def probe(q: Array[Float], probes: Int): Array[Int] = {
    val qq = prepQuery(q)
    meta.centroids.zipWithIndex
      .map { case (c, i) => (K.l2s(qq, c), i) }
      .sortBy(identity)
      .take(math.min(probes, meta.centroids.length))
      .map(_._2)
  }

  /**
   * ANN top-k. `probes` = clusters scanned; `epsilon` scales the code
   * error bound (reference default 1.9, src/index/gucs.rs:66); `refine` =
   * candidate multiplier for the exact rerank (refine*k candidates).
   * Output: (id, dist) ascending, deterministic (dist, id) ties.
   */
  def search(q: Array[Float], k: Int, probes: Int = 4, epsilon: Double = 1.9,
             refine: Int = 8): DataFrame = {
    val qq = prepQuery(q)
    val probed = probe(q, probes)
    val data = spark.read.parquet(s"$dir/data")
      .filter(col("cluster_id").isin(probed.map(Integer.valueOf): _*))
    // per-probed-cluster precomputed query residual + sums (broadcast)
    val residual = meta.cfg.residual
    val perCluster: Map[Int, (Array[Float], Double, Double)] = probed.map { cid =>
      val qr =
        if (residual) {
          val c = meta.centroids(cid)
          val r = new Array[Float](qq.length)
          var j = 0
          while (j < qq.length) { r(j) = qq(j) - c(j); j += 1 }
          r
        } else qq
      var s = 0.0; var j = 0
      while (j < qr.length) { s += qr(j); j += 1 }
      cid -> (qr, s, K.normSq(qr))
    }.toMap
    val bpc = spark.sparkContext.broadcast(perCluster)
    val bits = meta.cfg.bits
    val dim = meta.dim
    val isL2 = meta.cfg.metric == "l2"
    // estimate phase: codes only — vec column is pruned from this scan
    val est = data.select($"cluster_id", $"id", $"cmeta", $"codes")
      .as[(Int, Long, Seq[Float], Array[Byte])]
      .mapPartitions { it =>
        val pc = bpc.value
        it.map { case (cid, id, cm, codes) =>
          val (qr, qSum, qNormSq) = pc(cid)
          val code = RaBitQ.Code(cm.toArray, codes, bits, dim)
          val lb =
            if (isL2) {
              val (e, err) = RaBitQ.estimateL2s(code, qr, qSum, qNormSq)
              math.sqrt(math.max(e - epsilon * err, 0.0))
            } else {
              // dot-family estimate: -dot (negdot / shifted cosine)
              val d = RaBitQ.estimateDot(code, qr, qSum)
              val err = math.sqrt(qNormSq) * code.scale * math.sqrt(dim.toDouble)
              -d - epsilon * err
            }
          (id, cid, lb)
        }
      }.toDF("id", "cluster_id", "lb")
    val nCand = math.max(k * refine, k)
    val cand = est.orderBy($"lb", $"id").limit(nCand)
      .select($"id").as[Long].collect()
    // rerank: exact distances for just the candidates (vec column read
    // only here, with id + partition filters pushed to Parquet)
    val exact = exactDistUdf(qq)
    data.filter(col("id").isin(cand.map(java.lang.Long.valueOf): _*))
      .select($"id", exact($"vec").as("dist"))
      .orderBy($"dist", $"id")
      .limit(k)
  }

  /**
   * Exact search through the index path (all partitions, no estimate) —
   * the recall ground truth, and the oracle-checkable mode.
   */
  def searchExact(q: Array[Float], k: Int): DataFrame = {
    val qq = prepQuery(q)
    val exact = exactDistUdf(qq)
    spark.read.parquet(s"$dir/data")
      .select($"id", exact($"vec").as("dist"))
      .orderBy($"dist", $"id")
      .limit(k)
  }

  /**
   * Recall of ANN vs exact for one query — the reference's
   * `vchordrq_evaluate_query_recall` (reference:
   * sql/install/vchord--1.1.1.sql:1021-1092).
   */
  def evaluateRecall(q: Array[Float], k: Int, probes: Int = 4, epsilon: Double = 1.9,
                     refine: Int = 8): Double = {
    val ann = search(q, k, probes, epsilon, refine).select("id").as[Long].collect().toSet
    val exact = searchExact(q, k).select("id").as[Long].collect().toSet
    if (exact.isEmpty) Double.NaN
    else ann.intersect(exact).size.toDouble / exact.size
  }
}
