package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{VectorKernels => K}

/**
 * DiskANN/Vamana-style graph ANN index — the `vchordg` capability
 * (reference: greedy beam search crates/vchordg/src/search.rs:34-140,
 * robust prune crates/vchordg/src/prune.rs:19-72 with ascending alpha
 * passes [1.0, 1.2] and degree cap m=32 per crates/vchordg/src/types.rs:
 * 24-82, insert crates/vchordg/src/insert.rs:34-395, defaults
 * ef_construction=64 / ef_search=64 per src/index/gucs.rs:36-58).
 *
 * Graph traversal is pointer-chasing and inherently sequential, so —
 * exactly as SURVEY §2.4 G1 prescribes — the graph lives in memory and
 * batch queries fan out over executors with the graph BROADCAST; this is
 * the right Spark shape for moderate graph sizes (the billion-scale path
 * in this engine is the IVF index). Build is deterministic: fixed
 * insertion order, deterministic medoid, tie-breaks by id.
 */
final case class VamanaConfig(
    m: Int = 32,                     // max degree
    efConstruction: Int = 64,
    efSearch: Int = 64,
    alphas: Seq[Double] = Seq(1.0, 1.2),
    metric: String = "l2")

final class VamanaGraph(
    val ids: Array[Long],
    val vecs: Array[Array[Float]],
    val adj: Array[Array[Int]],
    val medoid: Int,
    val cfg: VamanaConfig) extends Serializable {

  private def dist(a: Array[Float], b: Array[Float]): Double = cfg.metric match {
    case "l2"      => K.l2(a, b)
    case "negdot"  => K.negdot(a, b)
    case "cosdist" => K.cosdist(a, b)
  }

  /**
   * Greedy beam search (reference search.rs:34-140): best-first expansion
   * from the medoid with an ef-bounded result set; terminates when the
   * closest unexpanded candidate is worse than the ef-th result.
   */
  def search(q: Array[Float], k: Int, ef: Int = -1): Array[(Long, Double)] = {
    val efUse = math.max(if (ef <= 0) cfg.efSearch else ef, k)
    if (ids.isEmpty) return Array.empty
    val visited = new java.util.HashSet[Integer]()
    // candidates: min-heap by (dist, idx); results: max-heap bounded to ef
    val candOrd = Ordering.by[(Double, Int), (Double, Int)](identity).reverse
    val cand = new scala.collection.mutable.PriorityQueue[(Double, Int)]()(candOrd)
    val resOrd = Ordering.by[(Double, Int), (Double, Int)](identity)
    val res = new scala.collection.mutable.PriorityQueue[(Double, Int)]()(resOrd)
    val d0 = dist(vecs(medoid), q)
    cand.enqueue((d0, medoid)); res.enqueue((d0, medoid)); visited.add(medoid)
    while (cand.nonEmpty) {
      val (dc, c) = cand.dequeue()
      if (res.size >= efUse && dc > res.head._1) {
        cand.clear() // early termination (peek_ef_th < dis_c)
      } else {
        adj(c).foreach { n =>
          if (!visited.contains(n)) {
            visited.add(n)
            val dn = dist(vecs(n), q)
            if (res.size < efUse || dn < res.head._1 ||
                (dn == res.head._1 && ids(n) < ids(res.head._2))) {
              cand.enqueue((dn, n))
              res.enqueue((dn, n))
              if (res.size > efUse) res.dequeue()
            }
          }
        }
      }
    }
    res.dequeueAll.reverse.toArray
      .map { case (d, i) => (d, ids(i), i) }
      .sortBy(t => (t._1, t._2))
      .take(k)
      .map(t => (t._2, t._1))
  }

  /** Batch search: queries fan out across executors, graph broadcast.
    * Output: (qid, id, dist, rn). */
  def searchBatch(spark: SparkSession, queries: Array[(Long, Array[Float])],
                  k: Int, ef: Int = -1): DataFrame = {
    import spark.implicits._
    if (queries.isEmpty)
      return Seq.empty[(Long, Long, Double, Long)].toDF("qid", "id", "dist", "rn")
    val bg = spark.sparkContext.broadcast(this)
    spark.sparkContext.parallelize(queries.toSeq, math.min(queries.length, 32))
      .flatMap { case (qid, q) =>
        bg.value.search(q, k, ef).zipWithIndex.map { case ((id, d), i) =>
          (qid, id, d, (i + 1).toLong)
        }
      }
      .toDF("qid", "id", "dist", "rn")
  }

  def degreeStats: (Int, Double) = {
    val degs = adj.map(_.length)
    (degs.max, degs.sum.toDouble / degs.length)
  }

  def save(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    ids.indices.map(i => (ids(i), vecs(i).toSeq, adj(i).map(ids).toSeq))
      .toDF("id", "vec", "neighbors")
      .write.mode("overwrite").parquet(s"$dir/graph")
    Seq((cfg.m, cfg.efConstruction, cfg.efSearch, cfg.alphas.mkString(","), cfg.metric, ids(medoid)))
      .toDF("m", "ef_construction", "ef_search", "alphas", "metric", "medoid_id")
      .write.mode("overwrite").parquet(s"$dir/config")
  }
}

object VamanaGraph {

  /** Build from a DataFrame — collects vectors (moderate-scale index; see
    * class doc) and runs the deterministic batch Vamana construction. */
  def build(df: DataFrame, idCol: String, vecCol: String,
            cfg: VamanaConfig = VamanaConfig()): VamanaGraph = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    build(rows.map(_._1), rows.map(_._2.toArray), cfg)
  }

  def build(ids0: Array[Long], vecs0: Array[Array[Float]], cfg: VamanaConfig): VamanaGraph = {
    require(ids0.nonEmpty, "empty graph build")
    // canonical ascending-id order (search uses binarySearch on ids)
    val order = ids0.indices.sortBy(ids0)
    val ids = order.map(ids0).toArray
    val vecs = order.map(vecs0).toArray
    val n = ids.length
    def dist(a: Int, b: Int): Double = cfg.metric match {
      case "l2"      => K.l2(vecs(a), vecs(b))
      case "negdot"  => K.negdot(vecs(a), vecs(b))
      case "cosdist" => K.cosdist(vecs(a), vecs(b))
    }
    // deterministic medoid: point nearest the mean
    val dim = vecs(0).length
    val mean = {
      val s = new Array[Double](dim)
      vecs.foreach { v => var j = 0; while (j < dim) { s(j) += v(j); j += 1 } }
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) { out(j) = (s(j) / n).toFloat; j += 1 }
      out
    }
    val medoid = vecs.indices.minBy(i => (K.l2s(vecs(i), mean), i))
    val adj = Array.fill(n)(scala.collection.mutable.ArrayBuffer[Int]())

    /** Robust prune (reference prune.rs:19-72): ascending alpha passes;
      * a candidate survives if no already-kept neighbor dominates it:
      * alpha * d(kept, cand) < d(point, cand). */
    def robustPrune(p: Int, candidates: Seq[Int]): Array[Int] = {
      val pool = candidates.distinct.filter(_ != p)
        .map(c => (dist(p, c), c)).sortBy(identity)
      val kept = scala.collection.mutable.ArrayBuffer[(Double, Int)]()
      val remaining = scala.collection.mutable.ArrayBuffer(pool: _*)
      for (alpha <- cfg.alphas if kept.length < cfg.m) {
        var i = 0
        while (i < remaining.length && kept.length < cfg.m) {
          val (dc, c) = remaining(i)
          val dominated = kept.exists { case (_, kIdx) => alpha * dist(kIdx, c) < dc }
          if (!dominated) {
            kept += ((dc, c))
            remaining.remove(i)
          } else i += 1
        }
      }
      kept.map(_._2).toArray
    }

    // live adjacency view shared with the searcher — updated in place as
    // edges change (insertion pass, reference insert.rs: search with
    // ef_construction, prune, link bidirectionally with overflow re-prune)
    val adjView: Array[Array[Int]] = Array.fill(n)(Array.empty[Int])
    val searcher = new VamanaGraph(ids, vecs, adjView, medoid, cfg)
    def searchIdx(q: Array[Float], ef: Int): Seq[Int] =
      searcher.search(q, ef, ef).map { case (id, _) =>
        java.util.Arrays.binarySearch(ids, id)
      }.filter(_ >= 0).toSeq
    // Deterministic parallel insertion in doubling batches: every batch
    // searches against the adjacency frozen at batch start (driver cores in
    // parallel — the batch analogue of the reference's parallel build
    // workers, am/am_build.rs:611-1080), then links sequentially in fixed
    // index order. Batch size never exceeds the built prefix, so insert
    // quality tracks the sequential build; results are order-independent
    // of thread scheduling.
    val pending = (0 until n).filter(_ != medoid).toArray
    var start = 0
    var built = 1
    while (start < pending.length) {
      val batch = math.min(built, pending.length - start)
      val idxs = java.util.Arrays.copyOfRange(pending, start, start + batch)
      val found = new Array[Seq[Int]](batch)
      java.util.stream.IntStream.range(0, batch).parallel().forEach { bi =>
        found(bi) = searchIdx(vecs(idxs(bi)), cfg.efConstruction)
      }
      // backlink slack: let a neighbor list grow to 1.5m before re-pruning
      // (re-prune is the expensive O(cap^2) step; amortizing it is the
      // standard DiskANN batch-build move). A final pass restores the hard
      // degree cap m.
      val cap = cfg.m + cfg.m / 2
      var bi = 0
      while (bi < batch) {
        val i = idxs(bi)
        val newNbrs = robustPrune(i, found(bi))
        adj(i).clear()
        adj(i) ++= newNbrs
        adjView(i) = newNbrs
        newNbrs.foreach { nb =>
          if (!adj(nb).contains(i)) {
            adj(nb) += i
            if (adj(nb).length > cap) {
              val pruned = robustPrune(nb, adj(nb).toSeq)
              adj(nb).clear()
              adj(nb) ++= pruned
            }
            adjView(nb) = adj(nb).toArray
          }
        }
        bi += 1
      }
      start += batch
      built += batch
    }
    // restore the degree-cap invariant (m) everywhere
    var v = 0
    while (v < n) {
      if (adj(v).length > cfg.m) {
        val pruned = robustPrune(v, adj(v).toSeq)
        adj(v).clear()
        adj(v) ++= pruned
      }
      v += 1
    }
    new VamanaGraph(ids, vecs, adj.map(_.toArray), medoid, cfg)
  }

  def load(spark: SparkSession, dir: String): VamanaGraph = {
    import spark.implicits._
    val (m, efc, efs, alphas, metric, medoidId) =
      spark.read.parquet(s"$dir/config")
        .as[(Int, Int, Int, String, String, Long)].head()
    val rows = spark.read.parquet(s"$dir/graph")
      .as[(Long, Seq[Float], Seq[Long])].collect().sortBy(_._1)
    val ids = rows.map(_._1)
    val idToIdx = ids.zipWithIndex.toMap
    val vecs = rows.map(_._2.toArray)
    val adj = rows.map(_._3.flatMap(idToIdx.get).toArray)
    new VamanaGraph(ids, vecs, adj, idToIdx(medoidId),
      VamanaConfig(m, efc, efs, alphas.split(",").map(_.toDouble).toSeq, metric))
  }

  /** Vacuum (reference G4): drop vertices and rebuild — relinking through
    * dead nodes is a rebuild in the batch engine. */
  def deleteAndRebuild(g: VamanaGraph, dead: Set[Long]): VamanaGraph = {
    val keep = g.ids.indices.filter(i => !dead.contains(g.ids(i)))
    build(keep.map(g.ids).toArray, keep.map(g.vecs).toArray, g.cfg)
  }
}
