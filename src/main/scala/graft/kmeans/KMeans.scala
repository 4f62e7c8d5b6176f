package graft.kmeans

import graft.core.{VectorKernels => K}

/**
 * Lloyd k-means over a driver-resident sample.
 *
 * Mirrors the reference's build-time clustering shape (reference:
 * crates/k_means/src/lib.rs:56-72 Lloyd loop; sampling cap = lists x
 * sampling_factor per am/am_build.rs:1306-1348): the sample size is
 * BOUNDED by the index config, independent of table size, which is what
 * makes driver-side clustering legitimate at 100 TB — the full-data pass
 * is only the (distributed) assignment step.
 *
 * Deterministic: fixed-seed k-means++ initialization, sequential
 * double-precision accumulation — same inputs, same centroids, always.
 */
object KMeans {

  /** k-means++ init with a FIXED-seed splitmix64 stream: D^2-weighted
    * seeding (standard k-means++ quality — evenly-spaced init over a
    * randomly-ordered sample is just a uniform draw, which lands multiple
    * seeds in dense regions and leaves sparse regions uncovered, i.e.
    * skewed cells and probe-budget recall misses). One pass per added
    * centroid: total cost equals ONE Lloyd assignment iteration. */
  private def kppInit(pts: Array[Array[Float]], kk: Int): Array[Array[Float]] = {
    val n = pts.length
    var state = 0x9E3779B97F4A7C15L
    def nextLong(): Long = {
      state += 0x9E3779B97F4A7C15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
    val cents = new Array[Array[Float]](kk)
    cents(0) = pts(((nextLong() >>> 1) % n).toInt).clone()
    val d2 = Array.fill(n)(Double.PositiveInfinity)
    var added = 1
    while (added < kk) {
      val last = cents(added - 1)
      var sum = 0.0
      var i = 0
      while (i < n) {
        val d = K.l2s(pts(i), last)
        if (d < d2(i)) d2(i) = d
        sum += d2(i)
        i += 1
      }
      if (sum == 0) cents(added) = pts(((nextLong() >>> 1) % n).toInt).clone()
      else {
        var r = nextDouble() * sum
        var j = 0
        while (j < n - 1 && r > d2(j)) { r -= d2(j); j += 1 }
        cents(added) = pts(j).clone()
      }
      added += 1
    }
    cents
  }

  /** Returns `k` centroids (may return fewer if sample has fewer points). */
  def lloyd(sample: Array[Array[Float]], k: Int, iters: Int = 10,
            spherical: Boolean = false): Array[Array[Float]] = {
    require(sample.nonEmpty, "empty k-means sample")
    val n = sample.length
    val dim = sample(0).length
    val kk = math.min(k, n)
    val pts = if (spherical) sample.map(K.normalize) else sample
    var centroids = kppInit(pts, kk)
    var it = 0
    while (it < iters) {
      // parallel assignment over FIXED 1024-point chunks; per-chunk
      // partial sums merge in chunk order, so results are independent of
      // core count and thread scheduling (the driver-core analogue of the
      // reference's rayon assignment pool, crates/k_means/src/lib.rs)
      val chunkSize = 1024
      val nChunks = (n + chunkSize - 1) / chunkSize
      val partial = new Array[(Array[Array[Double]], Array[Long])](nChunks)
      val cents = centroids
      java.util.stream.IntStream.range(0, nChunks).parallel().forEach { ci =>
        val sums = Array.fill(kk)(new Array[Double](dim))
        val counts = new Array[Long](kk)
        var i = ci * chunkSize
        val end = math.min(i + chunkSize, n)
        while (i < end) {
          val c = nearest(pts(i), cents)
          val s = sums(c)
          val p = pts(i)
          var j = 0
          while (j < dim) { s(j) += p(j); j += 1 }
          counts(c) += 1
          i += 1
        }
        partial(ci) = (sums, counts)
      }
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      var ci = 0
      while (ci < nChunks) {
        val (ps, pc) = partial(ci)
        var c = 0
        while (c < kk) {
          val s = sums(c); val p = ps(c)
          var j = 0
          while (j < dim) { s(j) += p(j); j += 1 }
          counts(c) += pc(c)
          c += 1
        }
        ci += 1
      }
      centroids = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centroids(c) // keep empty cluster's centroid
        else {
          val out = new Array[Float](dim)
          var j = 0
          while (j < dim) { out(j) = (sums(c)(j) / counts(c)).toFloat; j += 1 }
          if (spherical) K.normalize(out) else out
        }
      }
      it += 1
    }
    centroids
  }

  /**
   * Hierarchical (bisecting) k-means — the reference's huge-`lists`
   * algorithm (reference: crates/k_means/src/hierarchical.rs, selected by
   * `build.internal.kmeans_algorithm = "hierarchical"`): repeatedly
   * 2-means-split the largest cluster until `k` clusters exist. Each
   * split only touches that cluster's points, so cost is
   * O(n · log k · iters) instead of O(n · k · iters) — the "100M rows in
   * 20 minutes" build path. Deterministic (largest-cluster ties by
   * lowest index; splits seeded from extreme points).
   */
  def hierarchical(sample: Array[Array[Float]], k: Int, iters: Int = 10,
                   spherical: Boolean = false): Array[Array[Float]] = {
    require(sample.nonEmpty, "empty k-means sample")
    val pts = if (spherical) sample.map(K.normalize) else sample
    val kk = math.min(k, pts.length)
    // clusters as index lists
    var clusters = Vector(pts.indices.toArray)
    while (clusters.length < kk) {
      val bi = clusters.indices.maxBy(i => (clusters(i).length, -i))
      val members = clusters(bi)
      if (members.length < 2) return clusters.map(m => mean(pts, m, spherical)).toArray
      val sub = members.map(pts)
      // deterministic 2-means seeded with the two most separated members
      // relative to the first point
      val d0 = sub.map(p => K.l2s(p, sub(0)))
      val far = d0.indices.maxBy(i => (d0(i), -i))
      val seeds = Array(sub(0).clone(), sub(far).clone())
      var cents = seeds
      var it = 0
      while (it < iters) {
        val assign = sub.map(nearest(_, cents))
        cents = Array.tabulate(2) { c =>
          val idx = assign.indices.filter(assign(_) == c)
          if (idx.isEmpty) cents(c)
          else mean(sub, idx.toArray, spherical)
        }
        it += 1
      }
      val assign = sub.map(nearest(_, cents))
      val left = members.indices.filter(i => assign(i) == 0).map(members).toArray
      val right = members.indices.filter(i => assign(i) == 1).map(members).toArray
      clusters =
        if (left.isEmpty || right.isEmpty)
          clusters // degenerate split; stop growing this cluster
            .updated(bi, members)
        else clusters.updated(bi, left) :+ right
      if (left.isEmpty || right.isEmpty)
        return clusters.map(m => mean(pts, m, spherical)).toArray
    }
    clusters.map(m => mean(pts, m, spherical)).toArray
  }

  private def mean(pts: Array[Array[Float]], idx: Array[Int], spherical: Boolean): Array[Float] = {
    val dim = pts(0).length
    val s = new Array[Double](dim)
    idx.foreach { i =>
      val p = pts(i)
      var j = 0
      while (j < dim) { s(j) += p(j); j += 1 }
    }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) { out(j) = (s(j) / idx.length).toFloat; j += 1 }
    if (spherical) K.normalize(out) else out
  }

  /**
   * Dimensionality-reduced clustering (reference B4,
   * am/am_build.rs:1280-1291,1437-1551): cluster in a rotated+truncated
   * space, then recompute full-dim centroids as means of the full-dim
   * points assigned in reduced space.
   */
  def reducedDim(sample: Array[Array[Float]], k: Int, reducedDim: Int, iters: Int,
                 hierarchicalAlgo: Boolean, spherical: Boolean): Array[Array[Float]] = {
    val dim = sample(0).length
    require(reducedDim >= 1, "reducedDim must be >= 1")
    if (reducedDim >= dim)
      return if (hierarchicalAlgo) hierarchical(sample, k, iters, spherical)
             else lloyd(sample, k, iters, spherical)
    val rot = new graft.core.Rotation(dim)
    val reduced = sample.map(v => java.util.Arrays.copyOf(rot(v), reducedDim))
    val rCents =
      if (hierarchicalAlgo) hierarchical(reduced, k, iters, spherical = false)
      else lloyd(reduced, k, iters, spherical = false)
    val assign = reduced.map(nearest(_, rCents))
    val pts = if (spherical) sample.map(K.normalize) else sample
    Array.tabulate(rCents.length) { c =>
      val idx = assign.indices.filter(assign(_) == c).toArray
      if (idx.isEmpty) {
        // keep a full-dim placeholder for empty cells: nearest sample to
        // the reduced centroid
        val ni = reduced.indices.minBy(i => K.l2s(reduced(i), rCents(c)))
        pts(ni).clone()
      } else mean(pts, idx, spherical)
    }
  }

  /** Index of the nearest centroid by squared L2 (ties: lowest index). */
  def nearest(v: Array[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val d = K.l2s(v, centroids(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** [[nearest]] restricted to a candidate index set (tree-descent
    * assignment: score only one parent's children, not every centroid).
    * Ties: lowest candidate-array position. */
  def nearestAmong(v: Array[Float], centroids: Array[Array[Float]],
                   candidates: Array[Int]): Int = {
    require(candidates.nonEmpty, "nearestAmong needs at least one candidate")
    var best = candidates(0)
    var bestD = Double.PositiveInfinity
    var i = 0
    while (i < candidates.length) {
      val c = candidates(i)
      val d = K.l2s(v, centroids(c))
      if (d < bestD) { bestD = d; best = c }
      i += 1
    }
    best
  }
}
