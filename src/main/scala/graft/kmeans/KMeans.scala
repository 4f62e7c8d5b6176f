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
 * Deterministic: evenly-spaced initialization, sequential double-precision
 * accumulation, no RNG.
 */
object KMeans {

  /** Returns `k` centroids (may return fewer if sample has fewer points). */
  def lloyd(sample: Array[Array[Float]], k: Int, iters: Int = 10,
            spherical: Boolean = false): Array[Array[Float]] = {
    require(sample.nonEmpty, "empty k-means sample")
    val n = sample.length
    val dim = sample(0).length
    val kk = math.min(k, n)
    val pts = if (spherical) sample.map(K.normalize) else sample
    // evenly spaced init over the sample (deterministic)
    var centroids = Array.tabulate(kk)(i => pts((i.toLong * n / kk).toInt).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      var i = 0
      while (i < n) {
        val c = nearest(pts(i), centroids)
        val s = sums(c)
        val p = pts(i)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        counts(c) += 1
        i += 1
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
}
