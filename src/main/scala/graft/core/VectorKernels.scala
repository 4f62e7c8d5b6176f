package graft.core

/**
 * Dense-vector math kernels.
 *
 * Two precision tiers, on purpose:
 *
 *  - `f32` kernels mirror the reference engine's single-precision SIMD
 *    reductions (reference: crates/simd/src/floating_f32.rs
 *    `reduce_sum_of_xy/d2/x2`; crates/vector/src/vect.rs:128-161 operator
 *    semantics). Used inside index internals (quantization, estimation)
 *    where parity with the reference's storage precision matters.
 *
 *  - `f64` kernels back every user-visible distance function. They widen
 *    each element to double before accumulating, so results agree with any
 *    double-precision SQL oracle (DuckDB, Postgres) to ~1e-13 relative —
 *    which makes rounded outputs deterministically comparable across
 *    engines.
 *
 * Plain while-loops over primitive arrays: HotSpot auto-vectorizes these
 * (the JVM answer to the reference's hand-dispatched AVX kernels).
 *
 * Distance semantics replicated exactly (reference:
 * src/index/vchordrq/opclass.rs:244-262, crates/vector/src/vect.rs:128-143):
 *   l2        = sqrt(sum (x-y)^2)         -- operator `<->`
 *   negdot    = -sum x*y                  -- operator `<#>`
 *   cosdist   = 1 - dot/(|x||y|)          -- operator `<=>`
 *   maxsim    = sum_q min_d negdot(d, q)  -- operator `@#`
 */
object VectorKernels {

  @inline def requireSameDim(a: Array[Float], b: Array[Float]): Unit =
    require(a.length == b.length, s"vector dim mismatch: ${a.length} vs ${b.length}")

  // ---------------------------------------------------------------- f32 tier

  /** Squared L2 distance in single precision (reference `reduce_sum_of_d2`). */
  def l2sF32(a: Array[Float], b: Array[Float]): Float = {
    requireSameDim(a, b)
    var s = 0.0f; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Dot product in single precision (reference `reduce_sum_of_xy`). */
  def dotF32(a: Array[Float], b: Array[Float]): Float = {
    requireSameDim(a, b)
    var s = 0.0f; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Sum of squares in single precision (reference `reduce_sum_of_x2`). */
  def normSqF32(a: Array[Float]): Float = {
    var s = 0.0f; var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    s
  }

  // ---------------------------------------------------------------- f64 tier

  def l2s(a: Array[Float], b: Array[Float]): Double = {
    requireSameDim(a, b)
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  /** Euclidean distance `<->`. */
  def l2(a: Array[Float], b: Array[Float]): Double = math.sqrt(l2s(a, b))

  def dot(a: Array[Float], b: Array[Float]): Double = {
    requireSameDim(a, b)
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Negative inner product `<#>`. */
  def negdot(a: Array[Float], b: Array[Float]): Double = -dot(a, b)

  def normSq(a: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = math.sqrt(normSq(a))

  /**
   * Cosine distance `<=>` = 1 - cos(x, y). Zero-norm input yields distance
   * 1.0 (cos treated as 0) — NaN-free, matching total-order expectations.
   */
  def cosdist(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a); val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 1.0
    else 1.0 - dot(a, b) / (na * nb)
  }

  /** Unit-normalize; zero vector returned unchanged (reference `function_normalize`). */
  def normalize(a: Array[Float]): Array[Float] = {
    val n = norm(a)
    if (n == 0.0) a.clone()
    else {
      val out = new Array[Float](a.length)
      var i = 0
      while (i < a.length) { out(i) = (a(i) / n).toFloat; i += 1 }
      out
    }
  }

  /**
   * MaxSim `@#`: for each query token vector, the minimum negative dot
   * against any document token vector, summed over query tokens. Ascending
   * order = most similar first (reference:
   * src/datatype/operators_rabitq8.rs:123-139).
   */
  def maxsim(doc: Array[Array[Float]], query: Array[Array[Float]]): Double = {
    var total = 0.0
    var qi = 0
    while (qi < query.length) {
      val q = query(qi)
      var best = Double.PositiveInfinity
      var di = 0
      while (di < doc.length) {
        val nd = negdot(doc(di), q)
        if (nd < best) best = nd
        di += 1
      }
      if (best != Double.PositiveInfinity) total += best
      qi += 1
    }
    total
  }
}
