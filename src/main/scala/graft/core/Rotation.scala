package graft.core

import java.util.SplittableRandom

/**
 * Deterministic pseudo-random orthonormal rotation built from rounds of
 * sign-flips + fast Walsh–Hadamard transforms (FHT).
 *
 * Same role as the reference's `RandomProject` (reference:
 * crates/rabitq/src/rotate.rs:54-98 — 4 rounds of flip + FHT + Kac's walk
 * driven by a fixed compile-time random bit table). The exact bit table is
 * an arbitrary fixed seed; what matters is that index build and query use
 * the SAME rotation and that it is orthonormal (norm-preserving,
 * invertible). We derive flip signs from a SplittableRandom with a fixed
 * seed, which both sides share.
 *
 * Vectors whose dim is not a power of two are zero-padded up to the next
 * power of two before the transform; `apply` returns the padded length
 * (rotation mixes the padding), and `inverse` recovers the original by
 * truncating after the inverse transform.
 */
final class Rotation(val dim: Int, seed: Long = 0x56435250L /* "VCRP" */) extends Serializable {
  require(dim >= 1, s"dim must be >= 1, got $dim")

  val paddedDim: Int = Integer.highestOneBit(math.max(1, dim - 1)) * 2 match {
    case p if p >= dim => p
    case _             => dim // dim == 1
  }

  private val rounds = 4
  // rounds × paddedDim sign flips, deterministic in (seed, dim).
  private val signs: Array[Array[Float]] = {
    val rng = new SplittableRandom(seed + dim.toLong * 0x9E3779B97F4A7C15L)
    Array.fill(rounds)(Array.fill(paddedDim)(if (rng.nextBoolean()) 1.0f else -1.0f))
  }
  private val invSqrtN: Float = (1.0 / math.sqrt(paddedDim.toDouble)).toFloat

  /** In-place unnormalized FHT; self-inverse up to a factor of n. */
  private def fht(v: Array[Float]): Unit = {
    var h = 1
    val n = v.length
    while (h < n) {
      var i = 0
      while (i < n) {
        var j = i
        val end = i + h
        while (j < end) {
          val x = v(j); val y = v(j + h)
          v(j) = x + y; v(j + h) = x - y
          j += 1
        }
        i += 2 * h
      }
      h *= 2
    }
  }

  /** Rotate `v` (length == dim); returns a new array of length paddedDim. */
  def apply(v: Array[Float]): Array[Float] = {
    require(v.length == dim, s"expected dim $dim, got ${v.length}")
    val out = java.util.Arrays.copyOf(v, paddedDim)
    var r = 0
    while (r < rounds) {
      val s = signs(r)
      var i = 0
      while (i < paddedDim) { out(i) *= s(i); i += 1 }
      fht(out)
      // normalize so each round is orthonormal
      i = 0
      while (i < paddedDim) { out(i) *= invSqrtN; i += 1 }
      r += 1
    }
    out
  }

  /** Inverse rotation; input length paddedDim, output truncated to dim. */
  def inverse(v: Array[Float]): Array[Float] = {
    require(v.length == paddedDim, s"expected padded dim $paddedDim, got ${v.length}")
    val out = v.clone()
    var r = rounds - 1
    while (r >= 0) {
      fht(out)
      var i = 0
      while (i < paddedDim) { out(i) *= invSqrtN; i += 1 }
      val s = signs(r)
      i = 0
      while (i < paddedDim) { out(i) *= s(i); i += 1 }
      r -= 1
    }
    java.util.Arrays.copyOf(out, dim)
  }
}
