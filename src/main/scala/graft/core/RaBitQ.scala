package graft.core

/**
 * Scalar byte/nibble vector quantization codecs ("rabitq8" / "rabitq4"
 * column types).
 *
 * Same surface and metadata schema as the reference's quantized column
 * types (reference: crates/rabitq/src/byte.rs:18-83 for the 8-bit codec,
 * crates/rabitq/src/halfbyte.rs:18-92 for the nibble-packed 4-bit codec;
 * metadata quadruple per src/datatype/memory_rabitq8.rs). The concrete
 * lattice math here is our own: symmetric round-to-nearest with a
 * norm-preserving dequantization scale
 *
 *     scale = sqrt(dis_u_2) / norm_of_lattice
 *     x_hat_i = (code_i - bias) * scale
 *
 * which is exactly the reference's published dequantize formula
 * (reference: src/index/vchordrq/build.rs:48-74), so dequantized vectors
 * have the same norm as the original regardless of the code lattice.
 *
 * Metadata quadruple (f32, in this order, mirroring the reference type):
 *   dis_u_2          |x|^2
 *   norm_of_lattice  |code - bias|_2 (L2 norm of the integer lattice point)
 *   sum_of_code      sum of stored unsigned codes
 *   sum_of_abs_x     sum |x_i|
 */
object RaBitQ {

  /** A quantized vector: 4 f32 metadata + packed codes. */
  final case class Code(meta: Array[Float], codes: Array[Byte], bits: Int, dim: Int) {
    def disU2: Float = meta(0)
    def normOfLattice: Float = meta(1)
    def sumOfCode: Float = meta(2)
    def sumOfAbsX: Float = meta(3)
    /** Dequantization scale; 0 for the zero vector. */
    def scale: Double =
      if (meta(1) == 0.0f) 0.0 else math.sqrt(meta(0).toDouble) / meta(1).toDouble
  }

  val Bias8 = 127 // codes in [-127,127] stored as u8 in [0,254]
  val Bias4 = 7   // codes in [-7,7] stored as nibbles in [0,14]
  val Bias2 = 1   // codes in [-1,1] stored as 2-bit fields in [0,2] — the
                  // graph-vertex tier (reference vchordg stores bits=1|2
                  // vertex codes, crates/vchordg/src/types.rs:25-45)
  val Bias1 = 1   // SIGN lattice {-1,+1} stored one bit per component
                  // (bit = sign >= 0); the unsigned value is bit*2 in
                  // {0,2}, so the uniform `u - bias` algebra of every
                  // estimator below holds unchanged with bias 1 — the
                  // reference's most-compressed vertex tier (bits=1,
                  // crates/vchordg/src/types.rs:26-27), 8 components/byte

  private def bias(bits: Int): Int =
    if (bits == 8) Bias8 else if (bits == 4) Bias4 else if (bits == 2) Bias2 else Bias1

  /** Quantize to `bits` in {1, 2, 4, 8}. */
  def quantize(x: Array[Float], bits: Int): Code = {
    require(bits == 1 || bits == 2 || bits == 4 || bits == 8,
      s"bits must be 1, 2, 4 or 8, got $bits")
    val b = bias(bits)
    val dim = x.length
    var m = 0.0f
    var i = 0
    while (i < dim) { val a = math.abs(x(i)); if (a > m) m = a; i += 1 }
    val lattice = new Array[Int](dim)
    var latticeSq = 0.0
    var sumCode = 0.0
    var sumAbs = 0.0
    i = 0
    while (i < dim) {
      val c =
        if (bits == 1) { if (x(i) >= 0.0f) 1 else -1 } // sign lattice, never 0
        else if (m == 0.0f) 0
        else math.round(x(i) / m * b) // in [-b, b]
      lattice(i) = c
      latticeSq += c.toDouble * c.toDouble
      sumCode += (c + b).toDouble
      sumAbs += math.abs(x(i)).toDouble
      i += 1
    }
    val meta = Array(
      VectorKernels.normSqF32(x),
      math.sqrt(latticeSq).toFloat,
      sumCode.toFloat,
      sumAbs.toFloat)
    val codes =
      if (bits == 8) {
        val out = new Array[Byte](dim)
        i = 0
        while (i < dim) { out(i) = (lattice(i) + b).toByte; i += 1 }
        out
      } else if (bits == 4) {
        // two nibbles per byte, low nibble first
        val out = new Array[Byte]((dim + 1) / 2)
        i = 0
        while (i < dim) {
          val u = lattice(i) + b
          val j = i / 2
          if ((i & 1) == 0) out(j) = u.toByte
          else out(j) = (out(j) | (u << 4)).toByte
          i += 1
        }
        out
      } else if (bits == 2) {
        // four 2-bit fields per byte, lowest bits first
        val out = new Array[Byte]((dim + 3) / 4)
        i = 0
        while (i < dim) {
          val u = lattice(i) + b
          out(i / 4) = (out(i / 4) | (u << ((i & 3) * 2))).toByte
          i += 1
        }
        out
      } else {
        // one sign bit per component, lowest bit first (u = bit * 2)
        val out = new Array[Byte]((dim + 7) / 8)
        i = 0
        while (i < dim) {
          if (lattice(i) > 0) out(i / 8) = (out(i / 8) | (1 << (i & 7))).toByte
          i += 1
        }
        out
      }
    Code(meta, codes, bits, dim)
  }

  /** Unsigned code value at position i (any supported width). */
  @inline private def codeAt(codes: Array[Byte], bits: Int, i: Int): Int =
    if (bits == 8) codes(i) & 0xff
    else if (bits == 4) { val b = codes(i / 2) & 0xff; if ((i & 1) == 0) b & 0x0f else (b >> 4) & 0x0f }
    else if (bits == 2) (codes(i / 4) >> ((i & 3) * 2)) & 0x03
    else ((codes(i / 8) >> (i & 7)) & 0x01) << 1

  /** Unpack stored codes to unsigned ints in [0, 2*bias]. */
  def unpack(c: Code): Array[Int] = {
    val out = new Array[Int](c.dim)
    var i = 0
    while (i < c.dim) { out(i) = codeAt(c.codes, c.bits, i); i += 1 }
    out
  }

  /** Dequantize back to an approximate float vector. */
  def dequantize(c: Code): Array[Float] = {
    val u = unpack(c)
    val b = bias(c.bits)
    val s = c.scale
    val out = new Array[Float](c.dim)
    var i = 0
    while (i < c.dim) { out(i) = ((u(i) - b) * s).toFloat; i += 1 }
    out
  }

  /**
   * Estimated dot(query, x) straight from codes — the hot search kernel
   * (role of the reference's LUT `fast_scan`, crates/simd/src/fast_scan.rs):
   *   dot ~= scale * (sum_i u_i * q_i - bias * sum_i q_i)
   * `qSum` must be sum(q). Integer-times-float inner loop; no decode.
   */
  def estimateDot(c: Code, q: Array[Float], qSum: Double): Double = {
    require(q.length == c.dim, s"dim mismatch ${q.length} vs ${c.dim}")
    val b = bias(c.bits)
    var acc = 0.0
    if (c.bits == 8) {
      var i = 0
      while (i < c.dim) { acc += (c.codes(i) & 0xff) * q(i); i += 1 }
    } else {
      var i = 0
      while (i < c.dim) { acc += codeAt(c.codes, c.bits, i) * q(i); i += 1 }
    }
    c.scale * (acc - b * qSum)
  }

  /** Unpack stored codes into a caller-provided float scratch — amortizes
    * the byte-unpack over many queries in batch scans. Unsigned code
    * values are exactly representable in f32, so a subsequent
    * `us(i) * q(i)` accumulation is bit-identical to [[estimateDot]]'s
    * `(codes(i) & 0xff) * q(i)`. */
  def unpackTo(codes: Array[Byte], bits: Int, dim: Int, out: Array[Float]): Unit = {
    if (bits == 8) {
      var i = 0
      while (i < dim) { out(i) = (codes(i) & 0xff).toFloat; i += 1 }
    } else {
      var i = 0
      while (i < dim) { out(i) = codeAt(codes, bits, i).toFloat; i += 1 }
    }
  }

  /** Dequantization scale from the metadata pair (see [[Code.scale]]). */
  @inline def scaleOf(disU2: Float, normOfLattice: Float): Double =
    if (normOfLattice == 0.0f) 0.0 else math.sqrt(disU2.toDouble) / normOfLattice.toDouble

  /** [[estimateDot]] over pre-unpacked codes — same accumulation order and
    * types, so results are bit-identical. */
  def estimateDotUnpacked(us: Array[Float], dim: Int, scale: Double, bias: Int,
                          q: Array[Float], qSum: Double): Double = {
    var acc = 0.0
    var i = 0
    while (i < dim) { acc += us(i) * q(i); i += 1 }
    scale * (acc - bias * qSum)
  }

  def biasOf(bits: Int): Int = bias(bits)

  // ---- code-vs-code distance operators (reference:
  // src/datatype/operators_rabitq8.rs:21-49 / operators_rabitq4.rs:21-49,
  // math in crates/rabitq/src/extended.rs:155-205 half_process_{l2s,dot,cos}):
  // both sides stay quantized — the integer lattice dot plus the stored
  // metadata reconstruct the distance between the dequantized points, no
  // float decode. Formulas use OUR lattice (bias b = 127/7, see header):
  //   ip    = sum_i(ua_i*ub_i) - b*(sum_ua + sum_ub) + dim*b^2
  //   dot   = scale_a * scale_b * ip
  //   l2s   = disU2_a + disU2_b - 2*dot   (|x_hat|^2 == disU2 exactly,
  //                                        norm-preserving scale)
  //   cos   = dot / sqrt(disU2_a * disU2_b)
  // ----

  /** Integer lattice dot: sum of products of the unsigned code values. */
  private def codeDotInt(a: Code, b: Code): Double = {
    require(a.dim == b.dim, s"dim mismatch ${a.dim} vs ${b.dim}")
    require(a.bits == b.bits, s"bits mismatch ${a.bits} vs ${b.bits}")
    var acc = 0L
    if (a.bits == 8) {
      var i = 0
      while (i < a.dim) { acc += (a.codes(i) & 0xff).toLong * (b.codes(i) & 0xff); i += 1 }
    } else {
      var i = 0
      while (i < a.dim) {
        acc += codeAt(a.codes, a.bits, i).toLong * codeAt(b.codes, b.bits, i)
        i += 1
      }
    }
    acc.toDouble
  }

  /** Estimated dot(x, y) between the two original vectors, from codes only. */
  def dotQQ(a: Code, b: Code): Double = {
    val bi = bias(a.bits)
    val ip = codeDotInt(a, b) -
      bi.toDouble * (a.sumOfCode.toDouble + b.sumOfCode.toDouble) +
      a.dim.toDouble * bi.toDouble * bi.toDouble
    a.scale * b.scale * ip
  }

  /** Estimated L2 distance (reference `operator_l2s(...).sqrt()`). */
  def l2QQ(a: Code, b: Code): Double =
    math.sqrt(math.max(a.disU2.toDouble + b.disU2.toDouble - 2.0 * dotQQ(a, b), 0.0))

  /** Estimated `<#>` negative dot (the reference ip operator's sign). */
  def negdotQQ(a: Code, b: Code): Double = -dotQQ(a, b)

  /** Estimated `<=>` cosine distance 1 - cos; zero-norm input yields 1.0
    * (the engine-wide NaN-free convention, see VectorKernels.cosdist). */
  def cosdistQQ(a: Code, b: Code): Double = {
    val na = a.disU2.toDouble
    val nb = b.disU2.toDouble
    if (na == 0.0 || nb == 0.0) 1.0
    else 1.0 - dotQQ(a, b) / math.sqrt(na * nb)
  }

  /**
   * Estimated squared L2 distance + an error radius for lower-bounding:
   *   l2s ~= |q|^2 + |x|^2 - 2*dot
   *   err ~= 2 * |q| * (scale/2) * sqrt(dim)   (per-element code error <= scale/2)
   * The search uses `est - epsilon * err` as the pruning lower bound
   * (reference semantics: crates/vchordrq/src/search.rs:101-113).
   */
  def estimateL2s(c: Code, q: Array[Float], qSum: Double, qNormSq: Double): (Double, Double) = {
    val d = estimateDot(c, q, qSum)
    val est = qNormSq + c.disU2.toDouble - 2.0 * d
    val err = math.sqrt(qNormSq) * c.scale * math.sqrt(c.dim.toDouble)
    (math.max(est, 0.0), err)
  }
}
