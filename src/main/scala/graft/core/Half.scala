package graft.core

/**
 * IEEE 754 binary16 ("halfvec") conversion — the reference supports
 * pgvector's f16 vector type with all distance operators (reference:
 * crates/vector/src/vect.rs:38-46 `f16::vector_to_f32` widening,
 * src/datatype/memory_halfvec.rs). The JVM has no primitive f16
 * (Float.float16ToFloat arrives in JDK 20), so vectors are stored as
 * Short bit patterns and widened to f32 before the shared kernels run —
 * exactly the reference's approach of normalizing f16 to f32 for math.
 *
 * Encode uses round-to-nearest-even, matching hardware and the reference.
 */
object Half {

  /** f32 -> f16 bits (round-to-nearest-even, with overflow to inf). */
  def floatToHalf(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val e = (bits >>> 23) & 0xff
    val m = bits & 0x7fffff
    if (e == 0xff) { // inf / nan
      (sign | 0x7c00 | (if (m != 0) 0x200 else 0)).toShort
    } else {
      val newExp = e - 127 + 15
      if (newExp >= 0x1f) (sign | 0x7c00).toShort // overflow -> inf
      else if (newExp <= 0) {
        if (newExp < -10) sign.toShort // underflow -> 0
        else {
          // subnormal: implicit leading 1
          val mFull = m | 0x800000
          val shift = 14 - newExp
          val half = mFull >>> shift
          val rem = mFull & ((1 << shift) - 1)
          val halfway = 1 << (shift - 1)
          val rounded =
            if (rem > halfway || (rem == halfway && (half & 1) == 1)) half + 1 else half
          (sign | rounded).toShort
        }
      } else {
        val half = m >>> 13
        val rem = m & 0x1fff
        val rounded =
          if (rem > 0x1000 || (rem == 0x1000 && (half & 1) == 1)) half + 1 else half
        val out = (sign | (newExp << 10) | half) + (rounded - half)
        out.toShort
      }
    }
  }

  /** f16 bits -> f32. */
  def halfToFloat(h: Short): Float = {
    val sign = (h & 0x8000) << 16
    val e = (h >>> 10) & 0x1f
    val m = h & 0x3ff
    val bits =
      if (e == 0) {
        if (m == 0) sign
        else {
          // subnormal: normalize
          var mm = m
          var ee = -1
          while ((mm & 0x400) == 0) { mm <<= 1; ee += 1 }
          sign | ((127 - 15 - ee) << 23) | ((mm & 0x3ff) << 13)
        }
      } else if (e == 0x1f) sign | 0x7f800000 | (m << 13) // inf/nan
      else sign | ((e - 15 + 127) << 23) | (m << 13)
    java.lang.Float.intBitsToFloat(bits)
  }

  def encode(v: Array[Float]): Array[Short] = v.map(floatToHalf)
  def decode(h: Array[Short]): Array[Float] = h.map(halfToFloat)

  /** f32 vector -> packed f16 little-endian bytes (2 per element) — the
    * halfvec STORAGE form (half the bytes of f32 on disk and over the
    * rerank scan). */
  def encodeBytes(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](v.length * 2)
    var i = 0
    while (i < v.length) {
      val h = floatToHalf(v(i))
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  def decodeBytes(b: Array[Byte]): Array[Float] = {
    val out = new Array[Float](b.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = halfToFloat((((b(2 * i + 1) & 0xff) << 8) | (b(2 * i) & 0xff)).toShort)
      i += 1
    }
    out
  }

  /** f32 -> f16 -> f32 precision round-trip (what a halfvec store keeps). */
  def roundtrip(v: Array[Float]): Array[Float] = {
    val out = new Array[Float](v.length)
    var i = 0
    while (i < v.length) { out(i) = halfToFloat(floatToHalf(v(i))); i += 1 }
    out
  }
}
