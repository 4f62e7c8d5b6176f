package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.Props.forAllVecs
import graft.core.{VectorKernels => K}

/**
 * f16 codec — mirrors the reference's halfvec distance goldens
 * (reference: tests/general/distance.slt f16 variants produce the same
 * rounded values as f32).
 */
class HalfSpec extends AnyFunSuite {

  private def r3(x: Double): Double = math.rint(x * 1000) / 1000

  test("golden distances survive f16 round-trip ([1,2,3] vs [2,3,4])") {
    val a = Half.decode(Half.encode(Array(1f, 2f, 3f)))
    val b = Half.decode(Half.encode(Array(2f, 3f, 4f)))
    assert(r3(K.l2(a, b)) == 1.732)
    assert(r3(K.negdot(a, b)) == -20.0)
    assert(r3(K.cosdist(a, b)) == 0.007)
  }

  test("exact values: small integers and powers of two are lossless") {
    Seq(0f, -0f, 1f, -1f, 2f, 1024f, 0.5f, 0.25f, -3f, 255f).foreach { f =>
      assert(Half.halfToFloat(Half.floatToHalf(f)) == f, s"$f")
    }
  }

  test("overflow saturates to infinity; max finite f16 is 65504") {
    assert(Half.halfToFloat(Half.floatToHalf(65504f)) == 65504f)
    assert(Half.halfToFloat(Half.floatToHalf(70000f)).isInfinite)
    assert(Half.halfToFloat(Half.floatToHalf(-70000f)) == Float.NegativeInfinity)
  }

  test("subnormals round-trip") {
    val tiny = java.lang.Float.intBitsToFloat(0x37800000) // 2^-16
    assert(Half.halfToFloat(Half.floatToHalf(tiny)) == tiny)
    val tiniest = java.lang.Float.intBitsToFloat(0x33800000) // 2^-24
    assert(Half.halfToFloat(Half.floatToHalf(tiniest)) == tiniest)
  }

  test("property: relative round-trip error within fp16 epsilon") {
    forAllVecs(trials = 300, range = 100f) { x =>
      val back = Half.decode(Half.encode(x))
      x.indices.foreach { i =>
        val err = math.abs(back(i) - x(i))
        val tol = math.max(math.abs(x(i)) * (1.0 / 1024.0), 6.2e-5)
        assert(err <= tol, s"${x(i)} -> ${back(i)}")
      }
    }
  }

  test("encode is round-to-nearest-even") {
    // 1 + 2^-11 is exactly halfway between 1.0 and 1+2^-10 -> rounds to even (1.0)
    val halfway = 1.0f + java.lang.Math.ulp(1.0f) * math.pow(2, 12).toFloat / 8192f
    val v = java.lang.Float.intBitsToFloat(0x3f801000) // 1 + 2^-11 exactly
    assert(Half.halfToFloat(Half.floatToHalf(v)) == 1.0f)
    val above = java.lang.Float.intBitsToFloat(0x3f801001) // just above halfway
    assert(Half.halfToFloat(Half.floatToHalf(above)) > 1.0f)
  }
}
