package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.Props.forAllVecs
import graft.core.{VectorKernels => K}

/**
 * Golden values mirror the reference's scalar-operator sqllogictests
 * (reference: tests/general/distance.slt:1-30 — round((v <-> w), 3) etc.).
 */
class KernelSpec extends AnyFunSuite {
  private val a = Array(1.0f, 2.0f, 3.0f)
  private val b = Array(2.0f, 3.0f, 4.0f)

  private def r3(x: Double): Double = math.rint(x * 1000) / 1000

  test("golden: l2([1,2,3],[2,3,4]) = 1.732") { assert(r3(K.l2(a, b)) == 1.732) }
  test("golden: negdot = -20.000") { assert(r3(K.negdot(a, b)) == -20.0) }
  test("golden: cosdist = 0.007") { assert(r3(K.cosdist(a, b)) == 0.007) }

  test("dim mismatch throws") {
    assertThrows[IllegalArgumentException](K.l2(a, Array(1.0f)))
  }

  test("maxsim = sum of per-query minima") {
    val doc = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    val q = Array(Array(1.0f, 0.0f), Array(0.5f, 0.5f))
    // q1: min(-1, 0) = -1 ; q2: min(-0.5, -0.5) = -0.5
    assert(K.maxsim(doc, q) == -1.5)
  }

  test("property: l2(x,x)=0, symmetry, cos range") {
    forAllVecs() { x =>
      assert(K.l2(x, x) == 0.0)
      val y = x.map(v => -v)
      assert(K.l2(x, y) == K.l2(y, x))
      val c = K.cosdist(x, y)
      assert(c >= -1e-9 && c <= 2.0 + 1e-9)
    }
  }

  test("property: normalize gives unit norm (or zero passthrough)") {
    forAllVecs() { x =>
      val n = K.norm(K.normalize(x))
      assert(n == 0.0 || math.abs(n - 1.0) < 1e-6)
    }
  }

  test("f32 kernels agree with f64 to single precision") {
    forAllVecs() { x =>
      val y = x.map(v => v * 0.5f + 1.0f)
      assert(math.abs(K.l2sF32(x, y) - K.l2s(x, y)) <= 1e-3 * (1.0 + K.l2s(x, y)))
    }
  }
}
