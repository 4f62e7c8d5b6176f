package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.Props.forAllVecs
import graft.core.{VectorKernels => K}

/**
 * Quantize/dequantize round-trip bounds — mirrors the reference's
 * dequantize sqllogictests (reference: tests/general/dequantize.slt) as
 * property tests.
 */
class RaBitQSpec extends AnyFunSuite {

  test("8-bit relative L2 round-trip error < 3%") {
    forAllVecs() { x =>
      val deq = RaBitQ.dequantize(RaBitQ.quantize(x, 8))
      val n = K.norm(x)
      if (n > 1e-6) assert(K.l2(deq, x) / n < 0.03)
    }
  }

  test("4-bit relative L2 round-trip error < 25%") {
    forAllVecs() { x =>
      val deq = RaBitQ.dequantize(RaBitQ.quantize(x, 4))
      val n = K.norm(x)
      if (n > 1e-6) assert(K.l2(deq, x) / n < 0.25)
    }
  }

  test("dequantized norm equals original norm (norm-preserving scale)") {
    forAllVecs() { x =>
      val deq = RaBitQ.dequantize(RaBitQ.quantize(x, 8))
      val n = K.norm(x)
      if (n > 1e-6) assert(math.abs(K.norm(deq) - n) / n < 1e-3)
    }
  }

  test("nibble pack/unpack round-trips") {
    forAllVecs(trials = 50) { x =>
      val c = RaBitQ.quantize(x, 4)
      val u = RaBitQ.unpack(c)
      assert(u.length == x.length)
      assert(u.forall(v => v >= 0 && v <= 14))
    }
  }

  test("estimateDot matches dot(q, dequantized) closely") {
    forAllVecs(trials = 100) { x =>
      val q = x.map(v => v * 0.3f + 1.0f)
      val c = RaBitQ.quantize(x, 8)
      val deq = RaBitQ.dequantize(c)
      val qSum = q.map(_.toDouble).sum
      val est = RaBitQ.estimateDot(c, q, qSum)
      assert(math.abs(est - K.dot(deq, q)) < 1e-2 * (1.0 + math.abs(est)))
    }
  }

  test("estimateL2s lower bound is sound (est - err <= true l2s)") {
    forAllVecs(trials = 100) { x =>
      val q = x.map(v => -v * 0.7f + 0.5f)
      val c = RaBitQ.quantize(x, 8)
      val qSum = q.map(_.toDouble).sum
      val (est, err) = RaBitQ.estimateL2s(c, q, qSum, K.normSq(q))
      val truth = K.l2s(x, q)
      assert(est - err <= truth + 1e-6 + 1e-3 * truth)
    }
  }

  test("zero vector quantizes and round-trips") {
    val z = Array.fill(16)(0.0f)
    val deq = RaBitQ.dequantize(RaBitQ.quantize(z, 8))
    assert(deq.forall(_ == 0.0f))
  }
}
