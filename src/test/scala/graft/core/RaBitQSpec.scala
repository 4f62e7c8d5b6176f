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

  test("1-bit sign lattice: 8 components/byte, sign-faithful, norm-preserving") {
    forAllVecs(trials = 50) { x =>
      val c = RaBitQ.quantize(x, 1)
      assert(c.codes.length == (x.length + 7) / 8, "one bit per component")
      // normOfLattice = sqrt(dim) EXACTLY (every lattice value is +-1) —
      // the invariant the graph loaders use to recover dim at bits=1
      assert(math.round(c.normOfLattice.toDouble * c.normOfLattice).toInt
        == x.length)
      val deq = RaBitQ.dequantize(c)
      val n = K.norm(x)
      if (n > 1e-6) {
        // norm-preserving scale holds at 1 bit too
        assert(math.abs(K.norm(deq) - n) / n < 1e-3)
        // every dequantized component carries the original sign
        x.indices.foreach { i =>
          assert(x(i) >= 0 == deq(i) >= 0, s"sign flipped at $i")
        }
      }
      // code-vs-code dot equals the dot of the dequantized points (the
      // lattice algebra is exact; only quantization itself is lossy)
      val y = x.map(v => -v * 0.5f)
      val cy = RaBitQ.quantize(y, 1)
      val want = K.negdot(RaBitQ.dequantize(c), RaBitQ.dequantize(cy)) * -1.0
      assert(math.abs(RaBitQ.dotQQ(c, cy) - want) <= 1e-3 * (1.0 + math.abs(want)))
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

  test("code-vs-code operators equal the dequantized-pair distances") {
    Seq(8, 4).foreach { bits =>
      forAllVecs(trials = 100, seed = 7L) { x =>
        val y = x.map(v => -0.4f * v + 2.5f)
        val (a, b) = (RaBitQ.quantize(x, bits), RaBitQ.quantize(y, bits))
        val (da, db) = (RaBitQ.dequantize(a), RaBitQ.dequantize(b))
        // the metadata path computes the same quantity as decoding both
        // sides — only f32-rounding of the decoded elements separates them
        val l2Ref = K.l2(da, db)
        assert(math.abs(RaBitQ.l2QQ(a, b) - l2Ref) <= 1e-4 * (1.0 + l2Ref), s"bits=$bits l2")
        val ndRef = K.negdot(da, db)
        assert(math.abs(RaBitQ.negdotQQ(a, b) - ndRef) <= 1e-4 * (1.0 + math.abs(ndRef)), s"bits=$bits negdot")
        val cosRef = K.cosdist(da, db)
        assert(math.abs(RaBitQ.cosdistQQ(a, b) - cosRef) <= 1e-4 * (1.0 + math.abs(cosRef)), s"bits=$bits cos")
      }
    }
  }

  test("code-vs-code operators approximate the true distances (8-bit < 3%)") {
    forAllVecs(trials = 100, seed = 9L) { x =>
      val y = x.map(v => 0.8f * v - 1.0f)
      val (a, b) = (RaBitQ.quantize(x, 8), RaBitQ.quantize(y, 8))
      val scaleMag = K.norm(x) + K.norm(y)
      assert(math.abs(RaBitQ.l2QQ(a, b) - K.l2(x, y)) <= 0.03 * (1e-9 + scaleMag))
      assert(math.abs(RaBitQ.negdotQQ(a, b) - K.negdot(x, y)) <=
        0.03 * (1e-9 + K.norm(x) * K.norm(y)))
    }
  }

  test("code-vs-code self distance: l2 == 0, cosdist == 0, zero vec cos == 1") {
    val x = Array.tabulate(32)(i => (i - 16) * 0.25f)
    val a = RaBitQ.quantize(x, 8)
    assert(RaBitQ.l2QQ(a, a) == 0.0)
    // f32 metadata rounding leaves ~1e-8 relative residue in dot/disU2
    assert(math.abs(RaBitQ.cosdistQQ(a, a)) < 1e-6)
    val z = RaBitQ.quantize(Array.fill(8)(0.0f), 8)
    assert(RaBitQ.cosdistQQ(z, z) == 1.0)
    assert(RaBitQ.l2QQ(z, z) == 0.0)
  }
}
