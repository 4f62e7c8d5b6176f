package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.Props.forAllVecs
import graft.core.{VectorKernels => K}

/**
 * Mirrors the reference's rotation unit tests (reference:
 * crates/rabitq/src/rotate.rs:140-151 — rotate then rotate_reversed is
 * identity) plus orthonormality (norm preservation).
 */
class RotationSpec extends AnyFunSuite {

  test("round trip is identity (1e-3 abs)") {
    forAllVecs(trials = 100, maxDim = 100, range = 10f) { x =>
      val rot = new Rotation(x.length)
      val back = rot.inverse(rot(x))
      assert(back.length == x.length)
      x.indices.foreach(i => assert(math.abs(back(i) - x(i)) < 1e-3,
        s"dim ${x.length} at $i: ${back(i)} vs ${x(i)}"))
    }
  }

  test("norm preserved (orthonormal)") {
    forAllVecs(trials = 100, maxDim = 100, range = 10f) { x =>
      val rot = new Rotation(x.length)
      val r = rot(x)
      assert(math.abs(K.norm(r) - K.norm(x)) < 1e-3 * (1.0 + K.norm(x)))
    }
  }

  test("deterministic across instances") {
    val x = Array.tabulate(13)(i => i * 0.37f - 2f)
    val r1 = new Rotation(13)(x)
    val r2 = new Rotation(13)(x)
    assert(r1.sameElements(r2))
  }
}
