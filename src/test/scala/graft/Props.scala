package graft

/** Deterministic seeded property-test helper (no external generators). */
object Props {
  def forAllVecs(trials: Int = 200, minDim: Int = 1, maxDim: Int = 128,
                 range: Float = 50f, seed: Long = 42L)(f: Array[Float] => Unit): Unit = {
    val rng = new scala.util.Random(seed)
    (0 until trials).foreach { _ =>
      val n = minDim + rng.nextInt(maxDim - minDim + 1)
      f(Array.fill(n)((rng.nextFloat() * 2 - 1) * range))
    }
  }
}
