package graft.index

import org.apache.spark.sql.SparkSession

/**
 * Driver-side probe-cost microbench: flat centroid scoring vs tree
 * descent (B5) over the same synthetic centroid set — isolates the
 * per-query driver cost that internal levels remove. At lists=1024 the
 * flat probe scores every leaf centroid per query; the 3-level descent
 * scores roots + surviving children only (~8x fewer distance
 * evaluations), which is what keeps a 10^5-10^6-leaf index probeable
 * from the driver (reference: multi-level `lists`,
 * src/index/vchordrq/am/am_build.rs:1355-1385). No Spark jobs — probe is
 * pure driver work on broadcast-resident metadata.
 */
object ProbeBench {
  /** Returns (flat, tree) seconds for `iters` probes each. */
  def run(spark: SparkSession, lists: Int = 1024, dim: Int = 64,
          upper: Seq[Int] = Seq(4, 64), probes: Int = 32,
          iters: Int = 2000): (Double, Double) = {
    val rng = new scala.util.Random(5)
    val cents = Array.fill(lists)(Array.fill(dim)(rng.nextFloat() * 2 - 1))
    val (upC, upCh) = IvfIndex.buildUpper(cents, upper, 10)
    val cfg = IvfConfig(lists = lists)
    val flat = new IvfIndex(spark, "/nonexistent-probe-bench",
      IvfMeta(dim, dim, cfg, cents))
    val tree = new IvfIndex(spark, "/nonexistent-probe-bench",
      IvfMeta(dim, dim, cfg.copy(upperLists = upper), cents, upC, upCh))
    val qs = Array.fill(16)(Array.fill(dim)(rng.nextFloat() * 2 - 1))
    (0 until 200).foreach { i =>
      flat.probe(qs(i % 16), probes); tree.probe(qs(i % 16), probes)
    }
    val t0 = System.nanoTime()
    (0 until iters).foreach(i => flat.probe(qs(i % 16), probes))
    val tFlat = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    (0 until iters).foreach(i => tree.probe(qs(i % 16), probes))
    val tTree = (System.nanoTime() - t1) / 1e9
    (tFlat, tTree)
  }
}
