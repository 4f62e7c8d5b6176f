package graft.index

import graft.SparkSpec
import java.nio.file.Files

/**
 * Seeded CONFIG-MATRIX fuzz for the index itself: random combinations
 * of (bits, storage, metric, rotate, residual, kmeansAlgo, tree depth)
 * build over the same corpus, and full-probe search with generous
 * refine must return exactly searchExact's rows — the variants specs
 * cover each axis alone; this covers their interactions (e.g.
 * f16 + rotate + bits=1 + cosdist never meet otherwise). The exact
 * regime isolates build/estimate/rerank plumbing bugs from ANN slack.
 */
class IvfConfigFuzzSpec extends SparkSpec {

  test("12 random config combinations: full-probe search == searchExact") {
    import spark.implicits._
    val rng = new scala.util.Random(31337)
    val rows = (0L until 180L).map(i => (i, Seq.fill(10)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "vec")
    (1 to 12).foreach { trial =>
      val lists = Seq(2, 4, 8)(rng.nextInt(3))
      val cfg = IvfConfig(
        lists = lists,
        bits = Seq(1, 4, 8)(rng.nextInt(3)),
        residual = rng.nextBoolean(),
        metric = Seq("l2", "cosdist", "negdot")(rng.nextInt(3)),
        kmeansAlgo = if (rng.nextBoolean()) "lloyd" else "hierarchical",
        rotate = rng.nextBoolean(),
        storage = if (rng.nextBoolean()) "f32" else "f16",
        lists1 = if (rng.nextInt(3) == 0) 2 else 0)
      val dir = Files.createTempDirectory(s"graft-cfgfuzz-$trial").toString
      val idx = IvfIndex.build(df, "id", "vec", dir, cfg)
      (1 to 3).foreach { qi =>
        val q = Array.fill(10)(rng.nextFloat() * 2 - 1)
        val got = idx.search(q, 5, probes = lists, refine = 40)
          .select("id").as[Long].collect().toSeq
        val want = idx.searchExact(q, 5).select("id").as[Long].collect().toSeq
        assert(got == want,
          s"trial $trial query $qi diverged under $cfg:\n got=$got want=$want")
      }
    }
  }
}
