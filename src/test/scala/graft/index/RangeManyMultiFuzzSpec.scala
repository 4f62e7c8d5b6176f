package graft.index

import graft.SparkSpec
import graft.core.{VectorKernels => K}
import java.nio.file.Files

/**
 * Seeded config-axis fuzz of [[IvfIndex.rangeSearchManyMulti]] (the
 * AnnRangeFuzzSpec pattern applied to the batched face): each seed
 * draws roots (1-3), metric, storage tier, lists, batch size, radii,
 * and a survivor-delivery tier (driver membership vs distributed join),
 * builds fresh children, and requires the batch to equal the brute
 * strict-< cutoff over the tier-adjusted union corpus — any accepted
 * combination must be EXACT, across every axis the DSL exposes.
 */
class RangeManyMultiFuzzSpec extends SparkSpec {

  private def radiusFor(metric: String, rng: scala.util.Random): Double =
    metric match {
      case "l2"      => 0.9 + rng.nextDouble() * 0.6
      case "negdot"  => -0.8 + rng.nextDouble() * 0.6
      case "cosdist" => 0.25 + rng.nextDouble() * 0.3
    }

  private def runSeed(seed: Int): Unit = {
    import spark.implicits._
    val rng = new scala.util.Random(7000 + seed)
    val metric = Seq("l2", "negdot", "cosdist")(rng.nextInt(3))
    val storage = if (rng.nextBoolean()) "f32" else "f16"
    val nRoots = 1 + rng.nextInt(3)
    val lists = 2 + rng.nextInt(3)
    val nPerRoot = 60 + rng.nextInt(60)
    val tier = if (rng.nextBoolean()) "1000000" else "0"
    val parts = (0 until nRoots).map { r =>
      (0 until nPerRoot).map(i =>
        ((r * 1000 + i).toLong, Seq.fill(8)(rng.nextFloat() * 2 - 1)))
    }
    val idxs = parts.map { rows =>
      IvfIndex.build(rows.toDF("id", "vec"), "id", "vec",
        Files.createTempDirectory(s"graft-rmmf-$seed").toString,
        IvfConfig(lists = lists, metric = metric, storage = storage))
    }
    val nQ = 1 + rng.nextInt(3)
    val qs = Array.tabulate(nQ)(i =>
      (i.toLong, Array.fill(8)(rng.nextFloat() * 2 - 1),
        radiusFor(metric, rng)))
    val got = graft.core.Confs.withConfs(spark,
        "graft.ann.range.maxDriverSurvivors" -> tier) {
      IvfIndex.rangeSearchManyMulti(idxs, qs)
        .as[(Long, Long, Double)].collect()
    }.groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(t => (t._2, t._1)).toSeq)
      .toMap
    // brute over the TIER store — the shared [[RangeBruteOracle]], so
    // this fuzzer and the deterministic spec grade one store contract
    val all = parts.flatten
    qs.foreach { case (qid, c, r) =>
      val want = RangeBruteOracle.brute(all, c, r, metric, storage)
      val g = got.getOrElse(qid, Nil)
      assert(g.map(_._1) == want.map(_._1),
        s"[seed=$seed $metric/$storage roots=$nRoots lists=$lists " +
        s"tier=$tier] qid=$qid ids diverged: got=${g.map(_._1)} " +
        s"want=${want.map(_._1)}")
      g.map(_._2).zip(want.map(_._2)).foreach { case (d, w) =>
        assert(math.abs(d - w) < 1e-6,
          s"[seed=$seed $metric/$storage tier=$tier] qid=$qid $d vs $w")
      }
    }
  }

  test("25 seeds: every (metric, storage, roots, lists, tier, radii) " +
       "combination cuts brute-exact") {
    (0 until 25).foreach(runSeed)
  }
}
