package graft.index

import graft.SparkSpec
import graft.core.{VectorKernels => K}
import java.nio.file.Files

/**
 * Batched multi-root sphere range ([[IvfIndex.rangeSearchManyMulti]]):
 * M spheres x R roots in a constant number of Spark jobs, output equal
 * to the brute strict-< cutoff over the union corpus — across storage
 * tiers, metrics, a delta-appended root, the per-query direct-scan
 * fallback, rerank-in-table, and colliding ids between roots.
 */
class RangeSearchManyMultiSpec extends SparkSpec {

  private def corpus(n: Int, off: Long, seed: Int): Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(seed)
    (0L until n.toLong).map(i => (off + i, Seq.fill(8)(rng.nextFloat() * 2 - 1)))
  }

  private def build(rows: Seq[(Long, Seq[Float])], cfg: IvfConfig): IvfIndex = {
    import spark.implicits._
    IvfIndex.build(rows.toDF("id", "vec"), "id", "vec",
      Files.createTempDirectory("graft-rmm").toString, cfg)
  }

  /** Brute strict-< rows over the TIER-adjusted corpus — shared oracle
    * ([[RangeBruteOracle]]) so this spec and the fuzzer grade against
    * one store contract. */
  private def brute(all: Seq[(Long, Seq[Float])], q: Array[Float], r: Double,
                    metric: String, storage: String): Seq[(Long, Double)] =
    RangeBruteOracle.brute(all, q, r, metric, storage)

  private def radiusFor(metric: String): Array[Double] = metric match {
    case "l2"      => Array(1.1, 1.3, 0.9)
    case "negdot"  => Array(-0.5, -0.3, -0.7)
    case "cosdist" => Array(0.4, 0.5, 0.3)
  }

  test("batch == brute strict-< over the union corpus (l2/f32, delta " +
       "root included); job count independent of batch size") {
    import spark.implicits._
    val parts = Seq(corpus(150, 0, 1), corpus(150, 1000, 2), corpus(150, 2000, 3))
    val idxs = parts.take(2).map(build(_, IvfConfig(lists = 4))) :+ {
      val idx = build(parts(2).take(100), IvfConfig(lists = 4))
      idx.appendDelta(parts(2).drop(100).toDF("id", "vec"), "id", "vec")
      idx
    }
    val all = parts.flatten
    val rng = new scala.util.Random(17)
    def q(): Array[Float] = Array.fill(8)(rng.nextFloat() * 0.8f - 0.4f)
    val qs6 = Array.tabulate(6)(i => (i.toLong, q(), 1.15 + 0.05 * (i % 3)))
    // warm (listing caches, codegen), then count jobs for two batch sizes
    IvfIndex.rangeSearchManyMulti(idxs, qs6.take(2)).collect()
    val j0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).maxOption.getOrElse(-1)
    IvfIndex.rangeSearchManyMulti(idxs, qs6.take(2)).collect()
    val j1 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).maxOption.getOrElse(-1)
    val got = IvfIndex.rangeSearchManyMulti(idxs, qs6)
      .as[(Long, Long, Double)].collect()
    val j2 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).maxOption.getOrElse(-1)
    assert(j2 - j1 == j1 - j0,
      s"job count must not grow with batch size: ${j1 - j0} at M=2 vs " +
      s"${j2 - j1} at M=6")
    val byQ = got.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    qs6.foreach { case (qid, c, r) =>
      val want = brute(all, c, r, "l2", "f32")
      assert(byQ.getOrElse(qid, Nil).sortBy(t => (t._2, t._1)) == want,
        s"qid=$qid diverged from brute cutoff")
    }
    // output ordering contract: ascending (qid, dist, id)
    assert(got.sortBy(t => (t._1, t._3, t._2)).toSeq == got.toSeq)
  }

  test("f16 storage / cosdist / negdot cut exactly under per-root prep — " +
       "on BOTH survivor tiers (driver membership and distributed join)") {
    import spark.implicits._
    Seq("l2" -> "f16", "cosdist" -> "f32", "negdot" -> "f16").foreach {
      case (metric, storage) =>
        val parts = Seq(corpus(120, 0, 5), corpus(120, 5000, 6))
        val idxs = parts.map(build(_,
          IvfConfig(lists = 4, metric = metric, storage = storage)))
        val all = parts.flatten
        val rng = new scala.util.Random(23)
        val rads = radiusFor(metric)
        val qs = Array.tabulate(3)(i =>
          (100L + i, Array.fill(8)(rng.nextFloat() * 2 - 1), rads(i)))
        // maxDriverSurvivors=0 forces the huge-survivor DataFrame tier;
        // the default takes the driver-membership tier — both must cut
        // identically
        Seq("1000000", "0").foreach { tier =>
          val got = graft.core.Confs.withConfs(spark,
              "graft.ann.range.maxDriverSurvivors" -> tier) {
            IvfIndex.rangeSearchManyMulti(idxs, qs)
              .as[(Long, Long, Double)].collect()
          }.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
          qs.foreach { case (qid, c, r) =>
            val want = brute(all, c, r, metric, storage)
            val g = got.getOrElse(qid, Nil).sortBy(t => (t._2, t._1))
            assert(g.map(_._1) == want.map(_._1),
              s"[$metric/$storage tier=$tier] qid=$qid ids diverged: " +
              s"got=$g want=$want")
            g.map(_._2).zip(want.map(_._2)).foreach { case (d, w) =>
              assert(math.abs(d - w) < 1e-6,
                s"[$metric/$storage tier=$tier] $d vs $w")
            }
          }
        }
    }
  }

  test("rerank-in-TABLE cuts identically on both survivor tiers") {
    import spark.implicits._
    val parts = Seq(corpus(100, 0, 81), corpus(100, 1000, 82))
    val all = parts.flatten
    val src = all.toDF("id", "vec")
    val idxs = parts.map(build(_, IvfConfig(lists = 4)))
    val qs = Array.tabulate(2)(i =>
      (i.toLong, Array.fill(8)(0.1f * (i + 1)), 1.3))
    val results = Seq("1000000", "0").map { tier =>
      graft.core.Confs.withConfs(spark,
          "graft.ann.range.maxDriverSurvivors" -> tier) {
        IvfIndex.rangeSearchManyMulti(idxs, qs,
            rerankTable = Some((src, "id", "vec")))
          .as[(Long, Long, Double)].collect().toSeq
      }
    }
    assert(results(0).nonEmpty, "fixture produced no rows")
    assert(results(0) == results(1),
      s"tiers diverged: driver=${results(0)} distributed=${results(1)}")
  }

  test("no-prune spheres take the per-query direct-scan fallback and " +
       "still cut exactly; pruning spheres in the same batch keep the join") {
    import spark.implicits._
    val parts = Seq(corpus(200, 0, 31), corpus(200, 1000, 32))
    val idxs = parts.map(build(_, IvfConfig(lists = 4)))
    val all = parts.flatten
    // sphere 0: radius covers nearly everything (8-dim uniform [-1,1]
    // pairs sit ~ sqrt(8*2/3) ≈ 2.3 apart) -> > 25% survivors -> scan;
    // sphere 1: selective -> join path
    val qs = Array(
      (0L, Array.fill(8)(0.0f), 4.0),
      (1L, Array.fill(8)(0.1f), 1.0))
    val fb0 = IvfIndex.rangeScanFallbacks.get()
    val got = IvfIndex.rangeSearchManyMulti(idxs, qs)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    assert(IvfIndex.rangeScanFallbacks.get() == fb0 + 1,
      "exactly the wide sphere must take the scan fallback")
    qs.foreach { case (qid, c, r) =>
      val want = brute(all, c, r, "l2", "f32")
      assert(got.getOrElse(qid, Nil).sortBy(t => (t._2, t._1)) == want,
        s"qid=$qid diverged (fallback path)")
    }
  }

  test("codes-only children rerank-in-TABLE with RAW queries (cosine " +
       "renormalizes); loud refusal without a source") {
    import spark.implicits._
    val parts = Seq(corpus(120, 0, 71), corpus(120, 1000, 72))
    val all = parts.flatten
    val src = all.toDF("id", "vec")
    val idxs = parts.map { part =>
      build(part, IvfConfig(lists = 4, metric = "cosdist"))
        .dropVectors(Files.createTempDirectory("graft-rmm-novec").toString)
    }
    val e = intercept[IllegalArgumentException](
      IvfIndex.rangeSearchManyMulti(idxs, Array((0L, Array.fill(8)(0.1f), 0.4))))
    assert(e.getMessage.contains("rerankTable"), e.getMessage)
    val rng = new scala.util.Random(77)
    val qs = Array.tabulate(3)(i =>
      (i.toLong, Array.fill(8)(rng.nextFloat() * 2 - 1), 0.35 + 0.05 * i))
    val got = IvfIndex.rangeSearchManyMulti(idxs, qs,
        rerankTable = Some((src, "id", "vec")))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    qs.foreach { case (qid, c, r) =>
      // in-table truth: RAW vectors, RAW query, true cosdist
      val want = all.flatMap { case (id, v) =>
        val d = K.cosdist(v.toArray, c)
        if (d < r) Some((id, d)) else None
      }.sortBy(t => (t._2, t._1))
      val g = got.getOrElse(qid, Nil).sortBy(t => (t._2, t._1))
      assert(g.map(_._1) == want.map(_._1), s"qid=$qid ids diverged")
      g.map(_._2).zip(want.map(_._2)).foreach { case (d, w) =>
        assert(math.abs(d - w) < 1e-9, s"qid=$qid $d vs $w")
      }
    }
  }

  test("colliding ids across roots cut under their own root's rows only") {
    import spark.implicits._
    val a = corpus(80, 0, 41)
    val b = corpus(80, 0, 42) // same ids, different vectors
    val idxs = Seq(build(a, IvfConfig(lists = 2)), build(b, IvfConfig(lists = 2)))
    val q = Array.fill(8)(0.1f)
    val r = 1.4
    val got = IvfIndex.rangeSearchManyMulti(idxs, Array((0L, q, r)))
      .as[(Long, Long, Double)].collect().map(t => (t._2, t._3))
      .sortBy(t => (t._2, t._1))
    // every matching ROW surfaces (one per root) — the multiset of
    // (id, dist) pairs over both roots' independent rows
    val want = (a ++ b).flatMap { case (id, v) =>
      val d = K.l2(v.toArray, q)
      if (d < r) Some((id, d)) else None
    }.sortBy(t => (t._2, t._1))
    assert(got.toSeq == want,
      s"per-root rows must cut independently: got=${got.toSeq} want=$want")
  }

  test("STORAGE-mixed corpora (f32 + f16 children) cut by homogeneous " +
       "group — exact within each tier's store") {
    import spark.implicits._
    val f32part = corpus(80, 0, 51)
    val f16part = corpus(80, 1000, 52)
    val idxs = Seq(
      build(f32part, IvfConfig(lists = 2, storage = "f32")),
      build(f16part, IvfConfig(lists = 2, storage = "f16")))
    val qs = Array((0L, Array.fill(8)(0.1f), 1.3), (1L, Array.fill(8)(-0.1f), 1.2))
    val got = IvfIndex.rangeSearchManyMulti(idxs, qs)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(t => (t._2, t._1)).toSeq).toMap
    qs.foreach { case (qid, c, r) =>
      val want = (brute(f32part, c, r, "l2", "f32") ++
        brute(f16part, c, r, "l2", "f16")).sortBy(t => (t._2, t._1))
      val g = got.getOrElse(qid, Nil)
      assert(g.map(_._1) == want.map(_._1),
        s"qid=$qid ids diverged: got=$g want=$want")
      g.map(_._2).zip(want.map(_._2)).foreach { case (d, w) =>
        assert(math.abs(d - w) < 1e-6, s"qid=$qid $d vs $w")
      }
    }
  }

  test("storage-mixed groups WITH a rerank table fold duplicate rows: " +
       "one (qid, id) row even across group boundaries and through a " +
       "group's no-prune table-scan fallback") {
    import spark.implicits._
    // group A: codes-only; group B: full f32 — plus id 4242 indexed by
    // BOTH groups' roots (one source-table truth row)
    val aRows = corpus(80, 0, 91) :+ (4242L -> Seq.fill(8)(0.12f))
    val bRows = corpus(80, 1000, 92) :+ (4242L -> Seq.fill(8)(0.12f))
    val src = (corpus(80, 0, 91) ++ corpus(80, 1000, 92) :+
      (4242L -> Seq.fill(8)(0.12f))).toDF("id", "vec")
    val idxs = Seq(
      build(aRows, IvfConfig(lists = 2))
        .dropVectors(Files.createTempDirectory("graft-rmm-mx").toString),
      build(bRows, IvfConfig(lists = 2)))
    // sphere 0: huge radius -> at least one group's no-prune fallback
    // scans the WHOLE shared table; sphere 1: selective
    val qs = Array((0L, Array.fill(8)(0.1f), 4.0), (1L, Array.fill(8)(0.1f), 1.0))
    val got = IvfIndex.rangeSearchManyMulti(idxs, qs,
        rerankTable = Some((src, "id", "vec")))
      .as[(Long, Long, Double)].collect()
    val byQ = got.groupBy(_._1).view.mapValues(_.toSeq).toMap
    qs.foreach { case (qid, c, r) =>
      val rows = byQ.getOrElse(qid, Nil)
      assert(rows.map(_._2).distinct.length == rows.length,
        s"qid=$qid duplicate (qid, id) rows in the grouped rerank " +
        s"union: ${rows.sortBy(_._2)}")
      // in-table truth: RAW vectors, RAW query, strict-<
      val want = (corpus(80, 0, 91) ++ corpus(80, 1000, 92) :+
        (4242L -> Seq.fill(8)(0.12f)))
        .flatMap { case (id, v) =>
          val d = K.l2(v.toArray, c)
          if (d < r) Some((id, d)) else None
        }.sortBy(t => (t._2, t._1))
      assert(rows.map(t => (t._2, t._3)).sortBy(t => (t._2, t._1)) == want,
        s"qid=$qid diverged from the in-table cutoff")
    }
  }

  test("metric mixes and duplicate qids are refused loudly") {
    val idxs = Seq(
      build(corpus(60, 0, 55), IvfConfig(lists = 2, metric = "l2")),
      build(corpus(60, 100, 56), IvfConfig(lists = 2, metric = "negdot")))
    val e = intercept[IllegalArgumentException](
      IvfIndex.rangeSearchManyMulti(idxs, Array((0L, Array.fill(8)(0.1f), 1.0))))
    assert(e.getMessage.contains("metric"), e.getMessage)
    val ok = Seq(build(corpus(60, 0, 53), IvfConfig(lists = 2)))
    val e2 = intercept[IllegalArgumentException](
      IvfIndex.rangeSearchManyMulti(ok, Array(
        (0L, Array.fill(8)(0.1f), 1.0), (0L, Array.fill(8)(0.2f), 1.0))))
    assert(e2.getMessage.contains("duplicate qids"), e2.getMessage)
  }
}
