package graft.index

import graft.SparkSpec
import graft.core.{VectorKernels => K}
import java.nio.file.Files

/**
 * Batched multi-root search ([[IvfIndex.searchManyMulti]]): B queries x
 * R roots in two flat jobs, output equal to brute force over the union
 * corpus in the full-probe regime — across storage tiers, metrics, a
 * delta-appended root, and overlapping ids between roots (each row
 * scores under its own root's candidates; no global-uniqueness
 * assumption).
 */
class SearchManyMultiSpec extends SparkSpec {

  private def corpus(n: Int, off: Long, seed: Int): Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(seed)
    (0L until n.toLong).map(i => (off + i, Seq.fill(8)(rng.nextFloat() * 2 - 1)))
  }

  private def build(rows: Seq[(Long, Seq[Float])], cfg: IvfConfig): IvfIndex = {
    import spark.implicits._
    IvfIndex.build(rows.toDF("id", "vec"), "id", "vec",
      Files.createTempDirectory("graft-smm").toString, cfg)
  }

  private def brute(all: Seq[(Long, Seq[Float])], q: Array[Float], k: Int,
                    metric: String): Seq[(Long, Double)] = {
    val kern: (Array[Float], Array[Float]) => Double = metric match {
      case "l2"      => K.l2
      case "negdot"  => K.negdot
      case "cosdist" => K.cosdist
    }
    all.map { case (id, v) => (kern(v.toArray, q), id) }
      .sorted.take(k).map(t => (t._2, t._1))
  }

  test("full-probe batch == brute force over the union corpus (l2/f32, " +
       "delta-appended root included); exactly two jobs per batch") {
    import spark.implicits._
    val parts = Seq(corpus(150, 0, 1), corpus(150, 1000, 2), corpus(150, 2000, 3))
    val idxs = parts.take(2).map(build(_, IvfConfig(lists = 4))) :+ {
      // third root built over a prefix, the rest delta-appended
      val idx = build(parts(2).take(100), IvfConfig(lists = 4))
      idx.appendDelta(parts(2).drop(100).toDF("id", "vec"), "id", "vec")
      idx
    }
    val all = parts.flatten
    val rng = new scala.util.Random(17)
    val queries = Array.tabulate(5)(i =>
      (i.toLong, Array.fill(8)(rng.nextFloat() * 2 - 1)))
    // warm (relation build, listing caches), then count jobs
    IvfIndex.searchManyMulti(idxs, queries, k = 7, probes = 4, refine = 50)
      .collect()
    val jobs0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).maxOption.getOrElse(-1)
    val got = IvfIndex.searchManyMulti(idxs, queries, k = 7, probes = 4,
        refine = 50)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap
    val jobs1 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).maxOption.getOrElse(-1)
    assert(jobs1 - jobs0 == 2,
      s"batch must cost exactly 2 jobs at any root/query count, got ${jobs1 - jobs0}")
    queries.foreach { case (qid, q) =>
      val want = brute(all, q, 7, "l2").map(_._1)
      assert(got(qid) == want, s"qid=$qid: got=${got(qid)} want=$want")
    }
  }

  test("f16 storage and cosdist metric rerank exactly (prepped per root)") {
    import spark.implicits._
    Seq("l2" -> "f16", "cosdist" -> "f32", "negdot" -> "f16").foreach {
      case (metric, storage) =>
        val parts = Seq(corpus(120, 0, 5), corpus(120, 5000, 6))
        val idxs = parts.map(build(_,
          IvfConfig(lists = 4, metric = metric, storage = storage)))
        val all = parts.flatten
        val rng = new scala.util.Random(23)
        val queries = Array.tabulate(3)(i =>
          (100L + i, Array.fill(8)(rng.nextFloat() * 2 - 1)))
        val got = IvfIndex.searchManyMulti(idxs, queries, k = 5, probes = 4,
            refine = 50)
          .as[(Long, Long, Double, Long)].collect()
          .groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
        // brute must rank over the STORE's values or near-tie neighbors
        // legally swap: cosine normalizes at ingest (then rounds to f32),
        // and the f16 tier roundtrips through half floats — estimate and
        // rerank see that one store (the documented tier contract)
        val cmp = all.map { case (id, v) =>
          val a0 =
            if (metric == "cosdist") {
              val a = v.toArray
              val n = math.sqrt(K.dot(a, a))
              if (n > 0) a.map(x => (x / n).toFloat) else a
            } else v.toArray
          val a1 =
            if (storage == "f16")
              graft.core.Half.decodeBytes(graft.core.Half.encodeBytes(a0))
            else a0
          (id, a1.toSeq)
        }
        queries.foreach { case (qid, q) =>
          val want = brute(cmp, q, 5, metric)
          assert(got(qid).map(_._2).toSeq == want.map(_._1),
            s"[$metric/$storage] qid=$qid ids diverged")
          // f16 quantizes the stored vector; distances match within half
          // precision of the f16-roundtripped corpus (the store both the
          // estimate and rerank see — exact within the tier's contract)
          got(qid).map(_._3).zip(want.map(_._2)).foreach { case (d, w) =>
            assert(math.abs(d - w) < 1e-6,
              s"[$metric/$storage] qid=$qid dist $d vs $w")
          }
        }
    }
  }

  test("overlapping ids across roots score under their own root only") {
    import spark.implicits._
    // SAME id range in both roots, different vectors
    val a = corpus(80, 0, 31)
    val b = corpus(80, 0, 32)
    val idxs = Seq(build(a, IvfConfig(lists = 2)), build(b, IvfConfig(lists = 2)))
    val q = Array.fill(8)(0.1f)
    val got = IvfIndex.searchManyMulti(idxs, Array(0L -> q), k = 6,
        probes = 2, refine = 50)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    // brute expectation FOLDED per id (keep min distance) — the output
    // contract: an id colliding across roots occupies one slot with its
    // best distance, never two (same as the gen+delta fold)
    val want = (a ++ b).map { case (id, v) => (K.l2(v.toArray, q), id) }
      .groupBy(_._2).valuesIterator.map(_.min).toSeq
      .sorted.take(6)
    assert(got.map(t => (t._3, t._2)).toSeq == want,
      "distances must rank over BOTH roots' rows even with colliding ids, " +
      s"one slot per id: got=${got.toSeq} want=$want")
  }

  test("an id whose BOTH copies would land in top-k folds to one slot " +
       "with the cross-root best distance") {
    import spark.implicits._
    // planted fixture: id 5 is the nearest row in BOTH roots — distances
    // 0 (root A) and ~0.28 (root B), both inside any unfolded top-3 over
    // the far-away fillers — so a fold-free merge WOULD emit id 5 twice
    val q = Array.fill(8)(0.5f)
    val far = (10L until 40L).map(i =>
      (i, Seq.fill(8)(3.0f + (i % 5) * 0.5f)))
    val a = (5L, Seq.fill(8)(0.5f)) +: far
    val b = (5L, Seq.fill(8)(0.6f)) +: far.map { case (i, v) => (i + 100, v) }
    val idxs = Seq(build(a, IvfConfig(lists = 2)), build(b, IvfConfig(lists = 2)))
    val got = IvfIndex.searchManyMulti(idxs, Array(0L -> q), k = 3,
        probes = 2, refine = 50)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    assert(got.map(_._2).count(_ == 5L) == 1,
      s"id 5 must occupy exactly one slot: ${got.toSeq}")
    assert(got.head._2 == 5L && got.head._3 < 1e-6,
      s"the folded slot must carry the cross-root BEST distance (root A's " +
      s"exact hit), not root B's: ${got.toSeq}")
    // remaining slots: the nearest fillers, not id 5's second copy
    assert(got.map(_._2).distinct.length == got.length, s"dup ids: ${got.toSeq}")
  }

  test("STORAGE-mixed corpora (f32 + f16 children) serve by homogeneous " +
       "group — brute-exact within each tier's store, 2 x G flat jobs") {
    import spark.implicits._
    val f32parts = Seq(corpus(100, 0, 41), corpus(100, 1000, 43))
    val f16part = corpus(100, 2000, 42)
    val idxs =
      f32parts.map(build(_, IvfConfig(lists = 2, storage = "f32"))) :+
      build(f16part, IvfConfig(lists = 2, storage = "f16"))
    val rng = new scala.util.Random(45)
    val queries = Array.tabulate(4)(i =>
      (i.toLong, Array.fill(8)(rng.nextFloat() * 2 - 1)))
    // warm (relation/listing caches + codegen), then count jobs: two
    // homogeneous groups -> 2 x 2 flat jobs
    IvfIndex.searchManyMulti(idxs, queries, k = 6, probes = 2, refine = 50)
      .collect()
    val jobs0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).maxOption.getOrElse(-1)
    val got = IvfIndex.searchManyMulti(idxs, queries, k = 6, probes = 2,
        refine = 50)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    val jobs1 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).maxOption.getOrElse(-1)
    assert(jobs1 - jobs0 == 4,
      s"mixed-storage batch must cost 2 jobs per homogeneous group " +
      s"(2 groups here), got ${jobs1 - jobs0}")
    // brute over each child's TIER store: f16 children roundtrip through
    // half floats, f32 children rank raw
    val cmp = f32parts.flatten.map { case (id, v) => (id, v.toSeq) } ++
      f16part.map { case (id, v) =>
        (id, graft.core.Half.decodeBytes(
          graft.core.Half.encodeBytes(v.toArray)).toSeq)
      }
    queries.foreach { case (qid, q) =>
      val want = cmp.map { case (id, v) => (K.l2(v.toArray, q), id) }
        .sorted.take(6)
      assert(got(qid).map(_._2).toSeq == want.map(_._2),
        s"qid=$qid ids diverged: got=${got(qid).toSeq} want=$want")
      got(qid).map(_._3).zip(want.map(_._1)).foreach { case (d, w) =>
        assert(math.abs(d - w) < 1e-6, s"qid=$qid dist $d vs $w")
      }
    }
  }

  test("METRIC-mixed children are refused loudly (distances cannot merge)") {
    val idxs = Seq(
      build(corpus(60, 0, 41), IvfConfig(lists = 2, metric = "l2")),
      build(corpus(60, 100, 42), IvfConfig(lists = 2, metric = "negdot")))
    val e = intercept[IllegalArgumentException](
      IvfIndex.searchManyMulti(idxs, Array(0L -> Array.fill(8)(0.1f)), 3))
    assert(e.getMessage.contains("metric"), e.getMessage)
  }

  test("an id living in both gen and delta (append-without-delete) " +
       "occupies ONE slot with its best distance — distinct ids per query") {
    import spark.implicits._
    val rows = corpus(100, 0, 51)
    val idx = build(rows, IvfConfig(lists = 2))
    // re-append id 7 with a vector far from everything: the ORIGINAL row
    // must still win its slot, and 7 must not appear twice
    idx.appendDelta(Seq((7L, Seq.fill(8)(3.0f))).toDF("id", "vec"), "id", "vec")
    val other = build(corpus(100, 1000, 52), IvfConfig(lists = 2))
    val q = rows.find(_._1 == 7L).get._2.toArray
    val got = IvfIndex.searchManyMulti(Seq(idx, other), Array(0L -> q),
        k = 5, probes = 2, refine = 50)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    assert(got.map(_._2).distinct.length == got.length,
      s"duplicate ids in one query's top-k: ${got.toSeq}")
    assert(got.head._2 == 7L && got.head._3 < 1e-6,
      s"id 7 must surface once, scored from its ORIGINAL (nearest) row: " +
      s"${got.toSeq}")
  }

  test("pool budget refuses loudly instead of collecting unbounded") {
    val idxs = Seq(build(corpus(60, 0, 61), IvfConfig(lists = 2)))
    graft.core.Confs.withConfs(spark, "graft.ann.batch.maxPoolTuples" -> "10") {
      val e = intercept[IllegalArgumentException](
        IvfIndex.searchManyMulti(idxs,
          Array(0L -> Array.fill(8)(0.1f), 1L -> Array.fill(8)(0.2f)),
          k = 5, refine = 8))
      assert(e.getMessage.contains("maxPoolTuples"), e.getMessage)
    }
  }

  test("codes-only children rerank-in-TABLE: exact rows from the source " +
       "table's original vectors (searchMany's in-table semantics)") {
    import spark.implicits._
    val parts = Seq(corpus(120, 0, 71), corpus(120, 1000, 72))
    val all = parts.flatten
    val src = all.toDF("id", "vec")
    val idxs = parts.map { part =>
      val idx = build(part, IvfConfig(lists = 4))
      // codes-only copy: the storeVectors rerank path is gone
      idx.dropVectors(Files.createTempDirectory("graft-smm-novec").toString)
    }
    // without a rerank table: loud refusal
    val e = intercept[IllegalArgumentException](
      IvfIndex.searchManyMulti(idxs, Array(0L -> Array.fill(8)(0.1f)), 3))
    assert(e.getMessage.contains("rerankTable"), e.getMessage)
    val rng = new scala.util.Random(77)
    val queries = Array.tabulate(4)(i =>
      (i.toLong, Array.fill(8)(rng.nextFloat() * 2 - 1)))
    val got = IvfIndex.searchManyMulti(idxs, queries, k = 6, probes = 4,
        refine = 50, rerankTable = Some((src, "id", "vec")))
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap
    queries.foreach { case (qid, q) =>
      val want = brute(all, q, 6, "l2").map(_._1)
      assert(got(qid) == want, s"qid=$qid: got=${got(qid)} want=$want")
    }
  }
}
