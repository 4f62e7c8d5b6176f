package graft.index

import graft.SparkSpec
import graft.core.{VectorKernels => K}
import java.nio.file.Files

/**
 * Seeded fuzz of MAINTENANCE x SERVE interleavings over multi-root
 * corpora (the round-13 flat-read cache races were found by review, not
 * by a harness — this pins the staleness/visibility contract
 * mechanically, the PostingsCrashSpec determinism pattern): each seed
 * draws a sequence of appendDelta / re-append / delete / compact ops
 * across 2 roots, and after EVERY op both batched serve faces
 * ([[IvfIndex.searchManyMulti]], [[IvfIndex.rangeSearchManyMulti]])
 * must equal a brute-force run over the quiesced driver-side model of
 * the indexes' logical contents. A stale dirListing, a missed delta, or
 * a torn generation view diverges immediately at the step that broke.
 *
 * The one-cycle generation-retention contract (old-gen dirs survive one
 * rewrite for live readers) is pinned separately and deterministically:
 * a LAZY serve plan built before a delete-rewrite still collects — and
 * returns the snapshot its pinned files describe.
 */
class MaintenanceServeFuzzSpec extends SparkSpec {

  private val dim = 8

  private def vec(rng: scala.util.Random): Array[Float] =
    Array.fill(dim)(rng.nextFloat() * 2 - 1)

  /** Driver-side quiesced model: per root, id -> every stored row's
    * vector (a re-appended id holds BOTH rows until a rewrite folds). */
  private type Model = Seq[scala.collection.mutable.Map[Long, List[Array[Float]]]]

  private def bruteTopK(model: Model, q: Array[Float], k: Int): Seq[(Long, Double)] =
    model.flatMap(_.iterator.map { case (id, rows) =>
      // the searchManyMulti fold: one slot per id, best row wins
      (rows.map(v => K.l2(v, q)).min, id)
    }).sorted.take(k).map(t => (t._2, t._1))

  private def bruteRange(model: Model, c: Array[Float], r: Double): Seq[(Long, Double)] =
    model.flatMap(_.iterator.flatMap { case (id, rows) =>
      // range emits every stored ROW independently (gen+delta double
      // rows both pass the exact cutoff honestly)
      rows.flatMap { v =>
        val d = K.l2(v, c)
        if (d < r) Some((id, d)) else None
      }
    }).sortBy(t => (t._2, t._1))

  private def checkStep(idxs: Seq[IvfIndex], model: Model,
                        rng: scala.util.Random, tag: String): Unit = {
    import spark.implicits._
    if (rng.nextBoolean()) {
      val qs = Array.tabulate(2)(i => (i.toLong, vec(rng)))
      val got = IvfIndex.searchManyMulti(idxs, qs, k = 6, probes = 2,
          refine = 50)
        .as[(Long, Long, Double, Long)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._4).map(t => (t._2, t._3)).toSeq).toMap
      qs.foreach { case (qid, q) =>
        val want = bruteTopK(model, q, 6)
        val g = got.getOrElse(qid, Nil)
        assert(g.map(_._1) == want.map(_._1),
          s"[$tag] searchManyMulti qid=$qid ids diverged from the " +
          s"quiesced model: got=$g want=$want")
        g.map(_._2).zip(want.map(_._2)).foreach { case (d, w) =>
          assert(math.abs(d - w) < 1e-6, s"[$tag] qid=$qid dist $d vs $w")
        }
      }
    } else {
      val c = vec(rng)
      val r = 1.0 + rng.nextDouble() * 0.6
      val got = IvfIndex.rangeSearchManyMulti(idxs, Array((0L, c, r)))
        .as[(Long, Long, Double)].collect()
        .map(t => (t._2, t._3)).sortBy(t => (t._2, t._1)).toSeq
      val want = bruteRange(model, c, r)
      assert(got.map(_._1) == want.map(_._1),
        s"[$tag] rangeSearchManyMulti rows diverged from the quiesced " +
        s"model: got=$got want=$want")
      got.map(_._2).zip(want.map(_._2)).foreach { case (d, w) =>
        assert(math.abs(d - w) < 1e-6, s"[$tag] dist $d vs $w")
      }
    }
  }

  private def runSeed(seed: Int): Unit = {
    import spark.implicits._
    val rng = new scala.util.Random(900 + seed)
    val model: Model = Seq.fill(2)(scala.collection.mutable.Map.empty)
    val idxs = (0 until 2).map { r =>
      val rows = (0 until 50).map(i => ((r * 1000 + i).toLong, vec(rng)))
      rows.foreach { case (id, v) => model(r)(id) = List(v) }
      IvfIndex.build(rows.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec"),
        "id", "vec",
        Files.createTempDirectory(s"graft-msf-$seed-$r").toString,
        IvfConfig(lists = 2))
    }
    var nextId = 5000L + seed * 100
    (0 until 3).foreach { step =>
      val r = rng.nextInt(2)
      val ix = idxs(r)
      rng.nextInt(4) match {
        case 0 => // append FRESH rows through the served instance
          val rows = (0 until 5).map { _ =>
            val id = nextId; nextId += 1; (id, vec(rng))
          }
          ix.appendDelta(rows.map { case (id, v) => (id, v.toSeq) }
            .toDF("id", "vec"), "id", "vec")
          rows.foreach { case (id, v) => model(r)(id) = List(v) }
        case 1 => // RE-append an existing id (gen+delta double row)
          val id = model(r).keys.toSeq.sorted.apply(
            rng.nextInt(model(r).size))
          val v = vec(rng)
          ix.appendDelta(Seq((id, v.toSeq)).toDF("id", "vec"), "id", "vec")
          model(r)(id) = v :: model(r)(id)
        case 2 => // bulk delete (rewrite — folds delta, drops the ids)
          val ids = rng.shuffle(model(r).keys.toSeq.sorted).take(3)
          ix.delete(ids)
          ids.foreach(model(r).remove)
        case 3 => // compact (rewrite — no logical change)
          ix.compact()
          // a rewrite folds double rows to one row per id (best
          // semantics are moot: the fold keeps the LAST written row?
          // no — rewrite keeps every dataDf row; gen+delta double rows
          // BOTH survive into the new generation's files)
          ()
      }
      checkStep(idxs, model, rng, s"seed=$seed step=$step")
    }
  }

  test("50 seeds: every maintenance op x serve interleaving equals the " +
       "quiesced model at every step (2 roots, both batched faces)") {
    (0 until 50).foreach(runSeed)
  }

  test("one-cycle generation retention: a serve plan built BEFORE a " +
       "delete-rewrite still collects, returning its pinned snapshot") {
    import spark.implicits._
    val rng = new scala.util.Random(4242)
    val rowsA = (0 until 60).map(i => (i.toLong, vec(rng)))
    val rowsB = (0 until 60).map(i => ((1000 + i).toLong, vec(rng)))
    val idxs = Seq(rowsA, rowsB).zipWithIndex.map { case (rows, r) =>
      IvfIndex.build(rows.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec"),
        "id", "vec",
        Files.createTempDirectory(s"graft-msf-ret-$r").toString,
        IvfConfig(lists = 2))
    }
    val c = vec(rng)
    val radius = 1.5
    // LAZY plan: pins the pre-rewrite generation's FileStatuses
    val lazyDf = IvfIndex.rangeSearchManyMulti(idxs, Array((0L, c, radius)))
    val preWant = (rowsA ++ rowsB).flatMap { case (id, v) =>
      val d = K.l2(v, c)
      if (d < radius) Some((id, d)) else None
    }.sortBy(t => (t._2, t._1))
    // delete-rewrite root 0: CURRENT advances, the old generation is
    // retained ONE cycle for exactly this reader
    idxs.head.delete(rowsA.take(30).map(_._1))
    val got = lazyDf.as[(Long, Long, Double)].collect()
      .map(t => (t._2, t._3)).sortBy(t => (t._2, t._1)).toSeq
    assert(got.map(_._1) == preWant.map(_._1),
      "a pre-rewrite plan must serve its pinned snapshot (old generation " +
      s"retained one cycle): got=$got want=$preWant")
    // and a FRESH serve sees the post-delete truth
    val fresh = IvfIndex.rangeSearchManyMulti(idxs, Array((0L, c, radius)))
      .as[(Long, Long, Double)].collect().map(_._2).toSet
    assert(rowsA.take(30).map(_._1).forall(id => !fresh.contains(id)),
      "a fresh serve must see the delete")
  }
}
