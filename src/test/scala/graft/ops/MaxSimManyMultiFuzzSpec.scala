package graft.ops

import graft.SparkSpec
import graft.core.{VectorKernels => K}
import graft.index.IvfConfig
import java.nio.file.Files

/**
 * Seeded config-axis fuzz of [[MaxSim.maxsimManyMulti]]: each seed
 * draws roots, storage tier, rotation, doc/token shapes, batch size,
 * and budgets. Two invariants graded per seed:
 *
 *  - WHOLE-DOC SCORES AT ANY BUDGET: every reported (qid, doc, maxsim)
 *    row must equal the doc's true sum-min over ALL its stored tokens
 *    (the round-14 candidacy-fold contract — a token-subset score is a
 *    bug no matter how tight the estimate budgets are);
 *  - FULL COVERAGE = BRUTE: with probes/kPerToken/refine covering
 *    everything, the top-k doc SET and ordering equal brute force.
 */
class MaxSimManyMultiFuzzSpec extends SparkSpec {

  private def runSeed(seed: Int): Unit = {
    import spark.implicits._
    val rng = new scala.util.Random(8100 + seed)
    val storage = if (rng.nextBoolean()) "f32" else "f16"
    val rotate = rng.nextBoolean()
    val nRoots = 1 + rng.nextInt(3)
    val lists = 2 + rng.nextInt(3)
    val nDocs = 4 + rng.nextInt(5)
    val perDoc = 3 + rng.nextInt(5)
    val full = rng.nextBoolean() // full-coverage vs tight budgets
    // ~half the seeds SHARE doc ids across roots (each root holds its
    // own token rows for the same doc = a doc whose tokens split across
    // roots) — the geometry that makes the whole-doc-score invariant
    // able to catch a (root, doc)-gated candidacy regression; the other
    // half keep the disjoint partitioned-corpus norm
    val splitDocs = nRoots > 1 && rng.nextBoolean()
    // rerank-in-TABLE axis (round 15): ~half the seeds rescore from the
    // original token table (raw vectors, raw queries); of those, half
    // run CODES-ONLY children — the tier that REQUIRES the table
    val useRerank = rng.nextBoolean()
    val codesOnly = useRerank && rng.nextBoolean()
    val parts = (0 until nRoots).map { r =>
      val off = if (splitDocs) 0L else r * 100L
      for {
        d <- 0 until nDocs
        p <- 0 until perDoc
      } yield (off + d, p, Seq.fill(8)(rng.nextFloat() * 2 - 1))
    }
    val cfg = IvfConfig(metric = "negdot", lists = lists, storage = storage,
      rotate = rotate, storeVectors = !codesOnly)
    val idxs = parts.map { rows =>
      MaxSim.buildTokenIndex(rows.toDF("doc", "pos", "v"), "doc", "pos", "v",
        Files.createTempDirectory(s"graft-msmmf-$seed").toString, cfg)
    }
    val nQ = 1 + rng.nextInt(2)
    val qs = Array.tabulate(nQ)(i =>
      (i.toLong, Array.fill(1 + rng.nextInt(3))(
        Array.fill(8)(rng.nextFloat() * 2 - 1))))
    val k = 2 + rng.nextInt(3)
    val (kpt, prb, ref) =
      if (full) (256, Seq.fill(nRoots)(lists), 64)
      else (2 + rng.nextInt(4), Seq.fill(nRoots)(1 + rng.nextInt(lists)),
        1 + rng.nextInt(2))
    val src = parts.flatten.toDF("doc", "pos", "v")
    val got = MaxSim.maxsimManyMulti(idxs, qs, k, kPerToken = kpt,
        probes = prb, refine = ref,
        rerankTable = if (useRerank) Some((src, "doc", "v")) else None)
      .as[(Long, Long, Double)].collect()
    // brute whole-doc scores over the TIER store (f16 roundtrip; rotation
    // preserves dots, so raw vectors + raw queries are the truth). With a
    // rerank TABLE the truth is the ORIGINAL rows: raw f32 vectors, raw
    // queries — storage and rotation are index-internal there.
    def tierVec(v: Seq[Float]): Array[Float] = {
      val a = v.toArray
      if (useRerank) a
      else if (storage == "f16")
        graft.core.Half.decodeBytes(graft.core.Half.encodeBytes(
          // rotation happens BEFORE f16 storage: roundtrip the rotated
          // vector, then rotate back is impossible — so compare in the
          // rotated space instead when rotate is on
          if (rotate) new graft.core.Rotation(8)(a) else a))
      else if (rotate) new graft.core.Rotation(8)(a)
      else a
    }
    val rot = if (rotate && !useRerank) Some(new graft.core.Rotation(8)) else None
    def qTok(t: Array[Float]): Array[Float] =
      rot.map(_.apply(t)).getOrElse(t)
    val bruteScore: Map[(Long, Long), Double] = (for {
      (qid, toks) <- qs
      (doc, rows) <- parts.flatten.groupBy(_._1)
    } yield {
      val dts = rows.map(r => tierVec(r._3))
      val s = toks.map(t => dts.map(dt => K.negdot(dt, qTok(t))).min).sum
      (qid, doc) -> s
    }).toMap
    // invariant 1: every reported score is the WHOLE-doc truth
    got.foreach { case (qid, doc, s) =>
      val w = bruteScore((qid, doc))
      assert(math.abs(s - w) < 1e-6,
        s"[seed=$seed $storage rotate=$rotate roots=$nRoots full=$full] " +
        s"qid=$qid doc=$doc reported $s != whole-doc $w — a token-subset " +
        "score leaked through candidacy")
    }
    // invariant 2: at full coverage the top-k set + order is brute
    if (full) {
      val byQ = got.groupBy(_._1).view
        .mapValues(_.map(t => (t._3, t._2)).toSeq.sorted).toMap
      qs.foreach { case (qid, _) =>
        val want = bruteScore.collect { case ((q, d), s) if q == qid => (s, d) }
          .toSeq.sorted.take(k)
        assert(byQ.getOrElse(qid, Nil) == want,
          s"[seed=$seed full] qid=$qid diverged: ${byQ.getOrElse(qid, Nil)} " +
          s"vs $want")
      }
    }
  }

  test("20 seeds: whole-doc scores at any budget; brute equality at " +
       "full coverage — across storage/rotation/roots/budget axes") {
    (0 until 20).foreach(runSeed)
  }
}
