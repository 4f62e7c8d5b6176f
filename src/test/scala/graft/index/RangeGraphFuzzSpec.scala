package graft.index

import graft.SparkSpec
import graft.core.{VectorKernels => K}

/**
 * Seeded fuzz over the GRAPH-tier range search (strategy-2 sphere,
 * round 17): random (metric, quantization, ef, radius) trials with two
 * invariants per trial —
 *   1. NO INVENTED HITS: on exact graphs every returned (id, dist) is a
 *      true strict-< member at its exact distance, at ANY ef (the
 *      best-effort contract only permits misses, never false hits);
 *   2. EXACT AT SATURATION: at ef >= graph size the result equals the
 *      brute-force strict-< membership — on quantized graphs through
 *      the ε-bounded candidate walk + exact rerank of
 *      rangeSearchManyMulti.
 * Plus a sharded-tier parity trial per metric.
 */
class RangeGraphFuzzSpec extends SparkSpec {

  private val dim = 12
  private val n = 400

  private def mkData(seed: Int): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(seed)
    (0L until n.toLong).map(i => i -> Array.fill(dim)(rng.nextFloat() * 2 - 1))
  }

  private def metricFn(m: String): (Array[Float], Array[Float]) => Double =
    m match {
      case "l2"      => K.l2
      case "negdot"  => K.negdot
      case "cosdist" => K.cosdist
    }

  test("24 seeded trials: no invented hits at any ef; exact at saturating ef") {
    val s = spark
    import s.implicits._
    val data = mkData(4049)
    val rng = new scala.util.Random(811)
    val graphs = Seq("l2", "negdot", "cosdist").flatMap { m =>
      Seq(0, 8).map { bits =>
        (m, bits, VamanaGraph.build(data.map(_._1).toArray,
          data.map(_._2).toArray, VamanaConfig(m = 20, metric = m, bits = bits)))
      }
    }
    val src = data.map { case (i, v) => (i, v.toSeq) }.toDF("id", "vec")
    (1 to 24).foreach { trial =>
      val (metric, bits, g) = graphs(rng.nextInt(graphs.size))
      val fn = metricFn(metric)
      val q = Array.fill(dim)(rng.nextFloat() * 2 - 1)
      // radius from a random data point's distance: spheres range from
      // a handful of hits to most of the corpus, and sitting exactly AT
      // a stored distance stresses the strict-< cutoff
      val anchor = data(rng.nextInt(n))._2
      val r = fn(anchor, q) * (0.6 + rng.nextDouble() * 0.8)
      val want = data.map { case (id, v) => (id, fn(v, q)) }
        .filter(_._2 < r).sortBy(t => (t._2, t._1))
      if (bits == 0) {
        // exact graph: any-ef subset with true distances...
        val ef = 1 + rng.nextInt(2 * n)
        val got = g.rangeSearch(q, r, ef)
        val wantMap = want.toMap
        got.foreach { case (id, d) =>
          assert(wantMap.contains(id),
            s"trial $trial ($metric ef=$ef r=$r): invented hit $id")
          assert(math.abs(d - wantMap(id)) < 1e-9)
        }
        // ...and full equality at saturation
        val sat = g.rangeSearch(q, r, ef = n)
        assert(sat.map(_._1).toSeq == want.map(_._1),
          s"trial $trial ($metric saturated) mismatch")
      } else {
        // quantized: the reranked batch face is exact at saturation
        val got = VamanaGraph.rangeSearchManyMulti(spark, Seq(g),
            Array((0L, q, r)), ef = n, rerankTable = Some((src, "id", "vec")))
          .as[(Long, Long, Double)].collect()
          .map(t => (t._2, t._3)).sortBy(t => (t._2, t._1))
        assert(got.map(_._1).toSeq == want.map(_._1),
          s"trial $trial ($metric bits=8 saturated) mismatch: " +
          s"got ${got.length} want ${want.length}")
      }
    }
  }

  test("sharded parity: distributed range equals driver-graph range at saturation") {
    val s = spark
    import s.implicits._
    val data = mkData(4051)
    val df = data.map { case (i, v) => (i, v.toSeq) }.toDF("id", "vec")
    val rng = new scala.util.Random(823)
    Seq("l2", "cosdist").foreach { m =>
      val d = java.nio.file.Files.createTempDirectory(s"rgf-sh-$m").toString
      ShardedVamana.build(df, "id", "vec", d,
        VamanaConfig(m = 20, metric = m), shards = 4)
      val h = ShardedVamana.load(spark, d)
      try {
        val fn = metricFn(m)
        val queries = Array.tabulate(3) { i =>
          val q = Array.fill(dim)(rng.nextFloat() * 2 - 1)
          val r = fn(data(rng.nextInt(n))._2, q) * (0.8 + rng.nextDouble() * 0.4)
          (i.toLong, q, r)
        }
        val got = h.rangeSearch(spark, queries, ef = n)
          .as[(Long, Long, Double)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
        queries.foreach { case (qid, q, r) =>
          val want = data.map { case (id, v) => (id, fn(v, q)) }
            .filter(_._2 < r).map(_._1).sorted
          assert(got.getOrElse(qid, Nil) == want, s"$m qid $qid")
        }
      } finally h.unpersist()
    }
  }
}
