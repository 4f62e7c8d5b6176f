package graft.index

import graft.SparkSpec
import graft.core.{VectorKernels => K}
import java.nio.file.Files

/**
 * Graph-index behavior — mirrors the reference's vchordg test shape
 * (tests/vchordg/: build+query smoke, recall floor, vacuum).
 */
class VamanaGraphSpec extends SparkSpec {

  private lazy val data: Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(77)
    (0L until 1000L).map(i => i -> Array.fill(16)(rng.nextFloat() * 2 - 1))
  }

  private def brute(q: Array[Float], k: Int): Seq[Long] =
    data.map { case (id, v) => (K.l2(v, q), id) }.sortBy(identity).take(k).map(_._2)

  private lazy val graph = VamanaGraph.build(
    data.map(_._1).toArray, data.map(_._2).toArray, VamanaConfig(m = 24))

  test("degree cap respected; graph connected enough to search") {
    val (maxDeg, avgDeg) = graph.degreeStats
    assert(maxDeg <= 24, s"max degree $maxDeg")
    assert(avgDeg > 2.0, s"avg degree $avgDeg")
  }

  test("beam-search recall >= 0.9 over 20 queries (ef=64)") {
    val rng = new scala.util.Random(3)
    val recalls = (0 until 20).map { _ =>
      val q = Array.fill(16)(rng.nextFloat() * 2 - 1)
      val got = graph.search(q, 10).map(_._1).toSet
      val want = brute(q, 10).toSet
      got.intersect(want).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall $mean")
  }

  test("build is deterministic") {
    val g2 = VamanaGraph.build(
      data.map(_._1).toArray, data.map(_._2).toArray, VamanaConfig(m = 24))
    assert(graph.adj.zip(g2.adj).forall { case (a, b) => a.sameElements(b) })
    assert(graph.medoid == g2.medoid)
  }

  test("save/load round-trips and searches identically") {
    val dir = Files.createTempDirectory("graft-vamana").toString
    graph.save(spark, dir)
    val loaded = VamanaGraph.load(spark, dir)
    val q = data.head._2
    assert(loaded.search(q, 5).toSeq == graph.search(q, 5).toSeq)
    assert(loaded.cfg == graph.cfg)
  }

  test("searchBatch over broadcast graph matches local search") {
    import spark.implicits._
    val queries = data.take(5).map { case (id, v) => (id, v) }.toArray
    val got = graph.searchBatch(spark, queries, 3)
      .select("qid", "id", "rn").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    queries.foreach { case (qid, q) =>
      assert(got(qid) == graph.search(q, 3).map(_._1).toSeq, s"query $qid")
    }
  }

  test("self is its own nearest neighbor for most points") {
    val rng = new scala.util.Random(8)
    val hits = (0 until 50).count { _ =>
      val (id, v) = data(rng.nextInt(data.size))
      graph.search(v, 1).headOption.exists(_._1 == id)
    }
    assert(hits >= 45, s"$hits/50 self-hits")
  }

  test("delete + rebuild removes vertices (vacuum semantics)") {
    val dead = (0L until 100L).toSet
    val g2 = VamanaGraph.deleteAndRebuild(graph, dead)
    assert(g2.ids.length == 900)
    val q = data(5)._2 // vec of a deleted id
    assert(g2.search(q, 10).forall { case (id, _) => !dead.contains(id) })
  }
}
