package graft.ops

import graft.SparkSpec
import graft.core.{VectorKernels => K}

/**
 * Distributed MaxSim vs the scalar kernel — mirrors the reference's
 * multivector golden-ordering test shape (reference:
 * tests/vchordrq/multivector.slt:28-52: unit-circle token vectors, exact
 * expected id ordering).
 */
class MaxSimSpec extends SparkSpec {

  // 200 docs, 3 unit-circle dim-2 token vectors each (multivector.slt shape)
  private def tok(docId: Long, salt: Long): Array[Float] = {
    val angle = 2 * math.Pi * ((docId + salt) % 200L).toDouble / 200.0
    Array(math.cos(angle).toFloat, math.sin(angle).toFloat)
  }
  private lazy val docs: Seq[(Long, Array[Array[Float]])] =
    (0L until 200L).map(i => i -> Array(tok(i, 0), tok(i, 22), tok(i, 77)))

  private val query: Array[Array[Float]] = Array(tok(137L, 0), tok(137L, 22))

  test("aggregator matches scalar kernel on every doc, any partitioning") {
    import spark.implicits._
    val exploded = docs.flatMap { case (id, toks) => toks.map(t => (id, t.toSeq)) }
      .toDF("doc", "v").repartition(7)
    val got = MaxSim.score(exploded, "doc", "v", query)
      .as[(Long, Double)].collect().toMap
    docs.foreach { case (id, toks) =>
      assert(got(id) == K.maxsim(toks, query), s"doc $id")
    }
  }

  test("approximate MaxSim via token index recovers the exact top docs") {
    import spark.implicits._
    val tokens = docs.flatMap { case (id, toks) =>
      toks.zipWithIndex.map { case (t, p) => (id, p, t.toSeq) }
    }.toDF("doc", "pos", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft-maxsim-idx").toString
    val idx = MaxSim.buildTokenIndex(tokens, "doc", "pos", "v", dir,
      graft.index.IvfConfig(metric = "negdot", lists = 8, residual = false))
    val approx = MaxSim.approxTopK(idx, query, 10,
        kPerToken = 200, probes = 8, refine = 32)
      .select("doc").as[Long].collect().toSet
    val exactPairs = docs.map { case (id, toks) => (K.maxsim(toks, query), id) }
      .sorted.take(10)
    val exact = exactPairs.map(_._2).toSet
    val overlap = approx.intersect(exact).size
    assert(overlap >= 8, s"top-10 overlap $overlap; approx=$approx exact=$exact")
    // maxsim_refine semantics: exact rescoring of the candidate docs makes
    // the top-k EXACT (scores and ordering) when the candidate pool covers
    // the true top docs
    val refined = MaxSim.approxTopK(idx, query, 10,
        kPerToken = 200, probes = 8, refine = 32, refineDocs = 40)
      .as[(Long, Double)].collect().toSeq
    assert(refined == exactPairs.map { case (s, id) => (id, s) },
      s"refined=$refined exact=$exactPairs")
  }

  test("packKey/unpackDoc round-trip (u16 position payload)") {
    assert(MaxSim.unpackDoc(MaxSim.packKey(123456L, 65535)) == 123456L)
    assert((MaxSim.packKey(7L, 3) & 0xffffL) == 3L)
    assertThrows[IllegalArgumentException](MaxSim.packKey(1L, 65536))
  }

  test("topK orders by ascending score with doc tie-break") {
    import spark.implicits._
    val exploded = docs.flatMap { case (id, toks) => toks.map(t => (id, t.toSeq)) }
      .toDF("doc", "v")
    val got = MaxSim.topK(exploded, "doc", "v", query, 18)
      .select("doc").as[Long].collect().toSeq
    val want = docs.map { case (id, toks) => (K.maxsim(toks, query), id) }
      .sorted.take(18).map(_._2)
    assert(got == want) // golden exact ordering, multivector.slt-style
  }
}
