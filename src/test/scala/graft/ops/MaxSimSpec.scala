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
