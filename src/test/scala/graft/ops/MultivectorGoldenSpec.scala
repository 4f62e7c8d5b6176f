package graft.ops

import graft.SparkSpec

/**
 * Exact golden-ordering parity with the reference's multivector corpus
 * (reference: tests/vchordrq/multivector.slt:1-52): 10 000 docs, three
 * unit-circle dim-2 token vectors at angles 2π·((id+{0,22,777}) % 10000)
 * / 10000, queried with the two fixed vectors from the test — the top-18
 * ids must come back in the reference's exact order.
 */
class MultivectorGoldenSpec extends SparkSpec {

  private val TwoPi = 6.283185307179586

  private def tok(id: Int, off: Int): Seq[Float] = {
    val a = ((id + off) % 10000) / 10000.0 * TwoPi
    Seq(math.cos(a).toFloat, math.sin(a).toFloat)
  }

  test("top-18 by @# matches multivector.slt golden ordering") {
    import spark.implicits._
    val tokens = (1 to 10000).flatMap { id =>
      Seq(0, 22, 777).map(off => (id.toLong, tok(id, off)))
    }.toDF("doc", "v")
    val query = Array(
      Array(0.7197411498053302f, 0.6942425205048314f),
      Array(0.10645067063129976f, 0.9943179847122079f))
    val got = MaxSim.topK(tokens, "doc", "v", query, 18)
      .select("doc").as[Long].collect().toSeq
    val golden = Seq(1387L, 1388L, 1386L, 1389L, 1385L, 1390L, 1384L, 1391L,
      1383L, 1392L, 1382L, 1393L, 1381L, 1394L, 1380L, 1395L, 1379L, 1396L)
    assert(got == golden, s"got $got")
  }
}
