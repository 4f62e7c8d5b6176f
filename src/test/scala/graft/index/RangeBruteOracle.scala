package graft.index

import graft.core.{VectorKernels => K}

/** Shared tier-adjusted brute range oracle for the batched-range specs
  * (`RangeSearchManyMultiSpec`, `RangeManyMultiFuzzSpec`): ONE
  * implementation of the store contract — cosdist preps BOTH sides
  * (rows normalize at ingest, the query in prepQuery; distance is then
  * 1 + negdot), f16 roundtrips stored vectors through half floats — so
  * a tier-contract change cannot silently fork the two specs' oracles. */
object RangeBruteOracle {
  def brute(all: Seq[(Long, Seq[Float])], q: Array[Float], r: Double,
            metric: String, storage: String): Seq[(Long, Double)] = {
    val qn =
      if (metric == "cosdist") {
        val n = math.sqrt(K.dot(q, q))
        if (n > 0) q.map(x => (x / n).toFloat) else q
      } else q
    all.flatMap { case (id, v) =>
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
      val d = metric match {
        case "l2"      => K.l2(a1, qn)
        case "negdot"  => K.negdot(a1, qn)
        case "cosdist" => 1.0 + K.negdot(a1, qn)
      }
      if (d < r) Some((id, d)) else None
    }.sortBy(t => (t._2, t._1))
  }
}
