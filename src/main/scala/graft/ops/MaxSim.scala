package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.core.{VectorKernels => K}

/**
 * Distributed MaxSim (`@#`) over exploded multivectors — the scale shape
 * of the reference's multi-vector scan (reference:
 * src/index/vchordrq/scanners/maxsim.rs; score = sum over query tokens of
 * min over doc tokens of negdot, per
 * src/datatype/operators_rabitq8.rs:123-139).
 *
 * Docs arrive as one row per token `(doc, token_vec)` (the reference
 * explodes vector arrays the same way, opclass.rs:91-141). The Aggregator
 * keeps, per doc, the running minimum negdot against EACH query token —
 * a fixed-width Array[Double] buffer — so Spark's partial aggregation
 * (map-side combine) does the heavy lifting and the shuffle carries one
 * small buffer per (partition, doc), never the token sets. Min is
 * associative/commutative and the final sum runs in fixed query order:
 * byte-for-byte deterministic under any partitioning.
 */
object MaxSim {

  /** Aggregator over token vectors: buffer = per-query-token min negdot. */
  final class MaxSimAgg(query: Array[Array[Float]])
      extends Aggregator[Seq[Float], Array[Double], Double] {
    override def zero: Array[Double] = Array.fill(query.length)(Double.PositiveInfinity)
    override def reduce(buf: Array[Double], tok: Seq[Float]): Array[Double] = {
      val t = tok.toArray
      var qi = 0
      while (qi < query.length) {
        val nd = K.negdot(t, query(qi))
        if (nd < buf(qi)) buf(qi) = nd
        qi += 1
      }
      buf
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < buf.length) { if (buf(i) != Double.PositiveInfinity) s += buf(i); i += 1 }
      s
    }
    override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /**
   * Score every doc in `tokens(docCol, vecCol)` (one row per token) against
   * `query`; output (doc, maxsim).
   */
  def score(tokens: DataFrame, docCol: String, vecCol: String,
            query: Array[Array[Float]]): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.select(col(docCol).cast("long").as("doc"), col(vecCol).as("v"))
      .as[(Long, Seq[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new MaxSimAgg(query).toColumn.name("maxsim"))
      .toDF("doc", "maxsim")
  }

  /** Top-k most similar docs (ascending score = most similar first). */
  def topK(tokens: DataFrame, docCol: String, vecCol: String,
           query: Array[Array[Float]], k: Int): DataFrame =
    score(tokens, docCol, vecCol, query)
      .orderBy(col("maxsim"), col("doc")).limit(k)
}
