package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

import graft.core.{RaBitQ, VectorKernels => K}

/**
 * User-visible vector function surface — the Spark analog of the
 * reference's scalar operator set (reference:
 * src/datatype/operators_rabitq8.rs, crates/vector/src/vect.rs:128-161,
 * sql/install/vchord--1.1.1.sql:760-928):
 *
 *   <->   vec_l2        Euclidean distance
 *   <#>   vec_negdot    negative inner product
 *   <=>   vec_cosdist   cosine distance
 *   <<->> sphere_l2     range predicate  (x <-> c < r, strict)
 *   <<#>> sphere_negdot range predicate
 *   <<=>> sphere_cos    range predicate
 *   @#    vec_maxsim    multi-vector MaxSim
 *         quantize_rabitq8/4, dequantize_rabitq8/4
 *         vec_to_text / vec_from_text ('[1,2,3]' pgvector text format)
 *
 * All distance UDFs accumulate in double precision so results are
 * engine-portable (see VectorKernels). Registered for SQL use via
 * `registerAll(spark)` with the same names.
 */
object GraftFunctions {

  /** Serialized quantized-vector struct (see RaBitQ). */
  final case class QCode(meta: Seq[Float], codes: Array[Byte], bits: Int, dim: Int)

  private def arr(a: Seq[Float]): Array[Float] = a.toArray

  val vecL2: UserDefinedFunction =
    udf((a: Seq[Float], b: Seq[Float]) => K.l2(arr(a), arr(b)))
  val vecNegdot: UserDefinedFunction =
    udf((a: Seq[Float], b: Seq[Float]) => K.negdot(arr(a), arr(b)))
  val vecCosdist: UserDefinedFunction =
    udf((a: Seq[Float], b: Seq[Float]) => K.cosdist(arr(a), arr(b)))
  val vecNorm: UserDefinedFunction =
    udf((a: Seq[Float]) => K.norm(arr(a)))
  val vecNormalize: UserDefinedFunction =
    udf((a: Seq[Float]) => K.normalize(arr(a)).toSeq)
  val vecMaxsim: UserDefinedFunction =
    udf((doc: Seq[Seq[Float]], q: Seq[Seq[Float]]) =>
      K.maxsim(doc.map(arr).toArray, q.map(arr).toArray))

  // Range ("similarity filter") predicates — plain Catalyst predicates, so
  // they pushdown/prune like any other filter (the reference needs a custom
  // index strategy for this; in Spark it is just a Filter node).
  def sphereL2Contains(x: Column, center: Column, radius: Column): Column =
    vecL2(x, center) < radius
  def sphereNegdotContains(x: Column, center: Column, radius: Column): Column =
    vecNegdot(x, center) < radius
  def sphereCosContains(x: Column, center: Column, radius: Column): Column =
    vecCosdist(x, center) < radius

  val quantizeRabitq8: UserDefinedFunction = udf { (a: Seq[Float]) =>
    val c = RaBitQ.quantize(arr(a), 8); QCode(c.meta.toSeq, c.codes, c.bits, c.dim)
  }
  val quantizeRabitq4: UserDefinedFunction = udf { (a: Seq[Float]) =>
    val c = RaBitQ.quantize(arr(a), 4); QCode(c.meta.toSeq, c.codes, c.bits, c.dim)
  }
  val dequantize: UserDefinedFunction = udf { (q: QCode) =>
    RaBitQ.dequantize(RaBitQ.Code(q.meta.toArray, q.codes, q.bits, q.dim)).toSeq
  }

  /** pgvector text format: '[1,2,3]' (reference: src/datatype/text_rabitq8.rs). */
  val vecToText: UserDefinedFunction = udf { (a: Seq[Float]) =>
    a.map(f => if (f == f.toLong.toFloat) f.toLong.toString else f.toString)
      .mkString("[", ",", "]")
  }
  val vecFromText: UserDefinedFunction = udf { (s: String) =>
    val t = s.trim
    require(t.startsWith("[") && t.endsWith("]"), s"bad vector literal: $s")
    val body = t.substring(1, t.length - 1).trim
    if (body.isEmpty) Seq.empty[Float]
    else body.split(",").toSeq.map(_.trim.toFloat)
  }

  /** Register everything for spark.sql(...) use. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("vec_l2", vecL2)
    spark.udf.register("vec_negdot", vecNegdot)
    spark.udf.register("vec_cosdist", vecCosdist)
    spark.udf.register("vec_norm", vecNorm)
    spark.udf.register("vec_normalize", vecNormalize)
    spark.udf.register("vec_maxsim", vecMaxsim)
    spark.udf.register("quantize_rabitq8", quantizeRabitq8)
    spark.udf.register("quantize_rabitq4", quantizeRabitq4)
    spark.udf.register("dequantize", dequantize)
    spark.udf.register("vec_to_text", vecToText)
    spark.udf.register("vec_from_text", vecFromText)
  }
}
