package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

import graft.core.{Half, RaBitQ, VectorKernels => K}

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

  import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

  // Hot distance functions are native Catalyst expressions with codegen
  // (see VecExpressions) — they stay inside WholeStageCodegen; identical
  // double-precision results to the kernel/UDF tier.
  def vecL2(a: Column, b: Column): Column = toCol(VecL2Expr(toExpr(a), toExpr(b)))
  def vecNegdot(a: Column, b: Column): Column = toCol(VecNegDotExpr(toExpr(a), toExpr(b)))
  def vecCosdist(a: Column, b: Column): Column = toCol(VecCosDistExpr(toExpr(a), toExpr(b)))
  /** Nearest-centroid index over a fixed codebook (cosine argmin). */
  def vecNearest(a: Column, centroids: Array[Array[Float]]): Column =
    toCol(VecNearestExpr(toExpr(a), centroids))
  def vecNorm(a: Column): Column = toCol(VecNormExpr(toExpr(a)))

  // Same metrics with the LEFT side in packed-f16 binary (the halfvec
  // STORAGE form, Half.encodeBytes) — decode-on-the-fly codegen, no
  // boxed UDF on the f16 rerank/range path.
  def vecL2Half(a: Column, b: Column): Column = toCol(VecL2HalfExpr(toExpr(a), toExpr(b)))
  def vecNegdotHalf(a: Column, b: Column): Column = toCol(VecNegDotHalfExpr(toExpr(a), toExpr(b)))
  def vecCosdistHalf(a: Column, b: Column): Column = toCol(VecCosDistHalfExpr(toExpr(a), toExpr(b)))

  val vecNormalize: UserDefinedFunction =
    udf((a: Seq[Float]) => K.normalize(arr(a)).toSeq)
  /** `@#` MaxSim — a native Expression so the ANN planner rule can match
    * `ORDER BY vec_maxsim(tokens, q) LIMIT k` (reference strategy 3). */
  def vecMaxsim(doc: Column, q: Column): Column = toCol(VecMaxSimExpr(toExpr(doc), toExpr(q)))

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

  // ---- distance operators over QUANTIZED columns (reference:
  // src/datatype/operators_rabitq8.rs:21-49, operators_rabitq4.rs:21-49):
  // both sides stay coded — no dequantize round-trip. One function per
  // metric serves both rabitq8 and rabitq4 (the QCode struct carries its
  // own bits; Postgres needs a function per type, Spark does not). ----

  private def qc(q: QCode): RaBitQ.Code =
    RaBitQ.Code(q.meta.toArray, q.codes, q.bits, q.dim)

  /** `<->` over coded vectors (reference `_vchord_rabitq8_operator_l2`). */
  val rabitqL2: UserDefinedFunction = udf((a: QCode, b: QCode) => RaBitQ.l2QQ(qc(a), qc(b)))
  /** `<#>` over coded vectors (reference `_vchord_rabitq8_operator_ip`). */
  val rabitqNegdot: UserDefinedFunction = udf((a: QCode, b: QCode) => RaBitQ.negdotQQ(qc(a), qc(b)))
  /** `<=>` over coded vectors (reference `_vchord_rabitq8_operator_cosine`,
    * mapped to this engine's 1-cos convention). */
  val rabitqCosdist: UserDefinedFunction = udf((a: QCode, b: QCode) => RaBitQ.cosdistQQ(qc(a), qc(b)))

  /** `qcode <<metric>> sphere(center: qcode, radius)` — the reference's
    * sphere operators over quantized types (operators_rabitq8.rs:52+). */
  def rabitqSphereContains(x: Column, sph: Column, metric: String): Column = metric match {
    case "l2"      => rabitqL2(x, sph.getField("center")) < sph.getField("radius")
    case "negdot"  => rabitqNegdot(x, sph.getField("center")) < sph.getField("radius")
    case "cosdist" => rabitqCosdist(x, sph.getField("center")) < sph.getField("radius")
    case m         => throw new IllegalArgumentException(s"unknown metric: $m")
  }

  // ---- halfvec (f16) surface: stored as Short bit patterns, widened to
  // f32 for math (reference: crates/vector/src/vect.rs:38-46) ----

  val vecToHalf: UserDefinedFunction =
    udf((a: Seq[Float]) => Half.encode(arr(a)).toSeq)
  val halfToVec: UserDefinedFunction =
    udf((h: Seq[Short]) => Half.decode(h.toArray).toSeq)
  val halfL2: UserDefinedFunction =
    udf((a: Seq[Short], b: Seq[Short]) => K.l2(Half.decode(a.toArray), Half.decode(b.toArray)))
  val halfNegdot: UserDefinedFunction =
    udf((a: Seq[Short], b: Seq[Short]) => K.negdot(Half.decode(a.toArray), Half.decode(b.toArray)))
  val halfCosdist: UserDefinedFunction =
    udf((a: Seq[Short], b: Seq[Short]) => K.cosdist(Half.decode(a.toArray), Half.decode(b.toArray)))

  // ---- sphere composite (reference sphere_* types + sphere() constructor,
  // sql/install/vchord--1.1.1.sql:730-748,900-910) ----

  /** `sphere(center, radius)` struct constructor. */
  def sphere(center: Column, radius: Column): Column =
    struct(center.as("center"), radius.as("radius"))

  /** `x <<metric>> sphere` — strict-< containment against a sphere struct. */
  def sphereContains(x: Column, sph: Column, metric: String): Column = metric match {
    case "l2"      => vecL2(x, sph.getField("center")) < sph.getField("radius")
    case "negdot"  => vecNegdot(x, sph.getField("center")) < sph.getField("radius")
    case "cosdist" => vecCosdist(x, sph.getField("center")) < sph.getField("radius")
    case m         => throw new IllegalArgumentException(s"unknown metric: $m")
  }

  // ---- quantized-type text format '(m0,m1,m2,m3)[c0,c1,...]'
  // (reference: src/datatype/text_rabitq8.rs:20-160) ----

  def qcodeToText(q: QCode): String = {
    val u = RaBitQ.unpack(RaBitQ.Code(q.meta.toArray, q.codes, q.bits, q.dim))
    q.meta.map(_.toString).mkString("(", ",", ")") + u.mkString("[", ",", "]")
  }

  def qcodeFromText(s: String, bits: Int): QCode = {
    val t = s.trim
    val mEnd = t.indexOf(')')
    require(t.startsWith("(") && mEnd > 0, s"bad rabitq literal: $s")
    val meta = t.substring(1, mEnd).split(",").map(_.trim.toFloat).toSeq
    require(meta.length == 4, s"expected 4 metadata floats, got ${meta.length}")
    val rest = t.substring(mEnd + 1).trim
    require(rest.startsWith("[") && rest.endsWith("]"), s"bad rabitq literal: $s")
    val body = rest.substring(1, rest.length - 1).trim
    val us = if (body.isEmpty) Array.empty[Int] else body.split(",").map(_.trim.toInt)
    val dim = us.length
    val codes =
      if (bits == 8) us.map(_.toByte)
      else {
        val out = new Array[Byte]((dim + 1) / 2)
        var i = 0
        while (i < dim) {
          if ((i & 1) == 0) out(i / 2) = us(i).toByte
          else out(i / 2) = (out(i / 2) | (us(i) << 4)).toByte
          i += 1
        }
        out
      }
    QCode(meta, codes, bits, dim)
  }

  val qcodeToTextUdf: UserDefinedFunction = udf((q: QCode) => qcodeToText(q))
  def qcodeFromTextUdf(bits: Int): UserDefinedFunction =
    udf((s: String) => qcodeFromText(s, bits))

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
    val reg = spark.sessionState.functionRegistry
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    def bin(name: String, f: (org.apache.spark.sql.catalyst.expressions.Expression,
                              org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      reg.registerFunction(FunctionIdentifier(name),
        new ExpressionInfo(classOf[VecL2Expr].getName, name),
        exprs => { require(exprs.length == 2, s"$name takes 2 arguments"); f(exprs(0), exprs(1)) })
    bin("vec_l2", VecL2Expr.apply)
    bin("vec_negdot", VecNegDotExpr.apply)
    bin("vec_cosdist", VecCosDistExpr.apply)
    bin("vec_maxsim", VecMaxSimExpr.apply)
    bin("vec_l2_half", VecL2HalfExpr.apply)
    bin("vec_negdot_half", VecNegDotHalfExpr.apply)
    bin("vec_cosdist_half", VecCosDistHalfExpr.apply)
    reg.registerFunction(FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNormExpr].getName, "vec_norm"),
      exprs => { require(exprs.length == 1, "vec_norm takes 1 argument"); VecNormExpr(exprs.head) })
    spark.udf.register("vec_normalize", vecNormalize)
    spark.udf.register("vec_to_half", vecToHalf)
    spark.udf.register("half_to_vec", halfToVec)
    spark.udf.register("half_l2", halfL2)
    spark.udf.register("half_negdot", halfNegdot)
    spark.udf.register("half_cosdist", halfCosdist)
    spark.udf.register("quantize_rabitq8", quantizeRabitq8)
    spark.udf.register("quantize_rabitq4", quantizeRabitq4)
    spark.udf.register("dequantize", dequantize)
    spark.udf.register("rabitq_l2", rabitqL2)
    spark.udf.register("rabitq_negdot", rabitqNegdot)
    spark.udf.register("rabitq_cosdist", rabitqCosdist)
    spark.udf.register("vec_to_text", vecToText)
    spark.udf.register("vec_from_text", vecFromText)
    // text/curation expressions — literal config args are folded at
    // registration-call time (they configure the generated code)
    def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
               what: String): Int = {
      require(e.foldable, s"$what must be a literal")
      e.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"$what must be an integer literal, got $other")
      }
    }
    def litBool(e: org.apache.spark.sql.catalyst.expressions.Expression,
                what: String): Boolean = {
      require(e.foldable, s"$what must be a literal")
      e.eval().asInstanceOf[Boolean]
    }
    def litStr(e: org.apache.spark.sql.catalyst.expressions.Expression,
               what: String): String = {
      require(e.foldable, s"$what must be a literal")
      String.valueOf(e.eval())
    }
    reg.registerFunction(FunctionIdentifier("token_shingles"),
      new ExpressionInfo(classOf[TokenShinglesExpr].getName, "token_shingles"),
      exprs => {
        require(exprs.length == 2, "token_shingles(tokens, n)")
        TokenShinglesExpr(exprs(0), litInt(exprs(1), "token_shingles n"))
      })
    reg.registerFunction(FunctionIdentifier("token_stats"),
      new ExpressionInfo(classOf[TokenStatsExpr].getName, "token_stats"),
      exprs => {
        require(exprs.length == 1, "token_stats(tokens)")
        TokenStatsExpr(exprs.head)
      })
    reg.registerFunction(FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeTextExpr].getName, "normalize_text"),
      exprs => {
        require(exprs.nonEmpty && exprs.length <= 4,
          "normalize_text(text[, form[, lower[, strip_accents]]])")
        NormalizeTextExpr(exprs.head,
          if (exprs.length > 1) litStr(exprs(1), "normalize_text form") else "nfc",
          if (exprs.length > 2) litBool(exprs(2), "normalize_text lower") else true,
          if (exprs.length > 3) litBool(exprs(3), "normalize_text strip_accents") else false)
      })
    reg.registerFunction(FunctionIdentifier("token_tf"),
      new ExpressionInfo(classOf[TokenTfExpr].getName, "token_tf"),
      exprs => {
        require(exprs.length == 2, "token_tf(tokens, array('term', ...))")
        require(exprs(1).foldable, "token_tf term list must be a literal")
        val ad = exprs(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val terms = Array.tabulate(ad.numElements())(i =>
          ad.getUTF8String(i).toString).toSeq
        TokenTfExpr(exprs(0), terms)
      })
    reg.registerFunction(FunctionIdentifier("token_tf_all"),
      new ExpressionInfo(classOf[TokenTfAllExpr].getName, "token_tf_all"),
      exprs => {
        require(exprs.length == 1, "token_tf_all(tokens)")
        TokenTfAllExpr(exprs.head)
      })
    reg.registerFunction(FunctionIdentifier("vec_nearest"),
      new ExpressionInfo(classOf[VecNearestExpr].getName, "vec_nearest"),
      exprs => {
        require(exprs.length == 2, "vec_nearest(vec, array(array(...), ...))")
        require(exprs(1).foldable, "vec_nearest codebook must be a literal")
        val ad = exprs(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val elemType = exprs(1).dataType
          .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
          .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
        val cents = Array.tabulate(ad.numElements()) { i =>
          val row = ad.getArray(i)
          Array.tabulate(row.numElements()) { j =>
            elemType match {
              case org.apache.spark.sql.types.FloatType => row.getFloat(j)
              case org.apache.spark.sql.types.DoubleType => row.getDouble(j).toFloat
              case org.apache.spark.sql.types.IntegerType => row.getInt(j).toFloat
              case org.apache.spark.sql.types.LongType => row.getLong(j).toFloat
              case d: org.apache.spark.sql.types.DecimalType =>
                row.getDecimal(j, d.precision, d.scale).toFloat
              case t => throw new IllegalArgumentException(
                s"vec_nearest codebook element type $t unsupported")
            }
          }
        }
        VecNearestExpr(exprs.head, cents)
      })
  }
}
