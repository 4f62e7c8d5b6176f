package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the distance operators — the codegen
 * tier above Scala UDFs (SURVEY.md §7.3: "custom Expression
 * (codegen-friendly) worth it for vec_l2/vec_dot hot loops").
 *
 * Generated code calls the static [[VecExprKernels]] loops directly over
 * Catalyst ArrayData — no Seq materialization, no boxing, no
 * serialization round-trip, and the expression stays inside
 * WholeStageCodegen instead of forcing a BatchEvalPython/ScalaUDF node.
 *
 * Double-precision accumulation identical to VectorKernels, so results
 * are bit-for-bit the same as the UDF tier and the SQL oracle.
 */
object VecExprKernels {

  @inline private def checkDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    require(n == b.numElements(), s"vector dim mismatch: $n vs ${b.numElements()}")
    n
  }

  def l2(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var s = 0.0; var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  def negdot(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    -s
  }

  def cosdist(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var dot = 0.0; var na2 = 0.0; var nb2 = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na2 += x * x; nb2 += y * y
      i += 1
    }
    // two separate sqrts — matches VectorKernels.cosdist and the oracle
    val na = math.sqrt(na2); val nb = math.sqrt(nb2)
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / (na * nb)
  }

  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Nearest-centroid assignment (cosine distance argmin, ties to the
    * LOWEST index): one fused loop over a k×dim codebook. Distance math
    * is bit-identical to [[cosdist]] — same double accumulation order,
    * same zero-norm => 1.0 — so an argmin over k separate cosdist calls
    * gives the same winner. Exists because the expression-tree
    * formulation (`array_position(array(cosdist×k), array_min(...))`)
    * carries k child expressions: past ~100 centroids the generated
    * method outgrows JIT limits and Catalyst falls back to interpreted
    * per-row eval of every child (measured 20x slower at k=256). */
  def nearestCosdist(v: ArrayData, cents: Array[Array[Float]],
                     cnorms: Array[Double]): Int = {
    val n = v.numElements()
    var vn2 = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; vn2 += x * x; i += 1 }
    val vn = math.sqrt(vn2)
    var best = Double.PositiveInfinity
    var bi = 0
    var c = 0
    while (c < cents.length) {
      val ca = cents(c)
      if (ca.length != n)
        throw new IllegalArgumentException(
          s"vec_nearest dim mismatch: vector $n vs centroid ${ca.length}")
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v.getFloat(j).toDouble * ca(j).toDouble; j += 1 }
      val d = if (vn == 0.0 || cnorms(c) == 0.0) 1.0
              else 1.0 - dot / (vn * cnorms(c))
      if (d < best) { best = d; bi = c }
      c += 1
    }
    bi
  }

  // ---- halfvec (f16-packed binary) tier: decode-on-the-fly kernels.
  // The byte layout is Half.encodeBytes' little-endian f16 pairs; each
  // element widens to f32 then accumulates in double — bit-identical to
  // `kernel(Half.decodeBytes(bytes), q)` without materializing the
  // decoded array, and it keeps the f16 rerank/range path inside
  // WholeStageCodegen instead of a boxed Array[Byte] UDF. ----

  @inline private def halfAt(b: Array[Byte], i: Int): Float =
    graft.core.Half.halfToFloat(
      (((b(2 * i + 1) & 0xff) << 8) | (b(2 * i) & 0xff)).toShort)

  @inline private def checkHalfDims(a: Array[Byte], b: ArrayData): Int = {
    val n = b.numElements()
    require(a.length == n * 2, s"halfvec byte length ${a.length} != 2*$n")
    n
  }

  def l2Half(a: Array[Byte], b: ArrayData): Double = {
    val n = checkHalfDims(a, b)
    var s = 0.0; var i = 0
    while (i < n) {
      val d = halfAt(a, i).toDouble - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  def negdotHalf(a: Array[Byte], b: ArrayData): Double = {
    val n = checkHalfDims(a, b)
    var s = 0.0; var i = 0
    while (i < n) { s += halfAt(a, i).toDouble * b.getFloat(i).toDouble; i += 1 }
    -s
  }

  def cosdistHalf(a: Array[Byte], b: ArrayData): Double = {
    val n = checkHalfDims(a, b)
    var dot = 0.0; var na2 = 0.0; var nb2 = 0.0
    var i = 0
    while (i < n) {
      val x = halfAt(a, i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na2 += x * x; nb2 += y * y
      i += 1
    }
    val na = math.sqrt(na2); val nb = math.sqrt(nb2)
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / (na * nb)
  }

  /** MaxSim `@#` over two array<array<float>> values — accumulation order
    * identical to VectorKernels.maxsim (sum over query tokens of min over
    * doc tokens of negdot). */
  def maxsim(doc: ArrayData, q: ArrayData): Double = {
    var total = 0.0
    val nq = q.numElements()
    val nd = doc.numElements()
    var qi = 0
    while (qi < nq) {
      val qv = q.getArray(qi)
      var best = Double.PositiveInfinity
      var di = 0
      while (di < nd) {
        val nd2 = negdot(doc.getArray(di), qv)
        if (nd2 < best) best = nd2
        di += 1
      }
      if (best != Double.PositiveInfinity) total += best
      qi += 1
    }
    total
  }
}

sealed trait VecBinaryBase extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  // the analyzer coerces array<double> / array<int> literals to
  // array<float> (the surface a SQL user writing bare literals expects)
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  protected def kernelName: String
  protected def kernel(a: ArrayData, b: ArrayData): Double
  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecExprKernels.$kernelName($a, $b)")
}

/** `<->` Euclidean distance (reference crates/vector/src/vect.rs:132-135). */
case class VecL2Expr(left: Expression, right: Expression) extends VecBinaryBase {
  override def prettyName: String = "vec_l2"
  override protected def kernelName: String = "l2"
  override protected def kernel(a: ArrayData, b: ArrayData): Double = VecExprKernels.l2(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `<#>` negative inner product (reference vect.rs:128-130). */
case class VecNegDotExpr(left: Expression, right: Expression) extends VecBinaryBase {
  override def prettyName: String = "vec_negdot"
  override protected def kernelName: String = "negdot"
  override protected def kernel(a: ArrayData, b: ArrayData): Double = VecExprKernels.negdot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `<=>` cosine distance (reference vect.rs:138-143). */
case class VecCosDistExpr(left: Expression, right: Expression) extends VecBinaryBase {
  override def prettyName: String = "vec_cosdist"
  override protected def kernelName: String = "cosdist"
  override protected def kernel(a: ArrayData, b: ArrayData): Double = VecExprKernels.cosdist(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `@#` multi-vector MaxSim (reference src/datatype/operators_rabitq8.rs:
  * 123-139): `sum_q min_d negdot(d, q)` over two array<array<float>>. */
case class VecMaxSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "vec_maxsim"
  override def dataType: DataType = DoubleType
  override def inputTypes =
    Seq(ArrayType(ArrayType(FloatType)), ArrayType(ArrayType(FloatType)))
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecExprKernels.maxsim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecExprKernels.maxsim($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `vec_nearest(vec)` → nearest-centroid index over a fixed codebook
  * (cosine argmin, ties to lowest index) — the SemDeDup assignment
  * primitive as ONE expression. The codebook rides into generated code
  * as a referenced object, so k=100k centroids cost one virtual call
  * per row instead of k child expressions (which stop fitting JIT
  * method limits past ~100). */
case class VecNearestExpr(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(centroids.nonEmpty, "vec_nearest needs a non-empty codebook")
  override def prettyName: String = "vec_nearest"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  @transient private lazy val cnorms: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { val x = c(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }
  override protected def nullSafeEval(a: Any): Any =
    VecExprKernels.nearestCosdist(a.asInstanceOf[ArrayData], centroids, cnorms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val nRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecExprKernels.nearestCosdist($c, $cRef, $nRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Halfvec distance expressions: left = packed-f16 binary (the halfvec
  * storage form, Half.encodeBytes), right = array<float> query. Same
  * double accumulation as the f32 tier, decoded element-at-a-time —
  * the codegen replacement for the f16 rerank UDF the round-6 verdict
  * flagged (de-boxing item #6). */
sealed trait VecHalfBinaryBase extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(BinaryType, ArrayType(FloatType))
  protected def kernelName: String
  protected def kernel(a: Array[Byte], b: ArrayData): Double
  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecExprKernels.$kernelName($a, $b)")
}

/** `<->` over halfvec storage. */
case class VecL2HalfExpr(left: Expression, right: Expression) extends VecHalfBinaryBase {
  override def prettyName: String = "vec_l2_half"
  override protected def kernelName: String = "l2Half"
  override protected def kernel(a: Array[Byte], b: ArrayData): Double = VecExprKernels.l2Half(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `<#>` over halfvec storage. */
case class VecNegDotHalfExpr(left: Expression, right: Expression) extends VecHalfBinaryBase {
  override def prettyName: String = "vec_negdot_half"
  override protected def kernelName: String = "negdotHalf"
  override protected def kernel(a: Array[Byte], b: ArrayData): Double = VecExprKernels.negdotHalf(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `<=>` over halfvec storage. */
case class VecCosDistHalfExpr(left: Expression, right: Expression) extends VecHalfBinaryBase {
  override def prettyName: String = "vec_cosdist_half"
  override protected def kernelName: String = "cosdistHalf"
  override protected def kernel(a: Array[Byte], b: ArrayData): Double = VecExprKernels.cosdistHalf(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Euclidean norm. */
case class VecNormExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "vec_norm"
  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(ArrayType(FloatType))
  override protected def nullSafeEval(a: Any): Any =
    VecExprKernels.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecExprKernels.norm($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
