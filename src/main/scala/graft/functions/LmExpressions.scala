package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native kernels for the hashed-n-gram LM / DSIR operator family.
 *
 * Every md5 bucket in this repo is defined as the SQL-replicable form
 * `conv(substring(md5(bytes), 1, 8), 16, 10) % buckets` — i.e. the
 * first four bytes of the md5 digest read as an unsigned 32-bit
 * integer. The Column formulation pays, PER N-GRAM, a full hex-string
 * round trip: md5 → 32-char hex UTF8String → substring → `conv`
 * string-parse → cast. Profiled at sf0.1 (guide §1), that chain plus
 * the explode/broadcast-join/aggregate row machinery around it made
 * lm_xent's scoring stage a single 719 ms task over just 265k bigrams.
 * These kernels compute the identical bucket straight from the digest
 * bytes (no hex, no conv) and run the per-document scoring loop
 * IN-ROW inside generated code (guide step 4: codegen-friendly
 * expressions instead of row-expansion machinery), so a document costs
 * one kernel call instead of ~2 rows + 2 joins per bigram.
 *
 * Bucket values, sums and counts are BIT-IDENTICAL to the Column
 * formulation: same md5 bytes, same unsigned-int reduction, same
 * accumulation order (documents were contiguous within one scan
 * partition before, so partial aggregation already summed in token
 * order — exactly what the in-row loop does).
 */
object LmExprKernels {
  private val SEP = UTF8String.fromString(" ")
  private val MD5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 4 bytes of md5(b) as an unsigned 32-bit value — exactly
    * `conv(substring(md5(b), 1, 8), 16, 10)`. */
  def md5Head(b: Array[Byte]): Long = {
    val md = MD5.get()
    md.reset()
    head(md.digest(b))
  }

  @inline private def head(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)

  private val SP = Array[Byte](' ')

  /** md5 head of one token's bytes (digest() leaves the MessageDigest
    * reset, so no explicit reset between calls). */
  @inline private def head1(md: java.security.MessageDigest,
                            a: Array[Byte]): Long = head(md.digest(a))

  /** md5 head of `a ++ " " ++ b` without materializing the concat —
    * identical digest bytes to hashing the space-joined bigram. */
  @inline private def head2(md: java.security.MessageDigest,
                            a: Array[Byte], b: Array[Byte]): Long = {
    md.update(a); md.update(SP); head(md.digest(b))
  }

  /** `pmod(conv(substring(md5(s),1,8),16,10), buckets)` (value is
    * non-negative, so pmod == %). */
  def md5Bucket(s: UTF8String, buckets: Long): Long =
    md5Head(s.getBytes) % buckets

  /** `conv(substring(md5(s),1,8),16,10) / 4294967296.0` — the
    * deterministic unit sample key in [0, 1). */
  def md5Unit(s: UTF8String): Double =
    md5Head(s.getBytes) / 4294967296.0

  /** Both bigram-LM histograms' bucket streams of one document in one
    * call: the (m-1) bigram buckets followed by the (m-1) context-token
    * buckets OFFSET BY `buckets` — explode once, `groupBy` once, and
    * the driver splits the tagged counts back into the two histograms.
    * Replaces two full tokenize+md5 passes over the LM corpus. */
  def ngramLmBuckets(arr: ArrayData, buckets: Int): ArrayData = {
    val m = arr.numElements()
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    val md = MD5.get()
    md.reset()
    val out = new Array[Long](2 * (m - 1))
    var cur = arr.getUTF8String(0).getBytes
    var i = 0
    while (i + 2 <= m) {
      val next = arr.getUTF8String(i + 1).getBytes
      out(i) = head2(md, cur, next) % buckets
      out(m - 1 + i) = buckets + head1(md, cur) % buckets
      cur = next
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Per-document bigram-LM cross-entropy accumulation against the two
    * dense histograms: `[n_bigrams, Σ ln((cb(b2)+α)/(cu(b1)+α·B))]` in
    * token order — the in-row form of explode + two broadcast joins +
    * sum/count aggregation. */
  def ngramScore(arr: ArrayData, cb: Array[Long], cu: Array[Long],
                 alpha: Double): ArrayData = {
    val m = arr.numElements()
    val b = cb.length
    var s = 0.0
    var cnt = 0L
    if (m >= 2) {
      val md = MD5.get()
      md.reset()
      var cur = arr.getUTF8String(0).getBytes
      var i = 0
      while (i + 2 <= m) {
        val next = arr.getUTF8String(i + 1).getBytes
        val b2 = (head2(md, cur, next) % b).toInt
        val b1 = (head1(md, cur) % b).toInt
        s += math.log((cb(b2) + alpha) / (cu(b1) + alpha * b))
        cnt += 1
        cur = next
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(cnt.toDouble, s))
  }

  /** The md5 bucket of every n-token shingle of one document — the
    * in-row form of `explode(token_shingles(t, n))` + per-shingle
    * [[md5Bucket]], for histogram passes. */
  def shingleBuckets(arr: ArrayData, n: Int, buckets: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val tb = tokenBytes(arr, m)
    val md = MD5.get()
    md.reset()
    val out = new Array[Long](m - n + 1)
    var s = 0
    while (s <= m - n) {
      out(s) = windowHead(md, tb, s, n) % buckets
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  @inline private def tokenBytes(arr: ArrayData, m: Int): Array[Array[Byte]] = {
    val tb = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) { tb(i) = arr.getUTF8String(i).getBytes; i += 1 }
    tb
  }

  /** md5 head of the space-joined n-token window starting at s. */
  @inline private def windowHead(md: java.security.MessageDigest,
                                 tb: Array[Array[Byte]], s: Int,
                                 n: Int): Long = {
    md.update(tb(s))
    var j = 1
    while (j < n) { md.update(SP); md.update(tb(s + j)); j += 1 }
    head(md.digest())
  }

  /** Full 16-byte md5 digest of every n-token shingle of one document —
    * BIT-IDENTICAL to `unhex(md5(cast(<space-joined shingle> as
    * binary)))` (UTF-8 of the space-joined string is exactly the
    * concatenation of the tokens' UTF-8 bytes with 0x20 separators),
    * minus the per-occurrence shingle-string materialization AND the
    * md5→32-hex→unhex round trip. */
  def shingleMd5(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val tb = tokenBytes(arr, m)
    val md = MD5.get()
    md.reset()
    val out = new Array[Any](m - n + 1)
    var s = 0
    while (s <= m - n) {
      md.update(tb(s))
      var j = 1
      while (j < n) { md.update(SP); md.update(tb(s + j)); j += 1 }
      out(s) = md.digest() // digest() resets for the next window
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Full 16-byte md5 of one string — `unhex(md5(cast(s as binary)))`
    * without the hex round trip. */
  def md5Bin(s: UTF8String): Array[Byte] = {
    val md = MD5.get()
    md.reset()
    md.digest(s.getBytes)
  }

  /** Per-document DSIR importance accumulation against the dense
    * log-ratio table: `[n_shingles, Σ w(bucket)]` in token order — the
    * in-row form of explode + broadcast join + sum/count aggregation. */
  def shingleScore(arr: ArrayData, n: Int, w: Array[Double]): ArrayData = {
    val m = arr.numElements()
    val b = w.length
    var s = 0.0
    var cnt = 0L
    if (m >= n) {
      val tb = tokenBytes(arr, m)
      val md = MD5.get()
      md.reset()
      var i = 0
      while (i <= m - n) {
        s += w((windowHead(md, tb, i, n) % b).toInt)
        cnt += 1
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(cnt.toDouble, s))
  }
}

/** `md5_bucket(string)` -> long: first-4-md5-bytes bucket, no hex
  * round-trip (see [[LmExprKernels.md5Bucket]]). */
case class Md5BucketExpr(child: Expression, buckets: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  // >= 1, not >= 2: buildPostingsIndex's contract permits nBuckets = 1
  // (every term in bucket 0 — `x % 1 == 0` is well-defined), and the
  // pmod formulation this kernel replaced accepted it (r17 ADVICE).
  require(buckets >= 1, s"need >= 1 hash buckets, got $buckets")
  override def prettyName: String = "md5_bucket"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any): Any =
    LmExprKernels.md5Bucket(a.asInstanceOf[UTF8String], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LmExprKernels.md5Bucket($c, ${buckets}L)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `md5_unit(string)` -> double in [0, 1): the deterministic unit
  * sample key (see [[LmExprKernels.md5Unit]]). */
case class Md5UnitExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "md5_unit"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any): Any =
    LmExprKernels.md5Unit(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LmExprKernels.md5Unit($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `ngram_lm_buckets(tokens)` -> array<long>: tagged bigram+context
  * bucket stream for the one-pass LM histogram build. */
case class NgramLmBucketsExpr(child: Expression, buckets: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(buckets >= 2, s"need >= 2 hash buckets, got $buckets")
  override def prettyName: String = "ngram_lm_buckets"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    LmExprKernels.ngramLmBuckets(a.asInstanceOf[ArrayData], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LmExprKernels.ngramLmBuckets($c, $buckets)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `ngram_score(tokens)` -> array<double> [n_bigrams, Σ log p]: the
  * whole per-document LM scoring loop in one generated call. */
case class NgramScoreExpr(child: Expression, cb: Array[Long],
                          cu: Array[Long], alpha: Double)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(cb.length == cu.length && cb.nonEmpty,
    "ngram_score: histograms must be same-length and non-empty")
  override def prettyName: String = "ngram_score"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    LmExprKernels.ngramScore(a.asInstanceOf[ArrayData], cb, cu, alpha)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cb", cb, "long[]")
    val cuRef = ctx.addReferenceObj("cu", cu, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LmExprKernels.ngramScore($c, $cbRef, $cuRef, $alpha)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `shingle_buckets(tokens)` -> array<long>: md5 bucket of every
  * n-shingle, for DSIR histogram passes. */
case class ShingleBucketsExpr(child: Expression, n: Int, buckets: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  require(buckets >= 2, s"need >= 2 hash buckets, got $buckets")
  override def prettyName: String = "shingle_buckets"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    LmExprKernels.shingleBuckets(a.asInstanceOf[ArrayData], n, buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LmExprKernels.shingleBuckets($c, $n, $buckets)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `shingle_md5(tokens)` -> array<binary>: the full 16-byte digest of
  * every n-shingle, bit-identical to `unhex(md5(cast(shingle as
  * binary)))` over `token_shingles(t, n)` (see
  * [[LmExprKernels.shingleMd5]]). */
case class ShingleMd5Expr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def prettyName: String = "shingle_md5"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    LmExprKernels.shingleMd5(a.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LmExprKernels.shingleMd5($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `md5_bin(string)` -> binary: 16-byte digest without the hex round
  * trip (see [[LmExprKernels.md5Bin]]). */
case class Md5BinExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "md5_bin"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(a: Any): Any =
    LmExprKernels.md5Bin(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LmExprKernels.md5Bin($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `shingle_score(tokens)` -> array<double> [n_shingles, Σ w]: the
  * whole per-document DSIR scoring loop in one generated call. */
case class ShingleScoreExpr(child: Expression, n: Int, w: Array[Double])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  require(w.nonEmpty, "shingle_score: empty model table")
  override def prettyName: String = "shingle_score"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    LmExprKernels.shingleScore(a.asInstanceOf[ArrayData], n, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("w", w, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LmExprKernels.shingleScore($c, $n, $wRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
