package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native text-shingling kernel. The Column-function formulation
 * (`transform(sequence(...), i => array_join(slice(toks, i+1, n), " "))`)
 * is semantically right but executes through Catalyst's INTERPRETED
 * higher-order-function path — measured ~4.4 us per shingle at sf0.1,
 * which made shingle construction the dominant cost of every n-gram
 * operator (decontamination, repetition signals). This expression
 * computes the same array in one generated-code call into a static
 * kernel: byte-level UTF8String window concats, no per-shingle Catalyst
 * evaluation.
 */
object TextExprKernels {
  private val SEP = UTF8String.fromString(" ")

  /** All n-token shingles of a token array, space-joined — exactly
    * `transform(sequence(0, m-n), i => array_join(slice(toks,i+1,n), " "))`
    * for m >= n, and an empty array otherwise. */
  def tokenShingles(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) new GenericArrayData(Array.empty[Any])
    else {
      val toks = new Array[UTF8String](m)
      var i = 0
      while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
      val out = new Array[Any](m - n + 1)
      val window = new Array[UTF8String](n)
      var s = 0
      while (s <= m - n) {
        var j = 0
        while (j < n) { window(j) = toks(s + j); j += 1 }
        out(s) = UTF8String.concatWs(SEP, window: _*)
        s += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Per-term term frequencies for a FIXED query-term list in one hash
    * pass: out(i) = multiplicity of term i in the token array. The HOF
    * formulation (`size(filter(t, _ === term))` per term) is |terms|
    * interpreted passes; this is one generated-code call. */
  def tokenTf(arr: ArrayData, idx: java.util.HashMap[UTF8String, Integer],
              nTerms: Int): ArrayData = {
    val out = new Array[Long](nTerms)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      val t = idx.get(arr.getUTF8String(i))
      if (t != null) out(t.intValue) += 1L
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Full term-frequency map of a token array as
    * `array<struct<term,tf>>` in ONE hash pass, first-occurrence order
    * (deterministic). The explode+groupBy formulation materializes and
    * SHUFFLES one row per token occurrence; this emits one row per
    * DISTINCT term with no shuffle at all — the postings-build kernel. */
  def tokenTfAll(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Int]](
      math.max(16, m * 2))
    var i = 0
    while (i < m) {
      val t = arr.getUTF8String(i)
      if (t != null && t.numBytes > 0) {
        val cell = counts.get(t)
        if (cell == null) counts.put(t, Array(1)) else cell(0) += 1
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass token statistics: [max multiplicity, distinct count].
    * `[0, 0]` for an empty array. */
  def tokenStats(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer](math.max(16, m * 2))
    var top = 0
    var i = 0
    while (i < m) {
      val t = arr.getUTF8String(i)
      val prev = counts.get(t)
      val c = if (prev == null) 1 else prev.intValue + 1
      counts.put(t, Integer.valueOf(c))
      if (c > top) top = c
      i += 1
    }
    new GenericArrayData(Array[Any](top.toLong, counts.size.toLong))
  }

  /** Tokens NOT covered by any k-token window starting at one of
    * `starts` (0-based shingle starts): token j is removed iff some
    * start s has s <= j <= s+k-1 — an interval sweep over the sorted
    * starts, linear in tokens + starts. Replaces
    * `filter(t, (_, i) => !array_contains(cover, i+1))` over an
    * `explode(sequence(i+1, i+k))`-built cover set: the HOF filter is
    * interpreted AND O(tokens × cover), and the explode multiplies the
    * dup-occurrence rows by k before the aggregation. */
  def tokenCoverFilter(t: ArrayData, starts: ArrayData, k: Int): ArrayData = {
    val n = t.numElements()
    val m = starts.numElements()
    val ss = new Array[Int](m)
    var i = 0
    while (i < m) { ss(i) = starts.getInt(i); i += 1 }
    java.util.Arrays.sort(ss)
    val out = new Array[Any](n)
    var cnt = 0
    var si = 0
    var maxEnd = -1
    var j = 0
    while (j < n) {
      while (si < m && ss(si) <= j) {
        val e = ss(si) + k - 1
        if (e > maxEnd) maxEnd = e
        si += 1
      }
      if (j > maxEnd) { out(cnt) = t.getUTF8String(j); cnt += 1 }
      j += 1
    }
    new GenericArrayData(out.slice(0, cnt))
  }

  /** Unicode normalization for curation pipelines: canonical/compat
    * normalization (NFC=0 / NFKC=1), optional accent stripping (NFD →
    * drop non-spacing marks → renormalize — the utf8proc
    * `strip_accents` semantics, so a SQL oracle can replicate it),
    * optional ROOT-locale lowercasing, applied in that order. */
  def normalize(s: UTF8String, form: Int, toLower: Boolean,
                stripAccents: Boolean): UTF8String = {
    import java.text.Normalizer
    val f = if (form == 1) Normalizer.Form.NFKC else Normalizer.Form.NFC
    var str = Normalizer.normalize(s.toString, f)
    if (stripAccents) {
      val d = Normalizer.normalize(str, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var i = 0
      while (i < d.length) {
        val ch = d.charAt(i)
        if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
        i += 1
      }
      str = Normalizer.normalize(sb.toString, f)
    }
    if (toLower) str = str.toLowerCase(java.util.Locale.ROOT)
    UTF8String.fromString(str)
  }
}

/** `token_cover_filter(tokens, starts)` — tokens surviving removal of
  * every k-window at the given shingle starts, one generated call
  * (see [[TextExprKernels.tokenCoverFilter]]). */
case class TokenCoverFilterExpr(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  require(k >= 1, s"k must be >= 1, got $k")
  override def prettyName: String = "token_cover_filter"
  override def inputTypes = Seq(ArrayType(StringType), ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(StringType)
  override protected def nullSafeEval(t: Any, s: Any): Any =
    TextExprKernels.tokenCoverFilter(
      t.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) =>
      s"graft.functions.TextExprKernels.tokenCoverFilter($t, $s, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `normalize_text(string)` — Unicode NFC/NFKC + accent strip + lower
  * in one generated call (Spark has no built-in Unicode normalizer; a
  * Scala UDF here would deserialize every document to a boxed String
  * through the interpreted path). */
case class NormalizeTextExpr(child: Expression, form: String,
                             toLower: Boolean, stripAccents: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(form == "nfc" || form == "nfkc", s"form must be nfc|nfkc, got $form")
  private val formId = if (form == "nfkc") 1 else 0
  override def prettyName: String = "normalize_text"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(a: Any): Any =
    TextExprKernels.normalize(a.asInstanceOf[UTF8String], formId, toLower, stripAccents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextExprKernels.normalize($c, $formId, $toLower, $stripAccents)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `token_stats(array<string>)` -> `array<long> [topCount, distinctCount]`
  * in ONE hash pass. The HOF formulation of the top-word count
  * (`array_max(transform(array_distinct(t), w => size(filter(t, _ === w))))`)
  * is O(distinct x n) AND interpreted — measured 55k docs/s at bulk;
  * this kernel is linear and codegen'd. */
case class TokenStatsExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "token_stats"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    TextExprKernels.tokenStats(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextExprKernels.tokenStats($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `token_tf(array<string>)` -> `array<long>`: multiplicity of each of a
  * fixed query-term list (BM25 tf) in ONE codegen hash pass — see
  * [[TextExprKernels.tokenTf]]. */
case class TokenTfExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(terms.nonEmpty, "token_tf: empty term list")
  // a duplicate term would silently report tf=0 at its later position
  // (the index map keeps the first slot) — fail loudly at construction
  // instead; library callers dedupe via Search.checkTerms, this guards
  // the registered SQL form token_tf(tokens, array('a','a'))
  require(terms.distinct.size == terms.size,
    s"token_tf: duplicate query terms ${terms.diff(terms.distinct).distinct.mkString(", ")}")
  override def prettyName: String = "token_tf"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  @transient private lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.size * 2)
    terms.zipWithIndex.foreach { case (t, i) =>
      m.putIfAbsent(UTF8String.fromString(t), Integer.valueOf(i))
    }
    m
  }
  override protected def nullSafeEval(a: Any): Any =
    TextExprKernels.tokenTf(a.asInstanceOf[ArrayData], index, terms.size)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termIndex", index, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextExprKernels.tokenTf($c, $ref, ${terms.size})")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `token_tf_all(array<string>)` -> `array<struct<term,tf>>`: the full
  * per-document term-frequency map in one codegen hash pass (see
  * [[TextExprKernels.tokenTfAll]]). */
case class TokenTfAllExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "token_tf_all"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("tf", IntegerType, nullable = false))),
    containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    TextExprKernels.tokenTfAll(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextExprKernels.tokenTfAll($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `token_shingles(array<string>, n)`: every n-consecutive-token window
  * space-joined; `[]` when the array is shorter than n. Codegen-friendly
  * replacement for the interpreted HOF formulation (see
  * [[TextExprKernels]]). */
case class TokenShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def prettyName: String = "token_shingles"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    TextExprKernels.tokenShingles(a.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextExprKernels.tokenShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
