package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Pins every LM/DSIR md5 kernel to the SQL-replicable Column
  * formulation it replaced (r17 optimization): the kernels compute the
  * bucket/digest straight off the md5 digest bytes, and these goldens
  * are what makes "bit-identical" a checked property rather than a
  * comment. Fixtures include multi-byte UTF-8 (the digest must hash the
  * same bytes the `cast(s as binary)` path hashed). */
class LmExpressionsSpec extends SparkSpec {

  private def kcol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)
  private def kx(c: Column) = ColumnBridge.expression(c)

  // deterministic corpus with empties, 1-token docs, and unicode
  private lazy val docs: Seq[(Long, String)] = {
    val rng = new scala.util.Random(41)
    val vocab = Vector("alpha", "beta", "gamma", "δλo", "héllo", "x",
      "längère", "合気道", "q1", "r2", "s3")
    (0L until 80L).map { i =>
      val n = rng.nextInt(12) // 0..11 tokens
      i -> Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    } :+ (100L -> "") :+ (101L -> "single")
  }

  private lazy val df = {
    import spark.implicits._
    docs.toDF("id", "text")
  }

  private def legacyBucket(s: Column, buckets: Int): Column =
    pmod(conv(substring(md5(to_binary(s, lit("utf-8"))), 1, 8), 16, 10)
      .cast("long"), lit(buckets.toLong))

  test("Md5BucketExpr / Md5UnitExpr match the conv(substring(md5)) forms") {
    import spark.implicits._
    val b = 257
    val rows = df.select(
        kcol(Md5BucketExpr(kx(col("text")), b.toLong)),
        legacyBucket(col("text"), b),
        kcol(Md5UnitExpr(kx(col("text")))),
        conv(substring(md5(to_binary(col("text"), lit("utf-8"))), 1, 8), 16, 10)
          .cast("long").cast("double") / 4294967296.0)
      .as[(Long, Long, Double, Double)].collect()
    rows.foreach { case (kb, lb, ku, lu) =>
      assert(kb == lb, s"bucket $kb != $lb")
      assert(ku == lu, s"unit $ku != $lu") // exact double equality
    }
  }

  test("ShingleMd5Expr matches unhex(md5(cast(shingle as binary))) windows") {
    import spark.implicits._
    for (n <- Seq(1, 3, 8)) {
      val toks = split(col("text"), " ")
      val got = df.select(col("id"),
          kcol(ShingleMd5Expr(kx(toks), n)))
        .as[(Long, Seq[Array[Byte]])].collect().toMap
      val want = df.select(col("id"),
          graft.ops.Curation.tokenShingles(toks, n).as("sh"))
        .select(col("id"), transform(col("sh"),
          s => unhex(md5(s.cast("binary")))).as("h"))
        .as[(Long, Seq[Array[Byte]])].collect().toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (id, hs) =>
        val ws = want(id)
        assert(hs.length == ws.length, s"id $id n $n: ${hs.length} != ${ws.length}")
        hs.zip(ws).foreach { case (a, b) =>
          assert(java.util.Arrays.equals(a, b), s"id $id n $n digest differs") }
      }
    }
  }

  test("Md5BinExpr matches unhex(md5(cast(s as binary)))") {
    import spark.implicits._
    val rows = df.select(
        kcol(Md5BinExpr(kx(col("text")))),
        unhex(md5(col("text").cast("binary"))))
      .as[(Array[Byte], Array[Byte])].collect()
    rows.foreach { case (a, b) => assert(java.util.Arrays.equals(a, b)) }
  }

  test("ShingleBucketsExpr matches explode(token_shingles) + legacy bucket") {
    import spark.implicits._
    val b = 64; val n = 2
    val toks = split(col("text"), " ")
    val got = df.select(col("id"), kcol(ShingleBucketsExpr(kx(toks), n, b)))
      .as[(Long, Seq[Long])].collect().toMap
    val want = df.select(col("id"),
        graft.ops.Curation.tokenShingles(toks, n).as("sh"))
      .select(col("id"), transform(col("sh"),
        s => legacyBucket(s, b)).as("bk"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got == want)
  }

  test("NgramLmBucketsExpr = bigram buckets ++ (buckets + context buckets)") {
    import spark.implicits._
    val b = 32
    val toks = split(col("text"), " ")
    val got = df.select(col("id"), kcol(NgramLmBucketsExpr(kx(toks), b)))
      .as[(Long, Seq[Long])].collect().toMap
    val bi = df.select(col("id"),
        transform(graft.ops.Curation.tokenShingles(toks, 2),
          s => legacyBucket(s, b)).as("x"))
      .as[(Long, Seq[Long])].collect().toMap
    val ctx = df.select(col("id"),
        transform(slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          s => legacyBucket(s, b)).as("x"))
      .as[(Long, Seq[Long])].collect().toMap
    got.foreach { case (id, ks) =>
      val want = bi(id) ++ ctx(id).map(_ + b)
      assert(ks == want, s"id $id: $ks != $want")
    }
  }

  test("NgramLmBucketsExpr's bigram half equals ShingleBucketsExpr(n=2) " +
       "— the r18 curate_corpus_v2 histogram reuse contract") {
    // a bigram LM's cb histogram doubles as the DSIR n=2 target
    // histogram only if the two kernels bucket every bigram identically
    import spark.implicits._
    val b = 256
    val toks = split(col("text"), " ")
    val lmBi = df.select(col("id"),
        filter(kcol(NgramLmBucketsExpr(kx(toks), b)), k => k < b))
      .as[(Long, Seq[Long])].collect().toMap
    val sh = df.select(col("id"), kcol(ShingleBucketsExpr(kx(toks), 2, b)))
      .as[(Long, Seq[Long])].collect().toMap
    assert(lmBi == sh)
  }

  test("NgramScoreExpr / ShingleScoreExpr accumulate the join-form sums exactly") {
    // token-order accumulation over the same doubles: equality is exact
    val b = 16
    val rng = new scala.util.Random(7)
    val cb = Array.fill(b)(rng.nextInt(1000).toLong)
    val cu = Array.fill(b)(rng.nextInt(1000).toLong)
    val w = Array.fill(b)(rng.nextGaussian())
    val alpha = 0.1
    docs.foreach { case (_, text) =>
      val toks = if (text.isEmpty) Array.empty[String] else text.split(' ')
      // reference: per-token loop in plain Scala using the LEGACY bucket
      def bucket(s: String): Int =
        (java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(
            s.getBytes("UTF-8")).substring(0, 8), 16) % b).toInt
      var sN = 0.0; var nN = 0L
      (0 until math.max(0, toks.length - 1)).foreach { i =>
        val b2 = bucket(toks(i) + " " + toks(i + 1))
        val b1 = bucket(toks(i))
        sN += math.log((cb(b2) + alpha) / (cu(b1) + alpha * b))
        nN += 1
      }
      val gotN = LmExprKernels.ngramScore(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          toks.map(org.apache.spark.unsafe.types.UTF8String.fromString)),
        cb, cu, alpha)
      assert(gotN.getDouble(0) == nN.toDouble && gotN.getDouble(1) == sN,
        s"ngram '$text': (${gotN.getDouble(0)}, ${gotN.getDouble(1)}) != ($nN, $sN)")
      var sS = 0.0; var nS = 0L
      val n = 2
      (0 to toks.length - n).foreach { i =>
        sS += w(bucket(toks.slice(i, i + n).mkString(" ")))
        nS += 1
      }
      val gotS = LmExprKernels.shingleScore(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          toks.map(org.apache.spark.unsafe.types.UTF8String.fromString)),
        n, w)
      assert(gotS.getDouble(0) == nS.toDouble && gotS.getDouble(1) == sS,
        s"shingle '$text'")
    }
  }

  test("kernels stay inside WholeStageCodegen (no ScalaUDF node)") {
    val docsP = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = docsP.select(
        kcol(Md5BucketExpr(kx(col("text")), 64L)).as("b"),
        kcol(ShingleMd5Expr(kx(split(col("text"), " ")), 3)).as("h"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }
}
