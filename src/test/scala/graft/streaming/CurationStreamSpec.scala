package graft.streaming

import graft.SparkSpec
import graft.ops.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/**
 * Curation operators on STREAMING frames: signals, sampling, and
 * chunking are stateless projections/filters, so a curation ingest
 * pipeline (quality gate -> mix sample -> chunk) runs unchanged inside
 * a Structured Streaming query — each micro-batch produces exactly what
 * the batch operator produces on the same rows (verified against the
 * batch run below). Decontamination's flagged-set AGGREGATION is
 * batch-shaped; its streaming analog is a broadcast-set filter — the
 * stateless keep-side (anti semi-join against a precomputed contaminated
 * id set) is exercised here via the same per-row operators.
 */
class CurationStreamSpec extends SparkSpec {

  test("signals + sampleMix + chunkTokens run stateless in a streaming pipeline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val (topF, _, _) = Curation.repetitionSignals(col("text"))
    def pipeline(df: org.apache.spark.sql.DataFrame) = {
      val gated = df
        .filter(size(split(col("text"), " ")) >= 4 && topF <= 0.5)
      val mixed = Curation.sampleMix(gated, "doc_id", "source",
        Map("drop" -> 0.0), defaultRate = 0.7)
      Curation.chunkTokens(mixed, "doc_id", "text", window = 4, stride = 3)
    }
    val query = pipeline(input.toDF().toDF("doc_id", "text", "source"))
      .writeStream.format("memory").queryName("curate_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      val docs = (0L until 200L).map { i =>
        val words = (0 until (4 + (i % 7)).toInt).map(j => s"w${(i + j) % 11}")
        (i, words.mkString(" "), if (i % 5 == 0) "drop" else "keep")
      }
      input.addData(docs.take(100))
      query.processAllAvailable()
      input.addData(docs.drop(100))
      query.processAllAvailable()
      val streamed = spark.sql(
        "SELECT doc_id, chunk_no, chunk_text, n_tokens FROM curate_stream")
        .as[(Long, Long, String, Long)].collect().toSet
      val batch = pipeline(docs.toDF("doc_id", "text", "source"))
        .as[(Long, Long, String, Long)].collect().toSet
      assert(streamed == batch, "streaming output must equal the batch run")
      assert(batch.nonEmpty, "fixture must keep some chunks")
      assert(!batch.exists { case (id, _, _, _) => id % 5 == 0 },
        "rate-0 source must be dropped in both modes")
    } finally query.stop()
  }

  test("bm25Score with standing stats scores a stream in-row, matching batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 120L).map { i =>
      (i, (0 until 6).map(j => Seq("cat", "dog", "fish", "bird")(((i + j) % 4).toInt)).mkString(" "))
    }
    val batchDf = docs.toDF("doc_id", "text")
    // standing-corpus stats, as a keyword-alert pipeline would hold them
    val st = graft.ops.Search.bm25Stats(batchDf, "text", Seq("cat", "dog"))
    val batch = graft.ops.Search.bm25Score(batchDf, "doc_id", "text",
      Seq("cat", "dog"), stats = Some(st))
      .as[(Long, Double)].collect().toSet
    val input = MemoryStream[(Long, String)]
    val query = graft.ops.Search.bm25Score(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", Seq("cat", "dog"), stats = Some(st))
      .writeStream.format("memory").queryName("bm25_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docs.take(60)); query.processAllAvailable()
      input.addData(docs.drop(60)); query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, score FROM bm25_stream")
        .as[(Long, Double)].collect().toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally query.stop()
  }

  test("scoreWithModelIngest scores in-row in a stream, matching batch scores") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val w = Seq(("good", 2.0), ("bad", -2.0), ("meh", 0.3)).toDF("term", "weight")
    val docs = (0L until 50L).map { i =>
      (i, Seq("good", "bad", "meh", "zzz", s"w$i").take(2 + (i % 3).toInt).mkString(" "))
    }
    val batch = Curation.scoreWithModel(docs.toDF("doc_id", "text"),
        "doc_id", "text", w)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val input = MemoryStream[(Long, String)]
    val query = Curation.scoreWithModelIngest(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", w)
      .writeStream.format("memory").queryName("score_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docs.take(25)); query.processAllAvailable()
      input.addData(docs.drop(25)); query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, n_tokens, score FROM score_stream")
        .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (id, (n, s)) =>
        assert(n == batch(id)._1, s"doc $id token count")
        assert(math.abs(s - batch(id)._2) < 1e-12, s"doc $id score")
      }
      // loud vocabulary cap
      intercept[IllegalArgumentException] {
        Curation.scoreWithModelIngest(docs.toDF("doc_id", "text"),
          "doc_id", "text", w, maxVocab = 2)
      }
    } finally query.stop()
  }

  test("decontaminateIngest drops contaminated docs in a stream, matching batch keep") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalDf = Seq((10L, "a quick brown fox jumps high")).toDF("id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // 2 shared trigrams
      (2L, "completely unrelated text about spark engines"),
      (3L, "quick brown fox is here and brown fox jumps too"), // 2 shared
      (4L, "nothing in common either honestly"))
    // batch reference: string-shingle decontaminateKeep
    val batchKept = Curation.decontaminateKeep(
      docs.toDF("doc_id", "text"), "doc_id", "text", evalDf, "text", 3, 2)
      .select("doc_id").as[Long].collect().toSet
    assert(batchKept == Set(2L, 4L))
    // streaming: hashed broadcast-set filter inside a streaming query
    val input = MemoryStream[(Long, String)]
    val query = Curation.decontaminateIngest(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", evalDf, "text", 3, 2)
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docs.take(2))
      query.processAllAvailable()
      input.addData(docs.drop(2))
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM decon_stream")
        .as[Long].collect().toSet
      assert(streamed == batchKept,
        s"streaming keep-set $streamed must equal batch $batchKept")
    } finally query.stop()
  }

  test("redactPii + cleanLines run stateless in a streaming pipeline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    def pipeline(df: org.apache.spark.sql.DataFrame) = {
      val (red, nPii) = Curation.redactPii(col("text"))
      val (cleaned, kept, total) = Curation.cleanLines(red, minWords = 3)
      df.select(col("doc_id"), cleaned.as("clean"), nPii.as("n_pii"),
        kept.as("n_kept"), total.as("n_total"))
    }
    val query = pipeline(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("redact_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      val docs = (0L until 60L).map { i =>
        val pii = if (i % 2 == 0) s" u$i@ex.org" else s" 10.0.0.$i"
        (i, s"first line has$pii in it.\nshort.\nthe last full line stays here.")
      }
      input.addData(docs.take(30)); query.processAllAvailable()
      input.addData(docs.drop(30)); query.processAllAvailable()
      val streamed = spark.sql(
        "SELECT doc_id, clean, n_pii, n_kept, n_total FROM redact_stream")
        .as[(Long, String, Long, Long, Long)].collect().toSet
      val batch = pipeline(docs.toDF("doc_id", "text"))
        .as[(Long, String, Long, Long, Long)].collect().toSet
      assert(streamed == batch, "streaming output must equal the batch run")
      assert(batch.forall(_._3 == 1L), "each doc planted exactly one PII item")
      assert(batch.forall(r => r._4 == 2L && r._5 == 3L),
        "'short.' line dropped, the two real lines kept")
    } finally query.stop()
  }

  test("minhashDedupAgainstIngest flags near-dups of a static corpus in a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "red blue green gold pink teal gray cyan lime navy plum rust"
    val refDf = Seq(100L -> base, 101L -> "one two three four five six seven")
      .toDF("doc_id", "text")
    val docs = Seq(
      0L -> base,                                                // exact dup
      1L -> base.split(' ').updated(1, "mut").mkString(" "),     // near dup
      2L -> "totally different words about engines and rows here")
    val input = MemoryStream[(Long, String)]
    val query = graft.ops.Dedup.minhashDedupAgainstIngest(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        refDf, "doc_id", "text", 0.4)
      .writeStream.format("memory").queryName("against_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docs.take(1)); query.processAllAvailable()
      input.addData(docs.drop(1)); query.processAllAvailable()
      val streamed = spark.sql("SELECT da, db, jac FROM against_stream")
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed.map(t => (t._1, t._2)) == Set((0L, 100L), (1L, 100L)),
        s"got $streamed")
      assert(streamed.find(_._1 == 0L).get._3 == 1.0)
    } finally query.stop()
  }

  test("composed streaming pipeline: normalize -> xent gate -> DSIR score == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.DataFrame
    val docs = (0L until 40L).map { i =>
      val w = if (i % 2 == 0) "Alpha Beta alpha beta gamma alpha beta"
              else "delta echo fox delta echo golf hotel"
      (i, s"$w tail${i % 5}")
    }
    val docsDf = docs.toDF("doc_id", "text")
    def norm(d: DataFrame): DataFrame =
      d.withColumn("tn", graft.ops.TextOps.normalizeText(col("text"), "nfc",
        lower = true, stripAccents = true))
    val target = Seq((100L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val tnT = norm(target)
    // models trained ONCE batch-side (they are data)
    val lm = Curation.ngramLm(tnT, "tn", buckets = 64)
    val model = Curation.importanceModel(tnT, "tn", norm(docsDf), "tn",
      n = 2, buckets = 64)
    val gate = 4.0
    // batch reference chain over the same models
    val bx = Curation.ngramCrossEntropyIngest(norm(docsDf), "doc_id", "tn", lm)
      .filter(col("xent") <= gate)
    val batch = Curation.importanceIngest(bx, "doc_id", "tn", model)
      .select("doc_id", "xent", "weight").as[(Long, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(batch.nonEmpty && batch.size < docs.size,
      s"the xent gate must bite: kept ${batch.size}/${docs.size}")
    val input = MemoryStream[(Long, String)]
    val staged = Curation.importanceIngest(
      Curation.ngramCrossEntropyIngest(
        norm(input.toDF().toDF("doc_id", "text")), "doc_id", "tn", lm)
        .filter(col("xent") <= gate),
      "doc_id", "tn", model)
    val query = staged.select("doc_id", "xent", "weight")
      .writeStream.format("memory").queryName("pipe_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docs.take(20)); query.processAllAvailable()
      input.addData(docs.drop(20)); query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, xent, weight FROM pipe_stream")
        .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (id, (x, w)) =>
        assert(math.abs(x - batch(id)._1) < 1e-12 &&
          math.abs(w - batch(id)._2) < 1e-12, s"doc $id")
      }
    } finally query.stop()
  }

  test("ngramCrossEntropyIngest scores a stream in-row, matching batch xent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lmDf = Seq((0L, "a b a b c a b")).toDF("doc_id", "text")
    val docs = (0L until 30L).map(i =>
      (i, if (i % 2 == 0) "a b a b" else "p q r s t"))
    val docsDf = docs.toDF("doc_id", "text")
    val batch = Curation.ngramCrossEntropy(docsDf, "doc_id", "text",
        lmDf, "text", buckets = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val lm = Curation.ngramLm(lmDf, "text", buckets = 64)
    val input = MemoryStream[(Long, String)]
    val query = Curation.ngramCrossEntropyIngest(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", lm)
      .writeStream.format("memory").queryName("xent_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docs.take(15)); query.processAllAvailable()
      input.addData(docs.drop(15)); query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, n_bigrams, xent FROM xent_stream")
        .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (id, (nb, x)) =>
        assert(nb == batch(id)._1, s"doc $id bigram count")
        assert(math.abs(x - batch(id)._2) < 1e-9, s"doc $id xent")
      }
    } finally query.stop()
  }

  test("importanceIngest scores a stream in-row, matching batch DSIR weights") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val target = Seq((100L, "alpha beta alpha beta alpha beta")).toDF("doc_id", "text")
    val docs = (0L until 40L).map { i =>
      val w = if (i % 2 == 0) "alpha beta gamma alpha beta" else "delta echo fox delta echo"
      (i, s"$w tail${i % 5}")
    }
    val docsDf = docs.toDF("doc_id", "text")
    val batch = Curation.importanceWeights(docsDf, "doc_id", "text",
        target, "text", n = 2, buckets = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val model = Curation.importanceModel(target, "text", docsDf, "text",
      n = 2, buckets = 64)
    val input = MemoryStream[(Long, String)]
    val query = Curation.importanceIngest(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", model, n = 2)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docs.take(20)); query.processAllAvailable()
      input.addData(docs.drop(20)); query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, n_shingles, weight FROM dsir_stream")
        .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (id, (ns, w)) =>
        assert(ns == batch(id)._1, s"doc $id shingle count")
        assert(math.abs(w - batch(id)._2) < 1e-9, s"doc $id weight")
      }
    } finally query.stop()
  }
}
