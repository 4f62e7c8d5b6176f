package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Training-data curation operators — the pipeline stages between "raw
 * corpus" and "training mix" that sit alongside dedup/quality/ANN in a
 * large-scale LLM data pipeline:
 *
 *  - [[decontaminate]]: benchmark decontamination — flag/remove training
 *    documents that share n-gram shingles with an evaluation set, so test
 *    data never leaks into the training mix.
 *  - [[sampleMix]]: deterministic weighted sampling per source — build a
 *    training mix ("2x books, 0.3x web") reproducibly from a hash of the
 *    document id, with no RNG state and no shuffle.
 *  - [[chunkTokens]]: overlapping token-window chunking — split documents
 *    into model-context-sized pieces with a configurable stride.
 *  - [[repetitionSignals]]: Gopher-style repetition/diversity signals
 *    (top-word fraction, distinct-word ratio, duplicate-2-gram fraction)
 *    used to drop boilerplate and degenerate documents.
 *
 * Design rules shared with [[TextOps]]: every operator is built from
 * native Spark column functions (no UDFs — everything stays inside
 * whole-stage codegen), arithmetic is double-precision and reproducible
 * by any SQL engine, and per-document work is linear in document length
 * (token arrays never leave their row). At 100 TB each of these is a
 * narrow projection/flatMap over the corpus — no shuffle except where a
 * join is the semantics (decontamination's overlap count), and that join
 * broadcasts the (small) eval side.
 */
object Curation {

  private def toks(text: Column): Column = split(text, " ")

  /** All n-token shingles of `text` as space-joined strings; empty array
    * when the document has fewer than n tokens. A native codegen
    * expression ([[graft.functions.TokenShinglesExpr]]): the
    * higher-order-function formulation (`transform` + `slice` +
    * `array_join`) computes the same array but through Catalyst's
    * interpreted HOF path — measured ~7x slower end-to-end on the
    * decontamination query at sf0.1. The DuckDB oracles compute the
    * identical set from `array_to_string(t[i:i+n-1], ' ')`. */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.TokenShinglesExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(toks(text)), n))

  /**
   * Benchmark decontamination: count, per training document, the distinct
   * n-gram shingles it shares with ANY document of `evalDf`, and keep
   * documents at or above `minOverlap` (the contaminated set — anti-join
   * against it for the clean corpus, see [[decontaminateKeep]]).
   *
   * Scale shape: the eval side (benchmarks are thousands of docs, not
   * billions) collapses to DISTINCT shingles and broadcasts; the corpus
   * side is one narrow scan producing (doc_id, shingle) pairs that
   * semi-join the broadcast and aggregate by doc — one partial-agg
   * shuffle of contaminated ids only. Nothing in the plan is
   * proportional to corpus x eval.
   *
   * Output: (doc_id, n_overlap) for contaminated docs.
   */
  def decontaminate(df: DataFrame, idCol: String, textCol: String,
                    evalDf: DataFrame, evalTextCol: String,
                    n: Int = 3, minOverlap: Int = 1): DataFrame = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    val evalShingles = evalDf
      .select(explode(shingles(col(evalTextCol), n)).as("sh"))
      .distinct()
    val docShingles = df
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(shingles(col(textCol), n))).as("sh"))
    docShingles
      .join(broadcast(evalShingles), Seq("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** The cleaned corpus: `df` minus [[decontaminate]]'s flagged ids. */
  def decontaminateKeep(df: DataFrame, idCol: String, textCol: String,
                        evalDf: DataFrame, evalTextCol: String,
                        n: Int = 3, minOverlap: Int = 1): DataFrame = {
    val bad = decontaminate(df, idCol, textCol, evalDf, evalTextCol, n, minOverlap)
      .select(col("doc_id"))
    df.join(bad, df(idCol) === bad("doc_id"), "left_anti")
  }

  /**
   * STREAMING-shaped decontamination: [[decontaminate]] aggregates
   * per-doc overlap through a shuffle, which a streaming ingest stage
   * cannot do statelessly — this variant counts each row's distinct
   * shingle-hash overlap against a BROADCAST eval set entirely in-row
   * (no aggregation, no shuffle), so it drops contaminated documents in
   * any batch OR streaming pipeline. The eval set (benchmarks: small)
   * is hashed once on the driver via [[Dedup.hash64]] token shingles
   * and shared as a sorted array (binary search per shingle).
   *
   * Same keep/drop decision as [[decontaminateKeep]] up to 64-bit hash
   * collisions (the batch path compares shingle STRINGS; this one
   * compares FNV-64 hashes — collision odds ~n²/2⁶⁴).
   */
  def decontaminateIngest(docs: DataFrame, idCol: String, textCol: String,
                          evalDf: DataFrame, evalTextCol: String,
                          n: Int = 3, minOverlap: Int = 1): DataFrame = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    val spark = docs.sparkSession
    import spark.implicits._
    val evalSh: Array[Long] = evalDf.select(col(evalTextCol).cast("string"))
      .as[String]
      .flatMap(t => Dedup.sortedShingleSet(t.split(' ').map(Dedup.hash64), n))
      .distinct().collect().sorted
    val bEval = spark.sparkContext.broadcast(evalSh)
    val overlaps = udf { (text: String) =>
      val ev = bEval.value
      val sh = Dedup.sortedShingleSet(text.split(' ').map(Dedup.hash64), n)
      var i = 0; var hits = 0
      while (i < sh.length && hits < minOverlap) {
        if (java.util.Arrays.binarySearch(ev, sh(i)) >= 0) hits += 1
        i += 1
      }
      hits >= minOverlap
    }
    docs.filter(!overlaps(col(textCol).cast("string")))
  }

  /** Uniform deterministic unit sample key in [0, 1): the first 8 hex
    * chars of md5(seed:id) as a 32-bit integer over 2^32. Identical in
    * any engine with md5 (the DuckDB oracle recomputes it verbatim), no
    * RNG state, stable under repartitioning — the property `rand()`
    * does NOT have (its stream is per-partition). */
  def hashUnit(id: Column, seed: String): Column =
    conv(substring(md5(to_binary(
      concat(lit(seed), lit(":"), id.cast("string")), lit("utf-8"))), 1, 8),
      16, 10).cast("long").cast("double") / 4294967296.0

  /**
   * Deterministic weighted sampling for training-mix construction: keep a
   * row of source s iff hashUnit(id) < rates(s) (default `defaultRate`).
   * Rates <= 0 drop the source; rate >= 1 keeps everything. One narrow
   * filter scan — no shuffle, no RNG, reproducible row-for-row across
   * runs, partitionings, and engines; changing `seed` draws an
   * independent sample.
   *
   * (Upsampling weights > 1 are a separate concern — epoch repetition in
   * the data loader — and deliberately out of scope for a filter.)
   */
  def sampleMix(df: DataFrame, idCol: String, sourceCol: String,
                rates: Map[String, Double], defaultRate: Double = 1.0,
                seed: String = "mix"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    df.filter(hashUnit(col(idCol), seed) < rate)
  }

  /**
   * Overlapping token-window chunking: split each document's token
   * sequence into windows of `window` tokens starting every `stride`
   * tokens — the standard context-length preprocessing before
   * tokenization. Every token lands in at least one chunk (the last
   * window may be short); a document shorter than one window is one
   * chunk. Chunk count per doc: 1 + ceil(max(0, n - window) / stride).
   *
   * Output: (doc_id, chunk_no, chunk_text, n_tokens), chunk_no 0-based
   * in document order. One narrow flatMap scan, rows expand by the
   * chunk count; no shuffle.
   */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    val t = toks(col(textCol))
    val n = size(t)
    val nChunks = when(n <= window, lit(1L))
      .otherwise(ceil((n - window).cast("double") / stride) + 1L)
    df.select(col(idCol).as("doc_id"), t.as("__toks"), nChunks.as("__nc"))
      .select(col("doc_id"),
        posexplode(sequence(lit(0L), col("__nc") - 1L)).as(Seq("chunk_no", "__i")),
        col("__toks"))
      .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"),
        array_join(slice(col("__toks"), (col("__i") * stride + 1).cast("int"), lit(window)), " ")
          .as("chunk_text"),
        size(slice(col("__toks"), (col("__i") * stride + 1).cast("int"), lit(window)))
          .cast("long").as("n_tokens"))
  }

  /**
   * Gopher-style repetition/diversity signals, one row per document:
   *  - `top_word_frac`: occurrences of the most frequent token / tokens —
   *    high = degenerate repetition ("buy buy buy ...");
   *  - `distinct_ratio`: distinct tokens / tokens — low = low diversity;
   *  - `dup_2gram_frac`: 1 - distinct 2-grams / 2-grams — high =
   *    boilerplate/template text (0 when the doc has < 2 tokens).
   *
   * Everything is per-row array arithmetic on native functions; the
   * top-word count is O(distinct x n) per document which is the right
   * trade at corpus scale (no per-doc shuffle, no UDF boxing).
   */
  def repetitionSignals(text: Column): (Column, Column, Column) = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression}
    def stats(c: Column): Column =
      toCol(graft.functions.TokenStatsExpr(expression(c)))
    val t = toks(text)
    val n = size(t)
    // one-pass native kernel: [top multiplicity, distinct count] — the
    // HOF formulation (array_max over transform+filter) is O(d*n) and
    // interpreted; this is linear and codegen'd (measured 11x at bulk)
    val ts = stats(t)
    val topFrac = ts.getItem(0).cast("double") / n
    val distinctRatio = ts.getItem(1).cast("double") / n
    val grams = shingles(text, 2)
    val gs = stats(grams)
    val dupGramFrac = when(size(grams) === 0, lit(0.0))
      .otherwise(lit(1.0) - gs.getItem(1).cast("double") / size(grams))
    (topFrac, distinctRatio, dupGramFrac)
  }
}
