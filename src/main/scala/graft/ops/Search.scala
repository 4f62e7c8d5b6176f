package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Full-text relevance ranking (Okapi BM25) and rank fusion (RRF) — the
 * keyword half of hybrid search. The vector half is served by the ANN
 * tiers (`index/IvfIndex`, `index/VamanaGraph`); [[rrfFuse]] composes the
 * two result sets the way a hybrid retrieval stack does.
 *
 * 100 TB shape:
 *  - [[bm25Stats]] is the only corpus pass: one aggregate for (N, avgdl)
 *    and one partial-agg shuffle whose rows are capped at the number of
 *    query terms (per-doc matched-term sets are intersected BEFORE the
 *    explode, so the shuffle carries at most |terms| rows per doc, not
 *    the corpus vocabulary). For a standing corpus the stats are computed
 *    once and reused across queries, like a search engine's index-time
 *    statistics.
 *  - [[bm25Score]] is shuffle-free: docs that contain no query term are
 *    dropped by an `arrays_overlap` filter at the scan, and the score is
 *    one native column expression (ALL per-term tfs from one codegen hash
 *    pass — `TokenTfExpr` — with df/idf baked in as literals). Top-k goes
 *    through Spark's TakeOrdered — no global sort materialization.
 *  - [[buildPostings]]/[[PostingsIndex.search]] is the standing-corpus
 *    index path: a query reads only its terms' posting buckets
 *    (partition-pruned), so per-query cost is ∝ Σ df(term) instead of
 *    corpus size — and results are bit-identical to the scan path.
 *  - [[rrfFuse]] runs over BOUNDED runs (each a top-k result set), so the
 *    single-partition rank windows are deliberate and cheap; the fusion
 *    itself is one tiny union + aggregate.
 *
 * Arithmetic is double-precision native-function only, so the DuckDB
 * oracle reproduces scores to ~1e-13 (`bm25_topk` / `hybrid_rrf` goldens).
 */
object Search {

  private def toks(text: Column): Column = split(text, " ")

  /** Shared term-list validation: non-empty list of non-empty terms (an
    * empty-string "term" would match the empty tokens double spaces
    * produce on the scan path while the postings index stores none —
    * reject it loudly instead of diverging). */
  private def checkTerms(terms: Seq[String]): Seq[String] = {
    require(terms.nonEmpty, "bm25: empty term list")
    require(terms.forall(t => t != null && t.nonEmpty),
      "bm25: null/empty query term")
    terms.distinct
  }

  /** Engine-neutral term -> bucket: first 8 hex chars of md5(term) mod
    * nBuckets (the same md5-key idiom the dedup/sharding ops use —
    * stable across JVMs, replayable in any engine). */
  private[ops] def termBucket(term: String, nBuckets: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % nBuckets).toInt
  }

  // explicit index-file schemas: an EMPTY corpus writes no part files
  // under the partitioned dirs, and schema inference would fail on the
  // read — the create-then-insert lifecycle must serve (issue_427
  // semantics). bucket is last (partition column).
  private val postingsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("term",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("tf",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("dl",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("bucket",
      org.apache.spark.sql.types.IntegerType)))
  // doc-length sidecar (Lucene's norms analogue): lets remove() shrink
  // the meta counts exactly, including docs whose text produced no
  // postings
  private val normsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("dl",
      org.apache.spark.sql.types.IntegerType)))

  /** Column form of [[termBucket]] — identical arithmetic in one
    * generated call off the digest bytes (no hex round trip; see
    * [[graft.functions.Md5BucketExpr]]). */
  private def termBucketCol(term: Column, nBuckets: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.Md5BucketExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(term),
        nBuckets.toLong)).cast("int")

  /** Corpus-level BM25 statistics: document count, mean document length
    * (in whitespace tokens), and per-query-term document frequency. */
  final case class Bm25Stats(nDocs: Long, avgDl: Double, df: Map[String, Long]) {
    /** Standard BM25 idf with the +1 floor (Lucene's formulation):
      * ln((N - df + 0.5) / (df + 0.5) + 1). StrictMath.log, NOT
      * Math.log: Catalyst's `log` codegen calls StrictMath, and the
      * postings path ([[PostingsIndex.score]]) computes idf as a column
      * — using the same fdlibm log here keeps the scan path's idf
      * literals bit-identical to the index path's (Math.log is JIT-
      * intrinsified and can differ in the last ulp). */
    def idf(term: String): Double = {
      val n = df.getOrElse(term, 0L).toDouble
      java.lang.StrictMath.log((nDocs - n + 0.5) / (n + 0.5) + 1.0)
    }
  }

  /** One stats pass for the given query terms (see class doc for the
    * scale shape). `terms` must be non-empty. */
  def bm25Stats(docs: DataFrame, textCol: String, terms: Seq[String]): Bm25Stats = {
    val ts = checkTerms(terms)
    val t = toks(col(textCol))
    // avgdl = exact token sum / ALL docs (a null/empty text row counts as
    // a zero-length doc, not a skipped one) — the same value the postings
    // index derives from its meta, so scan and index stats are identical
    // even on corpora with null rows
    val head = docs.agg(
      count(lit(1)).as("n"),
      coalesce(sum(size(t)), lit(0L)).cast("long").as("ntok")).head()
    val n = head.getLong(0)
    val avgDl = if (n == 0) 0.0 else head.getLong(1).toDouble / n
    val dfMap = docs
      .select(explode(array_intersect(array_distinct(t),
        lit(ts.toArray))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .collect()
      .map { case Row(term: String, c: Long) => term -> c }
      .toMap
    Bm25Stats(n, avgDl, dfMap)
  }

  /** BM25 scores for every document containing at least one query term
    * (`requireAll = true` keeps only docs containing EVERY term — AND
    * semantics): `(idCol, score)`. Pass precomputed `stats` to skip the
    * corpus pass (standing-corpus usage); k1/b are the standard
    * Robertson defaults. */
  def bm25Score(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
                stats: Option[Bm25Stats] = None,
                requireAll: Boolean = false): DataFrame = {
    require(docs.columns.contains(idCol) && docs.columns.contains(textCol),
      s"bm25: missing column $idCol/$textCol")
    val ts = checkTerms(terms)
    val st = stats.getOrElse(bm25Stats(docs, textCol, ts))
    val t = toks(col(textCol))
    // all per-term tfs in ONE codegen hash pass (the HOF-per-term
    // formulation is |terms| interpreted array scans — see TextExprKernels)
    val tfArr = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.TokenTfExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(t), ts))
    val dl = size(t).cast("double")
    // shared denominator piece: k1 * (1 - b + b * (dl / avgdl)) —
    // parenthesized exactly as the oracle SQL writes it
    val denomBase = lit(k1) * (lit(1.0 - b) + lit(b) * (dl / lit(st.avgDl)))
    def score(tfOf: Int => Column): Column = ts.zipWithIndex.map { case (term, i) =>
      val tf = tfOf(i)
      lit(st.idf(term)) * tf * lit(k1 + 1.0) / (tf + denomBase)
    }.reduce(_ + _)
    val scored = docs.filter(arrays_overlap(t, lit(ts.toArray)))
      .withColumn("_graft_tf", tfArr) // materialize: one tf pass per row
    val gate =
      if (!requireAll) lit(true)
      else ts.indices.map(i => element_at(col("_graft_tf"), i + 1) > 0)
        .reduce(_ && _)
    scored.filter(gate)
      .select(col(idCol),
        score(i => element_at(col("_graft_tf"), i + 1).cast("double"))
          .as("score"))
  }

  /** Top-k BM25: deterministic (score desc, id asc) TakeOrdered. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int, k1: Double = 1.2,
               b: Double = 0.75, stats: Option[Bm25Stats] = None,
               requireAll: Boolean = false): DataFrame =
    bm25Score(docs, idCol, textCol, terms, k1, b, stats, requireAll)
      .orderBy(col("score").desc, col(idCol)).limit(k)

  // ------------------------------------------------------------------
  // Inverted-index (postings) path — the keyword analogue of the vector
  // tiers' scan-vs-index story. The scan path above reads the CORPUS per
  // query; this builds a term-bucketed postings table once, after which
  // a query reads only its own terms' buckets: cost ∝ Σ df(term), flat
  // in corpus size. Bucketing by term hash (not one partition per term)
  // keeps the directory count fixed at any vocabulary size; Parquet
  // partition pruning eliminates the other buckets at the scan, and the
  // term filter prunes row groups inside a bucket via dictionary/stats.
  // ------------------------------------------------------------------

  /** Handle to a built postings index: `dir/postings` is
    * (bucket=<b>/) (term, doc_id, tf, dl) parquet, `dir/norms` the
    * per-doc length sidecar, `dir/meta.properties` (nDocs, nTokens,
    * nBuckets); df is derived at query time from the pruned postings. `avgDl` is derived (nTokens/nDocs) — exact-
    * integer sums, so incremental [[append]] and a fresh build agree
    * bit-for-bit. */
  final case class PostingsIndex(dir: String, nDocs: Long, nTokens: Long,
                                 nBuckets: Int) {
    /** Mean document length — nTokens/nDocs in double, the identical
      * value Spark's avg() computes on the scan path (exact integer sum
      * up to 2^53, same division). */
    def avgDl: Double = if (nDocs == 0) 0.0 else nTokens.toDouble / nDocs

    private def bucketOf(term: String): Int = Search.termBucket(term, nBuckets)

    /**
     * Incremental insert — the create-then-insert lifecycle: appends the
     * new docs' postings/norms into the bucket dirs (parquet append, no
     * rewrite of existing files) and extends the meta counts. Per-append
     * cost is proportional to the BATCH, never the standing index (df is
     * derived at query time from the pruned posting rows, so there is no
     * index-wide table to re-aggregate). Returns the updated handle;
     * search results are bit-identical to a fresh build over the union
     * (spec'd). Caller contract: `docs` must be NEW doc ids —
     * re-appending an id double-counts it (same contract as any postings
     * append).
     */
    def append(docs: DataFrame, idCol: String, textCol: String): PostingsIndex = {
      val updated = stageAppend(docs, idCol, textCol)
      // healStage == false here does NOT always mean failure: a concurrent
      // READER (loadPostings promotes committed stages too) can heal the
      // freshly-committed stage first, leaving this writer's heal with no
      // stage dir to resolve. The commit is real either way — accept iff
      // the on-disk meta already carries the marker's absolute counts.
      if (!Search.healStage(dir)) {
        val onDisk = Search.loadPostings(dir)
        require(onDisk.nDocs == updated.nDocs && onDisk.nTokens == updated.nTokens,
          s"postings append commit failed: $dir (meta " +
          s"${onDisk.nDocs}/${onDisk.nTokens} != committed " +
          s"${updated.nDocs}/${updated.nTokens})")
      }
      updated
    }

    /** First half of [[append]] — stages the batch and writes the COMMIT
      * marker but does NOT promote. On return the on-disk state equals a
      * crash immediately after the commit point; package-private as the
      * crash-injection test seam (PostingsCrashSpec). */
    private[ops] def stageAppend(docs: DataFrame, idCol: String,
                                 textCol: String): PostingsIndex = {
      val spark = docs.sparkSession
      // finish (or discard) an interrupted previous append first; a healed
      // COMMIT changed the on-disk meta, so re-derive the running counts
      val cur =
        if (Search.healStage(dir)) Search.loadPostings(dir) else this
      cur.ensureNorms(spark)
      val t = toks(col(textCol))
      val head = docs.agg(
        count(lit(1)).as("n"),
        coalesce(sum(size(t)), lit(0L)).cast("long").as("ntok")).head()
      val (dn, dtok) = (head.getLong(0), head.getLong(1))
      // STAGED COMMIT (the vector tiers' generation-pointer pattern): the
      // batch lands under stage/ first, then an atomically-renamed COMMIT
      // marker carries the updated counts, and only then do the staged
      // files promote into the live dirs + meta. A crash BEFORE the
      // marker discards the stage (the batch never logically landed —
      // rerunning the append cannot double-count); a crash AFTER it is
      // finished idempotently by the next heal (file moves are unique
      // part names, meta rewrite carries absolute counts). The promote +
      // meta + cleanup ARE [[Search.healStage]] — the recovery path runs
      // on every append, so it cannot rot.
      Search.writePostings(docs, idCol, textCol, s"$dir/stage/postings",
        cur.nBuckets, append = false)
      Search.writeNorms(docs, idCol, textCol, s"$dir/stage/norms",
        append = false)
      val updated =
        PostingsIndex(dir, cur.nDocs + dn, cur.nTokens + dtok, cur.nBuckets)
      Search.writeCommitMarker(updated)
      updated
    }

    /**
     * Bulk delete (the vacuum analogue): drops the given doc ids from
     * the postings and norms tables and shrinks the meta counts
     * EXACTLY (token counts come from the norms sidecar, so stats stay
     * bit-identical to a fresh build over the survivors — spec'd).
     * Rewrites into fresh table files via [[compact]]'s swap machinery.
     */
    def remove(ids: DataFrame, idCol: String): PostingsIndex = {
      val spark = ids.sparkSession
      // a committed-but-unpromoted append stage must land BEFORE the
      // rewrite reads the live dirs (else its files would promote into
      // the rewritten index later and double-count)
      val cur =
        if (Search.healStage(dir)) Search.loadPostings(dir) else this
      cur.ensureNorms(spark)
      val drop = ids.select(col(idCol).cast("long").as("__drop_id"))
      val gone = cur.readNorms(spark)
        .join(drop, col("doc_id") === col("__drop_id"), "left_semi")
        .agg(count(lit(1)).as("n"),
          coalesce(sum(col("dl")), lit(0L)).cast("long").as("ntok")).head()
      val (dn, dtok) = (gone.getLong(0), gone.getLong(1))
      cur.rewrite(spark, drop,
        PostingsIndex(dir, cur.nDocs - dn, cur.nTokens - dtok, cur.nBuckets))
    }

    /**
     * Compaction (the maintain analogue): after many [[append]] batches
     * each bucket dir holds one small file per batch task — the classic
     * small-file problem. Rewrites postings and norms into one file per
     * bucket partition, results unchanged.
     */
    def compact(spark: org.apache.spark.sql.SparkSession): PostingsIndex = {
      val cur =
        if (Search.healStage(dir)) Search.loadPostings(dir) else this
      cur.ensureNorms(spark)
      cur.rewrite(spark, spark.emptyDataFrame
        .withColumn("__drop_id", lit(0L)).limit(0), cur)
    }

    /** Pre-norms-era indexes (built before the sidecar existed) get
      * their norms BACKFILLED from the postings (exact for every doc
      * with at least one posting; a doc whose text produced no postings
      * cannot be recovered, so removing such a doc later will shrink
      * neither nDocs nor nTokens — a documented, bounded drift on
      * legacy indexes only; current builds write norms for every row).
      * Must run BEFORE an append writes partial norms. */
    private def ensureNorms(spark: org.apache.spark.sql.SparkSession): Unit =
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$dir/norms"))) {
        spark.read.schema(postingsSchema).parquet(s"$dir/postings")
          .groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
          .write.parquet(s"$dir/norms")
      }

    /** Shared rewrite: filter out dropped ids, write to side dirs, swap
      * via rename, refresh meta. Crash healing: a crash during the tmp
      * write leaves the live dir untouched (stale tmp cleared on the
      * next rewrite); a crash BETWEEN the two renames is healed by
      * restoring the -old backup at the start of the next rewrite (the
      * backup is only deleted after the new dir is in place). A crash
      * between the postings swap and the norms/meta refresh can leave
      * the sidecars one step behind the postings — rerun the
      * remove/compact to reconverge (documented; single-writer
      * maintenance is assumed, as with any on-disk index). */
    private def rewrite(spark: org.apache.spark.sql.SparkSession,
                        drop: DataFrame, next: PostingsIndex): PostingsIndex = {
      import java.nio.file.{Files, Paths}
      def heal(sub: String): Unit = {
        val live = Paths.get(s"$dir/$sub")
        val old = Paths.get(s"$dir/$sub-old")
        if (!Files.exists(live) && Files.exists(old)) Files.move(old, live)
      }
      heal("postings"); heal("norms")
      def swap(sub: String, write: String => Unit): Unit = {
        val tmp = s"$dir/$sub-rewrite"
        deleteTree(Paths.get(tmp)) // a crashed prior rewrite must not brick us
        write(tmp)
        val live = Paths.get(s"$dir/$sub")
        val old = Paths.get(s"$dir/$sub-old")
        deleteTree(old)
        Files.move(live, old)
        Files.move(Paths.get(tmp), live)
        deleteTree(old)
      }
      swap("postings", tmp =>
        spark.read.schema(postingsSchema).parquet(s"$dir/postings")
          .join(drop, col("doc_id") === col("__drop_id"), "left_anti")
          .repartition(col("bucket"))
          .sortWithinPartitions(col("bucket"), col("term"))
          .write.partitionBy("bucket").parquet(tmp))
      swap("norms", tmp =>
        readNorms(spark)
          .join(drop, col("doc_id") === col("__drop_id"), "left_anti")
          .write.parquet(tmp))
      Search.writeMeta(next)
      next
    }

    private[ops] def readNorms(
        spark: org.apache.spark.sql.SparkSession): DataFrame =
      spark.read.schema(normsSchema).parquet(s"$dir/norms")

    private def deleteTree(p: java.nio.file.Path): Unit =
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { java.nio.file.Files.delete(f); () })
      }


    /** BM25 stats for `terms` from the index alone: df(term) is exactly
      * the term's posting-row count (one row per (doc, term)), computed
      * from the SAME pruned bucket read the query itself pays — no
      * separate df table to keep consistent, so [[append]] never has to
      * re-aggregate anything corpus-sized. */
    def stats(spark: org.apache.spark.sql.SparkSession,
              terms: Seq[String]): Bm25Stats = {
      val ts = terms.distinct
      val buckets = ts.map(bucketOf).distinct.toArray
      val dfMap = spark.read.schema(postingsSchema).parquet(s"$dir/postings")
        .filter(col("bucket").isin(buckets: _*) && col("term").isin(ts: _*))
        .groupBy("term").agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(r.fieldIndex("term")) ->
          r.getLong(r.fieldIndex("df"))).toMap
      Bm25Stats(nDocs, avgDl, dfMap)
    }

    /** Index-served BM25 scores `(doc_id, score)` for every matching
      * doc — SINGLE-PASS: reads ONLY the query terms' posting buckets
      * (partition-pruned), pivots each doc's per-term tf into fixed
      * positions, and derives df(term) from the SAME pivoted exchange
      * (a 1-row aggregate broadcast back over the per-doc rows).
      * Because both the df aggregate and the scoring projection consume
      * the identical shuffle subtree, Spark's exchange reuse
      * (`ReusedExchange` / AQE stage reuse) executes the parquet scan
      * and the per-doc shuffle ONCE per query — no separate stats job,
      * buckets read once. idf is computed as a column with operand-for-
      * operand the same double arithmetic as [[Bm25Stats.idf]], and the
      * per-term contributions sum in fixed term order, so results stay
      * bit-identical to the scan path ([[bm25Score]] — spec'd). */
    def score(spark: org.apache.spark.sql.SparkSession, terms: Seq[String],
              k1: Double = 1.2, b: Double = 0.75,
              requireAll: Boolean = false): DataFrame = {
      val ts = Search.checkTerms(terms)
      val buckets = ts.map(bucketOf).distinct.toArray
      val posts = spark.read.schema(postingsSchema).parquet(s"$dir/postings")
        .filter(col("bucket").isin(buckets: _*) && col("term").isin(ts: _*))
      // pivot: one row per matched doc, per-term tf in fixed slots (each
      // doc has at most one posting per term, so the sums are exact).
      // dl rides as a GROUPING key, not first(dl): every doc has one dl,
      // so the groups are identical — and a grouping key can't be
      // column-pruned away, which keeps this exchange subtree IDENTICAL
      // in both consumers below so exchange reuse fires (an aggregated
      // first(dl) gets pruned out of the df branch, splitting the plans
      // and scanning the buckets twice).
      val tfCols = ts.zipWithIndex.map { case (term, i) =>
        coalesce(sum(when(col("term") === term, col("tf"))), lit(0))
          .as(s"__tf$i")
      }
      val pivoted = posts.groupBy(col("doc_id"), col("dl"))
        .agg(tfCols.head, tfCols.tail: _*)
      // df(term) = docs with tf > 0, over the SAME exchange as `pivoted`
      val dfCols = ts.indices.map(i =>
        coalesce(sum(when(col(s"__tf$i") > 0, lit(1L)).otherwise(lit(0L))),
          lit(0L)).as(s"__df$i"))
      val dfAgg = pivoted.agg(dfCols.head, dfCols.tail: _*)
      val dl = col("dl").cast("double")
      val denomBase = lit(k1) * (lit(1.0 - b) + lit(b) * (dl / lit(avgDl)))
      // idf as a column: the identical left-to-right double arithmetic
      // as Bm25Stats.idf (ln((N - df + 0.5) / (df + 0.5) + 1))
      def idfCol(i: Int): Column = {
        val n = col(s"__df$i").cast("double")
        log((lit(nDocs.toDouble) - n + lit(0.5)) / (n + lit(0.5)) + lit(1.0))
      }
      // fixed-order sum: tf = 0 contributes exactly 0.0 (idf > 0 under
      // the +1 floor, denom > 0), reproducing the scan path's term slice
      val contrib = ts.indices.map { i =>
        val tf = col(s"__tf$i").cast("double")
        idfCol(i) * tf * lit(k1 + 1.0) / (tf + denomBase)
      }
      val total = contrib.reduce(_ + _)
      val gate =
        if (!requireAll) lit(true)
        else ts.indices.map(i => col(s"__tf$i") > 0).reduce(_ && _)
      pivoted.crossJoin(broadcast(dfAgg))
        .filter(gate).select(col("doc_id"), total.as("score"))
    }

    /** Index-served BM25 top-k: [[score]] + deterministic TakeOrdered. */
    def search(spark: org.apache.spark.sql.SparkSession, terms: Seq[String],
               k: Int, k1: Double = 1.2, b: Double = 0.75,
               requireAll: Boolean = false): DataFrame =
      score(spark, terms, k1, b, requireAll)
        .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** Build the postings index under `dir`. SHUFFLE-FREE tf pass: the
    * per-doc term-frequency map comes from one codegen hash pass
    * (`TokenTfAllExpr` — the explode+groupBy formulation shuffles one
    * row per token OCCURRENCE; this emits one row per distinct
    * (doc, term) with no exchange at all), written straight out
    * bucket-partitioned; df is one partial-agg pass over the written
    * postings (column-pruned to `term`). Idempotent overwrite. */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String,
                    dir: String, nBuckets: Int = 64): PostingsIndex = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = docs.sparkSession
    val t = toks(col(textCol))
    val head = docs.agg(
      count(lit(1)).as("n"),
      coalesce(sum(size(t)), lit(0L)).cast("long").as("ntok")).head()
    val (n, ntok) = (head.getLong(0), head.getLong(1))
    writePostings(docs, idCol, textCol, s"$dir/postings", nBuckets, append = false)
    writeNorms(docs, idCol, textCol, s"$dir/norms", append = false)
    val idx = PostingsIndex(dir, n, ntok, nBuckets)
    writeMeta(idx)
    idx
  }

  /** The per-doc length sidecar shared by build and append. `target` is
    * the norms directory itself (live for build, stage/ for append). */
  private def writeNorms(docs: DataFrame, idCol: String, textCol: String,
                         target: String, append: Boolean): Unit =
    docs.select(col(idCol).cast("long").as("doc_id"),
        size(toks(col(textCol))).as("dl"))
      .write.mode(if (append) "append" else "overwrite")
      .parquet(target)

  /** The postings write shared by build and append: one codegen tf pass
    * per doc (`TokenTfAllExpr` — the explode+groupBy formulation shuffles
    * one row per token OCCURRENCE; this emits one row per distinct
    * (doc, term)), then ONE fixed-width shuffle clustering rows by
    * bucket and sorting (bucket, term) within each task. Without the
    * repartition, every write task sees all `nBuckets` partition values
    * and pays a dynamic-partition sort PLUS emits up to `nBuckets`
    * files (measured: the in-task sort was the wall of the 10M-doc
    * build); with it, each task writes a handful of bucket files whose
    * rows are term-sorted — the clustering [[PostingsIndex.score]]'s
    * row-group pruning depends on. The explicit (bucket, term) sort
    * satisfies the writer's partition-column ordering requirement, so
    * no second sort is inserted. */
  private def writePostings(docs: DataFrame, idCol: String, textCol: String,
                            target: String, nBuckets: Int,
                            append: Boolean): Unit = {
    val t = toks(col(textCol))
    val tfAll = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.TokenTfAllExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(t)))
    docs
      .select(col(idCol).cast("long").as("doc_id"), size(t).as("dl"),
        explode(tfAll).as("p"))
      .select(col("doc_id"), col("p.term").as("term"), col("p.tf").as("tf"),
        col("dl"), termBucketCol(col("p.term"), nBuckets).as("bucket"))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("term"))
      .write.mode(if (append) "append" else "overwrite")
      .partitionBy("bucket").parquet(target)
  }

  /** Atomic meta commit: write to a tmp file, then rename over the live
    * one — a crash mid-write can never leave a truncated/corrupt
    * meta.properties (the data dirs already get full swap/heal
    * treatment in `rewrite`; [[PostingsIndex.append]] stages each batch
    * behind a COMMIT marker so there is no data-before-meta window —
    * see [[healStage]]). */
  private def writeMeta(idx: PostingsIndex): Unit = {
    val p = new java.util.Properties()
    p.setProperty("nDocs", idx.nDocs.toString)
    p.setProperty("nTokens", idx.nTokens.toString)
    p.setProperty("nBuckets", idx.nBuckets.toString)
    val tmp = java.nio.file.Paths.get(idx.dir, "meta.properties.tmp")
    val w = java.nio.file.Files.newBufferedWriter(tmp)
    try p.store(w, "graft postings meta") finally w.close()
    java.nio.file.Files.move(tmp,
      java.nio.file.Paths.get(idx.dir, "meta.properties"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** The in-flight append's COMMIT marker: updated ABSOLUTE counts,
    * written tmp-then-atomic-rename so its existence is all-or-nothing.
    * Existence = the batch is logically committed (heal finishes the
    * promote); absence with a stage/ dir = the batch never landed (heal
    * discards it). */
  private def writeCommitMarker(idx: PostingsIndex): Unit = {
    val p = new java.util.Properties()
    p.setProperty("nDocs", idx.nDocs.toString)
    p.setProperty("nTokens", idx.nTokens.toString)
    p.setProperty("nBuckets", idx.nBuckets.toString)
    val tmp = java.nio.file.Paths.get(idx.dir, "stage", "COMMIT.tmp")
    val w = java.nio.file.Files.newBufferedWriter(tmp)
    try p.store(w, "graft postings append commit") finally w.close()
    java.nio.file.Files.move(tmp,
      java.nio.file.Paths.get(idx.dir, "stage", "COMMIT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Resolve an append's stage/ dir, in either direction. With a COMMIT
    * marker: promote every staged part file into the live postings/norms
    * dirs (moves are idempotent — unique part names, already-moved files
    * are simply absent from the stage), rewrite meta from the marker's
    * absolute counts, clear the stage; returns true. Without one, and
    * `discardUncommitted`: the append never logically committed — discard
    * the stage so a rerun cannot double-count; returns false. No stage
    * dir: returns false. Runs at the head of every append/rewrite AND as
    * the commit step of every successful append, so the recovery path is
    * exercised constantly rather than only after crashes.
    *
    * `discardUncommitted = false` is the READ-path mode (loadPostings):
    * a reader cannot tell a crashed append's leftovers from one that is
    * IN FLIGHT right now, and deleting a live writer's stage would
    * corrupt its commit — so loads promote committed stages but leave
    * uncommitted ones for the next WRITE operation (whose single-writer
    * contract makes the discard safe) to resolve. */
  private[ops] def healStage(dir: String,
                             discardUncommitted: Boolean = true): Boolean = {
    import java.nio.file.{Files, Paths, Path}
    val stage = Paths.get(dir, "stage")
    if (!Files.exists(stage)) return false
    val commit = stage.resolve("COMMIT")
    if (!Files.exists(commit)) {
      if (discardUncommitted) deleteTreeAt(stage)
      return false
    }
    // a RACING healer (writer commit + concurrent reader load) can
    // promote, rewrite meta, and clear the stage under us at ANY point
    // from here on: a vanished commit/stage means the OTHER healer
    // finished the job — report "nothing left to heal" (false), which
    // append() then validates against the on-disk meta. Files.walk wraps
    // mid-traversal IO errors in UncheckedIOException, so both shapes
    // are handled.
    def raced(e: Throwable): Boolean = e match {
      case _: java.nio.file.NoSuchFileException => true
      case u: java.io.UncheckedIOException =>
        u.getCause.isInstanceOf[java.nio.file.NoSuchFileException]
      case _ => false
    }
    try healCommitted(dir, stage, commit)
    catch { case e if raced(e) => false }
  }

  private def healCommitted(dir: String, stage: java.nio.file.Path,
                            commit: java.nio.file.Path): Boolean = {
    import java.nio.file.{Files, Paths, Path}
    def promote(sub: String): Unit = {
      val from = stage.resolve(sub)
      if (!Files.exists(from)) return
      // walk stage/<sub>/** and move each part file to the same relative
      // spot under the live dir (bucket=N subdirs created as needed)
      val s = Files.walk(from)
      try {
        s.filter(Files.isRegularFile(_)).forEach { f: Path =>
          val name = f.getFileName.toString
          if (name.startsWith("part-")) {
            val rel = from.relativize(f)
            val dest = Paths.get(dir, sub).resolve(rel)
            Files.createDirectories(dest.getParent)
            // a RACING healer (writer commit + concurrent reader load) may
            // have moved this part already — absence means done, not error
            try Files.move(f, dest,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            catch { case _: java.nio.file.NoSuchFileException => () }
          }
        }
      } finally s.close()
    }
    promote("postings")
    promote("norms")
    val p = new java.util.Properties()
    val r = Files.newBufferedReader(commit)
    try p.load(r) finally r.close()
    writeMeta(PostingsIndex(dir, p.getProperty("nDocs").toLong,
      p.getProperty("nTokens").toLong, p.getProperty("nBuckets").toInt))
    deleteTreeAt(stage)
    true
  }

  private def deleteTreeAt(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      // racing healers may delete concurrently — vanished entries are
      // fine. Files.walk wraps mid-traversal IO errors (a subdirectory
      // deleted between listing and visit) in UncheckedIOException, so
      // both the direct and the wrapped NoSuchFileException must pass.
      try java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => {
          try java.nio.file.Files.delete(f)
          catch {
            case _: java.nio.file.NoSuchFileException => ()
            case _: java.nio.file.DirectoryNotEmptyException => ()
          }
          ()
        })
      catch {
        case _: java.nio.file.NoSuchFileException => ()
        case e: java.io.UncheckedIOException
            if e.getCause.isInstanceOf[java.nio.file.NoSuchFileException] => ()
      }
    }

  /** Load a postings index built by [[buildPostings]]. */
  def loadPostings(dir: String): PostingsIndex = {
    // finish an interrupted COMMITTED append; leave an uncommitted stage
    // alone — it may be a live writer's in-flight batch (read-path mode)
    healStage(dir, discardUncommitted = false)
    val p = new java.util.Properties()
    val r = java.nio.file.Files.newBufferedReader(
      java.nio.file.Paths.get(dir, "meta.properties"))
    try p.load(r) finally r.close()
    val nDocs = p.getProperty("nDocs").toLong
    // pre-append-era metas stored avgDl instead of the exact token sum
    val nTokens = Option(p.getProperty("nTokens")).map(_.toLong)
      .getOrElse(math.round(p.getProperty("avgDl").toDouble * nDocs))
    PostingsIndex(dir, nDocs, nTokens, p.getProperty("nBuckets").toInt)
  }

  /**
   * Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
   * over a BOUNDED candidate set — the diversification stage after
   * retrieval: greedily pick argmax `lambda*rel - (1-lambda)*maxSim`
   * where maxSim is the picked doc's highest cosine similarity to the
   * already-selected set. First pick is the highest-rel candidate; all
   * argmaxes break ties by id; scores are rounded to 6dp before
   * comparison so the selection is engine-replayable (the oracle replays
   * it in SQL).
   *
   * Candidates are a top-N result set (ids + vectors + a relevance
   * column, e.g. `1 - cosdist` or a fused RRF score) and are collected
   * to the driver — the greedy loop is inherently sequential and N is
   * bounded by construction; `maxCandidates` fails loudly on misuse.
   * Returns (id, rank, mmr) with rank 1-based in selection order.
   */
  def mmr(candidates: DataFrame, idCol: String, vecCol: String,
          relCol: String, k: Int, lambda: Double = 0.5,
          maxCandidates: Int = 10000): DataFrame = {
    require(k >= 1, s"mmr: k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"mmr: lambda in [0,1], got $lambda")
    val spark = candidates.sparkSession
    import spark.implicits._
    val rows = candidates
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"),
        col(relCol).cast("double"))
      .as[(Long, Seq[Float], Double)].collect()
      .map { case (id, v, rel) => (id, v.toArray, rel) }
    require(rows.length <= maxCandidates,
      s"mmr: ${rows.length} candidates exceed maxCandidates=$maxCandidates — " +
      "MMR diversifies a bounded top-N result set, not a corpus")
    val n = rows.length
    def r6(v: Double): Double = // Spark round() semantics (decimal string);
      // + 0.0 kills -0.0 so zero scores tie identically in every engine
      BigDecimal(java.lang.Double.toString(v))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    def cosSim(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val picked = new Array[Boolean](n)
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    var step = 0
    while (step < math.min(k, n)) {
      var best = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!picked(i)) {
          val s = r6(if (step == 0) rows(i)._3
            else lambda * rows(i)._3 - (1.0 - lambda) * maxSim(i))
          if (best < 0 || s > bestScore ||
              (s == bestScore && rows(i)._1 < rows(best)._1)) {
            best = i; bestScore = s
          }
        }
        i += 1
      }
      picked(best) = true
      selected += ((rows(best)._1, bestScore))
      var j = 0
      while (j < n) {
        if (!picked(j)) {
          val s = cosSim(rows(j)._2, rows(best)._2)
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
      step += 1
    }
    selected.zipWithIndex
      .map { case ((id, s), r) => (id, (r + 1).toLong, s) }.toSeq
      .toDF(idCol, "rank", "mmr")
  }

  /**
   * Reciprocal-rank fusion (Cormack et al. 2009) over bounded runs.
   * Each run is a (resultSet, orderColumn) pair; rank within a run is
   * `row_number` over (orderColumn, id) — pass e.g. `col("score").desc`
   * for BM25 and `col("dist").asc` for ANN distance. Fused score is
   * sum over runs of 1 / (kRrf + rank); ids absent from a run simply
   * contribute nothing (the standard treatment).
   *
   * Runs MUST be bounded (top-k result sets): the rank window is a
   * deliberate single partition per run. Fusing unbounded tables is a
   * misuse — rank the runs with their own distributed top-k first.
   */
  def rrfFuse(runs: Seq[(DataFrame, Column)], idCol: String,
              kRrf: Int = 60, topK: Int = 0): DataFrame = {
    require(runs.nonEmpty, "rrfFuse: no runs")
    val contribs = runs.map { case (df, ord) =>
      val w = Window.orderBy(ord, col(idCol))
      df.select(col(idCol),
        (lit(1.0) / (lit(kRrf.toDouble) + row_number().over(w).cast("double")))
          .as("rrf"))
    }
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(idCol).agg(sum("rrf").as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol))
    if (topK > 0) fused.limit(topK) else fused
  }
}
