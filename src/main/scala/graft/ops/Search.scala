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
 *    one native column expression (per-term tf via array `filter`, df/idf
 *    baked in as literals). Top-k goes through Spark's TakeOrdered — no
 *    global sort materialization.
 *  - [[rrfFuse]] runs over BOUNDED runs (each a top-k result set), so the
 *    single-partition rank windows are deliberate and cheap; the fusion
 *    itself is one tiny union + aggregate.
 *
 * Arithmetic is double-precision native-function only, so the DuckDB
 * oracle reproduces scores to ~1e-13 (`bm25_topk` / `hybrid_rrf` goldens).
 */
object Search {

  private def toks(text: Column): Column = split(text, " ")

  /** Corpus-level BM25 statistics: document count, mean document length
    * (in whitespace tokens), and per-query-term document frequency. */
  final case class Bm25Stats(nDocs: Long, avgDl: Double, df: Map[String, Long]) {
    /** Standard BM25 idf with the +1 floor (Lucene's formulation):
      * ln((N - df + 0.5) / (df + 0.5) + 1). */
    def idf(term: String): Double = {
      val n = df.getOrElse(term, 0L).toDouble
      math.log((nDocs - n + 0.5) / (n + 0.5) + 1.0)
    }
  }

  /** One stats pass for the given query terms (see class doc for the
    * scale shape). `terms` must be non-empty. */
  def bm25Stats(docs: DataFrame, textCol: String, terms: Seq[String]): Bm25Stats = {
    require(terms.nonEmpty, "bm25: empty term list")
    val ts = terms.distinct
    val t = toks(col(textCol))
    val head = docs.agg(
      count(lit(1)).as("n"),
      coalesce(avg(size(t)), lit(0.0)).as("avgdl")).head()
    val n = head.getLong(0)
    val avgDl = head.getDouble(1)
    val dfMap = docs
      .select(explode(array_intersect(array_distinct(t),
        lit(ts.toArray))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .collect()
      .map { case Row(term: String, c: Long) => term -> c }
      .toMap
    Bm25Stats(n, avgDl, dfMap)
  }

  /** BM25 scores for every document containing at least one query term:
    * `(idCol, score)`. Pass precomputed `stats` to skip the corpus pass
    * (standing-corpus usage); k1/b are the standard Robertson defaults. */
  def bm25Score(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
                stats: Option[Bm25Stats] = None): DataFrame = {
    require(terms.nonEmpty, "bm25: empty term list")
    require(docs.columns.contains(idCol) && docs.columns.contains(textCol),
      s"bm25: missing column $idCol/$textCol")
    val ts = terms.distinct
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
    docs.filter(arrays_overlap(t, lit(ts.toArray)))
      .withColumn("_graft_tf", tfArr) // materialize: one tf pass per row
      .select(col(idCol),
        score(i => element_at(col("_graft_tf"), i + 1).cast("double"))
          .as("score"))
  }

  /** Top-k BM25: deterministic (score desc, id asc) TakeOrdered. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int, k1: Double = 1.2,
               b: Double = 0.75, stats: Option[Bm25Stats] = None): DataFrame =
    bm25Score(docs, idCol, textCol, terms, k1, b, stats)
      .orderBy(col("score").desc, col(idCol)).limit(k)

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
