package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines: language ID (stopword-hit
 * heuristic), quality scoring, token counting, fingerprinting.
 *
 * Everything oracle-checked is built from native Spark functions (stays
 * inside whole-stage codegen, no UDFs) with arithmetic that any
 * double-precision SQL engine reproduces exactly.
 */
object TextOps {

  /** Per-language stopword lists (tiny; the heuristic, not a model). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  private def toks(text: Column): Column = split(text, " ")

  /** Unicode normalization — the curation step that must run BEFORE any
    * hashing/dedup/shingling so that visually-identical byte sequences
    * (precomposed é vs e+combining accent, full-width forms, ligatures)
    * dedup together: NFC or NFKC, optional accent strip (NFD → drop
    * non-spacing marks → renormalize, the utf8proc `strip_accents`
    * semantics), optional ROOT-locale lowercase — applied in that
    * order, as one codegen expression (Spark has no built-in). */
  def normalizeText(text: Column, form: String = "nfc",
                    lower: Boolean = true,
                    stripAccents: Boolean = false): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.NormalizeTextExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(text),
        form, lower, stripAccents))

  /** Count of tokens that are in `words` (occurrences, not distinct). */
  def stopwordHits(text: Column, words: Seq[String]): Column = {
    val set = words.map(w => s"'${w}'").mkString("array(", ",", ")")
    size(filter(toks(text), t => array_contains(expr(set), t)))
  }

  /**
   * Predicted language: argmax of per-language stopword hits, ties broken
   * by list order (en first); zero hits everywhere => "und" (undetermined).
   */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (lang, words) => lang -> stopwordHits(text, words) }
    val maxScore = greatest(scores.map(_._2): _*)
    val pick = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(acc)
    }
    // foldRight ties: earliest list entry wins because later `when`s are
    // nested in the earlier one's otherwise branch
    pick
  }

  def tokenCount(text: Column): Column = size(toks(text))

  /** BPE-ish proxy token count: ceil(chars / 4) — the common estimator. */
  def bpeTokenCount(nChars: Column): Column =
    ceil(nChars.cast("double") / 4.0).cast("long")

  /** Average token length = non-space chars / token count. */
  def avgTokenLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / tokenCount(text)

  /** English stopword ratio — a classic quality signal. */
  def stopRatio(text: Column): Column =
    stopwordHits(text, stopwords.head._2).cast("double") / tokenCount(text)

  /**
   * Composite quality score in [0, 1]:
   *   min(1, tokens/100) * (0.5 + 0.5 * stop_ratio)
   * Deterministic double arithmetic; mirrors length+stopword heuristics.
   */
  def qualityScore(text: Column): Column =
    least(lit(1.0), tokenCount(text).cast("double") / 100.0) *
      (lit(0.5) + lit(0.5) * stopRatio(text))

  /** Stable full-document fingerprint (md5 of lowercased text). */
  def fingerprint(text: Column): Column = md5(to_binary(lower(text), lit("utf-8")))

  /** Rolling polynomial hash over tokens — Spark-side fingerprint for
    * shingle-free near-dup heuristics (not oracle-checked). */
  val rollingHash: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      var h = 0L
      text.split(' ').foreach { w => h = h * 1000003L + Dedup.hash64(w) }
      h
    }
}
