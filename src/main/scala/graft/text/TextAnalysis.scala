package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenization,
  * language ID (stopword-marker heuristic), quality scoring, document
  * fingerprinting. All column-level expressions (codegen'd, no UDFs): at
  * 100 TB these run as narrow maps over the scan with zero shuffle.
  */
object TextAnalysis {

  /** Whitespace tokenization (collapses runs; no empty tokens). */
  def tokens(text: Column): Column =
    split(trim(regexp_replace(text, "\\s+", " ")), " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Adjacent-token bigrams of a token array (space-joined). Pure array
    * arithmetic — scan-side, no shuffle. */
  def bigrams(toks: Column): Column = {
    val m = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), m), slice(toks, lit(2), m),
             (a, b) => concat_ws(" ", a, b))
  }

  /** BPE-ish subword segmentation: letter runs, single digits, punctuation
    * marks — the classic pre-tokenizer shape (GPT-2-style regex, reduced
    * to what both engines' regex dialects share). */
  val bpeIshPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeIshPattern), lit(0)))

  /** The C4/Gopher-style quality-filter cascade (q_filter_funnel's
    * rules) collapsed to ONE scan-side expression: the deepest stage a
    * doc passes — 0 (< 30 tokens), 1 (mean token length outside
    * [2,10]), 2 (top-token ratio > 20%), 3 (no stopword), 4 (passes
    * all). The batch funnel's rule-3 shuffle (per-(doc, tok) counts)
    * becomes a SORT-AND-SCAN over the token array — the top-token
    * count is the longest equal run of the sorted array, O(k log k)
    * instead of the distinct×filter fold's O(k²), which matters once
    * real web docs hit 10³–10⁴ tokens. Still exact for any length,
    * still a single codegen'd expression, and still what makes the
    * stage a DERIVABLE column the IVM machinery can maintain exactly
    * under deletes ([[graft.cdc.TableViews.withDerived]]). */
  def qualityStage(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks)
    val b1 = nTok >= 30
    val b2 = (length(regexp_replace(text, "\\s+", "")).cast("double") /
                nTok).between(2.0, 10.0)
    val topC = aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, t) => {
        val run = when(t === acc("prev"), acc("run") + 1).otherwise(lit(1))
        struct(t.as("prev"), run.as("run"),
               greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    val b3 = topC * 5 <= nTok
    val b4 = array_contains(toks, "the") || array_contains(toks, "a")
    when(!b1, 0).when(!b2, 1).when(!b3, 2).when(!b4, 3).otherwise(4)
  }

  /** Per-doc Shannon TOKEN ENTROPY in nats — the classic diversity
    * quality signal (low entropy = repetitive/templated text). Computed
    * scan-side with the same sorted-run fold as [[qualityStage]]'s
    * top-token count: walking the sorted token array, a run growing
    * from r−1 to r moves its c·ln c term by r·ln r − (r−1)·ln(r−1), so
    * ONE O(k log k) pass accumulates S = Σ cᵢ·ln cᵢ and
    * H = ln N − S/N — no explode, no shuffle, exact at any doc
    * length. */
  def tokenEntropy(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val s = aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0.0).as("run"), lit(0.0).as("acc")),
      (acc, t) => {
        val run = when(t === acc("prev"), acc("run") + 1.0).otherwise(lit(1.0))
        val grown = acc("acc") + run * log(run) -
          when(run > 1.0, (run - 1.0) * log(run - 1.0)).otherwise(lit(0.0))
        struct(t.as("prev"), run.as("run"), grown.as("acc"))
      },
      acc => acc("acc"))
    log(n) - s / n
  }

  /** Marker-word sets for the n-gram-free language-ID heuristic. Real
    * pipelines use fastText/CLD3; the heuristic is the point here — it is
    * a pure scan-side expression. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "ist"),
    "es" -> Seq("el", "la", "que"),
    "fr" -> Seq("le", "et", "les"))

  /** Occurrences of a word (space-delimited) inside text. */
  def wordHits(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val needle = s" $word "
    // non-overlapping occurrence count via length difference
    ((length(padded) - length(replace(padded, lit(needle), lit(""))))
      / needle.length).cast("int")
  }

  def langScore(text: Column, lang: String): Column =
    langMarkers(lang).map(w => wordHits(text, w)).reduce(_ + _)

  /** argmax over language scores, deterministic tie-break by lang order;
    * "und" (undetermined) when no marker hits at all. */
  def langId(text: Column): Column = {
    val langs = Seq("en", "de", "es", "fr")
    val scores = langs.map(l => langScore(text, l).as(l))
    val best = greatest(scores: _*)
    langs.foldRight(lit("und"): Column) { (l, acc) =>
      when(best > 0 && langScore(text, l) === best, lit(l)).otherwise(acc)
    }
  }

  /** Quality features: length, token stats, alpha/punct ratios, stopword
    * ratio — the standard cheap filters (C4/Gopher-style) before expensive
    * model-based scoring. */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
      nullif(length(text), lit(0)).cast("double")

  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") /
      nullif(length(text), lit(0)).cast("double")

  def avgTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") /
      nullif(tokenCount(text), lit(0)).cast("double")

  def stopwordRatio(text: Column): Column = {
    val stop = Seq("the", "a", "and", "of", "to", "in", "is", "that")
    stop.map(w => wordHits(text, w)).reduce(_ + _).cast("double") /
      nullif(tokenCount(text), lit(0)).cast("double")
  }

  /** Composite quality score in [0,1]: clamped blend of heuristics. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val alpha = coalesce(alphaRatio(text), lit(0.0))
    val stop = least(coalesce(stopwordRatio(text), lit(0.0)) * 4.0, lit(1.0))
    round(lenScore * 0.4 + alpha * 0.4 + stop * 0.2, 6)
  }

  /** Normalized content fingerprint: md5 of lowercased,
    * whitespace-collapsed text. Stable across engines (md5 is md5),
    * unlike xxhash64 whose seed/impl is Spark-specific. */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Rolling polynomial hash over tokens (order-sensitive, mod 1e9+7 to
    * stay overflow-safe under ANSI semantics): cheap order-aware signature
    * complementing the order-insensitive fingerprint. Engine-portable —
    * only uses ascii() and arithmetic. */
  def rollingTokenHash(text: Column): Column = {
    val p = lit(1000000007L)
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * 31L + pmod(ascii(t).cast("long") * 131L +
        length(t).cast("long"), p), p))
  }
}
