package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID (n-gram /
  * stopword heuristic), quality scoring, token counting, and document
  * fingerprinting (rolling hash). All but langId/fingerprint are pure
  * Column expressions.
  */
object TextAnalysis {

  /** Return row of [[textStatsUdf]] — a NAMED case class so Spark
    * derives the struct (with these exact field names) from ONE UDF
    * invocation. r10 built the struct from five `getField` copies of
    * the nondeterministic UDF, and nondeterminism disables
    * subexpression elimination, so the "one string pass" executed 5×
    * per row (r10 advice; plans/r10/text_stats_after.txt shows
    * UDF(text) five times in one Project). */
  final case class TextStatsRow(n_tokens: Long, n_subwords: Long,
      punct_ratio: Double, stopword_ratio: Double, mean_word_len: Double)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, 0)
      .otherwise(size(split(trim(c), "\\s+"))).cast("long")

  /** BPE-ish subword count: word chars split into runs of <=4 plus
    * punctuation/digit singletons — a deterministic proxy for tokenizer
    * budget estimation (a real BPE table plugs into the same shape). */
  def subwordCount(c: Column): Column =
    aggregate(
      transform(split(trim(c), "\\s+"), w => ceil(length(w).cast("double") / 4.0)),
      lit(0L), (acc, x) => acc + x.cast("long"))

  /** Punctuation ratio over non-space characters. */
  def punctRatio(c: Column): Column = {
    val noSpace = regexp_replace(c, "\\s", "")
    val noPunct = regexp_replace(noSpace, "[\\p{Punct}]", "")
    when(length(noSpace) === 0, 0.0)
      .otherwise((length(noSpace) - length(noPunct)).cast("double") / length(noSpace))
  }

  private val Stopwords = Seq("the", "a", "an", "of", "to", "in", "and",
    "is", "it", "that", "for", "on", "with", "as", "was", "at", "by")

  /** Fraction of tokens that are common English stopwords. */
  def stopwordRatio(c: Column): Column = {
    val toks = split(lower(trim(c)), "\\s+")
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(Stopwords.map(lit): _*))).cast("double") / size(toks))
  }

  def meanWordLength(c: Column): Column = {
    val toks = split(trim(c), "\\s+")
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(toks))
  }

  /** All five per-document stats in ONE string pass (optimization
    * round 10): the five Column formulations above evaluate ~6
    * `split(trim(text))` and 3 `regexp_replace` regex passes per row —
    * the HOF lambdas (transform/aggregate/filter) are
    * CodegenFallback, so Catalyst's subexpression elimination cannot
    * share the splits across the output columns. This UDF replicates
    * each formulation bit for bit (TextAnalysisSpec pins equality,
    * the text_stats oracle re-pins it cross-engine):
    *  - the token array is `Pattern("\s+").split(trimmed, -1)` — the
    *    exact engine+limit Spark's `split` uses, so leading/trailing
    *    `\t` empties survive identically;
    *  - `trim` removes ASCII space only (Spark trim semantics, NOT
    *    Java's String#trim which eats all <= 0x20);
    *  - lengths count CODE POINTS (Spark `length` = numChars);
    *  - the stopword pass lowercases through UTF8String.toLowerCase —
    *    Spark's own `lower` implementation;
    *  - punct ratio counts `\s`-class and `Punct`-class code points in
    *    one scan (both classes are BMP-ASCII, so the scan equals the
    *    two regexp_replace+length pipelines).
    * Returns null (all fields null) for null input, like the Column
    * forms. Fields: n_tokens, n_subwords, punct_ratio, stopword_ratio,
    * mean_word_len (pre-round — callers apply the same `round`). */
  val textStatsUdf: org.apache.spark.sql.expressions.UserDefinedFunction = {
    val ws = Pattern.compile("\\s+")
    val stop = Stopwords.toSet
    udf { (text: String) =>
      if (text == null) null
      else {
        // Spark trim: strip ASCII spaces only
        var a = 0; var b = text.length
        while (a < b && text.charAt(a) == ' ') a += 1
        while (b > a && text.charAt(b - 1) == ' ') b -= 1
        val trimmed = text.substring(a, b)
        val toks = ws.split(trimmed, -1)
        def cp(s: String): Long = s.codePointCount(0, s.length).toLong
        val nToks = toks.length.toLong
        val nTokens = if (trimmed.isEmpty) 0L else nToks
        var nSub = 0L; var lenSum = 0L; var nStop = 0L
        var ti = 0
        while (ti < toks.length) {
          val t = toks(ti)
          val n = cp(t)
          nSub += math.ceil(n / 4.0).toLong
          lenSum += n
          val lt = org.apache.spark.unsafe.types.UTF8String
            .fromString(t).toLowerCase.toString
          if (stop.contains(lt)) nStop += 1
          ti += 1
        }
        // one scan over code points: total non-\s chars + punct chars
        var total = 0L; var punct = 0L
        var i = 0
        while (i < text.length) {
          val c = text.codePointAt(i)
          val isWs = c == ' ' || c == '\t' || c == '\n' || c == 0x0B ||
            c == '\f' || c == '\r'
          if (!isWs) {
            total += 1
            if (c >= '!' && c <= '~' &&
              !(c >= '0' && c <= '9') && !(c >= 'A' && c <= 'Z') &&
              !(c >= 'a' && c <= 'z')) punct += 1
          }
          i += Character.charCount(c)
        }
        val punctRatio = if (total == 0L) 0.0 else punct.toDouble / total
        val stopRatio = if (nToks == 0L) 0.0 else nStop.toDouble / nToks
        val meanLen = if (nToks == 0L) 0.0 else lenSum.toDouble / nToks
        TextStatsRow(nTokens, nSub, punctRatio, stopRatio, meanLen)
      }
    }.asNondeterministic()
  }

  /** Struct column of [[textStatsUdf]] with the canonical field names —
    * exactly ONE UDF invocation per row (the case-class return type
    * carries the names; consumers `getField` out of a null struct and
    * see the same nulls the per-field Column forms produced). */
  def textStats(c: Column): Column = textStatsUdf(c)

  /** Composite quality score in [0,1]: length sweet spot, low
    * punctuation noise, natural stopword density. */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / 500.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(c) * 4.0)
    val stopScore = least(stopwordRatio(c) * 5.0, lit(1.0))
    round((lenScore * 0.4 + punctScore * 0.4 + stopScore * 0.2), 6)
  }

  // ---- language identification ----------------------------------------
  private val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "is", "of", "to", "that", "with", "for"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "es", "una", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "des", "est", "que", "une", "dans"),
    "it" -> Seq("il", "di", "che", "la", "per", "una", "sono", "con"),
    "pt" -> Seq("o", "de", "que", "e", "do", "da", "em", "um", "para"))

  /** Stopword-voting language ID with CJK charset shortcut. Returns a
    * language code or 'und'. */
  val langIdUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null || text.isEmpty) "und"
      else {
        val han = text.codePoints().filter(cp =>
          java.lang.Character.UnicodeScript.of(cp) == java.lang.Character.UnicodeScript.HAN).count()
        val kana = text.codePoints().filter { cp =>
          val s = java.lang.Character.UnicodeScript.of(cp)
          s == java.lang.Character.UnicodeScript.HIRAGANA ||
            s == java.lang.Character.UnicodeScript.KATAKANA
        }.count()
        val hangul = text.codePoints().filter(cp =>
          java.lang.Character.UnicodeScript.of(cp) == java.lang.Character.UnicodeScript.HANGUL).count()
        val cyr = text.codePoints().filter(cp =>
          java.lang.Character.UnicodeScript.of(cp) == java.lang.Character.UnicodeScript.CYRILLIC).count()
        if (kana > 0) "ja"
        else if (hangul > 0) "ko"
        else if (han > 0) "zh"
        else if (cyr > text.length / 4) "ru"
        else {
          val toks = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
          if (toks.isEmpty) "und"
          else {
            val votes = LangMarkers.view.mapValues(m =>
              toks.count(m.contains)).toMap
            val (lang, n) = votes.maxBy { case (l, n) => (n, l) }
            if (n == 0) "und" else lang
          }
        }
      }
    }

  def langId(c: Column): Column = langIdUdf(c)

  /** Winnowing-style fingerprint: min over word-3-gram 60-bit hashes
    * (md5-prefix, see [[graft.operators.Dedup.hash60]]) — stable under
    * whitespace/case normalization, and exactly replicable by a SQL
    * oracle. Texts shorter than 3 words hash the whole normalized text. */
  def fingerprint(c: Column): Column = {
    val grams = graft.operators.Dedup.shingles(c, 3)
    val norm = regexp_replace(lower(trim(c)), "\\s+", " ")
    coalesce(
      array_min(transform(grams, g =>
        conv(substring(md5(g), 1, 15), 16, 10).cast("long"))),
      conv(substring(md5(norm), 1, 15), 16, 10).cast("long"))
  }
}
