package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Gopher document-quality rule set (Rae et al. 2021,
  * arXiv:2112.11446, Table A1) as one composite keep/drop verdict — the
  * filter a pre-training curation pipeline applies before anything
  * else. Word/line rules are pure Column arithmetic (codegen'd, zero
  * shuffle); the repetition thresholds reuse
  * [[TextRepetition.repetitionStats]].
  *
  * Rules, with Gopher's published thresholds:
  *  - word count in [50, 100_000]
  *  - mean word length in [3, 10]
  *  - symbol-to-word ratio ('#', '...', Unicode ellipsis) <= 0.1
  *  - <= 90% of lines start with a bullet; <= 30% end with an ellipsis
  *  - >= 80% of words contain an alphabetic character
  *  - document contains >= 2 of Gopher's required stop words
  *  - repetition fractions under Table A1's caps (dup-line 0.30,
  *    dup-line-char 0.20, top-2/3/4-gram char 0.20/0.18/0.16,
  *    dup-5-gram char 0.15)
  *
  * Every count is an integer and every fraction one int/int division,
  * so a SQL oracle reproduces the verdict bit-for-bit.
  */
object GopherQuality {

  /** Gopher's required words — a document must contain at least 2. */
  val RequiredStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Struct of the discriminative metrics plus per-rule booleans and
    * the composite `keep`. */
  def flags(c: Column): Column = {
    val toks = filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)
    val nw = size(toks)
    val meanWl = when(nw > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nw)
      .otherwise(lit(0.0))
    val stopHits = size(array_intersect(
      array_distinct(toks), array(RequiredStops.map(lit): _*)))
    val alphaFrac = when(nw > 0,
      size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / nw)
      .otherwise(lit(0.0))
    val symbolRatio = when(nw > 0,
      (regexp_count(c, lit("#")) + regexp_count(c, lit("\\.\\.\\.")) +
        regexp_count(c, lit("…"))).cast("double") / nw)
      .otherwise(lit(0.0))
    val lines = filter(transform(split(c, "\n"), l => trim(l)),
      l => length(l) > 0)
    val nl = size(lines)
    val bulletFrac = when(nl > 0,
      size(filter(lines, l => l.rlike("^[•\\-\\*]"))).cast("double") / nl)
      .otherwise(lit(0.0))
    val ellEndFrac = when(nl > 0,
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$"))).cast("double") / nl)
      .otherwise(lit(0.0))
    val rep = TextRepetition.repetitionStats(c)

    val passWords = nw >= 50 && nw <= 100000
    val passMeanWl = meanWl >= 3.0 && meanWl <= 10.0
    val passSymbols = symbolRatio <= 0.1
    val passLines = bulletFrac <= 0.9 && ellEndFrac <= 0.3
    val passAlpha = alphaFrac >= 0.8
    val passStops = stopHits >= 2
    val passRepetition =
      rep.getField("dup_line_frac") <= 0.30 &&
        rep.getField("dup_line_char_frac") <= 0.20 &&
        rep.getField("top2gram_char_frac") <= 0.20 &&
        rep.getField("top3gram_char_frac") <= 0.18 &&
        rep.getField("top4gram_char_frac") <= 0.16 &&
        rep.getField("dup5gram_char_frac") <= 0.15

    struct(
      nw.cast("long").as("n_words"),
      meanWl.as("mean_word_len"),
      stopHits.cast("long").as("stop_hits"),
      passWords.as("pass_words"),
      passMeanWl.as("pass_mean_wl"),
      passSymbols.as("pass_symbols"),
      passLines.as("pass_lines"),
      passAlpha.as("pass_alpha"),
      passStops.as("pass_stops"),
      passRepetition.as("pass_repetition"),
      (passWords && passMeanWl && passSymbols && passLines && passAlpha &&
        passStops && passRepetition).as("keep"))
  }
}
