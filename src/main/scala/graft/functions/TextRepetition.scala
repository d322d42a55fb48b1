package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Gopher-style repetition quality filters (Rae et al. 2021,
  * arXiv:2112.11446, Table A1): the standard pre-training corpus
  * signals for dropping boilerplate/spam documents — fraction of
  * duplicate lines, character mass of duplicate lines, character mass
  * of the most frequent word n-gram, character mass of repeated word
  * n-grams.
  *
  * Everything is per-document: a single forward pass over the text
  * builds hash-count maps, so the operator is embarrassingly parallel
  * (no shuffle, no state) and scales with corpus bytes. Deliberately
  * one struct-returning UDF rather than a chain of higher-order Column
  * functions: HOF lambdas re-evaluate their argument subtree per
  * element (see the measured note on [[graft.operators.Dedup.shingles]]),
  * so a Column formulation re-runs the normalize+split regex O(grams)
  * times per document.
  *
  * All counts are integers and every fraction is one int/int double
  * division, so an external SQL oracle (DuckDB) reproduces the values
  * bit-for-bit.
  */
object TextRepetition {

  /** n for the "top n-gram char fraction" metrics (Gopher uses 2..4). */
  val TopNs: Seq[Int] = Seq(2, 3, 4)

  /** n for the "duplicate n-gram char fraction" metric (Gopher 5..10;
    * one representative n keeps the output narrow). */
  val DupN: Int = 5

  case class RepStats(
      n_lines: Int,
      dup_line_frac: Double,
      dup_line_char_frac: Double,
      top2gram_char_frac: Double,
      top3gram_char_frac: Double,
      top4gram_char_frac: Double,
      dup5gram_char_frac: Double)

  /** a < b in code-point order (== UTF-8 binary order, the collation
    * SQL engines use for ORDER BY on UTF-8 strings). */
  private def cpLess(a: String, b: String): Boolean = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    a.length - i < b.length - j // the exhausted (prefix) side sorts first
  }

  private def gramFracs(ws: Array[String], n: Int, normChars: Double): (Double, Double) = {
    if (ws.length < n || normChars <= 0) return (0.0, 0.0)
    val cnt = new java.util.HashMap[String, Int]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= ws.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        j += 1
      }
      cnt.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    // top gram: max count, ties broken by lexicographically smallest
    // gram in CODE-POINT order — identical to UTF-8 binary order, i.e.
    // the DuckDB oracle's ORDER BY gram collation. (String.compareTo is
    // UTF-16 code-unit order, which ranks supplementary-plane grams
    // below U+E000..U+FFFF ones and would flip such ties cross-engine.)
    var bestCnt = 0
    var bestGram: String = null
    var dupChars = 0L
    val it = cnt.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val g = e.getKey
      val c = e.getValue
      if (c > bestCnt || (c == bestCnt && (bestGram == null || cpLess(g, bestGram)))) {
        bestCnt = c
        bestGram = g
      }
      if (c > 1) dupChars += c.toLong * g.length
    }
    val topFrac = if (bestGram == null) 0.0 else bestCnt.toLong * bestGram.length / normChars
    (topFrac, dupChars / normChars)
  }

  /** One-pass repetition statistics. Lines split on '\n' (trimmed,
    * empties dropped); words split on any whitespace, lowercased.
    * Character mass is measured over the words joined by single
    * spaces (i.e. whitespace-normalized text). */
  val statsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) RepStats(0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
      else {
        val lines = text.split("\n").map(_.trim).filter(_.nonEmpty)
        val nLines = lines.length
        var dupLineFrac = 0.0
        var dupLineCharFrac = 0.0
        if (nLines > 0) {
          val cnt = new java.util.HashMap[String, Int]()
          lines.foreach(l => cnt.merge(l, 1, (a, b) => a + b))
          dupLineFrac = (nLines - cnt.size).toDouble / nLines
          var total = 0L
          var dup = 0L
          val it = cnt.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val chars = e.getValue.toLong * e.getKey.length
            total += chars
            if (e.getValue > 1) dup += chars
          }
          dupLineCharFrac = if (total == 0) 0.0 else dup.toDouble / total
        }
        val ws = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val normChars =
          if (ws.isEmpty) 0.0
          else (ws.map(_.length.toLong).sum + (ws.length - 1)).toDouble
        val (t2, _) = gramFracs(ws, 2, normChars)
        val (t3, _) = gramFracs(ws, 3, normChars)
        val (t4, _) = gramFracs(ws, 4, normChars)
        val (_, d5) = gramFracs(ws, DupN, normChars)
        RepStats(nLines, dupLineFrac, dupLineCharFrac, t2, t3, t4, d5)
      }
    }

  def repetitionStats(c: Column): Column = statsUdf(c)

  /** Regroup whitespace words into '\n'-separated lines of `k` words —
    * gives line-based metrics a defined meaning on single-line corpora
    * (and a deterministic shape any SQL engine can replicate). */
  def relinear(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) null
      else {
        val ws = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        ws.grouped(k).map(_.mkString(" ")).mkString("\n")
      }
    }
}
