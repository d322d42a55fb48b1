package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Fulltext matching — reference
  * common/function/src/scalars/matches_term.rs and matches.rs
  * (SURVEY.md §2.2/§2.8). The `@@` SQL operator rewrites to
  * matches_term (reference query/src/optimizer/transcribe_atat.rs).
  *
  * matches_term: case-sensitive exact term/phrase match where ASCII
  * alphanumeric boundaries block partial-word hits ('cat' ∉ 'category',
  * 'cat' ∈ 'cat!'); non-ASCII (e.g. Han) edges match as substrings.
  *
  * matches: tantivy-style boolean query — bare terms are optional (OR),
  * `+term` must, `-term` must-not, AND/OR operators, parentheses,
  * "quoted phrases". Terms match case-insensitively with the same
  * boundary rule.
  */
object TextMatch {

  // char classes mirroring matches_term.rs:250-258 classify_char
  private final val AsciiWord = 0
  private final val Han = 1
  private final val UnicodeWord = 2
  private final val OtherClass = 3

  @inline private def classify(cp: Int): Int =
    if (cp < 128 && Character.isLetterOrDigit(cp)) AsciiWord
    else if (Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN) Han
    else if (Character.isLetterOrDigit(cp)) UnicodeWord
    else OtherClass

  // term kinds (matches_term.rs:268-287 classify_term): a Han-containing
  // term matches as a plain substring; a unicode-word term needs non-word
  // neighbors; an ascii-like term only rejects ascii-word neighbors
  private final val AsciiLike = 0
  private final val UnicodeWordTerm = 1
  private final val HanContaining = 2

  private def classifyTerm(q: String): Int = {
    var hasHan = false; var hasUni = false
    var i = 0
    while (i < q.length) {
      val cp = q.codePointAt(i)
      classify(cp) match {
        case Han => hasHan = true
        case UnicodeWord => hasUni = true
        case _ =>
      }
      i += Character.charCount(cp)
    }
    if (hasHan) HanContaining else if (hasUni) UnicodeWordTerm else AsciiLike
  }

  private def boundaryOk(kind: Int, neighborClass: Int): Boolean = kind match {
    case AsciiLike => neighborClass != AsciiWord
    case UnicodeWordTerm =>
      neighborClass != AsciiWord && neighborClass != UnicodeWord && neighborClass != Han
    case _ => true // HanContaining
  }

  /** Core matcher shared by matches_term (caseSensitive) and matches
    * terms — the reference's MatchesTermFinder::find
    * (matches_term.rs:289-360): a term edge that is itself a non-word
    * char satisfies that side's boundary unconditionally. */
  def termMatches(text: String, term: String, caseSensitive: Boolean): Boolean = {
    if (text == null || term == null) return false
    val t = if (caseSensitive) text else text.toLowerCase
    val q = if (caseSensitive) term else term.toLowerCase
    if (q.isEmpty) return t.isEmpty
    val kind = classifyTerm(q)
    val startsWithOther = classify(q.codePointAt(0)) == OtherClass
    val endsWithOther = classify(q.codePointBefore(q.length)) == OtherClass
    var idx = t.indexOf(q)
    while (idx >= 0) {
      val prevOk = startsWithOther || idx == 0 ||
        boundaryOk(kind, classify(t.codePointBefore(idx)))
      if (prevOk) {
        if (kind == HanContaining) return true
        val end = idx + q.length
        val nextOk = endsWithOther || end >= t.length ||
          boundaryOk(kind, classify(t.codePointAt(end)))
        if (nextOk) return true
      }
      idx = t.indexOf(q, idx + 1)
    }
    false
  }

  // ---- boolean query compiler for matches() ---------------------------

  private sealed trait Node
  private case class Term(s: String, must: Boolean = false, mustNot: Boolean = false) extends Node
  private case class Group(children: Seq[Node], must: Boolean = false, mustNot: Boolean = false) extends Node
  private case class And(l: Node, r: Node) extends Node
  private case class Or(l: Node, r: Node) extends Node

  private def tokenize(q: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < q.length) {
      q.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '(' | ')' | '+' | '-' => out += q.charAt(i).toString; i += 1
        case '"' =>
          val end = q.indexOf('"', i + 1)
          val stop = if (end < 0) q.length else end
          out += ("\"" + q.substring(i + 1, stop)); i = stop + 1
        case _ =>
          var j = i
          while (j < q.length && !q.charAt(j).isWhitespace &&
            !"()+-\"".contains(q.charAt(j))) j += 1
          out += q.substring(i, j); i = j
      }
    }
    out.toList
  }

  /** Recursive-descent parse; OR binds loosest, AND tighter, adjacency
    * = optional-list (tantivy default). */
  private def parse(tokens: List[String]): (Node, List[String]) = {
    def primary(ts: List[String], must: Boolean, mustNot: Boolean): (Node, List[String]) = ts match {
      case "(" :: rest =>
        val (n, rem) = parse(rest)
        val rem2 = rem.dropWhile(_ == ")") match { case r => r }
        (n match {
          // an already-signed group must NOT absorb the outer sign —
          // `-(-(a OR b))` is double negation (select/matches.result)
          case g: Group if !g.must && !g.mustNot =>
            g.copy(must = must, mustNot = mustNot)
          case other => Group(Seq(other), must, mustNot)
        }, if (rem.headOption.contains(")")) rem.tail else rem2)
      case "+" :: rest => primary(rest, must = true, mustNot = false)
      case "-" :: rest => primary(rest, must = false, mustNot = true)
      case t :: rest if t.startsWith("\"") => (Term(t.drop(1), must, mustNot), rest)
      case t :: rest => (Term(t, must, mustNot), rest)
      case Nil => (Group(Nil), Nil)
    }
    def andChain(ts: List[String]): (Node, List[String]) = {
      var (left, rest) = primary(ts, must = false, mustNot = false)
      while (rest.headOption.exists(t => t.equalsIgnoreCase("AND"))) {
        val (r, rem) = primary(rest.tail, must = false, mustNot = false)
        left = And(left, r); rest = rem
      }
      (left, rest)
    }
    // adjacency: collect nodes until OR / ')' / end
    var (first, rest) = andChain(tokens)
    val adj = scala.collection.mutable.ListBuffer[Node](first)
    while (rest.nonEmpty && rest.head != ")" && !rest.head.equalsIgnoreCase("OR")) {
      val (n, rem) = andChain(rest)
      adj += n; rest = rem
    }
    var node: Node = if (adj.size == 1) adj.head else Group(adj.toSeq)
    while (rest.headOption.exists(_.equalsIgnoreCase("OR"))) {
      val (r, rem) = parse(rest.tail)
      node = Or(node, r); rest = rem
      return (node, rest) // parse() consumed the remainder
    }
    (node, rest)
  }

  private def eval(n: Node, text: String): Boolean = n match {
    case Term(s, _, _) => termMatches(text, s, caseSensitive = false)
    // negation survives explicit AND/OR: `-over AND -lazy` is
    // NOT(over) AND NOT(lazy) (select/matches.result)
    case And(l, r) => evalSigned(l, text) && evalSigned(r, text)
    case Or(l, r) => evalSigned(l, text) || evalSigned(r, text)
    case Group(children, _, _) =>
      val musts = children.filter(isMust)
      val nots = children.filter(isMustNot)
      val opts = children.filterNot(c => isMust(c) || isMustNot(c))
      val mustsOk = musts.forall(evalPositive(_, text))
      val notsOk = !nots.exists(evalPositive(_, text))
      // tantivy: with no MUST clauses at least one SHOULD must match;
      // must_nots always exclude (`a AND b -c` = (a AND b) AND NOT c)
      if (musts.nonEmpty) mustsOk && notsOk
      else if (opts.nonEmpty) opts.exists(evalPositive(_, text)) && notsOk
      else notsOk
  }

  private def isMust(n: Node): Boolean = n match {
    case t: Term => t.must
    case g: Group => g.must
    case _ => false
  }
  private def isMustNot(n: Node): Boolean = n match {
    case t: Term => t.mustNot
    case g: Group => g.mustNot
    case _ => false
  }
  /** Like evalPositive but a must-not node contributes its NEGATION. */
  private def evalSigned(n: Node, text: String): Boolean =
    if (isMustNot(n)) !evalPositive(n, text) else evalPositive(n, text)

  private def evalPositive(n: Node, text: String): Boolean = eval(n match {
    case t: Term if t.mustNot || t.must => t.copy(must = false, mustNot = false)
    case g: Group if g.mustNot || g.must => g.copy(must = false, mustNot = false)
    case other => other
  }, text)

  def compile(query: String): String => Boolean = {
    val (ast, _) = parse(tokenize(query))
    text => text != null && eval(ast, text)
  }

  // ---- Column API ------------------------------------------------------

  private val matchesTermUdf =
    udf((text: String, term: String) => termMatches(text, term, caseSensitive = true))

  def matchesTerm(text: Column, term: Column): Column = matchesTermUdf(text, term)

  /** matches(col, 'query') with the pattern compiled once per literal
    * (closure capture ≈ reference MatchesConstantTermOptimizer). */
  def matches(text: Column, query: String): Column = {
    val pred = compile(query)
    udf((s: String) => pred(s)).apply(text)
  }
}
