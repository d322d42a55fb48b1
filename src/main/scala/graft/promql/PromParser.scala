package graft.promql

/** Hand-written PromQL parser (subset) — the reference uses the public
  * promql-parser grammar (query/src/parser.rs `parse_promql`). Covers:
  * selectors with label matchers (= != =~ !~), range [d] and offset d,
  * functions, aggregations with by/without and parameters (topk, k;
  * quantile, q), full binary-operator precedence with `bool`, scalars,
  * parentheses, unary minus.
  */
object PromParser {

  sealed trait Expr
  final case class NumberLit(v: Double) extends Expr
  final case class Matcher(label: String, op: String, value: String)
  final case class Selector(name: String, matchers: Seq[Matcher],
      rangeMs: Option[Long], offsetMs: Long,
      atMs: Option[AtTime] = None) extends Expr
  /** `@` modifier: fixed epoch-ms, or the query's start()/end(). */
  sealed trait AtTime
  final case class AtLiteral(ms: Long) extends AtTime
  case object AtStart extends AtTime
  case object AtEnd extends AtTime
  final case class Call(fn: String, args: Seq[Expr]) extends Expr
  final case class StringLit(s: String) extends Expr
  final case class Agg(op: String, by: Seq[String], without: Boolean,
      param: Option[Expr], expr: Expr) extends Expr
  /** `expr[range:step]` — inner expr evaluated at `step` resolution,
    * then folded as a range vector. step=None uses the outer step. */
  final case class Subquery(expr: Expr, rangeMs: Long, stepMs: Option[Long],
      offsetMs: Long = 0L) extends Expr
  /** Vector matching modifier: `on(l1,...)` or `ignoring(l1,...)`,
    * optionally with `group_left(extra...)` / `group_right(extra...)`
    * many-to-one grouping. */
  final case class Matching(on: Boolean, labels: Seq[String],
      groupLeft: Boolean = false, groupRight: Boolean = false,
      extraLabels: Seq[String] = Nil)
  final case class Binary(op: String, lhs: Expr, rhs: Expr, boolMod: Boolean,
      matching: Option[Matching] = None) extends Expr
  final case class Unary(expr: Expr) extends Expr

  val AggOps = Set("sum", "min", "max", "avg", "count", "group", "stddev",
    "stdvar", "topk", "bottomk", "quantile", "count_values")

  /** Go-style string unescaping for promql string literals / matcher
    * values: `"10\\.0"` denotes the regex `10\.0`. Unknown escapes are
    * kept verbatim (lenient). */
  private[promql] def unescapeString(s: String): String = {
    if (!s.contains('\\')) return s
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\'); i += 2
          case '"'  => sb.append('"'); i += 2
          case '\'' => sb.append('\''); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 'x' if i + 3 < s.length + 1 &&
              s.length >= i + 4 &&
              s.substring(i + 2, i + 4).matches("[0-9a-fA-F]{2}") =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar)
            i += 4
          case _    => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def parseDuration(s: String): Long = {
    val re = "([0-9]+)(ms|s|m|h|d|w|y)".r
    re.findAllMatchIn(s).map { m =>
      val n = m.group(1).toLong
      n * (m.group(2) match {
        case "ms" => 1L
        case "s" => 1000L
        case "m" => 60000L
        case "h" => 3600000L
        case "d" => 86400000L
        case "w" => 7L * 86400000L
        case "y" => 365L * 86400000L
      })
    }.sum
  }

  // ---- lexer -----------------------------------------------------------
  private val TokenRe =
    ("""\s*(=~|!~|!=|==|>=|<=|[(){}\[\],+\-*/%^><=@]|"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*'|""" +
      """[0-9]+(?:\.[0-9]+)?(?:ms|s|m|h|d|w|y)[0-9a-z]*|[0-9]+\.?[0-9]*(?:[eE][+-]?[0-9]+)?|""" +
      """[A-Za-z_:][A-Za-z0-9_:]*)""").r

  def tokenize(s: String): List[String] =
    TokenRe.findAllMatchIn(s).map(_.group(1)).toList

  def parse(input: String): Expr = {
    val p = new P(tokenize(input))
    val e = p.expr()
    require(p.done, s"trailing tokens: ${p.rest}")
    e
  }

  private final class P(var toks: List[String]) {
    def done: Boolean = toks.isEmpty
    def rest: String = toks.mkString(" ")
    private def peek: Option[String] = toks.headOption
    private def next(): String = { val h = toks.head; toks = toks.tail; h }
    private def expect(t: String): Unit = {
      require(peek.contains(t), s"expected '$t' at: $rest"); next()
    }
    private def isDuration(t: String) = t.matches("[0-9]+(ms|s|m|h|d|w|y).*")

    def expr(): Expr = orExpr()

    private def binChain(sub: () => Expr, ops: Set[String]): Expr = {
      var l = sub()
      while (peek.exists(t => ops.contains(t.toLowerCase))) {
        val op = next().toLowerCase
        val boolMod = peek.contains("bool") && { next(); true }
        def labelList(): Seq[String] = {
          expect("(")
          val ls = scala.collection.mutable.ListBuffer.empty[String]
          while (!peek.contains(")")) { ls += stripIdent(next()); if (peek.contains(",")) next() }
          expect(")")
          ls.toSeq
        }
        var matching = peek.map(_.toLowerCase) match {
          case Some(k @ ("on" | "ignoring")) =>
            next()
            Some(Matching(on = k == "on", labelList()))
          case _ => None
        }
        peek.map(_.toLowerCase) match {
          case Some(g @ ("group_left" | "group_right")) =>
            next()
            val extras = if (peek.contains("(")) labelList() else Nil
            val base = matching.getOrElse(
              throw new IllegalArgumentException(s"$g requires on()/ignoring()"))
            matching = Some(base.copy(groupLeft = g == "group_left",
              groupRight = g == "group_right", extraLabels = extras))
          case _ =>
        }
        val r = sub()
        l = Binary(op, l, r, boolMod, matching)
      }
      l
    }

    private def orExpr(): Expr = binChain(() => andExpr(), Set("or"))
    private def andExpr(): Expr = binChain(() => cmpExpr(), Set("and", "unless"))
    private def cmpExpr(): Expr =
      binChain(() => addExpr(), Set("==", "!=", ">", "<", ">=", "<="))
    private def addExpr(): Expr = binChain(() => mulExpr(), Set("+", "-"))
    private def mulExpr(): Expr = binChain(() => powExpr(), Set("*", "/", "%", "atan2"))
    private def powExpr(): Expr = {
      val l = unary()
      if (peek.contains("^")) { next(); Binary("^", l, powExpr(), boolMod = false) }
      else l
    }

    private def unary(): Expr = peek match {
      case Some("-") => next(); Unary(unary())
      case Some("+") => next(); unary()
      case _ => primary()
    }

    private def primary(): Expr = {
      val t = peek.getOrElse(throw new IllegalArgumentException("unexpected end"))
      val base =
        if (t == "(") { next(); val e = expr(); expect(")"); e }
        else if (t == "{") {
          // matcher-block-only selector: `{"metric"}`
          // (promql/string_identifier.sql); general `{__name__=..,l=..}`
          // blocks stay unsupported like the reference planner's
          // bare-matcher path (promql/label.result pins empty results
          // there via a different mechanism)
          val matchers = parseMatcherBlock()
          require(matchers.exists(_.label == "__name__"),
            "bare matcher block must name exactly one metric")
          // the reference planner does not support bare matcher blocks
          // carrying ordinary label matchers — it plans them as an EMPTY
          // metric (promql/label.result pins ++/++), while the selector
          // still parses (flow-tql resolves source_table_names from it).
          // The __bare_block__ sentinel matches nothing at eval time.
          val reserved = Set("__name__", "__field__", "__schema__", "__database__")
          val plain = matchers.filterNot(_.label == "__name__")
          val marked =
            if (plain.exists(m => !reserved.contains(m.label)))
              plain :+ Matcher("__bare_block__", "=", "1")
            else plain
          Selector(matchers.find(_.label == "__name__").get.value,
            marked, None, 0L)
        }
        else if (t.matches("[0-9].*") && !isDuration(t)) { next(); NumberLit(t.toDouble) }
        // Prometheus number literals include NaN/Inf (case-insensitive)
        else if (t.equalsIgnoreCase("NaN")) { next(); NumberLit(Double.NaN) }
        else if (t.equalsIgnoreCase("Inf") || t.equalsIgnoreCase("+Inf")) {
          next(); NumberLit(Double.PositiveInfinity)
        }
        else if (t.startsWith("\"") || t.startsWith("'")) {
          next(); StringLit(unescapeString(t.substring(1, t.length - 1)))
        }
        else if (AggOps.contains(t.toLowerCase)) aggExpr()
        else identExpr()
      postfix(base)
    }

    /** A quoted token denotes a label/metric identifier with otherwise
      * illegal characters (promql/string_identifier.sql). */
    private def stripIdent(tok: String): String =
      if (tok.startsWith("\"") || tok.startsWith("'"))
        unescapeString(tok.substring(1, tok.length - 1))
      else tok

    /** `{ ... }` matcher list; a lone quoted string is the metric name. */
    private def parseMatcherBlock(): Seq[Matcher] = {
      expect("{")
      val ms = scala.collection.mutable.ListBuffer.empty[Matcher]
      while (!peek.contains("}")) {
        val label0 = next()
        if (peek.contains("}") || peek.contains(",")) {
          // bare string entry = metric-name matcher
          ms += Matcher("__name__", "=", stripIdent(label0))
        } else {
          val op = next()
          val raw = next()
          ms += Matcher(stripIdent(label0), op,
            unescapeString(raw.substring(1, raw.length - 1)))
        }
        if (peek.contains(",")) next()
      }
      expect("}")
      ms.toSeq
    }

    /** `[range]` / `[range:step]` and `offset d` apply to the finished
      * primary: plain ranges attach to selectors, colon forms become
      * subqueries over any expression. */
    private def postfix(e0: Expr): Expr = {
      var e = e0
      if (peek.contains("[")) {
        next()
        val range = parseDuration(next())
        var sawColon = false
        val step = peek match {
          case Some(s) if s.startsWith(":") && s.length > 1 =>
            next(); sawColon = true; Some(parseDuration(s.drop(1)))
          case Some(":") => next(); sawColon = true; None
          case _ => None
        }
        val isSub = sawColon || !e.isInstanceOf[Selector]
        expect("]")
        e = e match {
          case s: Selector if !isSub => s.copy(rangeMs = Some(range))
          case other => Subquery(other, range, step)
        }
      }
      // offset and @ may appear in either order
      var more = true
      while (more) {
        if (peek.exists(_.equalsIgnoreCase("offset"))) {
          next()
          // negative offsets look FORWARD (promql/offset_direction.sql's
          // `offset -60s`); the sign arrives as its own token
          val sign = if (peek.contains("-")) { next(); -1L } else 1L
          val off = sign * parseDuration(next())
          e = e match {
            case s: Selector => s.copy(offsetMs = off)
            case sq: Subquery => sq.copy(offsetMs = off)
            case other => other
          }
        } else if (peek.contains("@")) {
          next()
          val at = peek match {
            case Some("start") => next(); expect("("); expect(")"); AtStart
            case Some("end") => next(); expect("("); expect(")"); AtEnd
            case Some(n) => next(); AtLiteral((n.toDouble * 1000).toLong)
            case None => throw new IllegalArgumentException("@ needs a time")
          }
          e = e match {
            case s: Selector => s.copy(atMs = Some(at))
            case other =>
              throw new IllegalArgumentException("@ applies to selectors")
          }
        } else more = false
      }
      e
    }

    private def grouping(): (Seq[String], Boolean) = peek match {
      case Some(k) if k.equalsIgnoreCase("by") || k.equalsIgnoreCase("without") =>
        val without = next().equalsIgnoreCase("without")
        expect("(")
        val ls = scala.collection.mutable.ListBuffer.empty[String]
        while (!peek.contains(")")) { ls += stripIdent(next()); if (peek.contains(",")) next() }
        expect(")")
        (ls.toSeq, without)
      case _ => (Nil, false)
    }

    private def aggExpr(): Expr = {
      val op = next().toLowerCase
      var (by, without) = grouping()
      expect("(")
      val args = scala.collection.mutable.ListBuffer.empty[Expr]
      args += expr()
      while (peek.contains(",")) { next(); args += expr() }
      expect(")")
      if (by.isEmpty && !without) {
        val g = grouping(); by = g._1; without = g._2
      }
      val (param, body) =
        if (args.size == 2) (Some(args.head), args(1)) else (None, args.head)
      Agg(op, by, without, param, body)
    }

    private def identExpr(): Expr = {
      val name = next()
      if (peek.contains("(")) { // function call
        next()
        val args = scala.collection.mutable.ListBuffer.empty[Expr]
        if (!peek.contains(")")) {
          args += expr()
          while (peek.contains(",")) { next(); args += expr() }
        }
        expect(")")
        Call(name.toLowerCase, args.toSeq)
      } else { // selector
        var matchers = Seq.empty[Matcher]
        if (peek.contains("{")) matchers = parseMatcherBlock()
        // range/offset attach in postfix() so subqueries share the path
        val nameMatcher = matchers.find(m => m.label == "__name__")
        val metricName = nameMatcher.map(_.value).getOrElse(name)
        Selector(metricName, matchers.filterNot(_.label == "__name__"), None, 0L)
      }
    }
  }
}
