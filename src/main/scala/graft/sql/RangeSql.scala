package graft.sql

import java.util.Locale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import graft.operators.RangeSelect
import graft.operators.RangeSelect.{Fill, RangeAgg}
import graft.promql.PromParser

/** SQL surface of the RANGE query (SURVEY.md §2.5) — the reference's
  * `RangePlanRewriter` (query/src/range_select/plan_rewrite.rs)
  * re-expressed as a two-phase rewrite:
  *
  *  1. every `<aggExpr> RANGE 'd' [FILL f]` annotation is lifted out of
  *     the SELECT list (arbitrary scalar nesting around it stays in the
  *     outer list, exactly like the reference's rewriter); each
  *     distinct range duration becomes one [[RangeSelect]] pass, joined
  *     on (ts, by) when durations differ
  *  2. the outer SELECT — with each annotated subexpression replaced by
  *     its generated alias — runs through `spark.sql` over the phase-1
  *     result, so scalar math / ORDER BY / LIMIT get Catalyst verbatim
  *
  * Grammar: `SELECT ... FROM t [WHERE c] ALIGN 'd' [TO 'origin'|TO ts]
  * [BY (cols)] [FILL f] [ORDER BY ... / LIMIT ...]`; FILL per expr
  * overrides the query-level default (plan_rewrite.rs semantics).
  */
object RangeSql {

  def looksLikeRange(sql: String): Boolean = {
    val u = sql.toUpperCase(Locale.ROOT)
    u.contains(" RANGE ") && u.contains(" ALIGN ")
  }

  private final case class Annotated(text: String, rangeMs: Long,
      fill: Option[Fill], alias: String)

  private def parseFill(tok: String): Fill = tok.toUpperCase(Locale.ROOT) match {
    case "NULL" => Fill.Null
    case "PREV" => Fill.Prev
    case "LINEAR" => Fill.Linear
    // integral consts stay integral so the filled column keeps its type
    case n if n.matches("-?\\d+") => Fill.Const(n.toLong)
    case n => Fill.Const(BigDecimal(n).toDouble)
  }

  private def splitTopComma(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]; var depth = 0; val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Walk left from the RANGE keyword to the start of the annotated
    * operand: a parenthesized group or call, plus a leading identifier
    * (the function name). */
  private def operandStart(s: String, rangeKw: Int): Int = {
    var i = rangeKw - 1
    while (i >= 0 && s.charAt(i).isWhitespace) i -= 1
    require(i >= 0 && s.charAt(i) == ')',
      s"RANGE must follow an aggregate call or (...) group: ${s.substring(0, rangeKw)}")
    var depth = 0
    while (i >= 0) {
      s.charAt(i) match {
        case ')' => depth += 1
        case '(' =>
          depth -= 1
          if (depth == 0) {
            var j = i - 1
            while (j >= 0 && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j -= 1
            return j + 1
          }
        case _ =>
      }
      i -= 1
    }
    throw new IllegalArgumentException(s"unbalanced parens before RANGE in: $s")
  }

  // ---- INTERVAL expressions in RANGE/ALIGN (range/interval.sql) -------

  /** `INTERVAL '1' day` / `'1 day'::INTERVAL` / sums / redundant casts →
    * milliseconds; None when the text isn't an interval expression. */
  private[sql] def intervalExprMs(text0: String): Option[Long] = {
    def strip(t0: String): String = {
      var t = t0.trim
      var changed = true
      while (changed) {
        changed = false
        val dropped = t.replaceAll("(?i)::\\s*INTERVAL", "").trim
        if (dropped != t) { t = dropped; changed = true }
        if (t.startsWith("(") && t.endsWith(")")) {
          // only strip when the parens match each other
          var d = 0; var ok = true
          t.zipWithIndex.foreach { case (c, i) =>
            if (c == '(') d += 1
            else if (c == ')') { d -= 1; if (d == 0 && i < t.length - 1) ok = false }
          }
          if (ok && d == 0) { t = t.substring(1, t.length - 1).trim; changed = true }
        }
      }
      t
    }
    def unitMs(u: String): Option[Long] = u.toLowerCase(Locale.ROOT) match {
      case "millisecond" | "milliseconds" | "ms" => Some(1L)
      case "second" | "seconds" | "s" => Some(1000L)
      case "minute" | "minutes" | "m" => Some(60000L)
      case "hour" | "hours" | "h" => Some(3600000L)
      case "day" | "days" | "d" => Some(86400000L)
      case "week" | "weeks" | "w" => Some(7L * 86400000L)
      case _ => None
    }
    def one(t0: String): Option[Long] = {
      val t = strip(t0)
      val lit = "(?i)^(?:INTERVAL\\s+)?'([^']+)'\\s*([A-Za-z]+)?$".r
      t match {
        case lit(body, unit0) =>
          Option(unit0) match {
            case Some(u) => unitMs(u).flatMap(ms =>
              body.trim.toLongOption.map(_ * ms))
            case None =>
              val hm = "^(\\d+)\\s*([A-Za-z]+)$".r
              body.trim match {
                case hm(n, u) => unitMs(u).map(n.toLong * _)
                case _ => None
              }
          }
        case _ => None
      }
    }
    // top-level '+' sum
    val t = strip(text0)
    var depth = 0; var inStr = false
    val parts = Seq.newBuilder[String]; val cur = new StringBuilder
    t.foreach {
      case '\'' => inStr = !inStr; cur += '\''
      case '(' if !inStr => depth += 1; cur += '('
      case ')' if !inStr => depth -= 1; cur += ')'
      case '+' if !inStr && depth == 0 => parts += cur.result(); cur.clear()
      case c => cur += c
    }
    parts += cur.result()
    val ps = parts.result().map(one)
    if (ps.exists(_.isEmpty)) None else Some(ps.flatten.sum)
  }

  /** Replace `RANGE (<interval expr>)` / `ALIGN (<interval expr>)` with
    * the quoted-duration spelling the main parser handles. */
  private def normalizeIntervalForms(stmt0: String): String = {
    var s = stmt0
    var changed = true
    while (changed) {
      changed = false
      val kw = "(?i)\\b(RANGE|ALIGN)\\s*\\(".r
      for (m <- kw.findAllMatchIn(s).toList if !changed) {
        val open = m.end - 1
        var d = 0; var i = open; var close = -1; var inStr = false
        while (i < s.length && close < 0) {
          val c = s.charAt(i)
          if (inStr) { if (c == '\'') inStr = false }
          else c match {
            case '\'' => inStr = true
            case '(' => d += 1
            case ')' => d -= 1; if (d == 0) close = i
            case _ =>
          }
          i += 1
        }
        if (close > 0) intervalExprMs(s.substring(open, close + 1)).foreach { ms =>
          s = s.substring(0, m.start) + s"${m.group(1)} '${ms}ms'" +
            s.substring(close + 1)
          changed = true
        }
      }
    }
    s
  }

  /** DataFusion within-aggregate ORDER BY on COMMUTATIVE aggregates
    * (range/nest.sql `min(val ORDER BY ts)`) — the order is irrelevant,
    * drop it. first/last_value keep their ORDER BY: Catalyst's
    * expression parser evaluates them with DataFusion's stable-sort tie
    * behavior (pinned by range/special_aggr.sql). */
  private def rewriteOrderedAggs(s: String): String =
    ("(?i)\\b(min|max|sum|count|avg)\\s*\\(" +
      "([^()]*?)\\s+ORDER\\s+BY\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*(?:ASC|DESC)?\\s*\\)").r
      .replaceAllIn(s, m => scala.util.matching.Regex.quoteReplacement(
        s"${m.group(1)}(${m.group(2).trim})"))

  def execute(spark: SparkSession, sql: String,
      resolveTable: String => (DataFrame, String, Seq[String]),
      defaultOriginMs: Long = 0L): DataFrame = {
    var stmt = rewriteOrderedAggs(
      normalizeIntervalForms(sql.trim.stripSuffix(";")))

    // ---- nested sources (range/nest.sql) ------------------------------
    // `FROM ( subquery ) [AS alias]`: a range-subquery evaluates
    // recursively with the outer running as plain SQL over it; a plain
    // subquery becomes the range query's source view
    val fromParen = "(?is)\\bFROM\\s*\\(".r.findFirstMatchIn(stmt)
    fromParen.foreach { fm =>
      val open = fm.end - 1
      var d = 0; var i = open; var close = -1; var inStr = false
      while (i < stmt.length && close < 0) {
        val c = stmt.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else c match {
          case '\'' => inStr = true
          case '(' => d += 1
          case ')' => d -= 1; if (d == 0) close = i
          case _ =>
        }
        i += 1
      }
      require(close > 0, s"unbalanced FROM ( in: $stmt")
      val sub = stmt.substring(open + 1, close).trim
      val after0 = stmt.substring(close + 1)
      val keywords = Set("WHERE", "ALIGN", "ORDER", "GROUP", "LIMIT", "BY",
        "UNION", "HAVING", "FILL", "TO")
      val aliasM = "(?is)^\\s*(?:AS\\s+)?([A-Za-z_][A-Za-z0-9_]*)".r
        .findFirstMatchIn(after0)
        .filterNot(a => keywords.contains(a.group(1).toUpperCase(Locale.ROOT)))
      val after = aliasM.map(a => after0.substring(a.end)).getOrElse(after0)
      val view = s"__range_src_${System.nanoTime()}"
      if (looksLikeRange(sub)) {
        // inner range query; outer is plain SQL
        execute(spark, sub, resolveTable, defaultOriginMs)
          .createOrReplaceTempView(view)
        var outerSql = stmt.substring(0, fm.start) + s" FROM $view" + after
        aliasM.foreach(a =>
          outerSql = outerSql.replaceAll("\\b" + a.group(1) + "\\.", ""))
        return spark.sql(outerSql)
      } else {
        spark.sql(sub).createOrReplaceTempView(view)
        stmt = stmt.substring(0, fm.start) + s" FROM $view" + after
        aliasM.foreach(a =>
          stmt = stmt.replaceAll("\\b" + a.group(1) + "\\.", ""))
      }
    }

    // ---- tail clauses: FROM / WHERE / ALIGN / TO / BY / FILL / ORDER --
    val tailRx =
      ("(?is)^(SELECT\\s+.*?)\\s+FROM\\s+([A-Za-z_][A-Za-z0-9_]*)" +
        "(?:\\s+WHERE\\s+(.*?))?" +
        "\\s+ALIGN\\s+'([^']+)'" +
        "(?:\\s+TO\\s+('[^']*'|\\S+))?" +
        "(?:\\s+BY\\s+\\(([^)]*)\\))?" +
        "(?:\\s+FILL\\s+(\\w+))?" +
        "(\\s*ORDER\\s+BY\\s+.*|\\s*LIMIT\\s+.*)?$").r

    val m = tailRx.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(s"cannot parse RANGE query: $stmt"))
    val selectPart = m.group(1)
    val table = m.group(2)
    val whereOpt = Option(m.group(3))
    val alignMs = PromParser.parseDuration(m.group(4))
    val toOpt = Option(m.group(5))
    val byOpt = Option(m.group(6))
    val defaultFill = Option(m.group(7)).map(parseFill)
    val trailer = Option(m.group(8)).getOrElse("")

    // ---- lift RANGE annotations out of the select list ---------------
    val rangeRx = "(?i)\\bRANGE\\s+'([^']+)'(?:\\s+FILL\\s+(\\w+))?".r
    val annots = scala.collection.mutable.ListBuffer.empty[Annotated]
    var outer = selectPart
    var idx = 0
    var mm = rangeRx.findFirstMatchIn(outer)
    while (mm.isDefined) {
      val g = mm.get
      val start = operandStart(outer, g.start)
      val alias = s"__r$idx"
      val text = outer.substring(start, g.start).trim
      // `distinct *` would silently count internal grid columns
      require(!text.toLowerCase(Locale.ROOT).contains("distinct *"),
        s"RANGE does not support DISTINCT *: $text")
      annots += Annotated(text,
        PromParser.parseDuration(g.group(1)),
        Option(g.group(2)).map(parseFill), alias)
      outer = outer.substring(0, start) + alias + outer.substring(g.end)
      idx += 1
      mm = rangeRx.findFirstMatchIn(outer)
    }
    require(annots.nonEmpty, s"no RANGE expressions in: $stmt")

    // ---- phase 1: aggregate per distinct range duration ---------------
    val (df0, tsCol, tags) =
      try resolveTable(table)
      catch {
        case _: Exception =>
          // nested-subquery views aren't catalog tables: time index is
          // the first timestamp-typed column, grouping comes from BY
          val df = spark.table(table)
          val ts = df.schema.fields.find(f =>
            f.dataType == TimestampType || f.dataType == TimestampNTZType)
            .map(_.name).getOrElse("ts")
          (df, ts, Seq.empty[String])
      }
    val isTsType = df0.schema(tsCol).dataType == TimestampType ||
      df0.schema(tsCol).dataType == TimestampNTZType
    // WHERE runs against the source's own types, BEFORE the ts→ms
    // rewrite (range/nest.sql filters ts against a timestamp literal)
    var base = df0
    whereOpt.foreach(w => base = base.filter(expr(w)))
    if (isTsType)
      base = base.withColumn(tsCol, unix_millis(col(tsCol).cast("timestamp")))

    // BY items may be expressions (`BY (length(host))`, `BY (2)`); each
    // non-identifier item becomes a computed key column, and the outer
    // select text references it by the generated name
    val byItems = byOpt.map(splitTopComma).getOrElse(tags)
    val by = byItems.zipWithIndex.map { case (item, i) =>
      if (item.matches("[A-Za-z_][A-Za-z0-9_]*")) item
      else {
        val alias = s"__by$i"
        base = base.withColumn(alias, expr(item))
        outer = outer.replaceAll(
          "(?<![A-Za-z0-9_])" + java.util.regex.Pattern.quote(item) + "(?![A-Za-z0-9_])",
          alias)
        alias
      }
    }
    val alignTo = toOpt.map { t =>
      val v = t.stripPrefix("'").stripSuffix("'")
      if (v.matches("-?\\d+")) v.toLong
      else java.time.Instant.parse(if (v.endsWith("Z")) v else v + "Z").toEpochMilli
    }.getOrElse(defaultOriginMs)

    val groups = annots.toList.groupBy(_.rangeMs)
    val parts = groups.map { case (rangeMs, as) =>
      RangeSelect(base, tsCol, by, alignMs, rangeMs,
        as.map(a => RangeAgg(a.alias, _ => expr(a.text),
          a.fill.orElse(defaultFill).getOrElse(Fill.None))),
        alignTo)
    }.toList
    val joined = parts.reduce { (a, b) =>
      a.join(b, (tsCol +: by).toSeq, "full_outer")
    }

    // ---- phase 2: outer projection over the aggregated frame ----------
    val restored = if (isTsType)
      joined.withColumn(tsCol, timestamp_millis(col(tsCol)))
    else joined
    val view = s"__range_${System.nanoTime()}"
    restored.createOrReplaceTempView(view)
    spark.sql(s"$outer FROM $view$trailer")
  }
}
