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

  def execute(spark: SparkSession, sql: String,
      resolveTable: String => (DataFrame, String, Seq[String]),
      defaultOriginMs: Long = 0L): DataFrame = {
    val stmt = sql.trim.stripSuffix(";")

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
    val (df0, tsCol, tags) = resolveTable(table)
    val isTsType = df0.schema(tsCol).dataType == TimestampType ||
      df0.schema(tsCol).dataType == TimestampNTZType
    var base = if (isTsType)
      df0.withColumn(tsCol, unix_millis(col(tsCol).cast("timestamp")))
    else df0
    whereOpt.foreach(w => base = base.filter(expr(w)))

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
