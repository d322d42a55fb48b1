package graft.logquery

import java.time.{Duration, Instant, LocalDate, LocalDateTime, YearMonth, ZoneOffset}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log-search IR — the reference's HTTP log query engine
  * (log-query/src/log_query.rs:26 `LogQuery`, `:112-146` `LogExpr`,
  * `:383` `ContentFilter`; planner query/src/log_query/planner.rs,
  * SURVEY.md §2.9). The IR compiles directly onto
  * filter/select/groupBy — no custom plan nodes needed.
  */
object LogQuery {

  // ---- content filters (log_query.rs:383) -----------------------------

  sealed trait ContentFilter
  final case class Exact(v: String) extends ContentFilter
  final case class Prefix(v: String) extends ContentFilter
  final case class Postfix(v: String) extends ContentFilter
  final case class Contains(v: String) extends ContentFilter
  final case class RegexMatch(pattern: String) extends ContentFilter
  case object Exist extends ContentFilter
  final case class Between(start: String, end: String,
      startInclusive: Boolean = true, endInclusive: Boolean = false) extends ContentFilter
  final case class GreatThan(v: String, inclusive: Boolean = false) extends ContentFilter
  final case class LessThan(v: String, inclusive: Boolean = false) extends ContentFilter

  private def contentCond(c: Column, f: ContentFilter): Column = f match {
    case Exact(v)      => c === v
    case Prefix(v)     => c.startsWith(v)
    case Postfix(v)    => c.endsWith(v)
    case Contains(v)   => c.contains(v)
    case RegexMatch(p) => c.rlike(p)
    case Exist         => c.isNotNull
    case Between(s, e, si, ei) =>
      val lo = if (si) c >= s else c > s
      val hi = if (ei) c <= e else c < e
      lo && hi
    case GreatThan(v, incl) => if (incl) c >= v else c > v
    case LessThan(v, incl)  => if (incl) c <= v else c < v
  }

  // ---- boolean filter tree (log_query.rs Filters) ---------------------

  sealed trait Filter
  /** Conjunction of content filters over one column. */
  final case class Cond(column: String, filters: Seq[ContentFilter]) extends Filter
  final case class And(fs: Seq[Filter]) extends Filter
  final case class Or(fs: Seq[Filter]) extends Filter
  final case class Not(f: Filter) extends Filter

  def filterCond(f: Filter): Column = f match {
    case Cond(c, fs) => fs.map(contentCond(col(c), _)).reduceOption(_ && _).getOrElse(lit(true))
    case And(fs)     => fs.map(filterCond).reduceOption(_ && _).getOrElse(lit(true))
    case Or(fs)      => fs.map(filterCond).reduceOption(_ || _).getOrElse(lit(false))
    case Not(x)      => !filterCond(x)
  }

  // ---- time filter (log_query.rs:187, canonicalize :198-260) ----------

  /** start/end/span in the reference's flexible formats; canonicalizes
    * to a half-open [startMs, endMs) epoch-ms range. Dates widen to
    * their full period ("2024-12" = that month). */
  final case class TimeFilter(start: Option[String] = None,
      end: Option[String] = None, span: Option[String] = None) {

    def canonicalize(nowMs: Long = System.currentTimeMillis()): (Long, Long) = {
      (start, end, span) match {
        case (Some(s), None, None) =>
          val (a, b) = parseRange(s)
          (a, b.getOrElse(
            throw new IllegalArgumentException(s"start '$s' needs end or span")))
        case (Some(s), Some(e), _) =>
          val (a, _) = parseRange(s)
          val (b0, bWide) = parseRange(e)
          (a, bWide.getOrElse(b0))
        case (Some(s), None, Some(sp)) =>
          val (a, _) = parseRange(s); (a, a + spanMs(sp))
        case (None, Some(e), Some(sp)) =>
          val (b, _) = parseRange(e); (b - spanMs(sp), b)
        case (None, None, Some(sp)) => (nowMs - spanMs(sp), nowMs)
        case _ => throw new IllegalArgumentException("invalid time filter")
      }
    }

    /** (startMs, Some(endMs)) when the string denotes a period. */
    private def parseRange(s: String): (Long, Option[Long]) = {
      val t = s.trim
      def ms(i: Instant) = i.toEpochMilli
      if (t.matches("\\d{4}")) {
        val y = t.toInt
        (ms(LocalDate.of(y, 1, 1).atStartOfDay.toInstant(ZoneOffset.UTC)),
          Some(ms(LocalDate.of(y + 1, 1, 1).atStartOfDay.toInstant(ZoneOffset.UTC))))
      } else if (t.matches("\\d{4}-\\d{2}")) {
        val ym = YearMonth.parse(t)
        (ms(ym.atDay(1).atStartOfDay.toInstant(ZoneOffset.UTC)),
          Some(ms(ym.plusMonths(1).atDay(1).atStartOfDay.toInstant(ZoneOffset.UTC))))
      } else if (t.matches("\\d{4}-\\d{2}-\\d{2}")) {
        val d = LocalDate.parse(t)
        (ms(d.atStartOfDay.toInstant(ZoneOffset.UTC)),
          Some(ms(d.plusDays(1).atStartOfDay.toInstant(ZoneOffset.UTC))))
      } else {
        val norm = t.replace(" ", "T")
        val inst =
          if (norm.endsWith("Z") || norm.matches(".*[+-]\\d{2}:\\d{2}$"))
            Instant.parse(norm)
          else LocalDateTime.parse(norm).toInstant(ZoneOffset.UTC)
        (ms(inst), None)
      }
    }

    private def spanMs(s: String): Long = {
      val t = s.trim.toLowerCase
      val m = "^(\\d+)\\s*(ms|s|sec|second|seconds|m|min|minute|minutes|h|hour|hours|d|day|days|w|week|weeks)$".r
      t match {
        case m(n, u) =>
          val base = u match {
            case "ms" => 1L
            case "s" | "sec" | "second" | "seconds" => 1000L
            case "m" | "min" | "minute" | "minutes" => 60000L
            case "h" | "hour" | "hours" => 3600000L
            case "d" | "day" | "days" => 86400000L
            case "w" | "week" | "weeks" => 7L * 86400000L
          }
          n.toLong * base
        case _ => throw new IllegalArgumentException(s"bad span: $s")
      }
    }
  }

  // ---- processing expressions (log_query.rs:112-146 LogExpr) ----------

  sealed trait LogExpr
  final case class NamedIdent(name: String) extends LogExpr
  final case class PositionalIdent(pos: Int) extends LogExpr
  final case class Literal(v: String) extends LogExpr
  final case class ScalarFunc(name: String, args: Seq[LogExpr],
      alias: Option[String] = None) extends LogExpr
  final case class AggFunc(name: String, args: Seq[LogExpr], alias: Option[String])
  final case class AggrFunc(exprs: Seq[AggFunc], by: Seq[LogExpr]) extends LogExpr
  /** Extract typed fields out of a JSON / CSV packed column. */
  final case class Decompose(expr: LogExpr, schema: String,
      fields: Seq[(String, String)]) extends LogExpr
  final case class BinaryOp(left: LogExpr, op: String, right: LogExpr) extends LogExpr
  final case class AliasExpr(expr: LogExpr, alias: String) extends LogExpr
  final case class FilterExpr(filter: Filter) extends LogExpr

  /** Pagination (log_query.rs:468). */
  final case class Limit(skip: Option[Int] = None, fetch: Option[Int] = None)

  /** Adjacent-line context around filter matches (log_query.rs:457):
    * by line count or by seconds, before/after separately. */
  sealed trait Context
  case object NoContext extends Context
  final case class Lines(before: Int, after: Int) extends Context
  final case class Seconds(before: Int, after: Int) extends Context

  /** The full request: table resolved by the caller to a DataFrame,
    * `timeColumn` is the table's time index in epoch-ms longs or
    * timestamps. */
  final case class Query(
      timeFilter: Option[TimeFilter] = None,
      filters: Option[Filter] = None,
      exprs: Seq[LogExpr] = Nil,
      columns: Seq[String] = Nil,
      limit: Limit = Limit(),
      context: Context = NoContext)

  // ---- planner (query/src/log_query/planner.rs equivalent) ------------

  private def exprToColumn(df: DataFrame, e: LogExpr): Column = e match {
    case NamedIdent(n)      => col(n)
    case PositionalIdent(i) => col(df.columns(i))
    case Literal(v)         => lit(v)
    case ScalarFunc(n, args, alias) =>
      val c = call_function(n, args.map(exprToColumn(df, _)): _*)
      alias.map(c.as).getOrElse(c)
    case BinaryOp(l, op, r) =>
      val (a, b) = (exprToColumn(df, l), exprToColumn(df, r))
      op match {
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        case "/" => a / b
        case "%" => a % b
        case "=" | "==" => a === b
        case "!=" | "<>" => a =!= b
        case ">" => a > b
        case ">=" => a >= b
        case "<" => a < b
        case "<=" => a <= b
        case "and" => a && b
        case "or" => a || b
        case other => throw new IllegalArgumentException(s"binary op: $other")
      }
    case AliasExpr(x, a) => exprToColumn(df, x).as(a)
    case other =>
      throw new IllegalArgumentException(s"not a column-level expr: $other")
  }

  /** Plan a log query over a resolved table frame. `timeColumn` must be
    * epoch-ms long or timestamp; the canonicalized range prunes
    * time-bucket partitions at the scan. */
  def plan(table: DataFrame, timeColumn: String, q: Query,
      nowMs: Long = System.currentTimeMillis()): DataFrame = {
    var df = table
    val tcMs =
      if (table.schema(timeColumn).dataType ==
        org.apache.spark.sql.types.LongType) col(timeColumn)
      else unix_millis(col(timeColumn).cast("timestamp"))

    q.timeFilter.foreach { tf =>
      val (s, e) = tf.canonicalize(nowMs)
      df = df.filter(tcMs >= s && tcMs < e)
    }

    q.filters.foreach { f =>
      val cond = filterCond(f)
      q.context match {
        case NoContext => df = df.filter(cond)
        case Seconds(b, a) =>
          // rows within the time neighbourhood of any match; matches are
          // few, so they broadcast and the semi-join dedups for free
          val times = df.filter(cond).select(tcMs.as("__mt")).distinct()
          df = df.join(broadcast(times),
            tcMs >= col("__mt") - b * 1000L && tcMs <= col("__mt") + a * 1000L,
            "left_semi")
        case Lines(b, a) =>
          // line context needs a total order over the stream — the
          // global window is the price of the semantics; Seconds is the
          // scale-friendly variant
          val w = org.apache.spark.sql.expressions.Window.orderBy(tcMs)
          val withRn = df.withColumn("__rn", row_number().over(w))
          val matches = withRn.filter(cond).select(col("__rn").as("__mrn"))
          df = withRn.join(broadcast(matches),
            col("__rn") >= col("__mrn") - b && col("__rn") <= col("__mrn") + a,
            "left_semi")
            .drop("__rn")
      }
    }

    q.exprs.foreach {
      case FilterExpr(f) => df = df.filter(filterCond(f))
      case Decompose(e, schema, fields) =>
        val src = exprToColumn(df, e)
        schema.toLowerCase match {
          case "json" =>
            fields.foreach { case (name, tpe) =>
              df = df.withColumn(name,
                get_json_object(src, s"$$.$name").cast(tpe))
            }
          case "csv" =>
            val parts = split(src, ",")
            fields.zipWithIndex.foreach { case ((name, tpe), i) =>
              df = df.withColumn(name, parts.getItem(i).cast(tpe))
            }
          case other => throw new IllegalArgumentException(s"decompose: $other")
        }
      case AggrFunc(aggs, by) =>
        val keys = by.map(exprToColumn(df, _))
        val aggCols = aggs.map { a =>
          val c = call_function(a.name, a.args.map(exprToColumn(df, _)): _*)
          a.alias.map(c.as).getOrElse(c)
        }
        df = df.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*)
      case AliasExpr(x, alias) =>
        df = df.withColumn(alias, exprToColumn(df, x))
      case ScalarFunc(n, args, alias) =>
        val c = call_function(n, args.map(exprToColumn(df, _)): _*)
        df = df.withColumn(alias.getOrElse(s"${n}_out"), c)
      case other =>
        df = df.select(exprToColumn(df, other))
    }

    if (q.columns.nonEmpty) df = df.select(q.columns.map(col): _*)
    q.limit match {
      case Limit(Some(skip), Some(fetch)) => df = df.offset(skip).limit(fetch)
      case Limit(Some(skip), None)        => df = df.offset(skip)
      case Limit(None, Some(fetch))       => df = df.limit(fetch)
      case _ =>
    }
    df
  }
}
