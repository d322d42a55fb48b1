package graft.promql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import PromParser._
import PromQL._

/** AST evaluator: PromParser.Expr -> InstantVector (the PromPlanner
  * equivalent, reference query/src/promql/planner.rs). `TQL EVAL
  * (start, end, step) q` == `new PromEval(...).evalQuery(q)`.
  */
final class PromEval(
    spark: SparkSession,
    catalog: Map[String, Metric],
    params: EvalParams) {

  private val RangeFns = Set("rate", "increase", "delta", "irate", "idelta",
    "changes", "resets", "deriv", "predict_linear", "quantile_over_time",
    "avg_over_time", "min_over_time", "max_over_time", "sum_over_time",
    "count_over_time", "last_over_time", "stddev_over_time",
    "stdvar_over_time", "present_over_time", "absent_over_time")

  private val TimeFns = Set("time", "minute", "hour", "month", "year",
    "day_of_month", "day_of_week", "day_of_year", "days_in_month")

  def evalQuery(q: String): DataFrame = eval(parse(q)) match {
    case Right(iv) => iv.output
    case Left(s) => scalarLiteral(spark, params, s).output
  }

  def evalVector(q: String): InstantVector = eval(parse(q)) match {
    case Right(iv) => iv
    case Left(s) => scalarLiteral(spark, params, s)
  }

  private def metricOf(sel: Selector): Metric = {
    val m = catalog.getOrElse(sel.name,
      // a non-existent metric is an EMPTY instant vector, not an error
      // (tql/range.result: sum(rate(non_existent_table[1m])) → ++ ++)
      Metric(spark.range(0).select(lit(0L).as("__ms"), lit(0.0).as("__value")),
        "__ms", "__value", Nil))
    // reserved matchers (tql/basic.sql): __schema__/__database__ scope
    // the query to a schema; __field__ picks the value column
    val (reserved, plain) = sel.matchers.partition(mt =>
      Set("__schema__", "__database__", "__field__").contains(mt.label))
    var base = m
    reserved.foreach { mt =>
      mt.label match {
        case "__schema__" | "__database__" =>
          if (mt.value != "public" && mt.value != "greptime")
            base = base.copy(df = base.df.filter(lit(false)))
        case "__field__" =>
          require(base.df.columns.contains(mt.value),
            s"field ${mt.value} not found")
          base = base.copy(df = base.df.withColumn(base.value,
            col(s"`${mt.value}`").cast("double")))
      }
    }
    val filtered = plain.foldLeft(base.df) { (df, mt) =>
      // a matcher on an ABSENT label compares against the empty string
      // (prometheus semantics; tql/range.result's non_existent_label)
      val absent = !df.columns.contains(mt.label)
      def rx = s"^(?:${mt.value})$$"
      mt.op match {
        case "=" =>
          if (absent) { if (mt.value == "") df else df.filter(lit(false)) }
          else df.filter(col(s"`${mt.label}`") === mt.value)
        case "!=" =>
          if (absent) { if (mt.value == "") df.filter(lit(false)) else df }
          else df.filter(col(s"`${mt.label}`") =!= mt.value)
        case "=~" =>
          if (absent) { if ("".matches(rx)) df else df.filter(lit(false)) }
          else df.filter(col(s"`${mt.label}`").rlike(rx))
        case "!~" =>
          if (absent) { if ("".matches(rx)) df.filter(lit(false)) else df }
          else df.filter(!col(s"`${mt.label}`").rlike(rx))
      }
    }
    base.copy(df = filtered)
  }

  /** Literal-arithmetic constant folding: the reference accepts scalar
    * FUNCTION ARGUMENTS as expressions (promql/functions.sql:
    * quantile_over_time(0.2 + 0.05, ...)). */
  private def constFold(e: Expr): Option[Double] = e match {
    case NumberLit(v) => Some(v)
    case Unary(x) => constFold(x).map(v => -v)
    case Binary(op, a, b, _, _)
        if Set("+", "-", "*", "/", "%", "^", "atan2").contains(op) =>
      for (x <- constFold(a); y <- constFold(b)) yield op match {
        case "+" => x + y
        case "-" => x - y
        case "*" => x * y
        case "/" => x / y
        case "%" => x % y
        case "^" => math.pow(x, y)
        case "atan2" => math.atan2(x, y)
      }
    case _ => None
  }

  /** Left = scalar, Right = vector. */
  def eval(e: Expr): Either[Double, InstantVector] = e match {
    case NumberLit(v) => Left(v)
    // a TOP-LEVEL subquery (encode_substrait.sql's
    // `increase(...)[12h:1h]`): the reference's PromRangeManipulate
    // carries the inner values through at the outer step — each step
    // samples the most recent inner value inside the subquery range
    case sq: PromParser.Subquery =>
      eval(PromParser.Call("last_over_time", Seq(sq)))
    case Unary(x) => eval(x) match {
      case Left(v) => Left(-v)
      case Right(iv) =>
        Right(InstantVector(iv.df.withColumn("__val", -col("__val")), iv.labels))
    }
    case sel: Selector =>
      require(sel.rangeMs.isEmpty, "range selector needs a range function")
      sel.atMs match {
        case None => Right(instant(metricOf(sel), params, sel.offsetMs))
        case Some(at) =>
          // @ pins sample selection to one instant; the value repeats at
          // every output step (Prometheus @ modifier)
          val t = atTimeMs(at)
          val pinned = instant(metricOf(sel), EvalParams(t, t, params.stepMs,
            params.lookbackMs), sel.offsetMs)
          Right(InstantVector(
            pinned.df.drop("__ts").crossJoin(gridDf(spark, params)), pinned.labels))
      }

    case Agg("count_values", by, without, Some(StringLit(dst)), body) =>
      Right(PromQL.countValues(evalToVector(body), dst, by, without))

    case Agg(op, by, without, param, body) =>
      val iv = evalToVector(body)
      val p = param.map(e => constFold(e).getOrElse(
        throw new IllegalArgumentException(s"aggregation param must be a literal: $e")))
      Right(PromQL.aggregate(iv, op, by, without, p))

    case Call("timestamp", Seq(sel: Selector)) if sel.rangeMs.isEmpty =>
      // timestamp(v): the selected SAMPLE's timestamp in seconds — not
      // the grid instant (promql/timestamp_fn.result: grid t=30s over a
      // sample at t=1s yields 1.0)
      Right(PromQL.timestampInstant(metricOf(sel), params, sel.offsetMs))

    case Call(fn @ ("holt_winters" | "double_exponential_smoothing"), args) =>
      val (sel, sf, tf) = args match {
        case Seq(s: Selector, a, b)
            if constFold(a).isDefined && constFold(b).isDefined =>
          (s, constFold(a).get, constFold(b).get)
        case other => throw new IllegalArgumentException(s"$fn args: $other")
      }
      val range = sel.rangeMs.getOrElse(
        throw new IllegalArgumentException(s"$fn needs a range selector"))
      Right(rangeFn(fn, metricOf(sel), params, range, sel.offsetMs, Seq(sf, tf)))

    case Call(fn, args) if RangeFns.contains(fn) =>
      val (param, target) = args match {
        case Seq(p, t) if constFold(p).isDefined => (constFold(p), t)
        case Seq(t, p) if constFold(p).isDefined => (constFold(p), t)
        case Seq(t) => (None, t)
        case other => throw new IllegalArgumentException(s"$fn args: $other")
      }
      // a pinned (@) range target evaluates its window once at the fixed
      // instant, replicated across the grid after the fold
      val atPin: Option[Long] = target match {
        case s: Selector => s.atMs.map(atTimeMs)
        case _ => None
      }
      val evalParams = atPin match {
        case Some(t) => EvalParams(t, t, params.stepMs, params.lookbackMs)
        case None => params
      }
      val (metric, range, offset) = target match {
        case s: Selector =>
          (metricOf(s), s.rangeMs.getOrElse(
            throw new IllegalArgumentException(s"$fn needs a range selector")),
            s.offsetMs)
        case sq: Subquery =>
          // inner expr evaluated on a step-aligned grid wide enough to
          // cover the folding range, then folded like any range vector
          val step = sq.stepMs.getOrElse(params.stepMs)
          val innerStart = Math.floorDiv(params.startMs - sq.rangeMs, step) * step
          val innerParams = EvalParams(innerStart, params.endMs, step, params.lookbackMs)
          val innerEval = new PromEval(spark, catalog, innerParams)
          val iv = innerEval.eval(sq.expr) match {
            case Right(v) => v
            case Left(s) => scalarLiteral(spark, innerParams, s)
          }
          (Metric(iv.df, "__ts", "__val", iv.labels), sq.rangeMs, sq.offsetMs)
        case other =>
          throw new IllegalArgumentException(s"$fn needs a range selector or subquery: $other")
      }
      if (fn == "absent_over_time") {
        val present = rangeFn("present_over_time", metric, evalParams, range, offset)
        Right(absent(present, params, spark))
      } else {
        val iv = rangeFn(fn, metric, evalParams, range, offset, param.toSeq)
        Right(atPin match {
          case Some(_) => InstantVector(
            iv.df.drop("__ts").crossJoin(gridDf(spark, params)), iv.labels)
          case None => iv
        })
      }

    case Call("absent", Seq(sel: Selector)) =>
      val lits = sel.matchers.filter(_.op == "=").map(m => m.label -> m.value)
      Right(absent(instant(metricOf(sel), params, sel.offsetMs), params, spark, lits))

    case Call("scalar", Seq(arg)) =>
      Right(scalarFn(evalToVector(arg), params, spark))

    case Call("vector", Seq(NumberLit(v))) => Right(scalarLiteral(spark, params, v))

    case Call("histogram_quantile", Seq(NumberLit(q), arg)) =>
      Right(histogramQuantile(evalToVector(arg), q))
    // out-of-range quantiles arrive as a unary-negated literal
    // (simple_histogram.sql's histogram_quantile(-0.1, ...) → -Inf rows)
    case Call("histogram_quantile", Seq(Unary(NumberLit(q)), arg)) =>
      Right(histogramQuantile(evalToVector(arg), -q))

    case Call("label_replace", Seq(arg, StringLit(dst), StringLit(rep), StringLit(src), StringLit(re))) =>
      Right(labelReplace(evalToVector(arg), dst, rep, src, re))

    case Call("label_join", arg +: StringLit(dst) +: StringLit(sep) +: srcs) =>
      Right(labelJoin(evalToVector(arg), dst, sep,
        srcs.map { case StringLit(s) => s; case o => o.toString }))

    case Call(fn, args) if TimeFns.contains(fn) =>
      val base = args.headOption.map(evalToVector)
        .getOrElse(scalarLiteral(spark, params, 0.0))
      Right(timeFn(base, fn))

    case Call("sort" | "sort_desc" | "sort_by_label" | "sort_by_label_desc", arg +: _) =>
      Right(evalToVector(arg)) // presentation order only
    case Call("pi", Seq()) => Left(math.Pi)

    case Call(fn, args) =>
      val (scalarArgs0, vecArg) = args.partition(a => constFold(a).isDefined)
      require(vecArg.size == 1, s"$fn expects one vector arg")
      val iv = evalToVector(vecArg.head)
      Right(mathFn(iv, fn, scalarArgs0.flatMap(constFold)))

    case Binary(op, lhs, rhs, boolMod, matching) =>
      // scalar-valued sub-expressions (scalar(), time(), and arithmetic
      // over them) match per-timestamp, not per-series
      def scalarish(e: Expr): Boolean = e match {
        case Call("scalar", _) => true
        case Call(fn, Seq()) if TimeFns.contains(fn) => true
        case Binary(_, a, b, _, _) => scalarish(a) && scalarish(b)
        case Unary(inner) => scalarish(inner)
        case _ => false
      }
      // a nullary math literal (pi()) compiles to an EmptyMetric grid in
      // the reference; binary ops against it keep only (ts, value) —
      // tags are dropped (promql/math.result `angles * pi()`)
      def isGridLiteral(e: Expr): Boolean = e match {
        case Call("pi", Seq()) => true
        case _ => false
      }
      val dropLabels = isGridLiteral(lhs) || isGridLiteral(rhs)
      def project(r: Either[Double, InstantVector]): Either[Double, InstantVector] = r match {
        case Right(iv) if dropLabels =>
          Right(InstantVector(iv.df.select(col("__ts"), col("__val")), Nil))
        case other => other
      }
      val setOps = Set("and", "or", "unless")
      (eval(lhs), eval(rhs)) match {
        case (Left(a), Left(b)) => Left(scalarScalar(op, a, b, boolMod))
        case (Right(iv), Left(s)) =>
          project(Right(vectorScalar(iv, op, s, scalarLeft = false, boolMod)))
        case (Left(s), Right(iv)) =>
          project(Right(vectorScalar(iv, op, s, scalarLeft = true, boolMod)))
        // a label-less grid vector (vector(1)) against a labeled vector
        // broadcasts per timestamp and keeps the labeled side's labels
        // (promql/set_operation.result `vector(1) * http_requests`)
        case (Right(l), Right(r)) if l.labels.isEmpty && r.labels.nonEmpty &&
            !setOps(op) && matching.isEmpty =>
          Right(vectorScalarSeries(r, l, op, scalarLeft = true, boolMod))
        case (Right(l), Right(r)) if r.labels.isEmpty && l.labels.nonEmpty &&
            !setOps(op) && matching.isEmpty =>
          Right(vectorScalarSeries(l, r, op, scalarLeft = false, boolMod))
        case (Right(l), Right(r)) if scalarish(lhs) && !scalarish(rhs) =>
          Right(vectorScalarSeries(r, l, op, scalarLeft = true, boolMod))
        case (Right(l), Right(r)) if scalarish(rhs) && !scalarish(lhs) =>
          Right(vectorScalarSeries(l, r, op, scalarLeft = false, boolMod))
        case (Right(l), Right(r)) =>
          val m = matching
          val (on, ignoring) = m match {
            case Some(PromParser.Matching(true, ls, _, _, _))  => (Some(ls), Nil)
            case Some(PromParser.Matching(false, ls, _, _, _)) => (None, ls)
            case None => (None, Nil)
          }
          Right(vectorVector(l, r, op, on, ignoring, boolMod,
            groupLeft = m.exists(_.groupLeft), groupRight = m.exists(_.groupRight),
            extraLabels = m.map(_.extraLabels).getOrElse(Nil)))
      }

    case StringLit(s) => throw new IllegalArgumentException(s"unexpected string: $s")
  }

  private def atTimeMs(a: PromParser.AtTime): Long = a match {
    case PromParser.AtLiteral(ms) => ms
    case PromParser.AtStart => params.startMs
    case PromParser.AtEnd => params.endMs
  }

  private def evalToVector(e: Expr): InstantVector = eval(e) match {
    case Right(iv) => iv
    case Left(s) => scalarLiteral(spark, params, s)
  }

  private def scalarScalar(op: String, a: Double, b: Double, boolMod: Boolean): Double =
    op match {
      case "+" => a + b
      case "-" => a - b
      case "*" => a * b
      case "/" => a / b
      case "%" => a % b
      case "atan2" => math.atan2(a, b)
      case "^" => math.pow(a, b)
      case _ =>
        val r = op match {
          case "==" => a == b
          case "!=" => a != b
          case ">" => a > b
          case "<" => a < b
          case ">=" => a >= b
          case "<=" => a <= b
        }
        if (r) 1.0 else 0.0
    }
}
