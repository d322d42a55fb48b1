package graft.promql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PromQL engine (SURVEY.md §2.6/§3.2) — the Spark re-expression of the
  * reference's PromPlanner (query/src/promql/planner.rs) and its
  * extension nodes:
  *
  *  - SeriesNormalize  -> offset shift + NaN staleness filter
  *  - InstantManipulate -> grid explode + max_by(value, ts) per step
  *    (latest sample within lookback at each step)
  *  - RangeManipulate  -> grid explode + sort_array(collect_list)
  *  - SeriesDivide     -> implicit in groupBy(labels)
  *  - EmptyMetric      -> sequence() grid for literal expressions
  *  - UnionDistinctOn  -> `or` via left ∪ (right anti left)
  *  - HistogramFold    -> le-bucket collect + interpolation UDF
  *
  * Scale: the grid explode fans each sample out to ≤ lookback/step (or
  * range/step) grid cells, then partial aggregation combines map-side;
  * the shuffle carries #series × #steps rows. Vector-vector binary ops
  * are equi-joins on (ts, labels) — Catalyst picks hash joins, and AQE
  * handles skew.
  */
object PromQL {

  /** Label-name column ref — backtick-quoted, since quoted PromQL
    * identifiers may contain dots (promql/string_identifier.sql). */
  private def lcol(n: String): Column = col(s"`$n`")


  /** A metric table: label columns + epoch-ms long time column + double
    * value column. */
  final case class Metric(df: DataFrame, tsMs: String, value: String, labels: Seq[String])

  final case class EvalParams(
      startMs: Long, endMs: Long, stepMs: Long, lookbackMs: Long = 300000L) {
    require(stepMs > 0)
  }

  /** Instant vector: DataFrame with `__ts` (long ms), `__val` (double),
    * plus the label columns. */
  final case class InstantVector(df: DataFrame, labels: Seq[String]) {
    def output: DataFrame =
      df.select((col("__ts") +: labels.sorted.map(lcol)) :+ col("__val"): _*)
  }

  /** At or above this window/step ratio, range/instant evaluation uses
    * the deque fold ([[foldWindowsAtGrid]]) instead of the grid explode.
    * PromqlScaleProbe measured the fold faster at EVERY ratio — 2× wall
    * and 3-6× less shuffle at ratios 1-3 on sf0.1, growing to 15.7×
    * wall and 77× shuffle at ratio 240 on 10× events — so the fold is
    * the default path (threshold 1); gridExplode remains for ratio-0
    * windows (range < step, where fan-out is sub-1 and the explode is a
    * plain codegen'd filter+agg) and as the reference implementation
    * the PromQLSpec battery pins the fold against. The reference's
    * RangeManipulate (promql/src/extension_plan/range_manipulate.rs:64)
    * likewise folds windows over one sorted per-series stream. */
  private[graft] var GridFanoutMax = 1L

  /** RangeManipulate without fan-out — the reference's formulation
    * (range_manipulate.rs:64): one shuffle on the series labels, each
    * partition sorted by (series, ts, v) and folded in a single linear
    * pass with a sliding deque. CPU is O(samples + Σ|window|) — the
    * output size — where the rangeBetween-window formulation tried
    * first recomputed each frame per ROW (quadratic on dense series:
    * 5.6× slower wall at 10× events despite 42× less shuffle).
    *
    * `latestOnly=false`: per-anchor sorted sample arrays (labels...,
    * __ts, __samples array<struct<_1 ts, _2 v>>), anchors with empty
    * windows dropped — exactly [[gridExplode]]+collect_list's output.
    * `latestOnly=true`: per-anchor latest sample (labels..., __ts,
    * __latest struct<_1 ts, _2 v>) for the instant/lookback path.
    * `evalF=Some(f)`: the range function is evaluated IN the fold —
    * f(window samples, winStartMs, winEndMs) emits `__val` directly
    * (None anchors dropped, matching the UDF path's isNotNull filter),
    * so no per-anchor sample array is ever built or serialized. */
  private def foldWindowsAtGrid(base: DataFrame, labels: Seq[String],
      p: EvalParams, windowMs: Long, latestOnly: Boolean,
      evalF: Option[(Seq[PromFunctions.Sample], Long, Long) => Option[Double]] = None)
      : DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    // samples outside (start-window, end] can contribute to no anchor
    val pruned = base.filter(
      col("__sample_ts") > p.startMs - windowMs && col("__sample_ts") <= p.endMs)
    val keyCol =
      if (labels.isEmpty) lit(0L).as("__k0") else struct(labels.map(lcol): _*)
    // TIME-SLICED parallelism: few-series metrics would otherwise fold
    // on #series cores. Each series splits into ~64 chunks of the eval
    // span (never narrower than the window, so a sample lands in ≤2
    // chunks — the copy into the successor covers its early anchors).
    // A sample at offset o serves anchors in [o, o+window) → chunks
    // floor(o/span) .. floor((o+window-1)/span).
    val totalSpan = math.max(1L, p.endMs - p.startMs)
    val chunkSpan = math.max(windowMs, (totalSpan + 63) / 64)
    val lastChunk = (totalSpan - 1) / chunkSpan
    val off = col("__t") - p.startMs
    // clamp into [0, lastChunk]: a sample at exactly the span end (the
    // last grid anchor's own timestamp) computes chunk lastChunk+1
    val cLo = least(
      greatest(floor(off.cast("double") / chunkSpan).cast("long"), lit(0L)),
      lit(lastChunk))
    val cHi = least(floor((off + windowMs - 1).cast("double") / chunkSpan).cast("long"),
      lit(lastChunk))
    val keyed = pruned
      .select(keyCol.as("__k"), col("__sample_ts").as("__t"),
        col("__v").cast("double").as("__vv"))
      .withColumn("__c", explode(when(cLo <= cHi, sequence(cLo, cHi))
        .otherwise(array().cast("array<long>"))))
      .repartition(col("__k"), col("__c"))
      .sortWithinPartitions(col("__k"), col("__c"), col("__t"), col("__vv"))
    val sampleT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_1",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("_2",
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    val outT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__k",
        keyed.schema("__k").dataType, nullable = labels.nonEmpty),
      org.apache.spark.sql.types.StructField("__ts",
        org.apache.spark.sql.types.LongType, nullable = false),
      if (evalF.isDefined)
        org.apache.spark.sql.types.StructField("__val",
          org.apache.spark.sql.types.DoubleType, nullable = false)
      else if (latestOnly)
        org.apache.spark.sql.types.StructField("__latest", sampleT)
      else
        org.apache.spark.sql.types.StructField("__samples",
          org.apache.spark.sql.types.ArrayType(sampleT, containsNull = false))))
    val (startMs, stepMs, endMs) = (p.startMs, p.stepMs, p.endMs)
    val nSteps = (endMs - startMs) / stepMs
    val folded = keyed.mapPartitions { it =>
      new Iterator[Row] {
        private val out = scala.collection.mutable.Queue.empty[Row]
        private var curKey: Any = null
        private var curChunk = -1L
        private var started = false
        private val deque = new java.util.ArrayDeque[Row]() // (ts, v) rows
        private var nextK = 0L // next unemitted grid slot of the chunk
        private var endK = 0L  // first slot past the chunk (exclusive)
        private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b
        private def emitUpTo(kLimit: Long): Unit = {
          val lim = math.min(kLimit, endK)
          while (nextK < lim) {
            val t = startMs + nextK * stepMs
            while (!deque.isEmpty && deque.peekFirst.getLong(0) <= t - windowMs)
              deque.pollFirst()
            if (!deque.isEmpty) {
              evalF match {
                case Some(f) =>
                  // NULL-valued samples carry PRESENCE (instant path) but
                  // no value a range function can use — skipped here, so
                  // a null never reads as 0.0 via getDouble
                  val s = new Array[PromFunctions.Sample](deque.size)
                  var i = 0
                  val di = deque.iterator()
                  while (di.hasNext) {
                    val r = di.next()
                    if (!r.isNullAt(1)) { s(i) = (r.getLong(0), r.getDouble(1)); i += 1 }
                  }
                  f(scala.collection.immutable.ArraySeq.unsafeWrapArray(
                      if (i == s.length) s else java.util.Arrays.copyOf(s, i)),
                    t - windowMs, t).foreach(v => out += Row(curKey, t, v))
                case None if latestOnly => out += Row(curKey, t, deque.peekLast)
                case None =>
                  val arr = new Array[Row](deque.size)
                  var i = 0
                  val di = deque.iterator()
                  while (di.hasNext) { arr(i) = di.next(); i += 1 }
                  out += Row(curKey, t, arr.toSeq)
              }
            }
            nextK += 1
          }
        }
        private def flushChunk(): Unit = {
          emitUpTo(endK)
          deque.clear()
        }
        private def startChunk(c: Long): Unit = {
          curChunk = c
          nextK = ceilDiv(c * chunkSpan, stepMs)
          // the last chunk also owns any anchor at exactly the span end
          endK =
            if (c == lastChunk) nSteps + 1
            else math.min(nSteps + 1, ceilDiv((c + 1) * chunkSpan, stepMs))
        }
        private def advance(): Unit = {
          while (out.isEmpty && it.hasNext) {
            val r = it.next()
            val k = r.get(0)
            val c = r.getLong(3)
            if (!started || k != curKey || c != curChunk) {
              if (started) flushChunk()
              curKey = k
              startChunk(c)
              started = true
            }
            val ts = r.getLong(1)
            // every anchor strictly before this sample's slot is final
            emitUpTo(
              if (ts < startMs) 0L
              else math.floorDiv(ts - startMs + stepMs - 1, stepMs))
            deque.addLast(Row(ts, if (r.isNullAt(2)) null else r.getDouble(2)))
          }
          if (out.isEmpty && started) { flushChunk(); started = false }
        }
        def hasNext: Boolean = { if (out.isEmpty) advance(); out.nonEmpty }
        def next(): Row = { if (out.isEmpty) advance(); out.dequeue() }
      }
    }(Encoders.row(outT))
    val dataCol =
      if (evalF.isDefined) col("__val")
      else if (latestOnly) col("__latest") else col("__samples")
    if (labels.isEmpty) folded.select(col("__ts"), dataCol)
    else folded.select((labels.map(l => col(s"__k.`$l`").as(l)) :+
      col("__ts")) :+ dataCol: _*)
  }

  private def gridExplode(
      df: DataFrame, tsCol: Column, p: EvalParams, windowMs: Long): DataFrame = {
    // Parallelize narrow few-partition sources (a single parquet file =
    // one task) before the fan-out; the explode multiplies work, so the
    // cheap round-robin shuffle of the projected input pays for itself.
    // Unconditional: probing df.rdd.getNumPartitions would materialize
    // RDD lineage on the driver per selector, and AQE coalesces the
    // shuffle back down when the input is already wide.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val spread = df.repartition(par)
    // slot indices k with t = start + k*step, ts <= t < ts + window
    val kLo = ceil((tsCol - p.startMs).cast("double") / p.stepMs).cast("long")
    val kHi = floor((tsCol + windowMs - 1 - p.startMs).cast("double") / p.stepMs).cast("long")
    val nSteps = (p.endMs - p.startMs) / p.stepMs
    val lo = greatest(kLo, lit(0L))
    val hi = least(kHi, lit(nSteps))
    // rows whose window misses the grid entirely have lo > hi — guard
    // them out, or sequence() runs DESCENDING and explodes a row into
    // |lo-hi| elements (billions for far-out-of-range timestamps)
    spread.withColumn("__k",
        explode(when(lo <= hi, sequence(lo, hi))
          .otherwise(array().cast("array<long>"))))
      .withColumn("__ts", col("__k") * p.stepMs + p.startMs)
      .filter(col("__ts") >= tsCol && col("__ts") < tsCol + windowMs)
      .drop("__k")
  }

  /** Selector -> instant vector (SeriesNormalize + InstantManipulate). */
  def instant(m: Metric, p: EvalParams, offsetMs: Long = 0L): InstantVector = {
    val ts = (col(m.tsMs) + offsetMs).as("__sample_ts")
    // ordinary NaN values are REAL samples, and so are NULL-valued rows:
    // promql/scalar.result pins NaN keeping cpu0 present in count() AND
    // the NULL sample keeping cpu2 present as a zero-count group — null
    // rides through as a null-valued sample and the aggregate's SQL null
    // semantics do the rest. Only the reference's staleness marker —
    // which never reaches parquet — is filtered.
    val base = m.df
      .select((m.labels.map(lcol) :+ ts) :+ lcol(m.value).as("__v"): _*)
    // lookback window is LEFT-EXCLUSIVE (t - lookback, t]: a sample
    // exactly lookback old is stale (promql/subquery.result, t=359 case)
    val grouped =
      if (p.lookbackMs / p.stepMs >= GridFanoutMax)
        foldWindowsAtGrid(base, m.labels, p, p.lookbackMs, latestOnly = true)
          .withColumn("__val", col("__latest._2")).drop("__latest")
      else
        gridExplode(base, col("__sample_ts"), p, p.lookbackMs)
          .groupBy((m.labels.map(lcol) :+ col("__ts")): _*)
          .agg(max_by(col("__v"), col("__sample_ts")).as("__val"))
    InstantVector(grouped, m.labels)
  }

  /** timestamp(selector): instant vector whose value is the selected
    * sample's own timestamp in SECONDS (prometheus timestamp();
    * promql/timestamp_fn.result pins pre-alignment sample times). */
  def timestampInstant(m: Metric, p: EvalParams, offsetMs: Long = 0L): InstantVector = {
    val ts = (col(m.tsMs) + offsetMs).as("__sample_ts")
    val base = m.df
      .select((m.labels.map(lcol) :+ ts) :+ lcol(m.value).as("__v"): _*)
    val grouped =
      if (p.lookbackMs / p.stepMs >= GridFanoutMax)
        foldWindowsAtGrid(base, m.labels, p, p.lookbackMs, latestOnly = true)
          .withColumn("__val", col("__latest._1").cast("double") / 1000.0)
          .drop("__latest")
      else
        gridExplode(base, col("__sample_ts"), p, p.lookbackMs)
          .groupBy((m.labels.map(lcol) :+ col("__ts")): _*)
          .agg((max(col("__sample_ts")).cast("double") / 1000.0).as("__val"))
    InstantVector(grouped, m.labels)
  }

  /** Selector[range] -> per-step collected windows (RangeManipulate):
    * columns __ts, labels..., __samples array<struct<ts,v>> sorted. */
  def rangeVector(m: Metric, p: EvalParams, rangeMs: Long, offsetMs: Long = 0L): DataFrame = {
    val ts = (col(m.tsMs) + offsetMs).as("__sample_ts")
    val base = m.df
      .select((m.labels.map(lcol) :+ ts) :+ lcol(m.value).as("__v"): _*)
    if (rangeMs / p.stepMs >= GridFanoutMax)
      foldWindowsAtGrid(base, m.labels, p, rangeMs, latestOnly = false)
    else
      gridExplode(base, col("__sample_ts"), p, rangeMs)
        .groupBy((m.labels.map(lcol) :+ col("__ts")): _*)
        .agg(sort_array(collect_list(struct(col("__sample_ts").as("_1"),
          col("__v").as("_2")))).as("__samples"))
  }

  /** Apply a range-vector function over the collected windows.
    * On the fold path (range/step ≥ [[GridFanoutMax]]) the function is
    * evaluated inside the fold — no `__samples` array is materialized
    * or pushed through a UDF; the explode path keeps the codegen'd
    * collect_list + UDF formulation. `fnArgs`: predict_linear's
    * look-ahead, quantile_over_time's q, holt_winters' (sf, tf). */
  def rangeFn(name: String, m: Metric, p: EvalParams, rangeMs: Long,
      offsetMs: Long = 0L, fnArgs: Seq[Double] = Nil): InstantVector = {
    if (rangeMs / p.stepMs >= GridFanoutMax) {
      val ts = (col(m.tsMs) + offsetMs).as("__sample_ts")
      val base = m.df
        .select((m.labels.map(lcol) :+ ts) :+ lcol(m.value).as("__v"): _*)
      return InstantVector(
        foldWindowsAtGrid(base, m.labels, p, rangeMs, latestOnly = false,
          evalF = Some(PromFunctions.windowEval(name, fnArgs))),
        m.labels)
    }
    val rv = rangeVector(m, p, rangeMs, offsetMs)
    val winStart = col("__ts") - rangeMs
    val winEnd = col("__ts")
    val v = name match {
      case "rate" => PromFunctions.rateUdf(col("__samples"), winStart, winEnd)
      case "increase" => PromFunctions.increaseUdf(col("__samples"), winStart, winEnd)
      case "delta" => PromFunctions.deltaUdf(col("__samples"), winStart, winEnd)
      case "irate" => PromFunctions.irateUdf(col("__samples"))
      case "idelta" => PromFunctions.idextaUdf(col("__samples"))
      case "changes" => PromFunctions.changesUdf(col("__samples"))
      case "resets" => PromFunctions.resetsUdf(col("__samples"))
      case "deriv" => PromFunctions.derivUdf(col("__samples"), winEnd)
      case "predict_linear" =>
        PromFunctions.predictLinearUdf(col("__samples"), winEnd, lit(fnArgs.head))
      case "quantile_over_time" =>
        PromFunctions.quantileOverTime(lit(fnArgs.head), col("__samples"))
      case "holt_winters" | "double_exponential_smoothing" =>
        PromFunctions.holtWintersUdf(col("__samples"), lit(fnArgs(0)), lit(fnArgs(1)))
      case other => PromFunctions.overTimeUdf(other)(col("__samples"))
    }
    InstantVector(
      rv.withColumn("__val", v).filter(col("__val").isNotNull).drop("__samples"),
      m.labels)
  }

  /** absent(): 1 at grid steps where the selector returns nothing; the
    * output series carries labels from the selector's `=` matchers
    * (promql/src/extension_plan/absent.rs semantics). */
  def absent(iv: InstantVector, p: EvalParams, spark: SparkSession,
      literalLabels: Seq[(String, String)] = Nil): InstantVector = {
    val grid = gridDf(spark, p)
    val present = iv.df.select(col("__ts")).distinct()
    var out = grid.join(present, Seq("__ts"), "left_anti")
      .withColumn("__val", lit(1.0))
    // duplicate matchers on one label (job="a", job="b"): last one wins,
    // single output column (promql/absent.result)
    val lastByKey = literalLabels.foldLeft(Vector.empty[(String, String)]) {
      case (acc, (k, v)) => acc.filterNot(_._1 == k) :+ (k -> v)
    }
    lastByKey.foreach { case (k, v) => out = out.withColumn(k, lit(v)) }
    InstantVector(out, lastByKey.map(_._1))
  }

  /** EmptyMetric: literal expressions evaluated on the step grid. */
  def gridDf(spark: SparkSession, p: EvalParams): DataFrame =
    spark.range(0, (p.endMs - p.startMs) / p.stepMs + 1)
      .select((col("id") * p.stepMs + p.startMs).as("__ts"))

  def scalarLiteral(spark: SparkSession, p: EvalParams, v: Double): InstantVector =
    InstantVector(gridDf(spark, p).withColumn("__val", lit(v)), Nil)

  // ---- aggregation operators -----------------------------------------

  def aggregate(iv: InstantVector, op: String, by: Seq[String],
      without: Boolean = false, param: Option[Double] = None): InstantVector = {
    val keep =
      if (without) iv.labels.filterNot(by.contains)
      else iv.labels.filter(by.contains)
    val keys = (keep.map(lcol) :+ col("__ts"))
    val x = col("__val")
    op match {
      case "topk" | "bottomk" =>
        val k = param.get.toInt
        // tiebreak follows the value's direction over the tags too
        // (planner.rs:3900-3920: every sort expr uses the same asc flag)
        val ord = if (op == "topk") x.desc_nulls_first else x.asc_nulls_first
        val tagOrd = iv.labels.sorted.map(l =>
          if (op == "topk") col(l).desc_nulls_first else col(l).asc_nulls_first)
        val w = Window.partitionBy(keys: _*).orderBy(ord +: tagOrd: _*)
        val ranked = iv.df.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= k).drop("__rn")
        InstantVector(ranked, iv.labels) // keeps original series labels
      case "count_values" =>
        throw new UnsupportedOperationException("count_values: use countValues()")
      case "sort" | "sort_desc" | "sort_by_label" | "sort_by_label_desc" =>
        InstantVector(iv.df, iv.labels) // ordering is presentational
      case _ =>
        val agg = op match {
          case "sum" => sum(x)
          case "min" => min(x)
          case "max" => max(x)
          case "avg" => avg(x)
          case "count" => count(x).cast("double")
          case "group" => lit(1.0)
          case "stddev" => stddev_pop(x)
          case "stdvar" => var_pop(x)
          case "quantile" =>
            PromFunctions.quantileOverTime(lit(param.get),
              sort_array(collect_list(struct(lit(0L).as("_1"), x.as("_2")))))
          case other => throw new IllegalArgumentException(s"unknown aggr: $other")
        }
        InstantVector(iv.df.groupBy(keys: _*).agg(agg.as("__val")), keep)
    }
  }

  /** PromQL `count_values("dst", v)`: per (kept labels, ts, value)
    * count, the sample value becoming the `dst` label. */
  def countValues(iv: InstantVector, dst: String, by: Seq[String],
      without: Boolean = false): InstantVector = {
    val keep =
      if (without) iv.labels.filterNot(by.contains)
      else if (by.nonEmpty) iv.labels.filter(by.contains)
      else Nil
    // Prometheus formats integral values without a decimal point
    val fmt = udf { (v: Double) =>
      if (v == math.floor(v) && !v.isInfinite && math.abs(v) < 1e15) v.toLong.toString
      else v.toString
    }
    val df = iv.df.withColumn(dst, fmt(col("__val")))
    val keys = (keep :+ dst).map(lcol) :+ col("__ts")
    InstantVector(
      df.groupBy(keys: _*).agg(count(lit(1)).cast("double").as("__val")),
      keep :+ dst)
  }

  // ---- binary operators ------------------------------------------------

  private def arith(op: String, l: Column, r: Column): Column = op match {
    case "+" => l + r
    case "-" => l - r
    case "*" => l * r
    case "/" => l / r
    case "%" => l % r
    case "atan2" => atan2(l, r)
    case "^" => pow(l, r)
    case _ => throw new IllegalArgumentException(op)
  }

  private def cmp(op: String, l: Column, r: Column): Column = op match {
    case "==" => l === r
    case "!=" => l =!= r
    case ">" => l > r
    case "<" => l < r
    case ">=" => l >= r
    case "<=" => l <= r
    case _ => throw new IllegalArgumentException(op)
  }

  val ArithOps = Set("+", "-", "*", "/", "%", "^", "atan2")
  val CmpOps = Set("==", "!=", ">", "<", ">=", "<=")

  def vectorScalar(iv: InstantVector, op: String, scalar: Double,
      scalarLeft: Boolean = false, boolMod: Boolean = false): InstantVector = {
    val x = col("__val")
    val s = lit(scalar)
    val (l, r) = if (scalarLeft) (s, x) else (x, s)
    if (ArithOps(op))
      InstantVector(iv.df.withColumn("__val", arith(op, l, r)), iv.labels)
    else if (boolMod)
      InstantVector(iv.df.withColumn("__val",
        when(cmp(op, l, r), 1.0).otherwise(0.0)), iv.labels)
    else
      InstantVector(iv.df.filter(cmp(op, l, r)), iv.labels)
  }

  /** Vector ⊗ per-step scalar series (result of scalar()/time()):
    * join on __ts only; the vector side keeps its labels — one-to-one
    * matching would wrongly demand equal label sets. */
  def vectorScalarSeries(iv: InstantVector, scalarIv: InstantVector, op: String,
      scalarLeft: Boolean = false, boolMod: Boolean = false): InstantVector = {
    val s = scalarIv.df.select(col("__ts"), col("__val").as("__sv"))
    val joined = iv.df.join(s, Seq("__ts"))
    val x = col("__val")
    val (l, r) = if (scalarLeft) (col("__sv"), x) else (x, col("__sv"))
    val out =
      if (ArithOps(op)) joined.withColumn("__val", arith(op, l, r))
      else if (boolMod) joined.withColumn("__val",
        when(cmp(op, l, r), 1.0).otherwise(0.0))
      else joined.filter(cmp(op, l, r))
    InstantVector(out.drop("__sv"), iv.labels)
  }

  /** Vector-vector binary op: equi-join on (__ts, matching labels) —
    * PromQL one-to-one vector matching (planner.rs ~5000-5400), plus
    * many-to-one via group_left/group_right: the "many" side keeps all
    * its labels (and may copy `extraLabels` off the "one" side); the
    * join itself is the same equi-join, just without collapsing the
    * many side's extra labels. */
  def vectorVector(lhs: InstantVector, rhs: InstantVector, op: String,
      on: Option[Seq[String]] = None, ignoring: Seq[String] = Nil,
      boolMod: Boolean = false, groupLeft: Boolean = false,
      groupRight: Boolean = false, extraLabels: Seq[String] = Nil): InstantVector = {
    val matchLabels = on.getOrElse(
      lhs.labels.intersect(rhs.labels).filterNot(ignoring.contains))
    val keys = "__ts" +: matchLabels
    // set ops (and/or/unless) with DEFAULT matching compare the FULL
    // label set (a label missing on one side is a mismatch — pinned by
    // set_operation.result: vector_matching_a{l="x"} survives `or
    // on(instance)`); labels absent from a side are padded null, and all
    // key comparisons are null-safe (<=>), matching the reference's
    // null-equality joins.
    val allLabels = lhs.labels ++ rhs.labels.filterNot(lhs.labels.contains)
    val setKeys = "__ts" +: on.getOrElse(allLabels.filterNot(ignoring.contains))
    // an on() label absent from BOTH sides still joins — as null on
    // each (set_operation.result `AND ON (dummy) vector(1)`)
    val joinPad = allLabels ++
      setKeys.filterNot(k => k == "__ts" || allLabels.contains(k))
    def pad(df: DataFrame, have: Seq[String]): DataFrame =
      joinPad.foldLeft(df)((d, l) =>
        if (have.contains(l)) d else d.withColumn(l, lit(null).cast("string")))
    def semiJoin(left: DataFrame, right: DataFrame, joinType: String): DataFrame = {
      val l = left.alias("__l")
      val r = right.select(setKeys.map(lcol): _*).distinct().alias("__r")
      val cond = setKeys.map(k => col(s"__l.$k") <=> col(s"__r.$k")).reduce(_ && _)
      l.join(r, cond, joinType)
    }
    op match {
      case "and" =>
        val out = semiJoin(pad(lhs.df, lhs.labels), pad(rhs.df, rhs.labels), "left_semi")
        InstantVector(out.select(("__ts" +: lhs.labels :+ "__val").map(lcol): _*), lhs.labels)
      case "unless" =>
        val out = semiJoin(pad(lhs.df, lhs.labels), pad(rhs.df, rhs.labels), "left_anti")
        InstantVector(out.select(("__ts" +: lhs.labels :+ "__val").map(lcol): _*), lhs.labels)
      case "or" =>
        // UnionDistinctOn: keep left row on key collision; output schema
        // is the union of both sides' label columns
        val rightOnly = semiJoin(pad(rhs.df, rhs.labels), pad(lhs.df, lhs.labels), "left_anti")
        def shape(df: DataFrame) = df.select(("__ts" +: allLabels :+ "__val").map(lcol): _*)
        InstantVector(shape(pad(lhs.df, lhs.labels)).union(shape(rightOnly)), allLabels)
      case _ =>
        // the "many" side keeps its full label set; default one-to-one
        // treats the left as many with no copied labels (same join)
        val (manyIv, oneIv, manyIsLeft) =
          if (groupRight) (rhs, lhs, false) else (lhs, rhs, true)
        // the many side keeps extra labels only when the other side also
        // carries the column (set_operation.result pins null_label
        // surviving `/ on(job)` with both sides having it; the planner
        // prunes labels absent from one side —
        // tsid_binary_join_regression.result drops `host` under on(job)).
        // group_left/right keeps the many side's extras unconditionally.
        val manyExtra0 = manyIv.labels.filterNot(matchLabels.contains)
        val manyExtra =
          if (groupLeft || groupRight) manyExtra0
          else manyExtra0.filter(oneIv.labels.contains)
        val many = manyIv.df
          .select((keys ++ manyExtra :+ "__val").map(lcol): _*)
          .withColumnRenamed("__val", "__mv").alias("__m")
        val one = oneIv.df
          .select((keys ++ extraLabels :+ "__val").map(lcol): _*)
          .withColumnRenamed("__val", "__ov").alias("__o")
        val cond = keys.map(k => col(s"__m.$k") <=> col(s"__o.$k")).reduce(_ && _)
        val joined = many.join(one, cond).select(
          (keys ++ manyExtra).map(k => col(s"__m.$k").as(k)) ++
            extraLabels.map(k => col(s"__o.$k").as(k)) :+
            col("__m.__mv").as("__mv") :+ col("__o.__ov").as("__ov"): _*)
        val (lv, rv) =
          if (manyIsLeft) (col("__mv"), col("__ov")) else (col("__ov"), col("__mv"))
        val outLabels = matchLabels ++ manyExtra ++ extraLabels
        if (ArithOps(op))
          InstantVector(joined.withColumn("__val", arith(op, lv, rv))
            .drop("__mv", "__ov"), outLabels)
        else if (boolMod)
          InstantVector(joined.withColumn("__val",
            when(cmp(op, lv, rv), 1.0).otherwise(0.0))
            .drop("__mv", "__ov"), outLabels)
        else
          InstantVector(joined.filter(cmp(op, lv, rv))
            .withColumn("__val", lv).drop("__mv", "__ov"), outLabels)
    }
  }

  // ---- instant-vector scalar functions ---------------------------------

  def mathFn(iv: InstantVector, name: String, args: Seq[Double] = Nil): InstantVector = {
    val x = col("__val")
    val v = name match {
      case "abs" => abs(x)
      case "ceil" => ceil(x).cast("double")
      case "floor" => floor(x).cast("double")
      case "exp" => exp(x)
      case "ln" => log(x)
      case "log2" => log2(x)
      case "log10" => log10(x)
      case "sqrt" => sqrt(x)
      case "sgn" => signum(x)
      case "round" =>
        val nearest = args.headOption.getOrElse(1.0)
        round(x / nearest) * nearest
      case "clamp" => least(greatest(x, lit(args(0))), lit(args(1)))
      case "clamp_min" => greatest(x, lit(args(0)))
      case "clamp_max" => least(x, lit(args(0)))
      case "rad" => radians(x)
      case "deg" => degrees(x)
      // timestamp(v): the SAMPLE's timestamp in seconds as the value
      // (prometheus functions.md; ref promql timestamp fn)
      case "timestamp" => col("__ts").cast("double") / 1000.0
      case "sin" => sin(x)
      case "cos" => cos(x)
      case "tan" => tan(x)
      case "asin" => asin(x)
      case "acos" => acos(x)
      case "atan" => atan(x)
      case other => throw new IllegalArgumentException(s"unknown fn: $other")
    }
    InstantVector(iv.df.withColumn("__val", v), iv.labels)
  }

  /** time()/minute()/hour()/... evaluated on the grid timestamp. */
  def timeFn(iv: InstantVector, name: String): InstantVector = {
    val t = to_utc_timestamp(timestamp_millis(col("__ts")), "UTC")
    val v = name match {
      case "time" => (col("__ts") / 1000.0)
      case "minute" => minute(t).cast("double")
      case "hour" => hour(t).cast("double")
      case "month" => month(t).cast("double")
      case "year" => year(t).cast("double")
      case "day_of_month" => dayofmonth(t).cast("double")
      case "day_of_week" => (dayofweek(t) - 1).cast("double") // prom: 0=Sunday
      case "day_of_year" => dayofyear(t).cast("double")
      case "days_in_month" => dayofmonth(last_day(t)).cast("double")
      case other => throw new IllegalArgumentException(s"unknown time fn: $other")
    }
    InstantVector(iv.df.withColumn("__val", v), iv.labels)
  }

  /** label_replace, following the reference's rules exactly
    * (query/src/promql/planner.rs:3434-3530):
    *  - src exists + empty regex            → unchanged, no dst added
    *  - src missing + empty replacement     → unchanged
    *  - src missing + non-empty replacement → dst = literal replacement
    *  - else dst = regexp_replace(src, "^(?s:re)$", repl) — anchored,
    *    so a non-match copies the src value into dst. */
  def labelReplace(iv: InstantVector, dst: String, replacement: String,
      src: String, regex: String): InstantVector = {
    java.util.regex.Pattern.compile(regex) // validate (invalid → error)
    val srcExists = iv.labels.contains(src)
    if (srcExists && regex.isEmpty) iv
    else if (!srcExists) {
      if (replacement.isEmpty) iv
      else InstantVector(iv.df.withColumn(dst, lit(replacement)),
        (iv.labels :+ dst).distinct)
    } else {
      val anchored = s"^(?s:$regex)$$"
      val f = udf((s: String, re: String, rep: String) =>
        if (s == null) null
        else java.util.regex.Pattern.compile(re).matcher(s).replaceFirst(rep))
      InstantVector(iv.df.withColumn(dst, f(col(src), lit(anchored), lit(replacement))),
        (iv.labels :+ dst).distinct)
    }
  }

  def labelJoin(iv: InstantVector, dst: String, sep: String, srcs: Seq[String]): InstantVector = {
    // empty source-label names contribute nothing (promql/label.sql
    // label_join(..., "host", "-", "") clears the label)
    val real = srcs.filter(_.nonEmpty)
    val v = if (real.isEmpty) lit("") else concat_ws(sep, real.map(lcol): _*)
    InstantVector(iv.df.withColumn(dst, v), (iv.labels :+ dst).distinct)
  }

  /** scalar(): value when the instant vector has exactly one element at
    * the step, NaN when it has several, and NO row when it has none —
    * grid steps without input data are dropped
    * (extension_plan/scalar_calculate.rs; pinned by promql/scalar.result,
    * where `scalar(clamp(host{...}))` starts at the first sample). */
  def scalarFn(iv: InstantVector, p: EvalParams, spark: SparkSession): InstantVector = {
    val perTs = iv.df.groupBy(col("__ts"))
      .agg(count(lit(1)).as("__n"), first(col("__val")).as("__v"))
    // empty input → NaN at EVERY grid step (promql/scalar.result with an
    // out-of-range window); otherwise steps without data are dropped
    val totals = iv.df.agg(count(lit(1)).as("__total"))
    val full = gridDf(spark, p).join(perTs, Seq("__ts"), "left")
      .crossJoin(broadcast(totals))
      .filter(col("__n").isNotNull || col("__total") === 0)
    InstantVector(full.select(col("__ts"),
      when(col("__n") === 1, col("__v")).otherwise(lit(Double.NaN)).as("__val")), Nil)
  }

  /** histogram_quantile over classic le-bucket series (HistogramFold). */
  def histogramQuantile(iv: InstantVector, q: Double): InstantVector = {
    // a vector with no 'le' label yields an EMPTY result, not an error
    // (simple_histogram.sql's sum by(pod,instance,fbf) variant)
    if (!iv.labels.contains("le"))
      return InstantVector(iv.df.limit(0), iv.labels)
    val rest = iv.labels.filterNot(_ == "le")
    val grouped = iv.df
      .withColumn("__le", when(col("le") === "+Inf", lit(Double.PositiveInfinity))
        .otherwise(col("le").cast("double")))
      .groupBy((rest.map(lcol) :+ col("__ts")): _*)
      .agg(collect_list(struct(col("__le").as("_1"), col("__val").as("_2"))).as("__b"))
    InstantVector(grouped
      .withColumn("__val", PromFunctions.histogramQuantileUdf(lit(q), col("__b")))
      .drop("__b"), rest)
  }
}
