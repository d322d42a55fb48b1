package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** GreptimeDB RANGE query (SURVEY.md §2.5) as a DataFrame expansion.
  *
  * `SELECT ts, by..., agg(val) RANGE 'r' FILL f FROM t ALIGN 'a' TO 'o' BY (by...)`
  *
  * Semantics pinned against the reference
  * (query/src/range_select/plan.rs:929-956 `produce_align_time`,
  * tests/cases/standalone/common/range/{calculate,fill}.result):
  *  - output slots are aligned timestamps `t ≡ align_to (mod align)`;
  *    a row at `ts` feeds every slot with `t <= ts < t + range`
  *  - without FILL only slots whose window saw >=1 input row appear
  *  - with any FILL, each series' slot grid is densified from its first
  *    to its last populated slot (plan.rs:1102-1110)
  *  - FILL PREV copies the previous slot value (leading nulls stay);
  *    FILL <const> replaces nulls; FILL LINEAR casts to double and
  *    interpolates between nearest non-null neighbours, extrapolating
  *    head/tail from the nearest two points, and is a no-op when a
  *    series has <2 non-null slots (plan.rs:113-187)
  *
  * Scale design: the explode factor is ceil(range/align) (identical to
  * the reference's per-row accumulator fan-out); partial aggregation
  * combines map-side, so the shuffle carries #series × #slots rows, not
  * #input × fanout. The fill pass re-uses one (by)-hash-partitioned sort
  * across all window stages.
  */
object RangeSelect {

  sealed trait Fill
  object Fill {
    /** No FILL clause: sparse slots, no densification. */
    case object None extends Fill
    case object Null extends Fill
    case object Prev extends Fill
    case object Linear extends Fill
    final case class Const(value: Any) extends Fill
  }

  /** One RANGE expression.
    * @param build aggregate expression builder; use [[Ctx.value]] so
    *              per-expression RANGE durations mask rows outside
    *              their window
    * @param rangeMs overrides the query-level range for this expr
    */
  final case class RangeAgg(
      alias: String,
      build: Ctx => Column,
      fill: Fill = Fill.None,
      rangeMs: Option[Long] = scala.None)

  /** Handed to [[RangeAgg.build]]: `value(c)` is column `c` masked to
    * this expression's window. */
  final class Ctx private[RangeSelect] (guard: Column) {
    def value(c: String): Column = value(col(c))
    def value(c: Column): Column = when(guard, c)
    def present: Column = when(guard, lit(1))
  }

  /** A collect-buffering aggregate (exact/approx percentile, WITHIN
    * GROUP, array_agg) evaluated INSIDE a per-series sliding-window fold
    * instead of the slot explode — the reference's `RangeSelectStream`
    * shape (query/src/range_select/plan.rs:967: per-window accumulators
    * updated in one pass over the sorted series). The explode path
    * serializes every input row into ceil(range/align) aggregation
    * buffers — 240× shuffle amplification at RANGE '1h' ALIGN '15s' —
    * where the fold shuffles each row at most twice (chunk-boundary
    * copy). Algebraic aggregates (min/max/sum/count/avg) should STAY on
    * the explode path: partial aggregation already combines them
    * map-side, and the codegen'd hash aggregate beats the fold there.
    *
    * @param eval window evaluator over the non-null (ts, value) samples
    *             of [[input]] with slot <= ts < slot + range, in
    *             ascending (ts, value) order; None → NULL output for the
    *             slot
    * @param dataType Spark type of the evaluator's result
    * @param evalWithNulls when set, takes precedence over [[eval]] and
    *             receives ALL window samples including null-valued ones
    *             (first_value/last_value carry nulls; percentile drops
    *             them)
    */
  final case class FoldAgg(
      alias: String,
      input: String,
      eval: IndexedSeq[(Long, Double)] => Option[Any],
      fill: Fill = Fill.None,
      rangeMs: Option[Long] = scala.None,
      dataType: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.DoubleType,
      evalWithNulls: Option[IndexedSeq[(Long, java.lang.Double)] => Option[Any]] =
        scala.None)

  /** Explode-to-fold switchover for SQL-surfaced collect-buffering RANGE
    * aggregates (graft.sql.RangeSql): when ceil(range/align) reaches
    * this fan-out, percentile WITHIN GROUP routes through [[FoldAgg]].
    * Below it the explode is a plain codegen'd filter+agg and the
    * reference sqlness corpus (fan-out ≤ a few) keeps its pinned
    * explode-path results. */
  private[graft] var FoldFanoutMin = 16L

  private val Slot = "__slot"

  /** @param tsMs  name of a LongType epoch-millisecond time column
    * @param by    series key columns
    * @param foldAggs collect-buffering aggregates routed through the
    *                 per-series fold (joined with the explode part on
    *                 (by, slot) — a #series × #slots join)
    * @return DataFrame with columns (tsMs slot, by..., aggs..., foldAggs...)
    */
  def apply(
      df: DataFrame,
      tsMs: String,
      by: Seq[String],
      alignMs: Long,
      rangeMs: Long,
      aggs: Seq[RangeAgg],
      alignToMs: Long = 0L,
      foldAggs: Seq[FoldAgg] = Nil): DataFrame = {
    require(alignMs > 0 && rangeMs > 0, "align/range must be positive")
    require(aggs.nonEmpty || foldAggs.nonEmpty, "at least one aggregate")
    val ts = col(tsMs)

    val explodePart: Option[DataFrame] = if (aggs.isEmpty) scala.None else Some {
      val maxRange = (rangeMs +: aggs.flatMap(_.rangeMs)).max
      // slot indices i with i*align+align_to in (ts - maxRange, ts]
      // (floor division keeps pre-epoch timestamps correct)
      val iHi = floor((ts - alignToMs).cast("double") / alignMs).cast("long")
      val loTs = ts - maxRange
      val iLo = floor((loTs - alignToMs).cast("double") / alignMs).cast("long") + 1
      // sequence(lo, hi) turns descending when lo > hi (possible when
      // range < align, where a row may belong to zero slots) — the guard
      // filter below drops any out-of-window slot it produces.
      val exploded = df
        .withColumn("__i", explode(sequence(least(iLo, iHi), iHi)))
        .withColumn(Slot, col("__i") * alignMs + alignToMs)
        .drop("__i")
        .filter(col(Slot) <= ts && ts < col(Slot) + maxRange)

      val aggCols = aggs.map { a =>
        val r = a.rangeMs.getOrElse(rangeMs)
        val guard = (col(Slot) <= ts) && (ts < col(Slot) + r)
        a.build(new Ctx(guard)).as(a.alias)
      }
      exploded
        .groupBy((by.map(col) :+ col(Slot)): _*)
        .agg(aggCols.head, aggCols.tail: _*)
    }

    val foldPart: Option[DataFrame] =
      if (foldAggs.isEmpty) scala.None
      else Some(foldSlots(df, tsMs, by, alignMs, alignToMs, rangeMs, foldAggs))

    // slot presence = ANY aggregate's window saw a row (the reference
    // keys output rows off the union of accumulator windows); the
    // full-outer join reproduces that across the two paths
    val combined = (explodePart, foldPart) match {
      case (Some(a), Some(b)) => a.join(b, by :+ Slot, "full_outer")
      case (Some(a), _) => a
      case (_, b) => b.get
    }

    val fills = aggs.map(a => a.alias -> a.fill) ++
      foldAggs.map(a => a.alias -> a.fill)
    val needFill = fills.exists(_._2 != Fill.None)
    val densified = if (needFill) densify(combined, by, alignMs) else combined

    val filled = applyFills(densified, by, fills)
    filled.withColumnRenamed(Slot, tsMs)
      .select((tsMs +: by) ++ (aggs.map(_.alias) ++ foldAggs.map(_.alias))
        map col: _*)
  }

  /** The fold evaluation of [[FoldAgg]]s: one shuffle on (series,
    * slot-chunk), each partition sorted by ts and swept once with a
    * sliding deque — shuffle volume is ≤2× the input (chunk-boundary
    * copies), independent of range/align, vs the explode's
    * ceil(range/align)× buffer amplification. Mirrors
    * graft.promql.PromQL.foldWindowsAtGrid but with RANGE's
    * FORWARD-looking window (slot <= ts < slot + range) and a
    * data-driven slot set (a slot exists iff its max-range window is
    * non-empty) instead of a fixed eval grid. */
  private def foldSlots(df: DataFrame, tsMs: String, by: Seq[String],
      alignMs: Long, alignToMs: Long, defaultRangeMs: Long,
      foldAggs: Seq[FoldAgg]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val ranges = foldAggs.map(_.rangeMs.getOrElse(defaultRangeMs))
    val maxR = ranges.max
    val inputs = foldAggs.map(_.input).distinct.toIndexedSeq
    val aggIn = foldAggs.map(a => inputs.indexOf(a.input)).toArray
    val evals = foldAggs.map(_.eval).toArray
    val evalsNul = foldAggs.map(_.evalWithNulls).toArray
    val rArr = ranges.toArray
    val nIn = inputs.length
    val nAgg = foldAggs.length

    val keyCol = if (by.isEmpty) lit(0L) else struct(by.map(col): _*)
    val projected = df.select(
      keyCol.as("__k") +: col(tsMs).cast("long").as("__t") +:
        inputs.zipWithIndex.map { case (c, i) =>
          col(c).cast("double").as(s"__in$i") }: _*)
    // slot indices this sample feeds: forward window t <= ts < t + maxR
    // → i in [iLo, iHi]
    val t = col("__t")
    val iHi = floor((t - alignToMs).cast("double") / alignMs).cast("long")
    val iLo = floor((t - maxR - alignToMs).cast("double") / alignMs)
      .cast("long") + 1
    // chunk = one maxR-wide band of slot indices → a sample lands in ≤2
    // chunks; per-series parallelism = series time-span / maxR
    val m = math.max(1L, (maxR + alignMs - 1) / alignMs)
    val keyed = projected
      .filter(iLo <= iHi) // range < align can orphan a row from every slot
      .withColumn("__c", explode(sequence(
        floor(iLo.cast("double") / m).cast("long"),
        floor(iHi.cast("double") / m).cast("long"))))
      .repartition(col("__k"), col("__c"))
      // inputs ride the sort as ts tie-breaks: deterministic window
      // order, and for single-input first/last it reproduces the
      // explode path's struct-lexicographic (ts, value) tie resolution
      .sortWithinPartitions(col("__k") +: col("__c") +: col("__t") +:
        (0 until nIn).map(i => col(s"__in$i")): _*)

    val outT = StructType(
      StructField("__k", keyed.schema("__k").dataType, nullable = by.nonEmpty) +:
        StructField(Slot, LongType, nullable = false) +:
        foldAggs.map(a => StructField(a.alias, a.dataType, nullable = true)))
    val (alignL, alignToL, maxRL, mL) = (alignMs, alignToMs, maxR, m)

    val folded = keyed.mapPartitions { it =>
      new Iterator[Row] {
        private val out = scala.collection.mutable.Queue.empty[Row]
        private var curKey: Any = null
        private var curChunk = 0L
        private var started = false
        // entries: Array(ts: Long, in0: java.lang.Double|null, ...)
        private val deque = new java.util.ArrayDeque[Array[Any]]()
        private var nextI = 0L // next unemitted slot index of the chunk
        private var endI = 0L  // first slot index past the chunk
        private def emitUpTo(limit0: Long): Unit = {
          val lim = math.min(limit0, endI)
          while (nextI < lim) {
            val slotTs = nextI * alignL + alignToL
            while (!deque.isEmpty &&
              deque.peekFirst()(0).asInstanceOf[Long] < slotTs)
              deque.pollFirst()
            if (deque.isEmpty) nextI = lim // no samples until the next row
            else {
              // invariant (emitUpTo precedes every insert): all deque
              // entries have ts < slotTs + maxR — the deque IS the
              // max-range window; per-agg windows are its prefixes
              val w = deque.toArray(new Array[Array[Any]](deque.size))
              val vals = new Array[Any](2 + nAgg)
              vals(0) = curKey
              vals(1) = slotTs
              var a = 0
              while (a < nAgg) {
                val end = slotTs + rArr(a)
                vals(2 + a) = evalsNul(a) match {
                  case Some(fn) =>
                    val buf = IndexedSeq.newBuilder[(Long, java.lang.Double)]
                    var j = 0
                    var inWin = true
                    while (j < w.length && inWin) {
                      val sts = w(j)(0).asInstanceOf[Long]
                      if (sts >= end) inWin = false
                      else buf += ((sts, w(j)(1 + aggIn(a)).asInstanceOf[java.lang.Double]))
                      j += 1
                    }
                    fn(buf.result()).orNull
                  case scala.None =>
                    val buf = IndexedSeq.newBuilder[(Long, Double)]
                    var j = 0
                    var inWin = true
                    while (j < w.length && inWin) {
                      val sts = w(j)(0).asInstanceOf[Long]
                      if (sts >= end) inWin = false
                      else {
                        val v = w(j)(1 + aggIn(a))
                        if (v != null) buf += ((sts, v.asInstanceOf[Double]))
                      }
                      j += 1
                    }
                    evals(a)(buf.result()).orNull
                }
                a += 1
              }
              out += Row.fromSeq(
                scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
              nextI += 1
            }
          }
        }
        private def advance(): Unit = {
          while (out.isEmpty && it.hasNext) {
            val r = it.next()
            val k = r.get(0)
            val c = r.getLong(2 + nIn)
            if (!started || k != curKey || c != curChunk) {
              if (started) { emitUpTo(endI); deque.clear() }
              curKey = k
              curChunk = c
              nextI = c * mL
              endI = (c + 1) * mL
              started = true
            }
            val sts = r.getLong(1)
            // slots strictly before this sample's first slot are final
            emitUpTo(Math.floorDiv(sts - maxRL - alignToL, alignL) + 1)
            val e = new Array[Any](1 + nIn)
            e(0) = sts
            var i = 0
            while (i < nIn) {
              e(1 + i) = if (r.isNullAt(2 + i)) null else Double.box(r.getDouble(2 + i))
              i += 1
            }
            deque.addLast(e)
          }
          if (out.isEmpty && started) {
            emitUpTo(endI); deque.clear(); started = false
          }
        }
        def hasNext: Boolean = { if (out.isEmpty) advance(); out.nonEmpty }
        def next(): Row = { if (out.isEmpty) advance(); out.dequeue() }
      }
    }(Encoders.row(outT))

    if (by.isEmpty) folded.select(col(Slot) +: foldAggs.map(a => col(a.alias)): _*)
    else folded.select((by.map(b => col(s"__k.`$b`").as(b)) :+ col(Slot)) ++
      foldAggs.map(a => col(a.alias)): _*)
  }

  /** Per-series dense grid from first to last populated slot, left-joined
    * back onto the sparse aggregate (plan.rs:1102-1110). The join key
    * (by, slot) matches the aggregation's partitioning. */
  private def densify(grouped: DataFrame, by: Seq[String], alignMs: Long): DataFrame = {
    val extent = grouped.groupBy(by.map(col): _*)
      .agg(min(col(Slot)).as("__lo"), max(col(Slot)).as("__hi"))
      .withColumn(Slot, explode(sequence(col("__lo"), col("__hi"), lit(alignMs))))
      .drop("__lo", "__hi")
    extent.join(grouped, by :+ Slot, "left")
  }

  private def applyFills(df: DataFrame, by: Seq[String],
      fills: Seq[(String, Fill)]): DataFrame = {
    val w = Window.partitionBy(by.map(col): _*).orderBy(col(Slot))
    fills.foldLeft(df) { case (d, (alias, fill)) =>
      fill match {
        case Fill.None | Fill.Null => d
        case Fill.Const(v) => d.withColumn(alias, coalesce(col(alias), lit(v)))
        case Fill.Prev =>
          d.withColumn(alias,
            last(col(alias), ignoreNulls = true)
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        case Fill.Linear => fillLinear(d, alias, w)
      }
    }
  }

  /** FILL LINEAR (plan.rs:141-187): nearest-neighbour interpolation,
    * head/tail extrapolation from the closest two points, no-op when the
    * series has fewer than two non-null slots. Output type: double. */
  private def fillLinear(df: DataFrame, c: String, w: WindowSpec): DataFrame = {
    val v = col(c).cast("double")
    val slotIf = when(col(c).isNotNull, col(Slot))
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1, Window.unboundedFollowing)
    val whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    val staged = df
      .withColumn("__pv", last(v, ignoreNulls = true).over(before))
      .withColumn("__pt", last(slotIf, ignoreNulls = true).over(before))
      .withColumn("__nv", first(v, ignoreNulls = true).over(after))
      .withColumn("__nt", first(slotIf, ignoreNulls = true).over(after))
      .withColumn("__nn", count(col(c)).over(whole))
      .withColumn("__f1t", first(slotIf, ignoreNulls = true).over(whole))
      .withColumn("__f1v", first(v, ignoreNulls = true).over(whole))
      .withColumn("__l1t", last(slotIf, ignoreNulls = true).over(whole))
      .withColumn("__l1v", last(v, ignoreNulls = true).over(whole))
    // second/second-to-last non-null need the first stage's result
    val staged2 = staged
      .withColumn("__f2t", first(when(col(c).isNotNull && col(Slot) > col("__f1t"), col(Slot)),
        ignoreNulls = true).over(whole))
      .withColumn("__f2v", first(when(col(c).isNotNull && col(Slot) > col("__f1t"), v),
        ignoreNulls = true).over(whole))
      .withColumn("__l2t", last(when(col(c).isNotNull && col(Slot) < col("__l1t"), col(Slot)),
        ignoreNulls = true).over(whole))
      .withColumn("__l2v", last(when(col(c).isNotNull && col(Slot) < col("__l1t"), v),
        ignoreNulls = true).over(whole))

    def interp(t1: Column, v1: Column, t2: Column, v2: Column): Column =
      v1 + (v2 - v1) * (col(Slot) - t1).cast("double") / (t2 - t1).cast("double")

    val filledV =
      when(col(c).isNotNull, v)
        .when(col("__nn") < 2, lit(null).cast("double"))
        .when(col("__pt").isNotNull && col("__nt").isNotNull,
          interp(col("__pt"), col("__pv"), col("__nt"), col("__nv")))
        .when(col("__pt").isNull,
          interp(col("__f1t"), col("__f1v"), col("__f2t"), col("__f2v")))
        .otherwise(
          interp(col("__l2t"), col("__l2v"), col("__l1t"), col("__l1v")))

    staged2.withColumn(c, filledV)
      .drop("__pv", "__pt", "__nv", "__nt", "__nn",
            "__f1t", "__f1v", "__l1t", "__l1v", "__f2t", "__f2v", "__l2t", "__l2v")
  }
}
