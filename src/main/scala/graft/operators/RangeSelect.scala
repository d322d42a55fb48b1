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

  private val Slot = "__slot"

  /** @param tsMs  name of a LongType epoch-millisecond time column
    * @param by    series key columns
    * @return DataFrame with columns (tsMs slot, by..., aggs...)
    */
  def apply(
      df: DataFrame,
      tsMs: String,
      by: Seq[String],
      alignMs: Long,
      rangeMs: Long,
      aggs: Seq[RangeAgg],
      alignToMs: Long = 0L): DataFrame = {
    require(alignMs > 0 && rangeMs > 0, "align/range must be positive")
    val maxRange = (rangeMs +: aggs.flatMap(_.rangeMs)).max
    val ts = col(tsMs)

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
    val grouped = exploded
      .groupBy((by.map(col) :+ col(Slot)): _*)
      .agg(aggCols.head, aggCols.tail: _*)

    val needFill = aggs.exists(_.fill != Fill.None)
    val densified = if (needFill) densify(grouped, by, alignMs) else grouped

    val filled = applyFills(densified, by, aggs)
    filled.withColumnRenamed(Slot, tsMs)
      .select((tsMs +: by) ++ aggs.map(_.alias) map col: _*)
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

  private def applyFills(df: DataFrame, by: Seq[String], aggs: Seq[RangeAgg]): DataFrame = {
    val w = Window.partitionBy(by.map(col): _*).orderBy(col(Slot))
    aggs.foldLeft(df) { (d, a) =>
      a.fill match {
        case Fill.None | Fill.Null => d
        case Fill.Const(v) => d.withColumn(a.alias, coalesce(col(a.alias), lit(v)))
        case Fill.Prev =>
          d.withColumn(a.alias,
            last(col(a.alias), ignoreNulls = true)
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        case Fill.Linear => fillLinear(d, a.alias, w)
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
