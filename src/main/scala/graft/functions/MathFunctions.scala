package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Math scalar functions — reference
  * common/function/src/scalars/math/{clamp,modulo,rate}.rs plus the
  * `if`/`isnull` expression helpers (SURVEY.md §2.8).
  */
object MathFunctions {

  def clamp(v: Column, lo: Column, hi: Column): Column = least(greatest(v, lo), hi)
  def clampMin(v: Column, lo: Column): Column = greatest(v, lo)
  def clampMax(v: Column, hi: Column): Column = least(v, hi)

  /** SQL `mod` — remainder with the dividend's sign (reference modulo.rs). */
  def mod(a: Column, b: Column): Column = a % b

  /** reference rate(): first-difference of a counter divided by elapsed
    * seconds; window must be (series, ordered by time). tsMs is epoch ms. */
  def rate(tsMs: Column, v: Column, w: WindowSpec): Column = {
    val dv = v - lag(v, 1).over(w)
    val dt = (tsMs - lag(tsMs, 1).over(w)).cast("double") / 1000.0
    when(dt > 0, dv.cast("double") / dt)
  }

  /** reference if(cond, a, b). */
  def iff(cond: Column, a: Column, b: Column): Column = when(cond, a).otherwise(b)

  def isNull(c: Column): Column = c.isNull
}
