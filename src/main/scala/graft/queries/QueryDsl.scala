package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers shared by the oracle-checked query registry.
  *
  * Floating-point discipline: double summation is order-dependent, and
  * the driver hash-compares our results against DuckDB. Every aggregate
  * over a double column therefore runs in exact decimal arithmetic and
  * is cast to double only at the very end — both engines then perform
  * the identical (deterministic) decimal→IEEE754 rounding. The matching
  * oracle spelling is `CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE)`.
  */
object QueryDsl {
  type Q = (SparkSession, String) => DataFrame

  def T(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(spark, dir, name) // normalizes events.ts → ns-long

  /** Exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 4))).cast("double")

  /** Exact sum at higher scale (for products like price*(1-disc)). */
  def dsum8(c: Column): Column = sum(c.cast(DecimalType(38, 8))).cast("double")

  /** Deterministic average: exact decimal sum, one double division. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Millisecond epoch of a timestamp column (both engines floor).
    * Parquet naive timestamps arrive as TIMESTAMP_NTZ; session TZ is
    * pinned to UTC so the cast is instant-preserving. */
  def ms(c: Column): Column = unix_millis(c.cast("timestamp"))
}
