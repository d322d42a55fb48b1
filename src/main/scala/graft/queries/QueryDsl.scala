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

  /** Exact integer cent count of a 2-dp-grid double (TPC-H money
    * columns: quantity/price/discount all sit on the cent grid —
    * verified max |x*100 − round(x*100)| ≤ 1e-9 over lineitem). The
    * double product/representation error is « 0.5, so the round is
    * exact recovery, and downstream sums become primitive LONG adds
    * inside whole-stage codegen instead of Decimal buffer adds. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Correctly-rounded double of an exact long sum at fixed decimal
    * scale: one exact decimal division (result scale ≥ 6, representable
    * exactly for scale ≤ 4 inputs) then ONE decimal→double conversion —
    * the same single rounding the oracle's decimal-sum cast performs.
    * Long sums hold exactly to ±9.2e18: at scale 4 with ~1e9/row
    * products that is ~8.8e9 rows per group (≈ TPC-H SF 1500 in one
    * group); past that, sum `prod.cast("decimal(38,0)")` instead — the
    * per-row arithmetic stays integer, only the buffer add widens. */
  def fromScaled(sumCol: Column, scale: Int): Column =
    (sumCol.cast(DecimalType(38, 0)) /
      lit(math.pow(10, scale).toLong)).cast("double")

  /** Millisecond epoch of a timestamp column (both engines floor).
    * Parquet naive timestamps arrive as TIMESTAMP_NTZ; session TZ is
    * pinned to UTC so the cast is instant-preserving. */
  def ms(c: Column): Column = unix_millis(c.cast("timestamp"))

  /** Unique temp dir (streaming sinks/checkpoints, index fixtures)
    * deleted at JVM exit — unique per call so repeated Verify/Bench
    * passes never collide, and cleaned so they don't accumulate under
    * /tmp. Shared by FlowQueries and LlmQueries (one copy; a fix here
    * reaches every fixture). */
  private[graft] def tempDirCleanedOnExit(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(dir.toFile)
    }))
    dir.toString
  }
}
