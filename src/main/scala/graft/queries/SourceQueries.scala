package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Copy
import graft.sources.Copy.Options
import QueryDsl._

/** External source/sink coverage (SURVEY.md §2.1): COPY TO/FROM over
  * csv / NDJSON / orc. Each query exports a table slice, reads it back
  * through the external-format scan, and aggregates — hash-compared
  * against DuckDB on the original parquet, proving the write+read
  * round-trip loses nothing. */
object SourceQueries {

  val queries: Map[String, Q] = Map(
    "copy_csv_roundtrip" -> ((s, d) => {
      val dir = Files.createTempDirectory("graft_copy_csv").toString + "/orders"
      val orders = T(s, d, "orders")
      Copy.tableTo(orders, dir, Options(format = "csv"))
      Copy.tableFrom(s, dir, Options(format = "csv"), Some(orders.schema))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    "copy_json_roundtrip" -> ((s, d) => {
      val dir = Files.createTempDirectory("graft_copy_json").toString + "/part"
      val part = T(s, d, "part")
      Copy.queryTo(part.filter(col("p_size") <= 20), dir, Options(format = "json"))
      Copy.tableFrom(s, dir, Options(format = "json"), Some(part.schema))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), dsum(col("p_retailprice")).as("sum_price"))
        .orderBy(col("p_brand"))
    }),

    "copy_orc_roundtrip" -> ((s, d) => {
      val dir = Files.createTempDirectory("graft_copy_orc").toString + "/supplier"
      val supplier = T(s, d, "supplier")
      Copy.tableTo(supplier, dir, Options(format = "orc"))
      Copy.tableFrom(s, dir, Options(format = "orc"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), dsum(col("s_acctbal")).as("sum_bal"))
        .select(col("s_nationkey").cast("long").as("s_nationkey"),
          col("n"), col("sum_bal"))
        .orderBy(col("s_nationkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "copy_csv_roundtrip" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY 1 ORDER BY 1""",

    "copy_json_roundtrip" ->
      """SELECT p_brand, COUNT(*) AS n,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price
         FROM part WHERE p_size <= 20 GROUP BY 1 ORDER BY 1""",

    "copy_orc_roundtrip" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, COUNT(*) AS n,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS sum_bal
         FROM supplier GROUP BY 1 ORDER BY 1"""
  )
}
