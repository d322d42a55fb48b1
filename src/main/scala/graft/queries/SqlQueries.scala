package graft.queries

import org.apache.spark.sql.functions._
import graft.sql.GraftSession
import QueryDsl._

/** SQL/DDL frontend coverage (SURVEY.md §3.1): CREATE TABLE with TIME
  * INDEX/PRIMARY KEY, INSERT ... SELECT, and a relational query through
  * the same `sql()` entry — hash-compared against DuckDB on the source
  * parquet. */
object SqlQueries {

  val queries: Map[String, Q] = Map(
    "sql_frontend_e2e" -> ((s, d) => {
      val g = new GraftSession(s)
      // register on g's cloned session — GraftSession isolates its views
      T(g.spark, d, "nation").createOrReplaceTempView("nation_src")
      g.sql("""CREATE TABLE n2 (
          ts TIMESTAMP TIME INDEX,
          n_name STRING PRIMARY KEY,
          n_regionkey BIGINT)""")
      g.sql("""INSERT INTO n2
          SELECT TIMESTAMP'2024-01-01 00:00:00', n_name, n_regionkey FROM nation_src""")
      g.sql("""SELECT n_regionkey, count(*) AS n FROM n2
               GROUP BY n_regionkey ORDER BY n_regionkey""")
        .select(col("n_regionkey").cast("long").as("n_regionkey"), col("n"))
    }),

    // within-aggregate ORDER BY (PG syntax the reference inherits from
    // DataFusion): array_agg(x ORDER BY x DESC) / string_agg(DISTINCT …
    // ORDER BY …) through the GraftSession rewrite, joined to strings so
    // the hash compare is exact
    "agg_array_ordered" -> ((s, d) => {
      val g = new GraftSession(s)
      T(g.spark, d, "lineitem").createOrReplaceTempView("li")
      g.sql("""SELECT l_returnflag, l_linestatus,
          array_join(array_agg(DISTINCT l_linenumber ORDER BY l_linenumber DESC), ',') AS lines_desc,
          string_agg(DISTINCT CAST(l_linenumber AS STRING), '-' ORDER BY CAST(l_linenumber AS STRING)) AS lines_str
        FROM li GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")
    }),

    // Postgres DISTINCT ON (aggregate/distinct.sql:19) through the
    // row_number-over-window rewrite; total ORDER BY so the kept row is
    // deterministic on both engines
    "sql_distinct_on" -> ((s, d) => {
      val g = new GraftSession(s)
      T(g.spark, d, "orders").createOrReplaceTempView("ord")
      g.sql("""SELECT DISTINCT ON (o_orderpriority)
          o_orderpriority, o_orderkey, o_orderstatus
        FROM ord ORDER BY o_orderpriority, o_orderkey""")
    })
  )

  val oracles: Map[String, String] = Map(
    "sql_frontend_e2e" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, COUNT(*) AS n
         FROM nation GROUP BY 1 ORDER BY 1""",

    "agg_array_ordered" ->
      """SELECT l_returnflag, l_linestatus,
           array_to_string(array_agg(DISTINCT l_linenumber ORDER BY l_linenumber DESC), ',') AS lines_desc,
           string_agg(DISTINCT CAST(l_linenumber AS VARCHAR), '-' ORDER BY CAST(l_linenumber AS VARCHAR)) AS lines_str
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",

    "sql_distinct_on" ->
      """SELECT DISTINCT ON (o_orderpriority)
           o_orderpriority, o_orderkey, o_orderstatus
         FROM orders ORDER BY o_orderpriority, o_orderkey"""
  )
}
