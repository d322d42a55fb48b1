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
    })
  )

  val oracles: Map[String, String] = Map(
    "sql_frontend_e2e" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, COUNT(*) AS n
         FROM nation GROUP BY 1 ORDER BY 1"""
  )
}
