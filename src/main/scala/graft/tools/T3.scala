package graft.tools

import org.apache.spark.sql.SparkSession

object T3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = new graft.sql.GraftSession(spark)
    def run(s: String): Unit = {
      try {
        val df = g.sql(s)
        println(s"--- $s")
        df.show(20, false)
      } catch { case e: Exception => println(s"--- $s\nERR ${e.getMessage}") }
    }
    run("""CREATE TABLE distinct_basic ("number" INT, ts TIMESTAMP DEFAULT CURRENT_TIMESTAMP, PRIMARY KEY(number), TIME INDEX(ts))WITH ('ttl' = 'instant')""")
    run("""CREATE FLOW test_distinct_basic SINK TO out_distinct_basic EVAL INTERVAL '1m' AS
SELECT DISTINCT number as dis FROM distinct_basic""")
    run("""INSERT INTO distinct_basic VALUES (20, "2021-07-01 00:00:00.200"), (20, "2021-07-01 00:00:00.200"), (22, "2021-07-01 00:00:00.600")""")
    run("ADMIN FLUSH_FLOW('test_distinct_basic')")
    run("SELECT dis FROM out_distinct_basic")
    run("SELECT number FROM distinct_basic")
  }
}
