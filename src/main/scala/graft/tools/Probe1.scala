package graft.tools
import org.apache.spark.sql.SparkSession
object Probe1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = new graft.sql.GraftSession(spark)
    g.sql("""CREATE TABLE incremental_aggr_input (
      host_id INT, n INT, ts TIMESTAMP TIME INDEX, PRIMARY KEY(host_id)
    ) WITH (append_mode = 'true')""")
    g.sql("""CREATE FLOW incremental_aggr_flow SINK TO incremental_aggr_sink
WITH (experimental_enable_incremental_read = 'true')
AS
SELECT
    sum(n) AS total,
    min(n) AS min_n,
    max(n) AS max_n,
    date_bin(INTERVAL '1 minute', ts, '2024-01-01 00:00:00') AS time_window
FROM
    incremental_aggr_input
GROUP BY
    time_window""")
    g.sql("INSERT INTO incremental_aggr_input VALUES (1, 10, '2024-01-01 00:00:00'), (2, 20, '2024-01-01 00:00:30')")
    try g.sql("ADMIN FLUSH_FLOW('incremental_aggr_flow')").show()
    catch { case e: Throwable => println("ERRFLUSH: " + e.toString.take(500)) }
    try g.sql("SELECT total, min_n, max_n, time_window FROM incremental_aggr_sink ORDER BY time_window").show(false)
    catch { case e: Throwable => println("ERRSEL: " + e.toString.take(800)) }
    println("DIALECT: [" + g.dialect("SELECT total, min_n, max_n, time_window FROM incremental_aggr_sink ORDER BY time_window") + "]")
    spark.stop()
  }
}
