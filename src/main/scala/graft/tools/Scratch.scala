package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev scratch probe — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = new graft.sql.GraftSession(spark)
    def run(q: String): Unit =
      try { println(s"--- ${q.take(90)}"); g.sql(q).show(20, false) }
      catch { case e: Throwable => println("ERR " + String.valueOf(e.getMessage).take(400)) }
    run("""CREATE TABLE http_requests_total (host STRING, job STRING, instance STRING, byte DOUBLE, ts TIMESTAMP TIME INDEX, PRIMARY KEY (host, job, instance))""")
    run("""CREATE FLOW calc_rate SINK TO rate_reqs EVAL INTERVAL '1m' AS
      TQL EVAL (now() - '1m'::interval, now(), '30s') rate(http_requests_total{job="my_service"}[1m])""")
    run("SHOW CREATE TABLE rate_reqs")
    run("""INSERT INTO TABLE http_requests_total VALUES
      ('localhost', 'my_service', 'instance1', 100, now() - '1min'::interval),
      ('localhost', 'my_service', 'instance1', 200, now() - '45s'::interval),
      ('remotehost', 'my_service', 'instance1', 300, now() - '30s'::interval),
      ('remotehost', 'their_service', 'instance1', 300, now() - '15s'::interval),
      ('localhost', 'my_service', 'instance1', 400, now())""")
    run("ADMIN FLUSH_FLOW('calc_rate')")
    run("SELECT count(*)>0 FROM rate_reqs")
    run("SELECT * FROM rate_reqs")
    spark.stop()
  }
}
