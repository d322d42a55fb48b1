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
    run("""CREATE TABLE ts_ns_bug (ts TIMESTAMP(9) TIME INDEX, v INT)""")
    run("""INSERT INTO ts_ns_bug VALUES
      ('2026-06-02 03:49:59.999999999', 1),
      ('2026-06-02 03:50:00.000000000', 2),
      ('2026-06-02 03:50:00.000000195', 3),
      ('2026-06-02 03:50:01.000000000', 4)""")
    run("SELECT * FROM __nsq_ts_ns_bug")
    run("SELECT ts, v FROM ts_ns_bug ORDER BY ts")
    run("SELECT ts, v FROM ts_ns_bug WHERE ts = '2026-06-02 03:50:00.000000195'")
    run("SELECT ts, v FROM ts_ns_bug WHERE ts <= '2026-06-02 03:50:00' ORDER BY ts")
    spark.stop()
  }
}
