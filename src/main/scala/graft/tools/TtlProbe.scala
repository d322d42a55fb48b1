package graft.tools
import org.apache.spark.sql.SparkSession

/** Timing probe for the 1-second database-ttl wall-clock test. */
object TtlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = new graft.sql.GraftSession(spark)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ttl] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    t("create db")(s.sql("CREATE DATABASE test_ttl_db WITH (ttl = '1 second')"))
    t("use")(s.sql("USE test_ttl_db"))
    t("create table")(s.sql("CREATE TABLE test_ttl(ts TIMESTAMP TIME INDEX, val INT)"))
    t("insert")(s.sql("INSERT INTO test_ttl VALUES (now(), 1)"))
    val rows = t("select")(s.sql("SELECT val from test_ttl").collect())
    println(s"[ttl] rows=${rows.length} (want 1)")
    spark.stop()
  }
}
