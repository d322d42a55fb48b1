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
    g.sql("""CREATE TABLE tsid_binary_join_physical (
  ts TIMESTAMP(3) TIME INDEX,
  greptime_value DOUBLE
) ENGINE = metric WITH ("physical_metric_table" = "")""")
    g.sql("""CREATE TABLE tsid_binary_join_left (
  host STRING NULL,
  job STRING NULL,
  ts TIMESTAMP(3) NOT NULL,
  greptime_value DOUBLE NULL,
  TIME INDEX (ts),
  PRIMARY KEY(host, job)
) ENGINE = metric WITH (on_physical_table = 'tsid_binary_join_physical')""")
    g.sql("INSERT INTO tsid_binary_join_left (host, job, ts, greptime_value) VALUES ('h1','j1','1970-01-01 00:00:00', 10)")
    println("[t3] select: " + scala.util.Try(
      g.sql("SELECT * FROM tsid_binary_join_left").columns.mkString(","))
      .recover { case e => "ERR " + String.valueOf(e.getMessage).take(200) }.get)
    println("[t3] tql: " + scala.util.Try(
      g.sql("TQL EVAL (0, 5, '5s') tsid_binary_join_left").columns.mkString(","))
      .recover { case e => "ERR " + String.valueOf(e.getMessage).take(300) }.get)
    spark.stop()
  }
}
