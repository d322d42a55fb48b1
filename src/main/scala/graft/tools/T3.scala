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
    g.sql("CREATE TABLE cast_preimage_ts_ms (host STRING PRIMARY KEY, ts TIMESTAMP(3) TIME INDEX, v INTEGER)")
    g.sql("INSERT INTO cast_preimage_ts_ms VALUES ('host1', 0, 1), ('host1', 5000, 2)")
    try {
      val df = g.sql("SELECT host, v FROM cast_preimage_ts_ms WHERE CAST(ts AS TIMESTAMP(9)) = '1970-01-01 00:00:05.000000001'::TIMESTAMP(9) ORDER BY host")
      println("[t3] rows=" + df.count())
    } catch { case e: Throwable => println("[t3] " + e.getClass.getName + " msg=" + e.getMessage); e.printStackTrace() }
    spark.stop()
  }
}
