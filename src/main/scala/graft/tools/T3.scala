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
    g.sql("SET time_zone = '+8:00'")
    println("[t3] gconf=" + g.spark.conf.get("spark.sql.session.timeZone"))
    println("[t3] gsql=" + g.spark.sql("SELECT unix_seconds(CAST('2024-01-02 00:00:00' AS TIMESTAMP))").head.getLong(0))
    println("[t3] ux=" + g.sql("select to_unixtime('2024-01-02 00:00:00')").head.get(0))
    spark.stop()
  }
}
