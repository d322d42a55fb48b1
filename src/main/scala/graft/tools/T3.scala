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
    g.sql("CREATE TABLE logs (`id` INT, `log_message` STRING, `ts` TIMESTAMP TIME INDEX)")
    g.sql("INSERT INTO logs VALUES (1, 'An error occurred!', 1000)")
    try {
      val df = g.sql("SELECT `id`, `log_message`, `log_message` @@ 'error' as `matches_error` FROM logs WHERE `id` <= 6 ORDER BY `id`")
      println("[t3] ok " + df.count())
    } catch { case e: Throwable => println("[t3] ERR " + String.valueOf(e.getMessage).take(400)) }
    spark.stop()
  }
}
