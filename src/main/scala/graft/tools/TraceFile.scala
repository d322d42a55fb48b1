package graft.tools
import org.apache.spark.sql.SparkSession
object TraceFile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = new graft.sql.GraftSession(spark)
    for (e <- GoldenRunner.parseResult(args(0))) {
      println(s"[trace] EXEC: ${e.sql.take(120)}")
      Console.flush()
      try { val df = g.sql(e.sql); df.collect(); println("[trace]   ok") }
      catch { case ex: Throwable => println(s"[trace]   ERR ${ex.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
