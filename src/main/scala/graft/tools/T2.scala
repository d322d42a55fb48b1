package graft.tools
import org.apache.spark.sql.SparkSession
object T2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = new graft.sql.GraftSession(spark)
    g.sql("CREATE TABLE test_ttl( ts TIMESTAMP TIME INDEX, val INT, PRIMARY KEY (`val`) ) WITH (ttl = 'instant')")
    println("[t2] ttl=" + g.catalog.spec("test_ttl").ttlMillis)
    g.sql("INSERT INTO test_ttl VALUES (now(), 1), (now(), 2), (now(), 3)")
    println("[t2] rows=" + g.sql("SELECT val from test_ttl").count())
    spark.stop()
  }
}
