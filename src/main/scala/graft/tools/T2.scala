package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object T2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = graft.Tables.load(spark, d, "documents")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.4, 3).count()
      println(f"[t2] run$i pairs=$n time=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
