package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc dev probe (scratch, rewritten per investigation). Current:
  * final AQE plan of text_tfidf at the 100x fan dir — where did the
  * 845 MB shuffle come from. */
object T2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft_cur100")
    val df = graft.SparkEntry.queries("text_tfidf")(spark, dir)
    df.select(bit_xor(xxhash64(df.columns.map(col): _*))).collect()
    println("==== FINAL ADAPTIVE PLAN ====")
    println(df.queryExecution.executedPlan.toString.take(8000))
    // vocabulary + tf sizes, to size the join sides
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = docs.select(explode(graft.operators.TfIdf.tokens(col("text"))).as("t"))
    println("tokens=" + toks.count() + " vocab=" + toks.distinct().count())
    spark.stop()
  }
}
