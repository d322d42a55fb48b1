package graft.tools
import org.apache.spark.sql.SparkSession
object OneFile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (f <- args) {
      val out = GoldenRunner.run(spark, f)
      println(s"[onefile] $f compared=${out.compared} skipped=${out.skipped} problems=${out.problems.size}")
      out.problems.take(6).foreach(p => println("    " + p.replace("\n", "\n    ")))
    }
    spark.stop()
  }
}
