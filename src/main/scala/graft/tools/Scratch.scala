package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc dev probe: run one SparkEntry query at a given SF and print
  * its result (value-level spot check before the Verify/DuckDB gate). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    for (name <- args.drop(1)) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      println(s"== $name @ $dir ==")
      df.show(50, truncate = false)
    }
    spark.stop()
  }
}
