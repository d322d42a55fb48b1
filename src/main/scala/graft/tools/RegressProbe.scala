package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-bench for the three queries that regressed ~2.5× between the
  * round-2 and round-3 testdata regeneration (VERDICT r3 #8):
  * join_inequality, window_rank, range_tumbling. Warm min-of-3 each. */
object RegressProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("join_inequality", "window_rank", "range_tumbling")
    for (n <- names) {
      val q = qs(n)
      q(spark, sf).collect() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q(spark, sf).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[regress] $n%-20s min=${times.min}%.3f s runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    sys.env.get("REGRESS_EXPLAIN").foreach { _ =>
      names.foreach(n => {
        println(s"===== $n"); qs(n)(spark, sf).explain("formatted")
      })
    }
    spark.stop()
  }
}
