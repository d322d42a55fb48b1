package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // watchdog: a query stalling >30s gets one full thread dump to
    // stderr — diagnoses sporadic long-run slowdowns without a profiler
    val stallAt = new java.util.concurrent.atomic.AtomicLong(Long.MaxValue)
    val curName = new java.util.concurrent.atomic.AtomicReference[String]("")
    val watchdog = new Thread(() => {
      while (true) {
        Thread.sleep(5000)
        if (System.nanoTime() > stallAt.get()) {
          stallAt.set(Long.MaxValue) // once per query
          Console.err.println(s"[bench-stall] ${curName.get()} >30s; thread dump:")
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
            if (st.nonEmpty && !t.getName.contains("watchdog")) {
              Console.err.println(s"  --- ${t.getName} (${t.getState})")
              st.take(12).foreach(f => Console.err.println(s"    at $f"))
            }
          }
        }
      }
    }, "bench-watchdog")
    watchdog.setDaemon(true)
    watchdog.start()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      curName.set(name)
      stallAt.set(t0 + 30L * 1000 * 1000 * 1000)
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      stallAt.set(Long.MaxValue)
      val dt = (System.nanoTime() - t0) / 1e9
      // caches inside operators (LSH signatures etc.) are per-query;
      // freeing them keeps the long sequential run GC-stable
      spark.catalog.clearCache()
      Console.err.println(f"[bench] $name%-28s $dt%8.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
