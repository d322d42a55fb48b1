package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Per-Spark-job wall-time breakdown of one query entry: runs the
  * entry end-to-end (same checksum action as Bench) with a listener
  * printing every job's duration, so the expensive pass inside a
  * multi-job protocol (index writes, counts, checkpoints) is visible.
  * Usage: runMain graft.tools.JobProfile <query> [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.details.linesIterator
          .find(l => l.contains("graft") && !l.contains("JobProfile"))
          .getOrElse(js.stageInfos.last.name)).getOrElse("")
        val nTasks = js.stageInfos.map(_.numTasks).sum
        starts.put(js.jobId, (System.nanoTime(),
          s"stages=${js.stageInfos.size} tasks=$nTasks  ${site.trim.take(100)}"))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms >= 20)
            println(f"[job] ${je.jobId}%4d ${ms}%9.0f ms  $desc")
        }
      }
    })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}
    // whole-process CPU seconds: immune to hypervisor steal (stolen
    // cycles inflate wall, not consumed CPU), so run-to-run deltas
    // reflect the work actually done by the query
    def cpuSec: Double = {
      val t = scala.io.Source.fromFile("/proc/self/stat").mkString.split(" ")
      (t(13).toDouble + t(14).toDouble) / 100.0
    }
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val jobCount = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        { jobCount.incrementAndGet(); () }
    })
    for (r <- 1 to reps) {
      val c0 = cpuSec; val g0 = gcMs; val j0 = jobCount.get()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.select(bit_xor(xxhash64(df.columns.map(col): _*))).head
      println(f"[run $r] $name ${(System.nanoTime() - t0) / 1e9}%.2f s wall, " +
        f"${cpuSec - c0}%.1f cpu-s, gc ${(gcMs - g0) / 1000.0}%.1f s, " +
        f"jobs ${jobCount.get() - j0}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
