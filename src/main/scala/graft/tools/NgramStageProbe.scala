package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.operators.Dedup

/** Stage count + shuffle bytes of ngramJaccardPairs at sf0.1, small path
  * vs forced scale path — the A/B behind the bench's 1.9→2.7 s drift
  * (round-5 verdict #6). */
object NgramStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val shuffle = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shuffle.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    def run(label: String, boundary: Long): Unit = {
      spark.conf.set(Dedup.VerifyBroadcastMinDocsKey, boundary.toString)
      try {
        Dedup.ngramJaccardPairs(docs, "text", "doc_id").count() // warm
        Thread.sleep(500)
        stages.set(0); shuffle.set(0)
        val walls = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          Dedup.ngramJaccardPairs(docs, "text", "doc_id").count()
          (System.nanoTime() - t0) / 1e9
        }
        Thread.sleep(500)
        println(f"[ngram-stage] $label%-12s wall_min=${walls.min}%5.2f s " +
          f"stages/run=${stages.get / 3} shuffleMB/run=${shuffle.get / 3e6}%7.1f " +
          f"passes=${walls.map(w => f"$w%.2f").mkString(",")}")
      } finally spark.conf.unset(Dedup.VerifyBroadcastMinDocsKey)
    }
    run("small-path", Long.MaxValue)
    run("scale-path", 0L)
    spark.stop()
  }
}
