package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.operators.Dedup

/** Growth audit for the dedup family (VERDICT r4 #8): runs the MinHash
  * LSH and exact n-gram Jaccard pipelines against a documents dir and
  * reports wall, output pair count, and total shuffle-write bytes.
  * Compare two corpus sizes: output-bounded pipelines grow ~linearly
  * in pairs and shuffle; a super-linear candidate stage shows up as
  * shuffle growing much faster than the corpus. */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val shuffleRows = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        shuffleRows.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
    })
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val n = docs.count()
    def run(label: String)(f: => Long): Unit = {
      shuffleBytes.set(0L)
      shuffleRows.set(0L)
      val t0 = System.nanoTime()
      val pairs = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[dedup-scale] $label%-16s docs=$n%-8d pairs=$pairs%-9d wall=$wall%7.2f s shuffleMB=${shuffleBytes.get / 1e6}%9.1f shuffleMrows=${shuffleRows.get / 1e6}%8.2f")
    }
    run("minhash_lsh") {
      Dedup.minhashPairs(docs, "text", "doc_id").count()
    }
    run("ngram_jaccard") {
      Dedup.ngramJaccardPairs(docs, "text", "doc_id").count()
    }
    spark.stop()
  }
}
