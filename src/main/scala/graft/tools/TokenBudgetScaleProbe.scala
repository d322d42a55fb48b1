package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Growth audit for Sampling.tokenBudget: the adversarial mixture shape
  * — ONE stratum holding the entire corpus (5M docs) — which the old
  * Window.partitionBy(stratum) formulation funneled through a single
  * task. The two-phase prefix sum must keep every non-trivial stage at
  * full parallelism: expected max-rows-in-one-task ≈ n/partitions, no
  * Window stage, wall flat-linear in docs. */
object TokenBudgetScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shuffle = new java.util.concurrent.atomic.AtomicLong(0)
    // max records seen by any single task of any stage: the serialization
    // smoking gun — the window formulation put all n rows in one task
    val maxTaskRows = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val rows = math.max(m.inputMetrics.recordsRead,
            m.shuffleReadMetrics.recordsRead)
          maxTaskRows.getAndUpdate(x => math.max(x, rows))
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffle.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    for (n <- Seq(500000L, 5000000L)) {
      val docs = spark.range(n).select(col("id"),
        lit(0L).as("src"), (col("id") % 97 + 3).as("toks")).persist()
      docs.count()
      shuffle.set(0); maxTaskRows.set(0)
      val t0 = System.nanoTime()
      val out = graft.operators.Sampling.tokenBudget(
        docs, col("src"), col("id"), col("toks"), budgetPerStratum = n * 13)
      val kept = out.filter(col("kept")).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[tokbudget-scale] docs=$n%8d kept=$kept%8d wall=$wall%6.1f s " +
        f"shuffleMB=${shuffle.get / 1e6}%7.1f maxTaskRows=${maxTaskRows.get}%9d " +
        f"(fair=${n / 32}%d)")
      docs.unpersist()
    }
    spark.stop()
  }
}
