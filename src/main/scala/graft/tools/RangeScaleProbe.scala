package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.operators.{RangeFolds, RangeSelect}
import graft.operators.RangeSelect.RangeAgg

/** Measures the two RANGE formulations of a collect-buffering aggregate
  * (exact percentile) at a large range/align ratio: `p50/p90 RANGE '1h'
  * ALIGN '15s'` is a 240× slot fan-out — the explode path serializes
  * every input row into 240 aggregation buffers; the FoldAgg path
  * shuffles each row ≤2× and evaluates the percentile inside the
  * per-series sweep. The round-5 verdict's acceptance criterion is
  * ≥10× shuffle-bytes reduction at ratio 240.
  *
  * args: [sfDir] [alignMs] [rangeMs] [byCol] [eventsScale]
  */
object RangeScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val alignMs = if (args.length > 1) args(1).toLong else 15000L
    val rangeMs = if (args.length > 2) args(2).toLong else 3600000L
    val byCol = if (args.length > 3) args(3) else "event_type"
    val scale = if (args.length > 4) args(4).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    var ev = graft.Tables.load(spark, src, "events")
      .select(col(byCol).cast("string").as("series"),
        (col("ts") / 1000000L).cast("long").as("ms"),
        col("value").cast("double").as("v"))
    if (scale > 1)
      // time-shifted copies: same series count, scale× the samples
      ev = ev.crossJoin(
          spark.range(scale).select(col("id").as("__rep")))
        .withColumn("ms", col("ms") + col("__rep") * 7L) // jitter, same span
        .drop("__rep")
    ev = ev.repartition(32).persist()
    val n0 = ev.count()

    def run(label: String, fold: Boolean): Unit = {
      def q() =
        if (fold)
          RangeSelect(ev, "ms", Seq("series"), alignMs, rangeMs, Nil,
            foldAggs = Seq(
              RangeSelect.FoldAgg("p50", "v", RangeFolds.percentileCont(0.5)),
              RangeSelect.FoldAgg("p90", "v", RangeFolds.percentileCont(0.9))))
        else
          RangeSelect(ev, "ms", Seq("series"), alignMs, rangeMs, Seq(
            RangeAgg("p50", ctx => percentile(ctx.value("v"), lit(0.5))),
            RangeAgg("p90", ctx => percentile(ctx.value("v"), lit(0.9)))))
      q().count() // warmup (JIT, scan caches)
      Thread.sleep(500)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val n = q().count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener events drain async
      println(f"[range-scale] $label%-12s rows=$n%-9d wall=$wall%7.2f s " +
        f"shuffleMB=${shuffleBytes.get / 1e6}%9.1f")
    }

    println(s"[range-scale] events=$n0 (scale=$scale) by=$byCol " +
      s"align=${alignMs}ms range=${rangeMs}ms ratio=${rangeMs / alignMs}")
    run("explode", fold = false)
    run("fold", fold = true)
    spark.stop()
  }
}
