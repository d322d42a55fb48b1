package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .filter(col("event_id") < 3000)
    val assets = Multimodal.mixedAssets(spark, ev)
    val keyed = Multimodal.contentKeys(assets)
    keyed.explain("formatted")
    // time WITHOUT the trailing checkpoint to isolate
    var t0 = System.nanoTime()
    println("PROBE rows=" + keyed.count())
    println(f"PROBE keyed count wall ${(System.nanoTime()-t0)/1e9}%.3f s")
    t0 = System.nanoTime()
    println("PROBE gen-only rows=" + assets.select(length(col("content")).as("len")).agg(sum("len")).head())
    println(f"PROBE gen-only wall ${(System.nanoTime()-t0)/1e9}%.3f s")
    spark.stop()
  }
}
