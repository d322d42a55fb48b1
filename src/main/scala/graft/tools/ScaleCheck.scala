package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale validation: synthesize a ~10x events table (1M+ rows, derived
  * deterministically from sf0.1 — NOT written into /root/testdata), link the
  * other tables, and leave a directory Bench can point at. Each source row
  * fans out 10 ways with jittered ts/user/value so per-key cardinalities and
  * time-spread scale together.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_scale"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val outDir = new java.io.File(out)
    if (outDir.exists()) {
      outDir.listFiles().foreach { f =>
        if (f.isDirectory) org.apache.commons.io.FileUtils.deleteDirectory(f)
        else f.delete()
      }
    }
    outDir.mkdirs()

    val ev = spark.read.parquet(s"$src/events.parquet")
    val n = ev.count()
    val fan = ev.crossJoin(spark.range(10).toDF("rep"))
      .select(
        (col("event_id") * 10 + col("rep")).as("event_id"),
        // spread replicas across the span: shift by rep * 97 seconds so
        // windows/timeseries densities scale ~10x without colliding
        (col("ts") + col("rep") * lit(97L) * lit(1000000000L)).as("ts"),
        (col("user_id") + col("rep") * 1000L).as("user_id"),
        col("event_type"),
        round(col("value") * (lit(1.0) + col("rep").cast("double") / 100.0), 4).as("value"),
        col("props"))
    fan.repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")
    val n2 = spark.read.parquet(s"$out/events.parquet").count()
    println(s"[scale] events: $n -> $n2 rows at $out/events.parquet")

    // link the remaining tables unchanged
    for (f <- new java.io.File(src).listFiles() if f.getName.endsWith(".parquet")
         if f.getName != "events.parquet") {
      val link = java.nio.file.Paths.get(out, f.getName)
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.createSymbolicLink(link, f.toPath.toAbsolutePath)
    }
    println(s"[scale] ready: SPARK_GRAFT_SF_DIR=$out")
    spark.stop()
  }
}
