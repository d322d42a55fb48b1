package graft.tools

import org.apache.spark.sql.SparkSession

/** Growth check for the composed streaming curation pipeline: run the
  * `flow_stream_curation` entry (five micro-batches of the full
  * documents table through quality filter + keyed dedup + windowed
  * agg) at 1x and 10x documents and report wall + sink mass. The state
  * story is structural — dedup state = keys within the watermark
  * horizon, agg state = open windows x sources, both linear in the
  * per-batch key count and bounded by eviction — this probe pins that
  * the end-to-end wall follows the data, not some per-batch
  * quadratic. */
object FlowCurationScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_inc10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries("flow_stream_curation")
    for (dir <- dirs if new java.io.File(s"$dir/documents.parquet").exists()) {
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      val t0 = System.nanoTime()
      val out = q(spark, dir).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val kept = out.map(_.getLong(2)).sum
      println(f"[flow-curation-scale] dir=$dir%-24s docs=$nDocs%-7d " +
        f"wall=$wall%7.2f s sinkRows=${out.length}%-4d keptDocRows=$kept%-7d")
    }
    spark.stop()
  }
}
