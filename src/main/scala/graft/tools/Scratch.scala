package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Dev scratchpad (contents change per investigation; not part of any
  * gate). Currently: stage-wise wall/cpu decomposition of the
  * multimodal_neardup_pipeline regression (r11 item 1). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def cpuSec: Double = {
      val t = scala.io.Source.fromFile("/proc/self/stat").mkString.split(" ")
      (t(13).toDouble + t(14).toDouble) / 100.0
    }
    def time[T](tag: String)(f: => T): T = {
      val c0 = cpuSec; val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s wall ${cpuSec - c0}%7.1f cpu-s")
      r
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      val ev = graft.Tables.load(spark, dir, "events")
        .filter(col("event_id") < 3000)
      val assets = Multimodal.nearDupImageAssets(spark, ev)
      time("assets.count")(assets.count())
      val keyed = time("contentKeys+truncate")(
        graft.operators.Lineage.truncate(Multimodal.contentKeys(assets)))
      val reps = keyed.groupBy(col("modality"), col("key"))
        .agg(min(col("media_id")).as("rep"))
      time("reps.count")(reps.count())
      val starPairs = keyed.join(reps, Seq("modality", "key"))
        .filter(col("media_id") =!= col("rep"))
        .select(col("rep").as("id_a"), col("media_id").as("id_b"))
      time("starPairs.count")(starPairs.count())
      val hamPairs = Multimodal.ahashNearDupPairs(
          reps.filter(col("modality") === "image"), "rep", "key",
          maxDistance = 3)
        .select(col("id_a"), col("id_b"))
      time("hamPairs.count")(hamPairs.count())
      val comps = time("connectedComponents")(
        graft.operators.Dedup.connectedComponents(
          starPairs.unionByName(hamPairs), "id_a", "id_b")
          .withColumnRenamed("id", "media_id"))
      val out = keyed.join(comps, Seq("media_id"), "left")
        .select(col("media_id"),
          coalesce(col("comp"), col("media_id")).as("canonical_id"))
        .withColumn("keep", col("canonical_id") === col("media_id"))
      time("final checksum")(
        out.select(bit_xor(xxhash64(out.columns.map(col): _*))).head)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
