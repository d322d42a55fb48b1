package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("pngFor emits real decodable PNGs with the declared dims") {
    for (cls <- 0 until Multimodal.imageClasses) {
      val d = Multimodal.decodeImage(Multimodal.pngFor(cls))
      assert(d.width == 48 + cls * 8)
      assert(d.height == 32 + cls * 8)
      assert(d.channels == 3)
    }
  }

  test("the 8 pattern classes average-hash distinctly; identical class hashes identically") {
    val hashes = (0 until Multimodal.imageClasses)
      .map(c => Multimodal.decodeImage(Multimodal.pngFor(c)).ahash)
    assert(hashes.distinct.size == Multimodal.imageClasses)
    // decode is deterministic: same bytes → same hash
    val again = (0 until Multimodal.imageClasses)
      .map(c => Multimodal.decodeImage(Multimodal.pngFor(c)).ahash)
    assert(hashes == again)
  }

  test("decodeImage handles null and garbage payloads") {
    assert(Multimodal.decodeImage(null) == null)
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3)) == null)
    // a TRUNCATED stream with a valid PNG signature makes ImageIO.read
    // throw (not return null) — must null the row, not fail the task
    val truncated = Multimodal.pngFor(0).take(40)
    assert(Multimodal.decodeImage(truncated) == null)
  }

  test("wavFor emits real decodable WAV with the declared rate/duration") {
    for (cls <- 0 until Multimodal.imageClasses) {
      val a = Multimodal.decodeAudio(Multimodal.wavFor(cls))
      assert(a.sample_rate == 16000)
      assert(a.channels == 1)
      assert(a.duration_ms == 200 + 50 * cls)
      // a 12000-amplitude sine's RMS is 12000/sqrt(2) ~ 8485
      assert(a.rms > 8400 && a.rms < 8600, s"rms=${a.rms}")
    }
    assert(Multimodal.decodeAudio(null) == null)
    assert(Multimodal.decodeAudio(Array[Byte](9, 9, 9)) == null)
  }

  test("phashCanonical groups by perceptual hash end-to-end") {
    val events = spark.range(0, 40).select(col("id").as("event_id"))
    val assets = Multimodal.imageAssets(spark, events)
    val out = Multimodal.phashCanonical(Multimodal.decodeImages(assets))
      .select($"media_id", $"canonical_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // canonical = min id of the same class (id % 8)
    for (id <- 0L until 40L) assert(out(id) == id % 8)
  }
}
