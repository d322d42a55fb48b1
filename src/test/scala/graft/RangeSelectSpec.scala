package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeSelect
import graft.operators.RangeSelect.{Fill, RangeAgg}

/** Golden tests replicating the reference's sqlness fixtures
  * tests/cases/standalone/common/range/{calculate,fill}.result —
  * the host table (ts ms, host tag, val bigint with null gaps). */
class RangeSelectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import scala.jdk.CollectionConverters._
  private def host(): DataFrame = {
    val rows = Seq[(Long, String, java.lang.Long)](
      (0L, "host1", 0L), (5000L, "host1", null), (10000L, "host1", 1L),
      (15000L, "host1", null), (20000L, "host1", 2L),
      (0L, "host2", 3L), (5000L, "host2", null), (10000L, "host2", 4L),
      (15000L, "host2", null), (20000L, "host2", 5L))
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava,
      org.apache.spark.sql.types.StructType.fromDDL("ts BIGINT, host STRING, val BIGINT"))
  }

  /** host with missing slots (fill.result second fixture) */
  private def hostGaps(): DataFrame = {
    val rows = Seq[(Long, String, java.lang.Long)](
      (0L, "host1", 0L), (1000L, "host1", 1L), (2000L, "host1", 2L),
      (15000L, "host1", 6L), (16000L, "host1", 7L), (17000L, "host1", 8L),
      (0L, "host2", 6L), (1000L, "host2", 7L), (2000L, "host2", 8L),
      (15000L, "host2", 12L), (16000L, "host2", 13L), (17000L, "host2", 14L))
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava,
      org.apache.spark.sql.types.StructType.fromDDL("ts BIGINT, host STRING, val BIGINT"))
  }

  private def collect(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy(col("host"), col("ts")).collect().toSeq.map(_.toSeq)

  test("min RANGE 5s ALIGN 5s (no fill) — sparse slots") {
    val out = RangeSelect(host(), "ts", Seq("host"), 5000, 5000,
      Seq(RangeAgg("m", ctx => min(ctx.value("val")))))
    assert(collect(out) == Seq(
      Seq(0L, "host1", 0L), Seq(5000L, "host1", null), Seq(10000L, "host1", 1L),
      Seq(15000L, "host1", null), Seq(20000L, "host1", 2L),
      Seq(0L, "host2", 3L), Seq(5000L, "host2", null), Seq(10000L, "host2", 4L),
      Seq(15000L, "host2", null), Seq(20000L, "host2", 5L)))
  }

  test("2*min RANGE 5s — scalar around aggregate") {
    val out = RangeSelect(host(), "ts", Seq("host"), 5000, 5000,
      Seq(RangeAgg("m", ctx => min(ctx.value("val")) * 2)))
    val got = collect(out).map(_.last)
    assert(got == Seq(0L, null, 2L, null, 4L, 6L, null, 8L, null, 10L))
  }

  test("RANGE 20s ALIGN 10s — overlapping windows incl. pre-epoch slot") {
    // covar fixture: slots -10s..20s; window [t, t+20s)
    val out = RangeSelect(host(), "ts", Seq("host"), 10000, 20000,
      Seq(RangeAgg("n", ctx => count(ctx.value("val")))))
    assert(collect(out).filter(_(1) == "host1") == Seq(
      Seq(-10000L, "host1", 1L), Seq(0L, "host1", 2L),
      Seq(10000L, "host1", 2L), Seq(20000L, "host1", 1L)))
  }

  test("FILL PREV") {
    val out = RangeSelect(host(), "ts", Seq("host"), 5000, 5000,
      Seq(RangeAgg("m", ctx => min(ctx.value("val")), Fill.Prev)))
    val got = collect(out).map(_.last)
    assert(got == Seq(0L, 0L, 1L, 1L, 2L, 3L, 3L, 4L, 4L, 5L))
  }

  test("FILL LINEAR — interpolation to double") {
    val out = RangeSelect(host(), "ts", Seq("host"), 5000, 5000,
      Seq(RangeAgg("m", ctx => min(ctx.value("val")), Fill.Linear)))
    val got = collect(out).map(_.last)
    assert(got == Seq(0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 3.5, 4.0, 4.5, 5.0))
  }

  test("FILL CONST 6") {
    val out = RangeSelect(host(), "ts", Seq("host"), 5000, 5000,
      Seq(RangeAgg("m", ctx => min(ctx.value("val")), Fill.Const(6L))))
    val got = collect(out).map(_.last)
    assert(got == Seq(0L, 6L, 1L, 6L, 2L, 3L, 6L, 4L, 6L, 5L))
  }

  test("FILL densifies missing slots; PREV and LINEAR across gaps") {
    val base = hostGaps()
    val sparse = RangeSelect(base, "ts", Seq("host"), 5000, 5000,
      Seq(RangeAgg("m", ctx => min(ctx.value("val")))))
    assert(collect(sparse).map(_.last) == Seq(0L, 6L, 6L, 12L))

    val prev = RangeSelect(base, "ts", Seq("host"), 5000, 5000,
      Seq(RangeAgg("m", ctx => min(ctx.value("val")), Fill.Prev)))
    assert(collect(prev).map(_.last) == Seq(0L, 0L, 0L, 6L, 6L, 6L, 6L, 12L))

    val lin = RangeSelect(base, "ts", Seq("host"), 5000, 5000,
      Seq(RangeAgg("m", ctx => min(ctx.value("val")), Fill.Linear)))
    assert(collect(lin).map(_.last) == Seq(0.0, 2.0, 4.0, 6.0, 6.0, 8.0, 10.0, 12.0))
  }

  test("multiple fills share densified grid; unfilled column keeps sparse nulls") {
    val out = RangeSelect(hostGaps(), "ts", Seq("host"), 5000, 5000, Seq(
      RangeAgg("raw", ctx => min(ctx.value("val"))),
      RangeAgg("c6", ctx => min(ctx.value("val")), Fill.Const(6L))))
    val h1 = collect(out).filter(_(1) == "host1")
    assert(h1.map(_(2)) == Seq(0L, null, null, 6L))
    assert(h1.map(_(3)) == Seq(0L, 6L, 6L, 6L))
  }

  test("per-expression RANGE durations") {
    val out = RangeSelect(host(), "ts", Seq("host"), 5000, 5000, Seq(
      RangeAgg("m5", ctx => min(ctx.value("val"))),
      RangeAgg("m10", ctx => min(ctx.value("val")), Fill.None, Some(10000L))))
    val h1 = collect(out).filter(_(1) == "host1")
    // slot grid is the union over expressions: m10's [-5s,5s) window
    // adds slot -5s where m5 (window [-5s,0)) is null
    assert(h1.map(_.head) == Seq(-5000L, 0L, 5000L, 10000L, 15000L, 20000L))
    assert(h1.map(_(3)) == Seq(0L, 0L, 1L, 1L, 2L, 2L))
    assert(h1.map(_(2)) == Seq(null, 0L, null, 1L, null, 2L))
  }

  test("range smaller than align drops between-slot rows") {
    val out = RangeSelect(host(), "ts", Seq("host"), 10000, 5000,
      Seq(RangeAgg("n", ctx => count(ctx.value("val")))))
    // windows [0,5s),[10s,15s),[20s,25s): rows at 5s/15s fall in no slot
    assert(collect(out).filter(_(1) == "host1") == Seq(
      Seq(0L, "host1", 1L), Seq(10000L, "host1", 1L), Seq(20000L, "host1", 1L)))
  }

  test("ALIGN TO shifts the grid origin") {
    val out = RangeSelect(host(), "ts", Seq("host"), 5000, 5000,
      Seq(RangeAgg("n", ctx => count(ctx.present))), alignToMs = 1000L)
    // slots ...,-4s,1s,6s,...: row@0 -> slot -4s, row@5s -> slot 1s ...
    assert(collect(out).filter(_(1) == "host1").map(_.head) ==
      Seq(-4000L, 1000L, 6000L, 11000L, 16000L))
  }
}
