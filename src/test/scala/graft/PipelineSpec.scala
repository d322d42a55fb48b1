package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Processors._

class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("dissect: basic fields + literals") {
    val df = Seq("1.2.3.4 - - [10/Oct/2000] \"GET /a.png\" 200").toDF("line")
    val out = Dissect("line", "%{ip} - - [%{ts}] \"%{method} %{path}\" %{status}")(df)
      .select("ip", "ts", "method", "path", "status").head()
    assert(out.toSeq == Seq("1.2.3.4", "10/Oct/2000", "GET", "/a.png", "200"))
  }

  test("dissect: append, skip and padding modifiers") {
    val df = Seq("john jacob   smith").toDF("line")
    val out = Dissect("line", "%{+name} %{?skip->} %{+name}", appendSeparator = "_")(df)
      .select("name").head().getString(0)
    assert(out == "john_smith")
    val nomatch = Dissect("line", "%{a}=%{b}")(df).select("a").head()
    assert(nomatch.isNullAt(0))
  }

  test("date + epoch parse") {
    val df = Seq(("2024-01-02 03:04:05", "1704164645000")).toDF("d", "e")
    val out = Pipeline(Seq(
      DateParse("d", Seq("yyyy-MM-dd HH:mm:ss")),
      Epoch("e", "ms"))).run(df)
      .select(unix_millis($"d"), unix_millis($"e")).head()
    assert(out.getLong(0) == 1704164645000L)
    assert(out.getLong(1) == 1704164645000L)
  }

  test("gsub, letter, join, decolorize") {
    val df = Seq((
      "a-b-c",
      "hello world",
      Seq("x", "y", "z"),
      "[31mred[0m plain"
    )).toDF("g", "l", "j", "c")
    val out = Pipeline(Seq(
      Gsub("g", "-", "."),
      Letter("l", "capital"),
      JoinArr("j", "/"),
      Decolorize("c"))).run(df).head()
    assert(out.getString(0) == "a.b.c")
    assert(out.getString(1) == "Hello World")
    assert(out.getString(2) == "x/y/z")
    assert(out.getString(3) == "red plain")
  }

  test("regex named groups, digest presets") {
    val df = Seq("user=alice id=42 from 10.0.0.1 said \"hi there\"").toDF("m")
    val out = Pipeline(Seq(
      RegexExtract("m", "user=(?<user>\\w+) id=(?<id>\\d+)"),
      Digest("m", Seq("ip", "quoted", "numbers")))).run(df).head()
    assert(out.getAs[String]("m_user") == "alice")
    assert(out.getAs[String]("m_id") == "42")
    assert(out.getAs[String]("m_digest") == "user=alice id= from  said ")
  }

  test("csv quote-aware parse") {
    val df = Seq("a,\"b,with,commas\",c").toDF("line")
    val out = CsvParse("line", Seq("f1", "f2", "f3"))(df)
      .select("f1", "f2", "f3").head()
    assert(out.toSeq == Seq("a", "b,with,commas", "c"))
  }

  test("json parse + path, cmcd, urlencoding") {
    val df = Seq((
      """{"a": "1", "b": "x"}""",
      """br=3200,bs,ot=v,sid="abc-123"""",
      "a%20b%2Fc"
    )).toDF("j", "cm", "u")
    val out = Pipeline(Seq(
      JsonPath("j", "b", "j_b"),
      JsonParse("j"),
      Cmcd("cm", Seq("br", "bs", "sid")),
      UrlEncoding("u", "decode"))).run(df).head()
    assert(out.getAs[String]("j_b") == "x")
    assert(out.getAs[Map[String, String]]("j")("a") == "1")
    assert(out.getAs[String]("cm_br") == "3200")
    assert(out.getAs[String]("cm_bs") == "true")
    assert(out.getAs[String]("cm_sid") == "abc-123")
    assert(out.getAs[String]("u") == "a b/c")
  }

  test("select + filter") {
    val df = Seq(("a", "keep", 1), ("b", "DEBUG", 2), ("c", "info", 3))
      .toDF("x", "level", "n")
    val out = Pipeline(Seq(
      Filter("level", Seq("debug")),
      Select(Seq("x", "level")))).run(df)
    assert(out.columns.toSeq == Seq("x", "level"))
    assert(out.collect().map(_.getString(0)).toSet == Set("a", "c"))
  }
}
