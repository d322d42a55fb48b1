package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Protocols

class ProtocolsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("influx line protocol: tags, typed fields, escapes, timestamps") {
    val lines = Seq(
      """cpu,host=web\ 01,region=us usage=0.64,count=3i,ok=t,note="a, b" 1465839830100400200""",
      """mem,host=db used=55.5""", // no timestamp -> default
      """# comment""",
      """garbage"""
    ).toDF("line")
    val out = Protocols.fromInfluxLines(lines, "line", defaultTsNs = 42L)
      .orderBy($"measurement").collect()
    assert(out.length == 2)
    val cpu = out(0)
    assert(cpu.getString(0) == "cpu")
    assert(cpu.getMap[String, String](1) == Map("host" -> "web 01", "region" -> "us"))
    assert(cpu.getMap[String, Double](2) == Map("usage" -> 0.64, "count" -> 3.0))
    assert(cpu.getMap[String, String](3) == Map("note" -> "a, b"))
    assert(cpu.getMap[String, Boolean](4) == Map("ok" -> true))
    assert(cpu.getLong(5) == 1465839830100400200L)
    assert(out(1).getLong(5) == 42L)
  }

  test("opentsdb put lines") {
    val lines = Seq(
      "put sys.cpu.user 1356998400 42.5 host=web01 cpu=0",
      "put sys.cpu.user 1356998400500 43.0 host=web02",
      "not a put line"
    ).toDF("line")
    val out = Protocols.fromOpenTsdbLines(lines, "line").orderBy($"ts_ns").collect()
    assert(out.length == 2)
    assert(out(0).getLong(5) == 1356998400000000000L) // seconds heuristic
    assert(out(1).getLong(5) == 1356998400500000000L) // ms heuristic
    assert(out(0).getMap[String, String](1) == Map("host" -> "web01", "cpu" -> "0"))
  }

  test("pivot to wide measurement table") {
    val lines = Seq(
      "cpu,host=a usage=1.0,sys=0.5 100",
      "cpu,host=b usage=2.0 200",
      "mem,host=a used=9.0 100"
    ).toDF("line")
    val samples = Protocols.fromInfluxLines(lines, "line")
    val wide = Protocols.pivotMeasurement(samples, "cpu").orderBy($"ts")
    assert(wide.columns.toSeq == Seq("host", "sys", "usage", "ts"))
    val rows = wide.collect()
    assert(rows(0).getString(0) == "a" && rows(0).getDouble(2) == 1.0)
    assert(rows(1).getString(0) == "b" && rows(1).isNullAt(1)) // missing field -> null
  }
}
