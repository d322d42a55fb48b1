package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.ingest.LogIngest

class LogIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("logingest-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("loki push: labels, ts, line, structured metadata; bad items dropped") {
    import spark.implicits._
    val payload =
      """{"streams":[
        |{"stream":{"service":"api","env":"prod"},
        | "values":[["1700000000000000000","hello",{"trace":"t1"}],
        |           ["not-a-ts","dropped"],
        |           ["1700000000000000001","plain"]]},
        |{"stream":{},"values":[["2","empty-labels"]]}
        |]}""".stripMargin
    val rows = LogIngest.fromLokiPush(Seq(payload, "{garbage", """{"streams":{}}""").toDF("body"), "body")
      .collect().map(r => (r.getAs[Map[String, String]]("labels"), r.getAs[Long]("ts_ns"),
        r.getAs[String]("line"), r.getAs[String]("structured_metadata")))
    assert(rows.length === 3)
    assert(rows(0) === (Map("service" -> "api", "env" -> "prod"), 1700000000000000000L, "hello", """{"trace":"t1"}"""))
    assert(rows(1) === (Map("service" -> "api", "env" -> "prod"), 1700000000000000001L, "plain", null))
    assert(rows(2)._1 === Map.empty[String, String])
  }

  test("es bulk: create/index commands, url index fallback, msg_field") {
    import spark.implicits._
    val payload =
      """{"create":{"_index":"t1"}}
        |{"a":1}
        |{"index":{"_index":"t2","_id":"9"}}
        |{"b":2}
        |{"create":{}}
        |{"c":3}
        |{"delete":{"_index":"t1"}}
        |{"ignored":true}""".stripMargin
    val rows = LogIngest.fromEsBulk(Seq(payload).toDF("body"), "body",
      indexFromUrl = Some("urltab")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(("t1", """{"a":1}"""), ("t2", """{"b":2}"""), ("urltab", """{"c":3}""")))

    val msg = """{"create":{"_index":"m"}}
                |{"message":"{\"k\":5}","other":1}
                |{"create":{"_index":"m"}}
                |{"message":"plain text"}""".stripMargin
    val narrowed = LogIngest.fromEsBulk(Seq(msg).toDF("body"), "body",
      msgField = Some("message")).collect().map(_.getString(1))
    assert(narrowed.toSeq === Seq("""{"k":5}""", """{"message":"plain text"}"""))
  }
}
