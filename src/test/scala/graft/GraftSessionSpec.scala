package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.GraftSession

class GraftSessionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val g = new GraftSession(spark)

  test("create table / insert / select with merge semantics") {
    g.sql("""CREATE TABLE host_cpu (
        ts TIMESTAMP(3) TIME INDEX,
        host STRING PRIMARY KEY,
        val DOUBLE
      )""")
    g.sql("INSERT INTO host_cpu VALUES (TIMESTAMP'2024-01-01 00:00:00', 'h1', 1.0)")
    g.sql("INSERT INTO host_cpu VALUES (TIMESTAMP'2024-01-01 00:00:00', 'h1', 9.0)")
    g.sql("INSERT INTO host_cpu VALUES (TIMESTAMP'2024-01-01 00:00:10', 'h2', 2.0)")
    // default merge = last_row upsert on (host, ts)
    val rows = g.sql("SELECT host, val FROM host_cpu ORDER BY host").collect()
    assert(rows.length == 2)
    assert(rows.map(r => r.getString(0) -> r.getDouble(1)).toSet ==
      Set("h1" -> 9.0, "h2" -> 2.0))
  }

  test("show tables / describe table semantic roles") {
    assert(g.sql("SHOW TABLES").collect().map(_.getString(0)).contains("host_cpu"))
    // reference six-column shape: Column|Type|Key|Null|Default|Semantic Type
    val d = g.sql("DESC TABLE host_cpu").collect()
      .map(r => r.getString(0) -> r.getString(5)).toMap
    assert(d("ts") == "TIMESTAMP" && d("host") == "TAG" && d("val") == "FIELD")
  }

  test("append_mode table keeps duplicates") {
    g.sql("""CREATE TABLE logs (ts TIMESTAMP TIME INDEX, msg STRING)
             WITH (append_mode = 'true')""")
    g.sql("INSERT INTO logs VALUES (TIMESTAMP'2024-01-01 00:00:00', 'dup')")
    g.sql("INSERT INTO logs VALUES (TIMESTAMP'2024-01-01 00:00:00', 'dup')")
    assert(g.sql("SELECT * FROM logs").count() == 2)
  }

  test("@@ operator rewrites to matches_term") {
    assert(g.rewriteAtAt("SELECT * FROM logs WHERE msg @@ 'dup'") ==
      "SELECT * FROM logs WHERE matches_term(msg, 'dup')")
    val n = g.sql("SELECT * FROM logs WHERE msg @@ 'dup'").count()
    assert(n == 2)
  }

  test("create flow + admin flush_flow refresh the sink") {
    g.sql("""CREATE TABLE cpu (ts TIMESTAMP TIME INDEX, host STRING PRIMARY KEY, v DOUBLE)""")
    g.sql("""CREATE FLOW cpu_sum SINK TO cpu_sum_sink EXPIRE AFTER '1h'
             AS SELECT host, count(*) AS n, sum(v) AS total FROM cpu GROUP BY host""")
    // the sink is auto-created empty; only rows written AFTER flow
    // creation become visible, and only on flush (reference semantics)
    assert(g.sql("SELECT * FROM cpu_sum_sink").count() == 0)
    g.sql("INSERT INTO cpu VALUES (TIMESTAMP'2024-01-01 00:00:01', 'h1', 1.0)")
    g.sql("INSERT INTO cpu VALUES (TIMESTAMP'2024-01-01 00:00:02', 'h1', 4.0)")
    g.sql("ADMIN flush_flow('cpu_sum')")
    val rows = g.sql("SELECT host, n, total FROM cpu_sum_sink").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Double]("total") == 5.0)
  }

  test("TQL EVAL over a registered metric table") {
    g.sql("""CREATE TABLE metric1 (ts TIMESTAMP TIME INDEX, host STRING PRIMARY KEY, v DOUBLE)""")
    g.sql("INSERT INTO metric1 VALUES (TIMESTAMP'1970-01-01 00:00:05', 'a', 3.0)")
    g.sql("INSERT INTO metric1 VALUES (TIMESTAMP'1970-01-01 00:00:15', 'a', 7.0)")
    val out = g.sql("TQL EVAL (0, 20, '5s') metric1").collect()
    // instant vector: lookback picks the latest sample at each step;
    // selector shape follows the declared column order (ts, host, v)
    assert(out.nonEmpty)
    // java8API sessions return java.time.Instant for LTZ timestamps
    val atT20 = out.filter(_.getAs[java.time.Instant](0).toEpochMilli == 20000L)
    assert(atT20.length == 1 && atT20(0).getDouble(2) == 7.0)
  }

  test("create view / drop view") {
    g.sql("CREATE VIEW big_logs AS SELECT msg FROM logs WHERE msg @@ 'dup'")
    assert(g.sql("SELECT count(*) AS n FROM big_logs").head().getLong(0) == 2L)
    g.sql("DROP VIEW big_logs")
  }

  test("alter table add/drop column without rewriting data") {
    g.sql("""CREATE TABLE alt (ts TIMESTAMP TIME INDEX, host STRING PRIMARY KEY, v DOUBLE)""")
    g.sql("INSERT INTO alt VALUES (TIMESTAMP'2024-01-01 00:00:00', 'h1', 1.0)")
    g.sql("ALTER TABLE alt ADD COLUMN note STRING")
    // old rows surface the new column as null
    assert(g.sql("SELECT note FROM alt").head().isNullAt(0))
    g.sql("INSERT INTO alt (ts, host, v, note) VALUES (TIMESTAMP'2024-01-01 00:00:01', 'h2', 2.0, 'x')")
    assert(g.sql("SELECT note FROM alt WHERE host = 'h2'").head().getString(0) == "x")
    g.sql("ALTER TABLE alt DROP COLUMN v")
    assert(!g.sql("SELECT * FROM alt").columns.contains("v"))
    val d = g.sql("DESC TABLE alt").collect().map(_.getString(0)).toSet
    assert(d == Set("ts", "host", "note"))
  }

  test("RANGE SQL: the reference's calculate.sql shape") {
    g.sql("""CREATE TABLE rhost (ts TIMESTAMP(3) TIME INDEX, host STRING PRIMARY KEY, val BIGINT)""")
    g.sql("""INSERT INTO rhost VALUES
      (TIMESTAMP'1970-01-01 00:00:00', 'host1', 0),
      (TIMESTAMP'1970-01-01 00:00:05', 'host1', null),
      (TIMESTAMP'1970-01-01 00:00:10', 'host1', 1),
      (TIMESTAMP'1970-01-01 00:00:15', 'host1', null),
      (TIMESTAMP'1970-01-01 00:00:20', 'host1', 2),
      (TIMESTAMP'1970-01-01 00:00:00', 'host2', 3),
      (TIMESTAMP'1970-01-01 00:00:05', 'host2', null),
      (TIMESTAMP'1970-01-01 00:00:10', 'host2', 4),
      (TIMESTAMP'1970-01-01 00:00:15', 'host2', null),
      (TIMESTAMP'1970-01-01 00:00:20', 'host2', 5)""")
    // reference range/calculate.sql: 2 * min(val) RANGE '5s' ALIGN '5s';
    // without FILL only populated slots appear; null vals stay null
    val got = g.sql(
      "SELECT unix_millis(ts) AS t, host, 2 * min(val) RANGE '5s' AS v FROM rhost ALIGN '5s' ORDER BY host, t")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, "host1", 0L), (5000L, "host1", null), (10000L, "host1", 2L),
      (15000L, "host1", null), (20000L, "host1", 4L),
      (0L, "host2", 6L), (5000L, "host2", null), (10000L, "host2", 8L),
      (15000L, "host2", null), (20000L, "host2", 10L)))
  }

  test("RANGE SQL: FILL variants and scalar nesting") {
    val prev = g.sql(
      "SELECT unix_millis(ts) AS t, host, min(val) RANGE '5s' FILL PREV AS v FROM rhost ALIGN '5s' ORDER BY host, t")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2)))
    assert(prev.filter(_._2 == "host1").map(_._3).toSeq == Seq(0L, 0L, 1L, 1L, 2L))
    // integral FILL consts keep the column type (reference Int64 semantics)
    val const = g.sql(
      "SELECT unix_millis(ts) AS t, host, min(val) RANGE '5s' FILL 6 AS v FROM rhost ALIGN '5s' ORDER BY host, t")
      .collect().map(r => r.getLong(2))
    assert(const.contains(6L))
    // scalar nesting outside the annotation + WHERE + query-level FILL
    val nested = g.sql(
      """SELECT unix_millis(ts) AS t, host, floor(min(val) RANGE '5s') + 1 AS v
         FROM rhost WHERE host = 'host2' ALIGN '5s' FILL PREV ORDER BY t""")
      .collect().map(r => r.getLong(2))
    assert(nested.toSeq == Seq(4L, 4L, 5L, 5L, 6L))
  }

  test("information_schema tables and columns") {
    val tables = g.sql(
      "SELECT table_name, table_type FROM information_schema.tables ORDER BY table_name")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tables.contains("host_cpu") && tables("host_cpu") == "BASE TABLE")
    val cols = g.sql(
      """SELECT column_name, semantic_type FROM information_schema.columns
         WHERE table_name = 'host_cpu' ORDER BY column_name""")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cols == Map("ts" -> "TIMESTAMP", "host" -> "TAG", "val" -> "FIELD"))
  }

  test("TQL EXPLAIN returns a physical plan") {
    val plan = g.sql("TQL EXPLAIN (0, 20, '5s') metric1")
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.contains("Physical Plan"))
  }

  test("INSERT INTO TABLE syntax (reference dialect)") {
    g.sql("INSERT INTO TABLE logs VALUES (TIMESTAMP'2024-01-01 00:00:01', 'via-table-kw')")
    assert(g.sql("SELECT * FROM logs WHERE msg = 'via-table-kw'").count() == 1)
  }

  test("admin stub returns the sqlness golden single-cell shape") {
    val r = g.sql("ADMIN compact_table('cpu')").collect()
    assert(r(0).getString(0) == "0")
  }

  test("cursors: DECLARE / successive FETCH / CLOSE") {
    g.sql("""CREATE TABLE cur_t (ts TIMESTAMP TIME INDEX, v DOUBLE)""")
    g.sql("INSERT INTO cur_t VALUES (1000, 1.0), (2000, 2.0), (3000, 3.0), (4000, 4.0), (5000, 5.0)")
    g.sql("DECLARE c1 CURSOR FOR SELECT v FROM cur_t ORDER BY ts")
    // successive fetches DRAIN the stream (cursor.rs take() semantics)
    assert(g.sql("FETCH 2 FROM c1").collect().map(_.getDouble(0)).toSeq == Seq(1.0, 2.0))
    assert(g.sql("FETCH 2 FROM c1").collect().map(_.getDouble(0)).toSeq == Seq(3.0, 4.0))
    // past the end: remaining rows only, then empty
    assert(g.sql("FETCH 9 IN c1").collect().map(_.getDouble(0)).toSeq == Seq(5.0))
    assert(g.sql("FETCH 9 FROM c1").collect().isEmpty)
    g.sql("CLOSE c1")
    assertThrows[IllegalArgumentException](g.sql("FETCH 1 FROM c1"))
    // non-SELECT body rejected (cursor_parser.rs ensure!)
    assertThrows[IllegalArgumentException](
      g.sql("DECLARE c2 CURSOR FOR INSERT INTO cur_t VALUES (6000, 6.0)"))
    g.sql("DROP TABLE cur_t")
  }
}
