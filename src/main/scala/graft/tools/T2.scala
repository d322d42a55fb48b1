package graft.tools
import org.apache.spark.sql.SparkSession
object T2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = new graft.sql.GraftSession(spark)
    g.sql("create table metric (ts timestamp(3) time index, val double)")
    g.sql("create table labels (ts timestamp(3) time index, host string primary key, cpu double)")
    g.sql("insert into metric values (0,0),(10000,8),(20000,8),(30000,2),(40000,3)")
    g.sql("insert into labels values ('1970-01-01 00:00:00','host1',0.1),('1970-01-01 00:00:10','host1',0.8)," +
      "('1970-01-01 00:00:20','host1',0.8),('1970-01-01 00:00:30','host1',0.2),('1970-01-01 00:00:40','host1',0.3)," +
      "('1970-01-01 00:00:00','host2',0.2),('1970-01-01 00:00:10','host2',0.9),('1970-01-01 00:00:20','host2',0.7)," +
      "('1970-01-01 00:00:30','host2',0.4),('1970-01-01 00:00:40','host2',0.5)")
    for (q <- Seq(
      "TQL EVAL (0, 40, '10s') metric",
      "TQL EVAL (0, 40, '10s') labels{host=\"host1\"}",
      "TQL EVAL (0, 40, '10s', '15s') metric",
      "TQL EVAL (0, 40, '10s') avg_over_time(labels[30s]) AS cpu",
      "WITH tql as ( TQL EVAL (0, 40, '10s') metric ) SELECT * FROM tql",
      "WITH tql (the_timestamp, the_value) as ( TQL EVAL (0, 40, '10s') metric ) SELECT * FROM tql",
      "WITH tql_agg(ts, summary) AS ( TQL EVAL (0, 40, '10s') sum(labels{host=~\"host.*\"}) ) SELECT round(avg(summary)) as avg_sum FROM tql_agg",
      "WITH host_metrics AS ( TQL EVAL (0, 40, '10s') labels{host=\"host1\"} ) SELECT host_metrics.ts, host_metrics.host FROM host_metrics",
      "WITH computed(ts, val) AS ( TQL EVAL (0, 40, '10s') metric * 2 + 1 ) SELECT min(val) as min_computed, max(val) as max_computed FROM computed",
      "WITH time_shifted AS ( TQL EVAL (0, 40, '10s') metric offset 50s ) SELECT * FROM time_shifted",
      "WITH tql_lookback AS ( TQL EVAL (0, 40, '10s', '15s') metric ) SELECT count(*) FROM tql_lookback",
      "SELECT 'cat!' @@ 'cat' as result",
      "SELECT '' @@ '' as result",
      "SELECT 'any' @@ '' as result",
      "SELECT lower('WARNING x') @@ 'warning' as m",
      "SHOW CHARACTER SET",
      "SHOW CHARSET LIKE 'latin1'",
      "SHOW COLLATION WHERE Charset = 'utf8'",
      "SHOW COLLATION LIKE 'utf8'")) {
      val r = scala.util.Try(g.sql(q))
      println("[t2] " + q.take(70) + " -> " +
        r.map(df => df.columns.mkString(",") + " :: " +
          df.collect().map(_.toSeq.mkString("|")).mkString(" / ").take(150))
          .recover { case e => "ERR " + String.valueOf(e.getMessage).take(150) }.get)
    }
    g.sql("CREATE TABLE test_table(\"COL\"\"UMN\" VARCHAR, \"NA\"\"ME\" VARCHAR, ts TIMESTAMP TIME INDEX)")
    g.sql("INSERT INTO test_table VALUES ('ALL', 'test', 1000)")
    for (q <- Seq(
      "SELECT \"COL\"\"UMN\" FROM test_table",
      "SELECT test_table.\"COL\"\"UMN\", test_table.\"NA\"\"ME\" FROM test_table")) {
      val r = scala.util.Try(g.sql(q))
      println("[t2] " + q.take(70) + " -> " +
        r.map(df => df.columns.mkString(",") + " :: " +
          df.collect().map(_.toSeq.mkString("|")).mkString(" / "))
          .recover { case e => "ERR " + String.valueOf(e.getMessage).take(150) }.get)
    }
    g.sql("create table t (ts timestamp time index, id int, name string)")
    g.sql("insert into t values (1000, 1, 'a'), (2000, 2, 'a'), (3000, 1, 'b')")
    println("[t2] count_hash -> " + scala.util.Try(
      g.sql("select count_hash (`id`) from t").collect().map(_.toSeq.mkString("|")).mkString("/"))
      .recover { case e => "ERR " + String.valueOf(e.getMessage).take(150) }.get)
    spark.stop()
  }
}
