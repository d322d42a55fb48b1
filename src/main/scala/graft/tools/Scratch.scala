package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev scratch probe — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("SELECT * FROM VALUES ('b',1),('a',1),('c',2),(NULL,1) AS t(x,g)").createOrReplaceTempView("t")
    def tryq(q: String): Unit =
      try println(q + " => " + spark.sql(q).collect().mkString(";"))
      catch { case e: Throwable => println(q + " !! " + String.valueOf(e.getMessage).take(150)) }
    tryq("SELECT string_agg(x, '|') WITHIN GROUP (ORDER BY x DESC) FROM t")
    tryq("SELECT listagg(DISTINCT x, '|') WITHIN GROUP (ORDER BY x) FROM t")
    tryq("SELECT g, string_agg(x, '') WITHIN GROUP (ORDER BY x) FROM t GROUP BY g ORDER BY g")
    tryq("SELECT * EXCEPT (g) FROM t")
    tryq("SELECT transform(array_sort(collect_list(struct((x IS NULL) AS n, x AS k, x AS v))), s -> s.v) FROM t")
    spark.stop()
  }
}
