package graft.tools
import org.apache.spark.sql.SparkSession
object T3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = new graft.sql.GraftSession(spark)
    g.sql("""CREATE TABLE scheduled_late_overlap_input (
  ts TIMESTAMP(3) TIME INDEX,
  series STRING,
  reading DOUBLE,
  PRIMARY KEY(series)
)""")
    try {
      g.sql("""CREATE FLOW scheduled_late_overlap_flow
SINK TO scheduled_late_overlap_sink
EVAL INTERVAL '1s'
AS
WITH
target_offsets(delta) AS (
  VALUES
    (INTERVAL '1 second'),
    (INTERVAL '2 seconds')
),
target_seconds AS (
  SELECT date_trunc('second', now()) - delta AS target_ts
  FROM target_offsets
),
bucketed AS (
  SELECT
    series,
    date_bin(INTERVAL '1 second', ts) AS bucket_ts,
    last_value(reading ORDER BY ts) AS reading
  FROM scheduled_late_overlap_input
  WHERE ts >= date_trunc('second', now()) - INTERVAL '20 seconds'
    AND ts <  date_trunc('second', now())
  GROUP BY series, date_bin(INTERVAL '1 second', ts)
)
SELECT
  target_seconds.target_ts AS ts,
  bucketed.series,
  bucketed.reading,
  now() AS create_time
FROM target_seconds
JOIN bucketed
  ON bucketed.bucket_ts = target_seconds.target_ts""")
      println("[t3] create flow OK")
    } catch { case e: Throwable =>
      println("[t3] FAIL " + e.getClass.getName + ": " + e.getMessage)
      e.printStackTrace()
    }
    spark.stop()
  }
}
