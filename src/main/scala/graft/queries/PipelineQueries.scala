package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.pipeline.Processors._
import QueryDsl._

/** Log-pipeline ETL coverage (SURVEY.md §2.1, reference
  * pipeline/src/etl). Raw log lines are synthesized from the events
  * table, pushed through a processor chain, and the re-extracted fields
  * are hash-compared against DuckDB recomputing them from the original
  * columns — a full parse round-trip proof. */
object PipelineQueries {

  val queries: Map[String, Q] = Map(
    // dissect + epoch + letter round-trip
    "pipeline_etl" -> ((s, d) => {
      val raw = T(s, d, "events").select(concat(
        col("user_id"), lit(" - ["), expr("ts div 1000000"), lit("] \""),
        upper(col("event_type")), lit(" /api/"), col("event_type"), lit("\" "),
        col("value").cast(DecimalType(18, 4))).as("line"))
      val pipe = Pipeline(Seq(
        Dissect("line", "%{user} - [%{ts}] \"%{method} %{path}\" %{val}"),
        Epoch("ts", "ms"),
        Letter("method", "lower")))
      pipe.run(raw)
        .select(col("user").cast("long").as("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("method"), col("path"),
          col("val").cast("double").as("value"))
        .orderBy(col("user_id"), col("ts_ms"), col("value"))
    }),

    // digest preset templating over synthesized lines
    "pipeline_digest" -> ((s, d) => {
      val raw = T(s, d, "events").select(concat(
        lit("user "), col("user_id"), lit(" did \""), col("event_type"),
        lit("\" at "), expr("ts div 1000000")).as("line"))
      Digest("line", Seq("quoted", "numbers"))(raw)
        .groupBy(col("line_digest")).agg(count(lit(1)).as("n"))
        .orderBy(col("line_digest"))
    }),

    // json_path with result_index + simple_extract dotted-key walk over a
    // synthesized nested document (processor.rs json_path/simple_extract)
    "pipeline_extract" -> ((s, d) => {
      val raw = T(s, d, "events").select(col("event_id"), col("event_type"), concat(
        lit("""{"a":{"b":"""), col("value").cast("decimal(18,4)"),
        lit(""","arr":["""), col("user_id"), lit(","), col("event_id"),
        lit("]}}")).as("doc"))
      val pipe = Pipeline(Seq(
        SimpleExtract("doc", "a.b", "b_val"),
        JsonPath("doc", "$.a.arr", "second", resultIndex = Some(1)),
        SimpleExtract("doc", "a.missing.deep", "gone")))
      pipe.run(raw)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("b_val").cast("decimal(28,4)")).cast("double").as("sum_b"),
          sum(col("second").cast("long")).as("sum_second"),
          count(col("gone")).as("n_gone"))
        .orderBy(col("event_type"))
    }),

    // json_path extraction from the props column
    "pipeline_json" -> ((s, d) => {
      val pipe = Pipeline(Seq(
        JsonPath("props", "k", "k"),
        Filter("event_type", Seq("purchase"))))
      pipe.run(T(s, d, "events"))
        .select(col("event_id"), col("event_type"), col("k").cast("long").as("k"))
        .orderBy(col("event_id"))
    }),

    // vrl processor (vrl_processor.rs): one-to-many expansion through the
    // MiniVrl interpreter — each event becomes a 2-element nested JSON
    // document, the program dels the parents, upcases a field, computes a
    // derived value, and fans the array out into rows. Integer payloads so
    // the JSON round-trip is bit-exact against the SQL oracle.
    "pipeline_vrl" -> ((s, d) => {
      val raw = T(s, d, "events").select(to_json(struct(
        col("event_id").as("id"),
        col("event_type").as("etype"),
        array(
          struct(lit("lo").as("k"), (col("event_id") % 1000).as("v")),
          struct(lit("hi").as("k"), ((col("event_id") % 1000) * 2).as("v"))
        ).as("tags"))).as("j"))
      val src = """
          |tags = del(.tags)
          |id = del(.id)
          |etype = del(.etype)
          |map_values(array!(tags)) -> |t| {
          |    {
          |        "id": id,
          |        "etype": upcase(string!(etype)),
          |        "k": t.k,
          |        "v": t.v,
          |        "v3": t.v * 3 + 1
          |    }
          |}
          |""".stripMargin
      Pipeline(Seq(Vrl("j", src))).run(raw)
        .select(
          get_json_object(col("j"), "$.id").cast("long").as("id"),
          get_json_object(col("j"), "$.etype").as("etype"),
          get_json_object(col("j"), "$.k").as("k"),
          get_json_object(col("j"), "$.v").cast("long").as("v"),
          get_json_object(col("j"), "$.v3").cast("long").as("v3"))
        .orderBy(col("id"), col("k"))
    }),

    // dispatcher (dispatcher.rs): value-match routing — the 'purchase'
    // route runs its own sub-pipeline (extracting props.k), everything
    // else stays in the main pipeline; both legs union for the oracle
    "pipeline_dispatch" -> ((s, d) => {
      val df = T(s, d, "events")
      val disp = Dispatcher("event_type", Seq(
        DispatchRule("purchase", "_purchases",
          Some(Pipeline(Seq(JsonPath("props", "k", "k")))))))
      val routed = disp.route(df).head._2
        .select(col("event_id"), lit("_purchases").as("route"),
          col("k").cast("long").as("k"))
      val rest = disp.remainder(df)
        .select(col("event_id"), lit("").as("route"),
          lit(null).cast("long").as("k"))
      routed.unionByName(rest).orderBy(col("event_id"))
    }),

    // table_suffix (tablesuffix.rs): per-row MiniVrl expression names the
    // write shard from the JSON payload
    "pipeline_table_suffix" -> ((s, d) => {
      val raw = T(s, d, "events").select(col("event_id"),
        to_json(struct(col("event_type").as("etype"))).as("j"))
      Pipeline(Seq(TableSuffix("j", """ "_" + downcase(string!(.etype)) """)))
        .run(raw)
        .select(col("event_id"), col("__table_suffix").as("suffix"))
        .orderBy(col("event_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "pipeline_etl" ->
      """SELECT user_id, epoch_ns(ts) // 1000000 AS ts_ms,
           lower(event_type) AS method, '/api/' || event_type AS path,
           CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS value
         FROM events ORDER BY user_id, ts_ms, value""",

    "pipeline_digest" ->
      """SELECT 'user  did  at ' AS line_digest, COUNT(*) AS n FROM events""",

    "pipeline_extract" ->
      """SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) AS DECIMAL(28,4))) AS DOUBLE) AS sum_b,
           CAST(SUM(event_id) AS BIGINT) AS sum_second,
           CAST(0 AS BIGINT) AS n_gone
         FROM events GROUP BY 1 ORDER BY 1""",

    "pipeline_json" ->
      """SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events WHERE lower(event_type) <> 'purchase' ORDER BY event_id""",

    "pipeline_vrl" ->
      """SELECT id, etype, k, v, v * 3 + 1 AS v3 FROM (
           SELECT event_id AS id, upper(event_type) AS etype,
                  'lo' AS k, event_id % 1000 AS v FROM events
           UNION ALL
           SELECT event_id, upper(event_type), 'hi', (event_id % 1000) * 2
           FROM events)
         ORDER BY id, k""",

    "pipeline_dispatch" ->
      """SELECT event_id,
           CASE WHEN event_type = 'purchase' THEN '_purchases' ELSE '' END AS route,
           CASE WHEN event_type = 'purchase'
                THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
         FROM events ORDER BY event_id""",

    "pipeline_table_suffix" ->
      """SELECT event_id, '_' || lower(event_type) AS suffix
         FROM events ORDER BY event_id"""
  )
}
