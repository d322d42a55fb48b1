package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator registry; each key is one line of
  * the SURVEY §2 inventory. `oracleSql` carries the DuckDB-equivalent
  * SQL for the hash-compare correctness gate. The key sets are
  * SYMMETRIC: every entry — including the sketch / MinHash / PromQL
  * ones — has a full DuckDB oracle (deterministic replays of the
  * algorithm in SQL where no direct equivalent exists); none fall back
  * to the weaker rows-only check. EntryCoverageSpec pins the symmetry.
  */
object SparkEntry {

  private val registries: Seq[(Map[String, QueryDsl.Q], Map[String, String])] = Seq(
    (Relational.queries, Relational.oracles),
    (RelationalExtra.queries, RelationalExtra.oracles),
    (RangeQueries.queries, RangeQueries.oracles),
    (FunctionQueries.queries, FunctionQueries.oracles),
    (SketchQueries.queries, SketchQueries.oracles),
    (PromQLQueries.queries, PromQLQueries.oracles),
    (LlmQueries.queries, LlmQueries.oracles),
    (CurationQueries.queries, CurationQueries.oracles),
    (FlowQueries.queries, FlowQueries.oracles),
    (PipelineQueries.queries, PipelineQueries.oracles),
    (LogQueryQueries.queries, LogQueryQueries.oracles),
    (SourceQueries.queries, SourceQueries.oracles),
    (MergeQueries.queries, MergeQueries.oracles),
    (SqlQueries.queries, SqlQueries.oracles),
    (IngestQueries.queries, IngestQueries.oracles),
    (TraceQueries.queries, TraceQueries.oracles),
    (TsbsQueries.queries, TsbsQueries.oracles)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_groupby")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.iterator.map(_._2).reduce(_ ++ _)
}
