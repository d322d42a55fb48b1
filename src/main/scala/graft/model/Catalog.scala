package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table registry + read-view builder.
  *
  * A graft table is an append-only Parquet directory; upsert / merge
  * semantics are applied as a *view* at read time (SURVEY.md §1.1):
  *
  *  - last_row:      `row_number() over (partition by pk order by seq desc) = 1`
  *  - last_non_null: per-field `first(value, ignoreNulls)` over the same key
  *  - append:        raw read
  *  - ttl:           `time_index >= now() - ttl` filter injected at scan
  *
  * At 100 TB the dedup window shuffles on (tags, ts) once; downstream
  * per-series operators (RANGE, PromQL) reuse that clustering. A
  * compaction job can materialize the deduped snapshot so steady-state
  * reads skip the window entirely (SURVEY §7.3(c)).
  */
final class Catalog(spark: SparkSession) {
  private val specs = scala.collection.concurrent.TrieMap.empty[String, TableSpec]

  def register(spec: TableSpec): Unit = specs.put(spec.name, spec)
  def deregister(name: String): Option[TableSpec] = specs.remove(name)
  def spec(name: String): TableSpec = specs(name)
  def tables: Seq[String] = specs.keys.toSeq.sorted

  /** Raw append-stream read (no merge semantics). mergeSchema unions
    * file footers so ALTER TABLE ADD COLUMN is a metadata-only change
    * (older files surface the new column as null). */
  def raw(name: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(spec(name).path)

  /** The merged read view: what SQL queries against this table see. */
  def read(name: String): DataFrame = Catalog.readView(raw(name), spec(name))

  /** Register the read view as a temp view so spark.sql can use it. */
  def createView(name: String): Unit = read(name).createOrReplaceTempView(name)

  /** Per-series scan (reference mito2 series_scan.rs): co-locate each
    * series on one partition, time-ordered within it — the input shape
    * the RANGE / PromQL / lastpoint operators want. One shuffle on the
    * tags; the sort is partition-local, never global. */
  def seriesScan(name: String): DataFrame = {
    val s = spec(name)
    Catalog.partSort(read(name), s.tags, s.timeIndex)
  }
}

object Catalog {
  private val SeqCol = "__graft_seq"

  /** PartSortExec equivalent (reference query/src/part_sort.rs): sort
    * inside existing partitions without a global shuffle-sort. With
    * `keys` empty the frame keeps its current partitioning; otherwise
    * hash-partition by the keys first (series co-location). */
  def partSort(df: DataFrame, keys: Seq[String], orderBy: String): DataFrame = {
    val partitioned =
      if (keys.isEmpty) df else df.repartition(keys.map(k => col(s"`$k`")): _*)
    partitioned.sortWithinPartitions((keys :+ orderBy).map(k => col(s"`$k`")): _*)
  }

  def readView(df: DataFrame, spec: TableSpec): DataFrame = {
    // ttl='instant' drops rows at write (scans never see them); a
    // duration ttl expires rows only when flush/compaction materializes
    // it (ttl/ttl_instant.result vs flow/flow_advance_ttl.result: rows
    // older than the ttl stay visible until ADMIN flush/compact)
    val ttlFiltered = spec.ttlMillis match {
      case Some(0L) => df.filter(lit(false))
      case _ => df
    }
    spec.mergeMode match {
      case MergeMode.Append      => ttlFiltered
      case MergeMode.LastRow     => dedupLastRow(ttlFiltered, spec)
      case MergeMode.LastNonNull => dedupLastNonNull(ttlFiltered, spec)
    }
  }

  /** Materialize the write-order column ONCE so every window in the
    * dedup pipeline sees identical ordering (monotonically_increasing_id
    * is deterministic per evaluation but not across re-evaluations after
    * a shuffle). */
  private def withSeq(df: DataFrame, spec: TableSpec): DataFrame =
    spec.seqColumn.filter(df.columns.contains) match {
      case Some(c) => df.withColumn(SeqCol, col(c).cast("long"))
      case None    => df.withColumn(SeqCol, monotonically_increasing_id())
    }

  /** Default upsert: duplicate (pk, ts) keys keep the last-written row
    * (mito2 MergeMode::LastRow). */
  def dedupLastRow(df: DataFrame, spec: TableSpec): DataFrame =
    dropSeq(keepNewest(withSeq(df, spec), spec))

  /** merge_mode=last_non_null: for each field independently, the last
    * non-null write wins (mito2/src/read/dedup.rs:301-425). */
  def dedupLastNonNull(df: DataFrame, spec: TableSpec): DataFrame = {
    val seqd = withSeq(df, spec)
    val pk = mergeKey(seqd, spec).toSet
    val fields = seqd.columns
      .filterNot(c => pk.contains(c) || c == SeqCol || spec.seqColumn.contains(c))
    // Ordered newest-first; frame [current, +inf) reaches back to older
    // writes, so first(ignoreNulls) == newest non-null value <= this row.
    val w = Window.partitionBy(mergeKey(seqd, spec).map(c => col(s"`$c`")): _*)
      .orderBy(col(SeqCol).desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val merged = fields.foldLeft(seqd) { (d, f) =>
      d.withColumn(f, first(col(s"`$f`"), ignoreNulls = true).over(w))
    }
    dropSeq(keepNewest(merged, spec))
  }

  /** Merge key: the primary key plus, when the table stores one, the
    * time index's hidden sub-µs remainder — nanosecond-distinct rows
    * are distinct keys even though they share a µs timestamp. */
  private def mergeKey(df: DataFrame, spec: TableSpec): Seq[String] =
    spec.primaryKey ++
      Some(s"__nsr_${spec.timeIndex}").filter(df.columns.contains)

  private def keepNewest(df: DataFrame, spec: TableSpec): DataFrame = {
    val w = Window.partitionBy(mergeKey(df, spec).map(c => col(s"`$c`")): _*)
      .orderBy(col(SeqCol).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  private def dropSeq(df: DataFrame): DataFrame = df.drop(SeqCol)
}
