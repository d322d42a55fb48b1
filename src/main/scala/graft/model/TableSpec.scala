package graft.model

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Column roles of the time-series data model.
  *
  * The reference attaches a `SemanticType` to every column
  * (store-api/src/metadata.rs:55): Tag columns form the primary key,
  * exactly one Timestamp column is the TIME INDEX, everything else is a
  * Field. We carry the same convention in Spark as `StructField`
  * metadata under the key [[SemanticType.Key]].
  */
object SemanticType extends Enumeration {
  val Tag, Timestamp, Field = Value
  val Key = "graft.semantic_type"

  def of(f: StructField): SemanticType.Value =
    if (f.metadata.contains(Key)) withName(f.metadata.getString(Key)) else Field

  def tagged(f: StructField, st: SemanticType.Value): StructField =
    f.copy(metadata = new MetadataBuilder()
      .withMetadata(f.metadata).putString(Key, st.toString).build())
}

/** Row-merge semantics on duplicate (primary key, time index) keys.
  * Mirrors mito2/src/region/options.rs:68-73 (`MergeMode`) plus the
  * `append_mode` table option (store-api/src/mito_engine_options.rs:21).
  */
sealed trait MergeMode
object MergeMode {
  /** Default upsert: the last written row wins wholesale. */
  case object LastRow extends MergeMode
  /** Per-field merge: the last non-null value of each field wins
    * (mito2/src/read/dedup.rs:301-425). */
  case object LastNonNull extends MergeMode
  /** append_mode=true — no dedup (log tables). */
  case object Append extends MergeMode

  def parse(s: String): MergeMode = s.toLowerCase match {
    case "last_row"      => LastRow
    case "last_non_null" => LastNonNull
    case "append"        => Append
    case other => throw new IllegalArgumentException(s"unknown merge mode: $other")
  }
}

/** Logical description of a graft table: where the Parquet lives, which
  * columns are tags / time index, and the storage semantics attached to
  * the logical row key (SURVEY.md §1.1).
  *
  * @param ttlMillis 0 = instant (rows hidden from scans at write); a
  *   positive ttl expires rows at flush/compaction time
  *                  (table/src/requests.rs:164,202-210)
  * @param seqColumn optional ingestion-sequence column used to order
  *                  duplicate keys; when absent, dedup falls back to a
  *                  deterministic-but-arbitrary "any row wins" choice,
  *                  which is what a single Parquet snapshot gives us.
  * @param compactedSeq when set, rows with seq <= this bound are already
  *                  merge-MATERIALIZED on disk (at most one row per
  *                  merge key — a compaction rewrote them), so the read
  *                  view only needs to merge keys the post-compaction
  *                  delta touches. Resolved from the on-disk compaction
  *                  manifest by [[graft.model.Catalog.read]], not set by
  *                  hand (mito compaction analog: merged SST output,
  *                  mito2/src/compaction.rs).
  */
final case class TableSpec(
    name: String,
    path: String,
    timeIndex: String,
    tags: Seq[String] = Nil,
    mergeMode: MergeMode = MergeMode.Append,
    ttlMillis: Option[Long] = None,
    seqColumn: Option[String] = None,
    compactedSeq: Option[Long] = None) {

  def primaryKey: Seq[String] = tags :+ timeIndex

  /** Annotate a Parquet schema with the semantic-type metadata. */
  def annotate(schema: StructType): StructType = StructType(schema.map { f =>
    val st =
      if (f.name == timeIndex) SemanticType.Timestamp
      else if (tags.contains(f.name)) SemanticType.Tag
      else SemanticType.Field
    SemanticType.tagged(f, st)
  })
}
