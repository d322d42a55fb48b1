package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.model.Catalog

/** File export / import — the reference's `COPY TABLE TO/FROM`,
  * `COPY (query) TO` and `COPY DATABASE` statements over the four
  * external file formats (operator/src/statement.rs:269-307,
  * common/datasource/src/file_format/{csv,json,parquet,orc}.rs,
  * SURVEY.md §2.1).
  *
  * JSON is newline-delimited (NDJSON), matching the reference's json
  * file format. Reads accept an explicit schema (the reference infers
  * or takes the target table's); without one, Spark infers. All paths
  * are directories of part files — the natural distributed layout; a
  * single-file export at 100 TB would serialize through one writer.
  */
object Copy {

  final case class Options(
      format: String = "parquet",
      header: Boolean = true,
      delimiter: String = ",",
      compression: Option[String] = None,
      /** glob for COPY FROM, e.g. `*.csv` (copy_table_from.rs pattern) */
      pattern: Option[String] = None)

  private val Formats = Set("parquet", "csv", "json", "orc")

  private def check(fmt: String): String = {
    val f = fmt.toLowerCase
    require(Formats(f), s"unsupported COPY format: $fmt")
    f
  }

  /** COPY <table> TO 'path' WITH (format ...). */
  def tableTo(df: DataFrame, path: String, opts: Options = Options()): Unit = {
    val fmt = check(opts.format)
    var w = df.write.mode("overwrite").format(fmt)
    if (fmt == "csv")
      w = w.option("header", opts.header.toString).option("sep", opts.delimiter)
    opts.compression.foreach(c => w = w.option("compression", c))
    w.save(path)
  }

  /** COPY (query) TO 'path' — same writer over any frame. */
  def queryTo(df: DataFrame, path: String, opts: Options = Options()): Unit =
    tableTo(df, path, opts)

  /** COPY <table> FROM 'path' WITH (format, pattern ...). */
  def tableFrom(spark: SparkSession, path: String, opts: Options = Options(),
      schema: Option[StructType] = None): DataFrame = {
    val fmt = check(opts.format)
    var r = spark.read.format(fmt)
    if (fmt == "csv")
      r = r.option("header", opts.header.toString).option("sep", opts.delimiter)
    if (fmt == "csv" || fmt == "json")
      schema match {
        case Some(sc) => r = r.schema(sc)
        case None     => r = r.option("inferSchema", "true")
      }
    else schema.foreach(sc => r = r.schema(sc))
    opts.pattern.foreach(p => r = r.option("pathGlobFilter", p))
    r.load(path)
  }

  /** COPY DATABASE TO: one subdirectory per registered table. */
  def databaseTo(catalog: Catalog, dir: String, opts: Options = Options()): Unit =
    catalog.tables.foreach(t => tableTo(catalog.read(t), s"$dir/$t", opts))

  /** COPY DATABASE FROM: read every subdirectory back as a table name →
    * frame map (insertion into a target catalog is the caller's call). */
  def databaseFrom(spark: SparkSession, dir: String,
      opts: Options = Options()): Map[String, DataFrame] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isDirectory)
      .map(s => s.getPath.getName -> tableFrom(spark, s.getPath.toString, opts))
      .toMap
  }
}
