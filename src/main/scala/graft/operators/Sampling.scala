package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation at 100 TB:
  * every mode keys off an md5-derived rank of a stable row id, so a
  * sample is (a) reproducible run-to-run, (b) replicable in any engine
  * with md5 (the DuckDB oracle replays the identical arithmetic), and
  * (c) embarrassingly parallel — a narrow filter or a per-stratum
  * window, never a global shuffle of the full corpus.
  *
  * Modes:
  *  - proportional: keep rows whose hash-rank < fraction (one scan,
  *    no shuffle; the classic "sample p% of the corpus")
  *  - stratified fractions: per-stratum fraction (e.g. upsample rare
  *    languages, downsample boilerplate-heavy domains)
  *  - stratified quota: exactly n rows per stratum by hash-rank order
  *    (one keyed shuffle bounded by the strata, standard window top-n)
  */
object Sampling {

  /** 60-bit integer rank from the md5 hex prefix of the id — same
    * convention as Dedup.hash60 (DuckDB:
    * `('0x'||substr(md5(CAST(id AS VARCHAR)),1,15))::BIGINT`). */
  def hashRank(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** rank scaled to [0,1): rank / 2^60 (exact in double). */
  def unitRank(id: Column): Column =
    hashRank(id).cast("double") / lit(1152921504606846976.0)

  def proportional(df: DataFrame, id: Column, fraction: Double): DataFrame =
    df.where(unitRank(id) < fraction)

  /** Per-stratum fraction; strata absent from the map keep `default`. */
  def stratifiedFractions(df: DataFrame, stratum: Column, id: Column,
                          fractions: Map[String, Double],
                          default: Double): DataFrame = {
    val threshold = fractions.foldLeft(lit(default)) { case (acc, (k, f)) =>
      when(stratum === k, lit(f)).otherwise(acc)
    }
    df.where(unitRank(id) < threshold)
  }

  /** Exactly min(n, |stratum|) rows per stratum, picked by hash-rank
    * order (id tiebreak). One shuffle on the strata columns. */
  def stratifiedQuota(df: DataFrame, strata: Seq[String], id: Column,
                      n: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashRank(id), id)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") <= n)
      .drop("__rn")
  }

  /** Token-budget mixture sampling: the "fill each source's share of
    * the training mix" draw. Documents are ordered per stratum by
    * hash-rank (a deterministic uniform permutation) and admitted while
    * the running token total before them is under the stratum's budget
    * — so the document that crosses the budget line is kept and every
    * stratum reaches its target. Adds a boolean `kept` column.
    *
    * Scale shape: a `Window.partitionBy(stratum)` cumulative sum would
    * serialize each stratum through ONE task — a 100 TB mixture has ~10
    * strata and ~10⁹ docs, i.e. ten serial windows. Instead this is a
    * two-phase distributed prefix sum: (1) range-repartition on
    * (stratum, rank, id) so the admission order is (partition, row)
    * order, with every partition carrying its fair slice of even a
    * single-stratum input; (2) per-partition per-stratum token
    * subtotals — partitions × strata rows — collect as model state and
    * prefix-scan on the driver; (3) a partition-local pass computes
    * each row's running total seeded by its (partition, stratum)
    * offset. No stage sees a stratum-sized partition. The repartitioned
    * input is persisted so both passes observe the same range bounds,
    * and the result is materialized (Lineage.truncate) before the cache
    * is released. */
  def tokenBudget(df: DataFrame, stratum: Column, id: Column,
                  tokens: Column, budgetPerStratum: Long): DataFrame =
    runningBefore(df, stratum, id, tokens, "__before")
      .withColumn("kept", col("__before") < budgetPerStratum)
      .drop("__before")

  /** Pack documents into fixed-size context windows — the
    * concat-and-chunk training-prep step (GPT-2/Pile style: documents
    * are concatenated in a deterministic order and the token stream is
    * split every `contextLen`; a document may straddle a boundary).
    * Per stratum (one stream per source/shard), in hash-rank order:
    *   window_id = tokens-before div contextLen  (the window holding
    *               the document's first token)
    *   offset    = tokens-before mod contextLen
    *   n_windows = windows the document touches (≥ 1; 1 unless it
    *               crosses a boundary).
    * Same two-phase prefix sum as [[tokenBudget]] — no stratum-sized
    * window stage anywhere. */
  def packWindows(df: DataFrame, stratum: Column, id: Column,
                  tokens: Column, contextLen: Long): DataFrame = {
    require(contextLen > 0)
    runningBefore(df, stratum, id, tokens, "__before")
      .withColumn("window_id", expr(s"__before div $contextLen"))
      .withColumn("offset", col("__before") % contextLen)
      .withColumn("__last", col("__before") +
        greatest(tokens.cast("long"), lit(1L)) - 1)
      .withColumn("n_windows",
        expr(s"__last div $contextLen") - col("window_id") + 1)
      .drop("__before", "__last")
  }

  /** Two-phase distributed prefix sum: appends `outCol` = the sum of
    * `value` over every row ordered BEFORE this one within its stratum
    * (order = (hashRank(id), id), the deterministic uniform
    * permutation all Sampling ops share).
    *
    * Scale shape — the reason this is not a window function: a
    * `Window.partitionBy(stratum)` cumulative sum serializes each
    * stratum through ONE task (~10 strata over ~1e9 docs at 100 TB).
    * Instead: (1) range-repartition on (stratum, rank, id) so the
    * admission order is (partition, row) order, with every partition
    * carrying its fair slice of even a single-stratum input; (2)
    * per-(partition, stratum) subtotals — partitions × strata rows —
    * collect as model state and prefix-scan on the driver; (3) a
    * partition-local pass seeds each row's running total from its
    * (partition, stratum) offset. No stage sees a stratum-sized
    * partition. The repartitioned input is persisted so both passes
    * observe the same range bounds, and the result is materialized
    * (Lineage.truncate) before the cache is released. */
  def runningBefore(df: DataFrame, stratum: Column, id: Column,
                    value: Column, outCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val parts = df
      .withColumn("__st", stratum)
      .withColumn("__rk", hashRank(id))
      .withColumn("__tid", id)
      .withColumn("__val", value.cast("long"))
      .repartitionByRange(col("__st"), col("__rk"), col("__tid"))
      .sortWithinPartitions(col("__st"), col("__rk"), col("__tid"))
      .persist()
    try {
      // phase 1: per-(partition, stratum) subtotals — model-state-sized
      // (spark_partition_id() is computed on the cache scan, before the
      // aggregation exchange, so it names the persisted partitions)
      val subtotals = parts
        .groupBy(spark_partition_id().as("__p"), col("__st"))
        .agg(coalesce(sum(col("__val")), lit(0L)).as("__t"))
        .collect()
      val offsets: Map[(Int, Any), Long] = subtotals
        .groupBy(_.get(1)).iterator.flatMap { case (st, rows) =>
          var acc = 0L
          rows.sortBy(_.getInt(0)).map { r =>
            val entry = ((r.getInt(0), st), acc); acc += r.getLong(2); entry
          }
        }.toMap
      val bc = spark.sparkContext.broadcast(offsets)
      val outSchema = StructType(
        parts.schema.fields :+ StructField(outCol, LongType, nullable = false))
      val stIdx = parts.schema.fieldIndex("__st")
      val valIdx = parts.schema.fieldIndex("__val")
      // phase 2: partition-local running sums seeded by the offsets
      val summed = parts.mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val running = scala.collection.mutable.Map.empty[Any, Long]
        it.map { r =>
          val st = r.get(stIdx)
          val before = running.getOrElse(st, bc.value.getOrElse((pid, st), 0L))
          val v = if (r.isNullAt(valIdx)) 0L else r.getLong(valIdx)
          running(st) = before + v
          Row.fromSeq(r.toSeq :+ before)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      Lineage.truncate(summed.drop("__st", "__rk", "__tid", "__val"))
    } finally parts.unpersist()
  }
}
