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
    * One shuffle on the stratum column (standard cumulative-sum
    * window). A stratum's rows must be window-sortable on one
    * partition; at 100 TB pre-aggregate to (doc, n_tokens) rows first —
    * the window runs over doc-count-sized data, never corpus bytes. */
  def tokenBudget(df: DataFrame, stratum: Column, id: Column,
                  tokens: Column, budgetPerStratum: Long): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(hashRank(id), id)
    val before = coalesce(
      sum(tokens).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    df.withColumn("kept", before < budgetPerStratum)
  }
}
