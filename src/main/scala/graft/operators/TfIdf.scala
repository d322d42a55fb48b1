package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TF-IDF keyword extraction: the standard corpus-statistics pass of a
  * training-data pipeline (topic tagging, quality heuristics, near-dup
  * blocking keys).
  *
  * Plan shape at scale — one executed corpus scan (AQE stage-cache
  * reuse; see topTerms), linear shuffles only: (1) per-(doc, term)
  * counts, partial aggregation combining map-side; (2) document
  * frequencies re-aggregated from tf map-side; (3) the tf-df join on
  * term — AQE-skew-splittable where a term-window would be one hot
  * partition per Zipf-head term; (4) the per-document top-k window,
  * pruned map-side via WindowGroupLimit. The corpus row count joins in
  * as a broadcast single-row aggregate — no driver action materializes
  * data.
  */
object TfIdf {

  /** Lowercased whitespace tokens, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)

  /** Top-k terms per document by tf·ln(N/df), ties broken by term.
    * Output: idCol, rank, term, tf, df, score. */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    // Document frequency by re-aggregating tf on term, NOT a term
    // window: a window puts every tf row of a Zipf-head term ("the" in
    // 100M docs) into ONE partition — no partial aggregation, and AQE
    // cannot split window partitions, so the operator's hottest input
    // is a straggler by construction. The join below keys the same
    // rows by term, but skewed sort-merge-join partitions ARE
    // AQE-splittable. The historical cost of this shape — the df
    // branch re-scanning and re-exploding the corpus because column
    // pruning diverged its aggregate subtree from tf's — is neutralized
    // by the no-op `tf >= 1` guard: it references the count, pruning
    // leaves both subtrees identical, and AQE's stage cache executes
    // the scan+explode+aggregate once (probed: stage counts and
    // shuffle at 100x match the single-scan formulation).
    val dfTbl = tf.where(col("tf") >= 1)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = tf
      .join(dfTbl, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * log(col("__n").cast("double") / col("df")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"), col("term"),
        col("tf"), col("df"), col("score"))
  }
}
