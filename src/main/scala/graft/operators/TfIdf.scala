package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TF-IDF keyword extraction: the standard corpus-statistics pass of a
  * training-data pipeline (topic tagging, quality heuristics, near-dup
  * blocking keys).
  *
  * Plan shape at scale: one shuffle for per-(doc, term) counts (partial
  * aggregation combines map-side), one map-side-combined shuffle for
  * document frequencies, a shuffle join tf ⋈ df on term (AQE broadcasts
  * it when the vocabulary is small), and a per-document window top-k
  * that Spark prunes map-side via WindowGroupLimit. The corpus row
  * count joins in as a broadcast single-row aggregate — no driver
  * action materializes data.
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
    val dfTbl = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
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
