package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — exact, one scan, no shuffle of
  * the corpus (queries are broadcast). Scale path: random-hyperplane
  * LSH bucketing that prunes the corpus to signature-collision buckets
  * before the exact re-rank — the standard recall/throughput trade.
  */
object Similarity {

  /** Deterministic seeded hyperplanes -> packed sign bits (long).
    *
    * A single tight-loop UDF: the naive alternative (planes × dim
    * `element_at` terms reduced into one Column) produces an expression
    * tree large enough to break whole-stage codegen and fall back to
    * per-term interpreted eval — ~50× slower on a 64-dim corpus. */
  def hyperplaneSignature(v: Column, planes: Int, dim: Int, seed: Long): Column = {
    require(planes <= 63)
    val rnd = new scala.util.Random(seed)
    val hp: Array[Array[Double]] =
      Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
    val sign = udf { (vec: Seq[Float]) =>
      var sig = 0L
      var p = 0
      while (p < planes) {
        val w = hp(p)
        var s = 0.0
        var i = 0
        val n = math.min(w.length, vec.length)
        while (i < n) { s += w(i) * vec(i); i += 1 }
        if (s >= 0) sig |= (1L << p)
        p += 1
      }
      sig
    }
    sign(v)
  }

  /** Exact brute-force cosine top-k for one query vector. */
  def bruteForceTopK(corpus: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = lit(query.toArray)
    corpus
      .withColumn("cos_sim", lit(1.0) - vecCosDistance(col(vecCol), q))
      .orderBy(col("cos_sim").desc, col(idCol))
      .select(col(idCol), col("cos_sim"))
      .limit(k)
  }

  /** Exact top-k for a (small) query table: broadcast the queries over
    * one corpus scan, rank per query. Corpus is never shuffled wide —
    * the shuffle carries #queries × #corpus-partitions candidates. */
  def bruteForceTopKBatch(corpus: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, queryVecCol: String, queryIdCol: String, k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("cos_sim", lit(1.0) - vecCosDistance(col(vecCol), col(queryVecCol)))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cos_sim").desc, col(idCol))
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(queryIdCol), col(idCol), col("cos_sim"), col("__rn").as("rank"))
  }

  /** LSH-pruned approximate top-k: only corpus rows whose hyperplane
    * signature matches the query's in >= (planes - maxFlips) bits are
    * re-ranked exactly. */
  def lshTopK(corpus: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, queryVecCol: String, queryIdCol: String,
      k: Int, planes: Int = 16, dim: Int = 64, seed: Long = 42L,
      maxFlips: Int = 3): DataFrame = {
    val cSig = corpus.withColumn("__csig",
      hyperplaneSignature(col(vecCol), planes, dim, seed))
    val qSig = queries.withColumn("__qsig",
      hyperplaneSignature(col(queryVecCol), planes, dim, seed))
    val candidates = cSig.crossJoin(broadcast(qSig))
      .filter(bit_count(col("__csig").bitwiseXOR(col("__qsig"))) <= maxFlips)
      .withColumn("cos_sim", lit(1.0) - vecCosDistance(col(vecCol), col(queryVecCol)))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cos_sim").desc, col(idCol))
    candidates.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(queryIdCol), col(idCol), col("cos_sim"), col("__rn").as("rank"))
  }
}
