package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * Five strategies, each designed around one shuffle-bounded plan that
  * survives 100 TB inputs:
  *
  *  - exact: hash-groupBy on normalized text (md5); the canonical row
  *    (min id) survives. One shuffle on the 128-bit digest.
  *  - MinHash + LSH: shingles -> k=64 minhashes -> b=16 bands of r=4 ->
  *    candidates co-bucketed by band hash, verified by estimated
  *    Jaccard (minhash agreement). Only bucket-collision pairs are
  *    materialized — never the O(n²) cross product.
  *  - SimHash: 64-bit sign-of-weighted-sum signature; near-dups found
  *    by banding the signature (Hamming ≤ 3 implies a 16-bit band
  *    collision by pigeonhole) and verifying Hamming distance.
  *  - n-gram Jaccard: exact word-3-gram sets, bucket-joined on shared
  *    ngrams with |A∩B| accumulated distributively.
  *  - embedding cosine: random-hyperplane LSH prefilter + exact cosine
  *    verify (see Similarity for the search-side variant).
  */
object Dedup {

  private def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Exact dedup: keep the smallest `idCol` per normalized-text group. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(normText(col(textCol)))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("is_dup", col("__rn") > 1)
      .drop("__rn")
  }

  /** Word shingles of size n as a deduplicated array column. */
  def shingles(c: Column, n: Int): Column = {
    val words = split(normText(c), " ")
    array_distinct(filter(
      transform(words, (_, i) =>
        when(i + n <= size(words), concat_ws(" ", slice(words, i + lit(1), lit(n))))),
      x => x.isNotNull))
  }

  /** doc -> (id, minhash[k]) signature frame. */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      k: Int = 64, shingleSize: Int = 3): DataFrame = {
    val ex = df.select(col(idCol).as("__id"),
        explode(shingles(col(textCol), shingleSize)).as("__sh"))
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("__sh"))).as(s"mh$i"))
    ex.groupBy(col("__id")).agg(mins.head, mins.tail: _*)
  }

  /** Candidate near-dup pairs via LSH banding + minhash-estimated
    * Jaccard ≥ threshold. Returns (id_a, id_b, est_jaccard), id_a < id_b. */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.7, k: Int = 64, bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    require(k % bands == 0)
    val r = k / bands
    val sig = minhashSignatures(df, textCol, idCol, k, shingleSize).cache()
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * r until (b + 1) * r).map(i => col(s"mh$i")): _*).as("h"))
    }
    val buckets = sig.select(col("__id"), explode(array(bandCols: _*)).as("__b"))
      .select(col("__id"), col("__b.band"), col("__b.h"))
    val a = buckets.as("a")
    val b = buckets.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    val sa = sig.select(col("__id").as("id_a"),
      array((0 until k).map(i => col(s"mh$i")): _*).as("__sa"))
    val sb = sig.select(col("__id").as("id_b"),
      array((0 until k).map(i => col(s"mh$i")): _*).as("__sb"))
    cand.join(sa, "id_a").join(sb, "id_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("__sa"), col("__sb"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / k)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** Mark near-duplicates: a doc is a dup if it pairs with a smaller id. */
  def minhashDedup(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.7): DataFrame = {
    val dups = minhashPairs(df, textCol, idCol, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dups.withColumn("is_dup", lit(true)), Seq(idCol), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
  }

  /** 64-bit SimHash signature: sign of the token-hash bit histogram. */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ex = df.select(col(idCol).as("__id"),
      explode(split(normText(col(textCol)), " ")).as("__tok"))
      .withColumn("__h", xxhash64(col("__tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = ex.groupBy(col("__id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    agg.select(col("__id"), sig.as("simhash"))
  }

  /** Near-dup pairs with Hamming(simhash) <= maxDistance, banded into
    * four 16-bit chunks for the candidate join (pigeonhole: d<=3 means
    * at least one chunk is identical). */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxDistance: Int = 3): DataFrame = {
    require(maxDistance <= 3, "banding guarantees recall only for d<=3")
    val sig = simhash(df, textCol, idCol).cache()
    val chunks = (0 until 4).map(i =>
      struct(lit(i).as("band"),
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL)).as("h")))
    val buckets = sig.select(col("__id"), col("simhash"),
      explode(array(chunks: _*)).as("__b"))
      .select(col("__id"), col("simhash"), col("__b.band"), col("__b.h"))
    val a = buckets.as("a"); val b = buckets.as("b")
    val ham = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
    a.join(b, col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        ham.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  /** Exact n-gram Jaccard similarity pairs ≥ threshold. The join key is
    * the shared ngram; |A∩B| falls out of a count per pair. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.6, n: Int = 3): DataFrame = {
    val grams = df.select(col(idCol).as("__id"),
      explode(shingles(col(textCol), n)).as("__g"))
    val sizes = grams.groupBy(col("__id")).agg(count(lit(1)).as("__sz"))
    val a = grams.as("a"); val b = grams.as("b")
    val inter = a.join(b, col("a.__g") === col("b.__g") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .agg(count(lit(1)).as("__inter"))
    inter
      .join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__sz", "__sa"), "id_a")
      .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__sz", "__sb"), "id_b")
      .withColumn("jaccard",
        col("__inter").cast("double") / (col("__sa") + col("__sb") - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding near-dup pairs: random-hyperplane LSH prefilter + exact
    * cosine verify. Hyperplanes are seeded-deterministic. */
  def embeddingCosinePairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, planes: Int = 16, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val sigCol = Similarity.hyperplaneSignature(col(vecCol), planes, dim, seed)
    val sig = df.select(col(idCol).as("__id"), col(vecCol).as("__v"), sigCol.as("__sig"))
    // band the signature into 4 chunks: cos >= 0.95 flips few bits
    val chunks = (0 until 4).map(i =>
      struct(lit(i).as("band"),
        shiftright(col("__sig"), i * (planes / 4))
          .bitwiseAND(lit((1L << (planes / 4)) - 1)).as("h")))
    val buckets = sig.select(col("__id"), col("__v"), explode(array(chunks: _*)).as("__b"))
      .select(col("__id"), col("__v"), col("__b.band"), col("__b.h"))
    val a = buckets.as("a"); val b = buckets.as("b")
    val cosSim = lit(1.0) - graft.functions.VectorFunctions
      .vecCosDistance(col("a.__v"), col("b.__v"))
    a.join(b, col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        cosSim.as("cos_sim"))
      .distinct()
      .filter(col("cos_sim") >= threshold)
  }
}
