package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means over an embedding column — the curation
  * primitive behind semantic dedup / corpus bucketing (cluster, then
  * sample or dedup within clusters). Complements
  * [[Similarity.trainCentroids]] (which trains IVF's coarse quantizer
  * on a bounded driver-side sample): here the ASSIGNMENT and the
  * centroid updates run over the full corpus as DataFrame jobs.
  *
  * Scale shape per Lloyd iteration: one corpus scan + one map-side
  * combined shuffle of (cluster, dim) partial sums — k·dim rows per
  * partition, independent of corpus size. Centroids (k·dim longs) are
  * the model state: they live on the driver between iterations and
  * ship to executors inside the assignment closure, exactly like a
  * broadcast model in any ML pipeline. Nothing row-sized is ever
  * collected.
  *
  * Determinism: coordinates are quantized to round(x·1e6) longs, so
  * every distance is exact integer arithmetic and every centroid
  * update is one exact long sum + one double division + one half-up
  * round — bit-identical in any engine regardless of row order. An
  * external SQL oracle replays the full iteration history exactly
  * (floating-point Lloyd's would diverge on sum order). Quantization
  * error is 1e-6 per coordinate — far below any clustering-relevant
  * signal; a production variant on un-quantized doubles is the same
  * code minus the rounds, trading oracle-exactness for precision.
  */
object Clustering {

  /** round(x·1e6) as long — exact for |x| ≤ ~9e12, i.e. any normalized
    * embedding coordinate. */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 1e6).cast("long"))

  /** Returns Array(cluster, distq) — an array, not a case class, so the
    * downstream projection stays inside whole-stage codegen (janino
    * cannot compile an Invoke on a local case-class accessor and the
    * whole stage would fall back to interpreted eval). */
  private def assignUdf(cents: Array[Array[Long]]) = udf { (qv: Seq[Long]) =>
    var best = 0
    var bd = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var s = 0L
      var j = 0
      while (j < cv.length) {
        val d = qv(j) - cv(j)
        s += d * d
        j += 1
      }
      if (s < bd) { bd = s; best = c } // ties keep the smaller cluster id
      c += 1
    }
    Array(best.toLong, bd)
  }

  /** Lloyd's k-means: `iters` assignment passes, `iters - 1` centroid
    * updates in between. Init = the k rows with the smallest
    * (md5-rank(id), id) — a deterministic uniform draw any engine can
    * reproduce. Empty clusters keep their previous centroid. Returns
    * the input columns plus `cluster` (0-based, by init rank order) and
    * `distq` (exact quantized squared distance to the final centroid).
    */
  def kmeansQuantized(df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int): DataFrame = {
    require(iters >= 1 && k >= 1)
    val qdf = df.withColumn("__qv", quantize(col(vecCol)))
    // cache the quantized corpus across the Lloyd update collects (they
    // run eagerly in the loop below); released before returning so a
    // call doesn't pin a corpus-sized cache for the session — the final
    // assignment pass re-reads the source once (scan + quantize, no
    // shuffle), which is cheaper than leaking one cache per call
    qdf.persist()

    var cents: Array[Array[Long]] = qdf
      .select(col(idCol), col("__qv"))
      .withColumn("__rk", Dedup.hash60(col(idCol).cast("string")))
      .orderBy(col("__rk"), col(idCol))
      .limit(k)
      .collect() // k rows of model state, not data
      .map(_.getSeq[Long](1).toArray)
    require(cents.length == k, s"k-means needs >= $k input rows")

    var it = 1
    while (it < iters) {
      // (cluster, dim) partial sums combine map-side; round matches the
      // SQL oracle's round(sum::DOUBLE / n) half-away-from-zero
      val upd = qdf
        .withColumn("__c", assignUdf(cents)(col("__qv"))(0).cast("int"))
        .select(col("__c"), posexplode(col("__qv")).as(Seq("__j", "__v")))
        .groupBy(col("__c"), col("__j"))
        .agg(round(sum(col("__v")).cast("double") / count(lit(1))).cast("long").as("__cj"))
        .collect() // k·dim rows of model state
      val next = cents.map(_.clone())
      upd.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getLong(2))
      cents = next
      it += 1
    }
    qdf.unpersist()

    qdf.withColumn("__a", assignUdf(cents)(col("__qv")))
      .withColumn("cluster", col("__a")(0).cast("int"))
      .withColumn("distq", col("__a")(1))
      .drop("__qv", "__a")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    * embeddings, then search for near-duplicate pairs only WITHIN each
    * cluster — the O(n²) pair search becomes k independent O((n/k)²)
    * blocks and the equi-join on cluster co-locates all candidates in
    * one shuffle. Cross-cluster near-dups are unreachable by design
    * (the published recall trade; raise k to shrink blocks, lower k to
    * raise recall). */
  def semanticDedupPairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, k: Int, iters: Int): DataFrame = {
    // the assignment feeds BOTH sides of the self-join: checkpoint it
    // eagerly so the corpus scan + k*dim assignment UDF run once, not
    // once per join side (blocks reclaimed when the result is GC'd —
    // the ngramJaccardPairs lifecycle); reliable checkpoint when
    // graft.checkpoint.dir is set (Lineage.truncate)
    val asg = Lineage.truncate(kmeansQuantized(df, vecCol, idCol, k, iters)
      .select(col("cluster"), col(idCol).as("__id"), col(vecCol).as("__v")))
    val a = asg.select(col("cluster"), col("__id").as("id_a"), col("__v").as("__va"))
    val b = asg.select(col("cluster"), col("__id").as("id_b"), col("__v").as("__vb"))
    val cosSim = lit(1.0) - graft.functions.VectorFunctions
      .vecCosDistance(col("__va"), col("__vb"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosSim)
      .filter(col("cos_sim") >= threshold)
      .select(col("cluster"), col("id_a"), col("id_b"), col("cos_sim"))
  }
}
