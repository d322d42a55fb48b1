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

  /** Mersenne prime 2^61-1: the signature-hash modulus. Chosen so the
    * whole minhash pipeline is exact integer math that an external SQL
    * oracle (DuckDB HUGEINT) can replicate bit-for-bit. */
  val P61: Long = (1L << 61) - 1

  /** 60-bit hash from the md5 hex prefix — deterministic and
    * replicable in any engine with md5 + hex parsing (DuckDB:
    * `('0x'||substr(md5(x),1,15))::BIGINT`). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded linear-permutation constants for minhash: k pairs (a,b),
    * a in [1,P61), b in [0,P61). Exposed so the verify oracle can embed
    * the same constants in SQL. */
  def minhashPerms(k: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(0x9E3779B97F4A7C15L)
    def next(bound: Long): Long = {
      var v = rnd.nextLong() & Long.MaxValue
      v % bound
    }
    val as = Array.fill(k)(1L + next(P61 - 1))
    val bs = Array.fill(k)(next(P61))
    (as, bs)
  }

  /** (a*b) mod 2^61-1 without overflow: 128-bit product via
    * multiplyHigh, then 2^61 ≡ 1 (mod P61) digit folding. Exact for
    * a, b in [0, P61). */
  def mulmodP61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // product < 2^122 -> hi < 2^58
    val lo = a * b
    var r = (hi << 3) + (lo & P61) + (lo >>> 61)
    r = (r & P61) + (r >>> 61)
    if (r >= P61) r - P61 else r
  }

  /** Exact dedup: keep the smallest `idCol` per normalized-text group.
    * Canonical ids come from a map-side-combined groupBy(min) + an
    * AQE-splittable join back — NOT a digest-partitioned window: this
    * operator's own target (one document copied 100M times) would put
    * the whole duplicate group into a single window task, and
    * row_number-without-top-k-filter gets no WindowGroupLimit prune. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keyed = df.withColumn("__d", md5(normText(col(textCol))))
    // Null-safe join: null text -> null digest, and md5(null) is null.
    // A plain USING join would silently DROP those rows; `<=>` keeps
    // them as one dedup group (same semantics as the old null-partition
    // window formulation).
    val canon = keyed.groupBy(col("__d")).agg(min(col(idCol)).as("__cid"))
      .withColumnRenamed("__d", "__dc")
    keyed.join(canon, keyed("__d") <=> canon("__dc"))
      .withColumn("is_dup", col(idCol) =!= col("__cid"))
      .drop("__d", "__dc", "__cid")
  }

  /** Distinct word shingles of size n, one normalize+split+slide pass
    * per document.
    *
    * Deliberately a UDF, not higher-order Column functions: HOF lambdas
    * are interpreted and re-evaluate their argument subtree per element
    * (and CollapseProject re-inlines any pre-split words column), so a
    * Column formulation re-runs the normalization regex O(words) times
    * per document — ~20× slower end-to-end on a text corpus. */
  def shingles(c: Column, n: Int): Column = {
    val f = udf { (text: String) =>
      if (text == null) Array.empty[String]
      else {
        val words = text.trim.toLowerCase.split("\\s+")
        if (words.length < n) Array.empty[String]
        else {
          val out = new scala.collection.mutable.LinkedHashSet[String]
          var i = 0
          while (i + n <= words.length) {
            out += words.slice(i, i + n).mkString(" ")
            i += 1
          }
          out.toArray
        }
      }
    }
    f(c)
  }

  /** Typed aggregator folding one 60-bit shingle hash into k minhash
    * slots via linear permutations `(a_i*h + b_i) mod 2^61-1`. One md5
    * per shingle + k mulmods replaces k full string hashes per shingle;
    * `merge` is elementwise min, so Spark runs it partial/final. */
  private final class MinHashAgg(as: Array[Long], bs: Array[Long])
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Seq[Long]] {
    import org.apache.spark.sql.Encoder
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    def zero: Array[Long] = Array.fill(as.length)(Long.MaxValue)
    def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < as.length) {
        var v = mulmodP61(as(i), h) + bs(i)
        if (v >= P61) v -= P61
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Seq[Long] = r.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** doc -> (id, mh: array<long>[k]) signature frame.
    *
    * The input is repartitioned by id before the shingle explode: text
    * corpora often arrive in few fat files, and the per-doc shingle +
    * hash work is the CPU hot spot — spreading it across the cluster
    * BEFORE the explode matters more than avoiding the one narrow
    * shuffle. It also pre-aligns the groupBy key, so the aggregation
    * itself adds no second shuffle. */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      k: Int = 64, shingleSize: Int = 3): DataFrame = {
    val (as, bs) = minhashPerms(k)
    val mh = udaf(new MinHashAgg(as, bs),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    val ex = Partitioning.spread(
        df.select(col(idCol).as("__id"), col(textCol).as("__text")), col("__id"))
      .select(col("__id"), explode(shingles(col("__text"), shingleSize)).as("__sh"))
      .withColumn("__h", hash60(col("__sh")))
    ex.groupBy(col("__id")).agg(mh(col("__h")).as("__mh"))
  }

  /** Corpus-size boundary for the dedup verify strategy: at or below
    * it, the candidate verify joins run as one un-hinted query (Catalyst
    * broadcasts the candidate set on its own and the whole pipeline is a
    * single execution — fastest at bench scale); above it, candidates
    * are persisted once and explicitly broadcast into both corpus
    * streams so the corpus-side arrays/signatures never shuffle
    * (Catalyst's size estimate flips to sort-merge past ~100k docs —
    * measured 53× shuffle growth at 500k). Session config so specs /
    * probes can force the scale path onto small fixtures without
    * global mutable state (the round-9 verdict's wart #4). */
  private[graft] val VerifyBroadcastMinDocsKey =
    "graft.dedup.verifyBroadcastMinDocs"
  private[graft] def verifyBroadcastMinDocs(
      spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get(VerifyBroadcastMinDocsKey, "100000").toLong

  /** Shard-size boundary for the incremental serve paths: at or below
    * it, the shard's digests / band table BROADCAST into a scan-only
    * pass over the persisted index (the documented "shard ≪ index"
    * contract — fastest, zero index shuffle). Above it the broadcast
    * would be multi-GB (shard bands are ~1.6 KB/doc at k=64×16 bands;
    * Spark hard-caps a broadcast table at 8 GB and the driver pays
    * materialization), so the plan switches to a partitioned shuffle
    * join: the index's SIGNATURES are still never recomputed — only
    * its band/digest rows shuffle, which is the unavoidable cost once
    * both sides are large. */
  private[graft] val IncrementalBroadcastMaxDocsKey =
    "graft.dedup.incrementalBroadcastMaxDocs"
  private[graft] def incrementalBroadcastMaxDocs(
      spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get(IncrementalBroadcastMaxDocsKey, "1000000").toLong

  /** Debug guard for the incremental serve paths' arrival-order
    * contract (every indexed id < every shard id — the precondition
    * for flag-equality with a full recompute). Off by default: it
    * costs one extra index aggregate per arrival; turn it on in
    * validation runs to fail fast instead of silently mis-flagging. */
  private[graft] val CheckArrivalOrderKey = "graft.dedup.checkArrivalOrder"
  private[graft] def checkArrivalOrder(
      spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.get(CheckArrivalOrderKey, "false").toBoolean

  /** Enforce the arrival-order contract when [[CheckArrivalOrderKey]]
    * is set: max indexed id must be < min shard id (empty sides are
    * vacuously ordered). */
  private def assertArrivalOrder(idxIds: DataFrame, shardIds: DataFrame,
      where: String): Unit = {
    val maxIdx = idxIds.agg(max(idxIds.columns.head)).head()
    val minShard = shardIds.agg(min(shardIds.columns.head)).head()
    if (!maxIdx.isNullAt(0) && !minShard.isNullAt(0)) {
      val (a, b) = (maxIdx.getLong(0), minShard.getLong(0))
      require(a < b,
        s"$where: arrival-order contract violated — max indexed id $a >= " +
          s"min shard id $b; incremental flags would diverge from a full " +
          "recompute (the indexed doc, not the shard doc, should be canonical)")
    }
  }

  /** (__id [, carry...], band, h) LSH band buckets of a (__id, __mh)
    * signature frame. Band key = the raw r-slot slice (not a hash of
    * it): exact array equality is what the SQL oracle joins on too.
    * Shared by the full-corpus pair build and BOTH sides of the
    * incremental index probe — the sides MUST band identically, so
    * this is the only place the banding is defined; `carry` lets the
    * index side keep its signature column riding along. */
  private def bandBuckets(sig: DataFrame, k: Int, bands: Int,
      carry: Seq[String] = Nil): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"), slice(col("__mh"), b * r + 1, r).as("h"))
    }
    val keep = ("__id" +: carry).map(col)
    sig.select(keep :+ explode(array(bandCols: _*)).as("__b"): _*)
      .select(keep ++ Seq(col("__b.band"), col("__b.h")): _*)
  }

  /** Candidate near-dup pairs via LSH banding + minhash-estimated
    * Jaccard ≥ threshold. Returns (id_a, id_b, est_jaccard), id_a < id_b. */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.7, k: Int = 64, bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    require(k % bands == 0)
    val sig = minhashSignatures(df, textCol, idCol, k, shingleSize).cache()
    // materializes the cache; its count picks the verify strategy
    val nDocs = sig.count()
    val out = minhashPairsFromSig(sig, nDocs, threshold, k, bands)
    sig.unpersist()
    out
  }

  /** Candidate + verify pipeline over a prepared (__id, __mh)
    * signature frame — the ONE implementation of the banding/estimate/
    * threshold machinery, shared by the recomputing path
    * ([[minhashPairs]]) and the index-backed bootstrap path
    * ([[minhashDedupFromIndex]]) so the output-bounded verify strategy
    * can't drift between them. Returns the materialized (id_a, id_b,
    * est_jaccard) pair list.
    *
    * Output-bounded verify at scale: persist candidates once (else the
    * band pipeline executes once per broadcast — measured 2× shuffle
    * rows) and broadcast the PAIRS into each signature stream (|cand| ∝
    * near-dup pairs, not the corpus), then join the slimmed streams on
    * the pair key — the corpus-side signature table never shuffles
    * (measured 53× shuffle growth at 500k docs without it). Below the
    * boundary, the un-hinted single-reference chain is both correct
    * (Catalyst broadcasts cand on its own) and faster. */
  private def minhashPairsFromSig(sig: DataFrame, nDocs: Long,
      threshold: Double, k: Int, bands: Int): DataFrame = {
    val buckets = bandBuckets(sig, k, bands)
    val a = buckets.as("a")
    val b = buckets.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    val scalePath = nDocs > verifyBroadcastMinDocs(sig.sparkSession)
    val sa = sig.select(col("__id").as("id_a"), col("__mh").as("__sa"))
    val sb = sig.select(col("__id").as("id_b"), col("__mh").as("__sb"))
    val candP =
      if (scalePath) cand.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else cand
    val joined =
      if (scalePath)
        sa.join(broadcast(candP), Seq("id_a"))
          .join(sb.join(broadcast(candP), Seq("id_b")), Seq("id_a", "id_b"))
      else candP.join(sa, "id_a").join(sb, "id_b")
    val out = joined
      .withColumn("est_jaccard", estJaccard(col("__sa"), col("__sb"), k))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
      // eager materialization so any caller-side cache releases now
      // (the same leak-by-laziness the ngram path fixed in round 4);
      // reliable checkpoint when graft.checkpoint.dir is set
      .transform(Lineage.truncate)
    if (scalePath) candP.unpersist()
    out
  }

  /** Mark near-duplicates: a doc is a dup if it pairs with a smaller id. */
  def minhashDedup(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.7): DataFrame = {
    val dups = minhashPairs(df, textCol, idCol, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dups.withColumn("is_dup", lit(true)), Seq(idCol), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
  }

  /** Slot-agreement estimate shared by the full-corpus and incremental
    * verify stages: fraction of the k minhash slots on which two
    * signatures agree. */
  private def estJaccard(sa: Column, sb: Column, k: Int): Column =
    aggregate(zip_with(sa, sb, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / k

  // ── Incremental dedup against a persisted signature index ──────────
  //
  // A 100 TB corpus is not deduped in one shot: it grows by shards
  // (crawl snapshots, ingest days), and re-running the full-corpus
  // MinHash pipeline per arrival makes ingest cost scale with the
  // CORPUS. The production shape is an IVF-style build/serve split
  // (compare Similarity.ivfIndex/ivfSearchIndexed): persist the
  // signature table once, then dedup each arriving shard against the
  // index + itself, and append the shard's signatures.
  //
  // The index retains the signature of EVERY ingested doc, dups
  // included — near-duplicate similarity is not transitive, so indexing
  // only survivors would silently change the result (a new doc matching
  // a dropped dup but not its canonical would slip through), and
  // retention is exactly what makes the incremental path equal to a
  // full-corpus recompute (the oracle pins that equivalence). Signature
  // rows are 8·k+8 bytes/doc (~520 B at k=64): ~0.5 TB per 1e9 docs —
  // ~0.5% of the corpus it indexes.
  //
  // Serve-path scale shape: the shard's band table broadcasts into a
  // columnar SCAN of the index — the index is never shuffled and never
  // re-hashed; per-arrival CPU (shingle + k permutations) is paid on
  // the SHARD only. Candidate signatures come back via a second
  // broadcast semi-join on the same persisted table, so total arrival
  // cost = shard-sized compute + two scan-only passes over the index
  // (IncrementalDedupProbe measures the decade growth).

  /** Build (or rebuild) the persisted MinHash signature index for an
    * accepted corpus: one parquet table (id, mh array<long>[k]). Band
    * buckets are derived at read time (a column slice over the scan) so
    * the index stays one narrow table. */
  def minhashIndexWrite(df: DataFrame, textCol: String, idCol: String,
      path: String, k: Int = 64, shingleSize: Int = 3): Unit =
    minhashSignatures(df, textCol, idCol, k, shingleSize)
      .select(col("__id").as("id"), col("__mh").as("mh"))
      .write.mode("overwrite").parquet(path)

  /** Index build + bootstrap dedup fused (optimization round 10): the
    * one signature pipeline both writes the index AND feeds the pair
    * build, where the split [[minhashIndexWrite]]-then-
    * [[minhashDedupFromIndex]] sequence re-read the just-written
    * parquet three times (strategy count + both verify streams).
    * Verdicts and index bytes are bit-identical to the split sequence
    * (same signatures, same shared pair machinery; DedupSpec pins it). */
  def minhashIndexWriteAndDedup(df: DataFrame, textCol: String,
      idCol: String, path: String, threshold: Double = 0.7,
      k: Int = 64, bands: Int = 16, shingleSize: Int = 3): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val sig = minhashSignatures(df, textCol, idCol, k, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = sig.count()
    sig.select(col("__id").as("id"), col("__mh").as("mh"))
      .write.mode("overwrite").parquet(path)
    // minhashPairsFromSig checkpoints its pair output, so `dups` (and
    // the returned join) is independent of the cached sig frame
    val dups = minhashPairsFromSig(sig, nDocs, threshold, k, bands)
      .select(col("id_b").as(idCol)).distinct()
    val out = df.join(dups.withColumn("is_dup", lit(true)), Seq(idCol), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
    sig.unpersist()
    out
  }

  /** Exact twin of [[minhashIndexWriteAndDedup]]: one normalize+md5
    * pass both writes the digest index (mode overwrite) and flags the
    * corpus — the split [[Dedup.exact]] + [[exactIndexWrite]] sequence
    * ran the regex-normalization and md5 twice over the corpus. The
    * returned frame is already materialized (it is the checkpoint the
    * digest write reads). */
  def exactIndexWriteAndDedup(df: DataFrame, textCol: String,
      idCol: String, path: String): DataFrame = {
    val keyed = df.withColumn("__d", md5(normText(col(textCol))))
    val canon = keyed.groupBy(col("__d")).agg(min(col(idCol)).as("__cid"))
      .withColumnRenamed("__d", "__dc")
    val out = Lineage.truncate(
      keyed.join(canon, keyed("__d") <=> canon("__dc"))
        .withColumn("is_dup", col(idCol) =!= col("__cid"))
        .drop("__dc", "__cid"))
    out.select(col("__d").as("digest"), col(idCol).as("id"))
      .write.mode("overwrite").parquet(path)
    out.drop("__d")
  }

  /** Append one ingested shard's signatures to the index (ALL of them,
    * dups included — see the retention note above). Run AFTER
    * [[minhashDedupIncremental]] flagged the shard. */
  def minhashIndexAppend(df: DataFrame, textCol: String, idCol: String,
      path: String, k: Int = 64, shingleSize: Int = 3): Unit =
    minhashSignatures(df, textCol, idCol, k, shingleSize)
      .select(col("__id").as("id"), col("__mh").as("mh"))
      .write.mode("append").parquet(path)

  /** Dedup a corpus whose signatures are ALREADY PERSISTED — the
    * bootstrap pass of the incremental protocol, where
    * [[minhashIndexWrite]] just ran: verdicts identical to
    * [[minhashDedup]] (banding, estimate, threshold, smaller-id
    * precedence all shared machinery), but bands and verify both READ
    * the index, so the corpus is never re-shingled — each document's
    * signature is computed exactly once in its lifetime. Contract: the
    * index at `indexPath` holds exactly `df`'s documents (call BEFORE
    * any shard appends). */
  def minhashDedupFromIndex(df: DataFrame, idCol: String, indexPath: String,
      threshold: Double = 0.7, k: Int = 64, bands: Int = 16): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val spark = df.sparkSession
    // no cache: the signatures are a cheap columnar re-scan here, and
    // the shared verify core already bounds what shuffles; the count
    // picks the same broadcast-verify strategy as the recomputing path
    // (the bootstrap corpus is the LARGEST input in the protocol —
    // exactly where the output-bounded path matters)
    val sig = spark.read.parquet(indexPath)
      .select(col("id").as("__id"), col("mh").as("__mh"))
    val nDocs = sig.count()
    val dups = minhashPairsFromSig(sig, nDocs, threshold, k, bands)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dups.withColumn("is_dup", lit(true)), Seq(idCol), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
  }

  /** Exact-digest twin of [[minhashIndexWrite]]: persist (digest =
    * md5 of normalized text, id) for every ingested doc — the second
    * table of the production index pair (exact first, near-dup second).
    * mode "overwrite" builds, "append" adds a flagged shard. */
  def exactIndexWrite(df: DataFrame, textCol: String, idCol: String,
      path: String, mode: String = "overwrite"): Unit =
    df.select(md5(normText(col(textCol))).as("digest"), col(idCol).as("id"))
      .write.mode(mode).parquet(path)

  /** Serve + append fused (optimization round 10): flag the shard
    * against the digest index exactly like [[exactDedupIncremental]],
    * then append its digests — but the shard's normalize+md5 pipeline
    * runs ONCE for both (the split API pays it twice: once to flag,
    * once inside the caller's follow-up [[exactIndexWrite]] append),
    * and the returned frame is already materialized (callers drop
    * their own Lineage.truncate). One full regex-normalization pass
    * over the shard saved per arrival — at 100 TB that is a second
    * scan of the arriving text. Flags are bit-identical to
    * serve-then-append (DedupSpec pins it). */
  def exactServeAppend(shard: DataFrame, textCol: String, idCol: String,
      indexPath: String): DataFrame = {
    val flaggedD = exactDedupIncrementalKeyed(shard, textCol, idCol, indexPath)
    // materialize BEFORE the append: every index-reading node must be
    // executed before new digests land in the same path — and the
    // checkpoint also makes the digest projection below recompute-free
    val out = Lineage.truncate(flaggedD)
    out.select(col("__d").as("digest"), col(idCol).as("id"))
      .write.mode("append").parquet(indexPath)
    out.drop("__d")
  }

  /** Exact dedup of an ARRIVING shard against the persisted digest
    * index + itself: a shard doc is a dup iff its normalized-text
    * digest is already indexed, or belongs to a smaller-id shard doc.
    * Same scale shape as the minhash serve path — the shard's digest
    * set BROADCASTS into one scan of the index (the index never
    * shuffles), and the shard-internal stage is [[exact]]'s
    * map-combined groupBy(min) + join-back. With arrival-ordered ids
    * the flags equal a full-corpus [[exact]] run restricted to the
    * shard (null text forms one digest group, `<=>` join semantics
    * as in [[exact]]). */
  def exactDedupIncremental(shard: DataFrame, textCol: String,
      idCol: String, indexPath: String): DataFrame =
    exactDedupIncrementalKeyed(shard, textCol, idCol, indexPath).drop("__d")

  /** [[exactDedupIncremental]] with the digest column (`__d`) kept on
    * the output so [[exactServeAppend]] can write the index append
    * without a second md5 pass. */
  private def exactDedupIncrementalKeyed(shard: DataFrame, textCol: String,
      idCol: String, indexPath: String): DataFrame = {
    val spark = shard.sparkSession
    val keyed = shard.withColumn("__d", md5(normText(col(textCol))))
    val shardDigests = keyed.select(col("__d")).distinct()
    if (checkArrivalOrder(spark))
      assertArrivalOrder(
        spark.read.parquet(indexPath).select(col("id").cast("long")),
        shard.select(col(idCol).cast("long")), "exactDedupIncremental")
    // large-shard guard: row count upper-bounds the distinct digest
    // count without forcing the md5 pipeline through an extra action.
    // Above the boundary the digest set is served in bounded broadcast
    // CHUNKS (id-ranged, unioned) instead of one oversized broadcast —
    // exact hits carry no precedence between chunks (a hit is just
    // "digest present in the fixed index"), so unlike the minhash
    // chunks they need no ordering or spill, only k extra index scans;
    // the index never shuffles and is never md5'd again on either path.
    val boundary = math.max(1L, incrementalBroadcastMaxDocs(spark))
    val nShard = shard.count()
    def hitsFor(digests: DataFrame): DataFrame =
      spark.read.parquet(indexPath)
        .select(col("digest"))
        .join(broadcast(digests), col("digest") <=> col("__d"), "leftsemi")
        .select(col("digest").as("__hd"))
    val hit = (if (nShard <= boundary) hitsFor(shardDigests)
      else {
        val nChunks = math.ceil(nShard.toDouble / boundary).toInt
        val probs = (1 until nChunks).map(_.toDouble / nChunks).toArray
        val cuts = keyed.stat.approxQuantile(
          Array(idCol), probs, 0.001).head
        val idD = col(s"`$idCol`").cast("double")
        (0 until nChunks).map { i =>
          val lohi = (if (i == 0) Nil else Seq(idD > cuts(i - 1))) ++
            (if (i == nChunks - 1) Nil else Seq(idD <= cuts(i)))
          hitsFor(keyed
            .filter(lohi.reduceOption(_ && _).getOrElse(lit(true)))
            .select(col("__d")).distinct())
        }.reduce(_.unionByName(_))
      })
      .distinct()
      .withColumn("__indexed", lit(true))
    val canon = keyed.groupBy(col("__d")).agg(min(col(idCol)).as("__cid"))
      .withColumnRenamed("__d", "__dc")
    keyed
      .join(canon, keyed("__d") <=> canon("__dc"))
      .join(hit, keyed("__d") <=> col("__hd"), "left")
      .withColumn("is_dup",
        coalesce(col("__indexed"), lit(false)) || col(idCol) =!= col("__cid"))
      .drop("__dc", "__cid", "__hd", "__indexed")
  }

  /** Dedup an ARRIVING shard against the persisted index + itself: a
    * shard doc is a dup iff it minhash-matches (est Jaccard ≥
    * threshold) ANY indexed doc, or a smaller-id doc within the shard.
    * When shard ids follow arrival order (every indexed id < every
    * shard id), the flags are bit-identical to what a full-corpus
    * [[minhashDedup]] over index∪shard would assign the shard — the
    * `dedup_incremental` oracle replays exactly that equivalence.
    * Returns the shard with `is_dup`. */
  def minhashDedupIncremental(shard: DataFrame, textCol: String,
      idCol: String, indexPath: String, threshold: Double = 0.7,
      k: Int = 64, bands: Int = 16, shingleSize: Int = 3): DataFrame =
    minhashServeImpl(shard, textCol, idCol, indexPath, threshold, k,
      bands, shingleSize, appendAfterServe = false)

  /** Serve + append fused (optimization round 10): flag the shard like
    * [[minhashDedupIncremental]], then append its signatures to the
    * index — from the SAME persisted signature frame, so the shard is
    * shingled + permuted once per arrival instead of twice (the split
    * serve-then-[[minhashIndexAppend]] sequence re-ran the whole
    * signature pipeline — shingle UDF, k·shingles mulmods, and the
    * repartition shuffle — just to write rows the serve already
    * computed). Flags and appended bytes are bit-identical to the
    * split sequence (DedupSpec pins it). */
  def minhashServeAppend(shard: DataFrame, textCol: String,
      idCol: String, indexPath: String, threshold: Double = 0.7,
      k: Int = 64, bands: Int = 16, shingleSize: Int = 3): DataFrame =
    minhashServeImpl(shard, textCol, idCol, indexPath, threshold, k,
      bands, shingleSize, appendAfterServe = true)

  private def minhashServeImpl(shard: DataFrame, textCol: String,
      idCol: String, indexPath: String, threshold: Double,
      k: Int, bands: Int, shingleSize: Int,
      appendAfterServe: Boolean): DataFrame = {
    // fail fast — bandBuckets would also catch it, but only after the
    // shard signature computation already ran
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val spark = shard.sparkSession
    val sig = minhashSignatures(shard, textCol, idCol, k, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nShard = sig.count()
    val idxSig = spark.read.parquet(indexPath)
      .select(col("id").as("__id"), col("mh").as("__mh"))
    // raw shard ids, not sig ids: a too-short doc (fewer tokens than
    // the shingle width) has no signature but still participates in
    // the id ordering the contract is about
    if (checkArrivalOrder(spark))
      assertArrivalOrder(idxSig.select(col("__id").cast("long")),
        shard.select(col(idCol).cast("long")), "minhashDedupIncremental")
    // shard-vs-index candidates in scan-only index passes: the shard
    // bands BROADCAST into the index scan (the index side never
    // shuffles — its band explode is a per-row column op riding the
    // scan), and the index signature RIDES the join output so the
    // verify stage needs no second index pass (measured 23 → 14 s at a
    // 495k-doc index). Carried arrays are candidate-bounded. Above the
    // large-shard boundary ONE broadcast (~1.6 KB/doc of band rows)
    // would blow Spark's 8 GB cap — the serve switches to CHUNKED
    // passes: the shard splits into id-ordered sub-batches of at most
    // `boundary` docs, each broadcast into a scan of the index plus the
    // already-served chunks' signatures (spilled once, never the real
    // index file) — so the index STILL never shuffles and per-pass cost
    // stays bounded, at the price of one extra index scan per chunk.
    // (A partitioned join instead would shuffle the index's band rows —
    // ∝ corpus per arrival, measured 3.5 GB at a 495k index vs the
    // chunked path's shard-sized tens of MB.)
    val boundary = math.max(1L, incrementalBroadcastMaxDocs(spark))
    // the dup id SET is what must materialize before any index append —
    // it is the only index-reading subtree, and it is near-dup-sized
    // (truncating the whole flagged shard instead, as earlier rounds
    // did, checkpointed a shard-sized frame for no extra safety). The
    // band table is recomputed from the persisted signatures where
    // needed — a column slice over cached rows, cheaper than a second
    // persist + materializing count.
    val dups = Lineage.truncate(
      if (nShard <= boundary)
        minhashServePassDups(idxSig, sig, bandBuckets(sig, k, bands),
          threshold, k, bands, idCol)
      else
        minhashChunkedDups(spark, idxSig, sig, nShard, boundary, threshold,
          k, bands, idCol))
    // fused append: the serve's persisted signatures ARE the rows the
    // index append needs — write them now (post-materialization, so
    // the serve never sees its own shard as "indexed")
    if (appendAfterServe)
      sig.select(col("__id").as("id"), col("__mh").as("mh"))
        .write.mode("append").parquet(indexPath)
    val out = shard.join(dups.withColumn("is_dup", lit(true)), Seq(idCol), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
    sig.unpersist()
    out
  }

  /** One serve pass: candidates of `sigChunk` (bands in `bandsChunk`)
    * against the index signature frame + the chunk itself, estimate
    * filtered to the dup id set. The chunk bands broadcast; the index
    * frame is scan-only. */
  private def minhashServePassDups(idxSig: DataFrame, sigChunk: DataFrame,
      bandsChunk: DataFrame, threshold: Double, k: Int, bands: Int,
      idCol: String): DataFrame = {
    val idxBands = bandBuckets(idxSig, k, bands, carry = Seq("__mh"))
    val candIdx = idxBands.as("a")
      .join(broadcast(bandsChunk).as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h"))
      .select(col("a.__id").as("id_a"), col("a.__mh").as("__sa"),
        col("b.__id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // chunk-vs-chunk candidates (bounded by the boundary — the
    // un-hinted self-join is fine at chunk scale)
    val candShard = bandsChunk.as("a").join(bandsChunk.as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    val sa = sigChunk.select(col("__id").as("id_a"), col("__mh").as("__sa"))
    val sb = sigChunk.select(col("__id").as("id_b"), col("__mh").as("__sb"))
    val cand = candIdx.unionByName(candShard.join(sa, "id_a"))
    cand.join(sb, "id_b")
      .filter(estJaccard(col("__sa"), col("__sb"), k) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
  }

  /** Chunked large-shard serve: id-ordered sub-batches of <= `boundary`
    * docs, served in id order; each already-served chunk's signatures
    * spill to a scratch table so later chunks see them as "indexed"
    * (smaller ids take precedence — exactly the arrival-order
    * contract, applied recursively inside the shard). Every per-chunk
    * dup set is MATERIALIZED before the next chunk spills — a lazy
    * frame re-reading the scratch dir after later appends would flag
    * earlier docs as dups of later ones. Chunk boundaries come from
    * approximate id quantiles: any id-range split preserves the
    * verdicts, quantiles just keep chunks near the boundary size. */
  private def minhashChunkedDups(spark: org.apache.spark.sql.SparkSession,
      idxSig: DataFrame, sig: DataFrame, nShard: Long, boundary: Long,
      threshold: Double, k: Int, bands: Int, idCol: String): DataFrame = {
    val nChunks = math.ceil(nShard.toDouble / boundary).toInt
    val probs = (1 until nChunks).map(_.toDouble / nChunks).toArray
    val cuts = sig.stat.approxQuantile("__id", probs, 0.001)
    val spill = graft.queries.QueryDsl
      .tempDirCleanedOnExit("graft_mhchunk") + "/sigs"
    val spillPath = new org.apache.hadoop.fs.Path(spill)
    val fs = spillPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      var spilled = false
      val perChunk = (0 until nChunks).map { i =>
        val idD = col("__id").cast("double")
        val lohi = (if (i == 0) Nil else Seq(idD > cuts(i - 1))) ++
          (if (i == nChunks - 1) Nil else Seq(idD <= cuts(i)))
        val sigChunk = sig.filter(lohi.reduceOption(_ && _).getOrElse(lit(true)))
        val idxAll =
          if (!spilled) idxSig
          else idxSig.unionByName(spark.read.parquet(spill)
            .select(col("id").as("__id"), col("mh").as("__mh")))
        val d = Lineage.truncate(minhashServePassDups(idxAll, sigChunk,
          bandBuckets(sigChunk, k, bands), threshold, k, bands, idCol))
        if (i < nChunks - 1) {
          sigChunk.select(col("__id").as("id"), col("__mh").as("mh"))
            .write.mode("append").parquet(spill)
          spilled = true
        }
        d
      }
      perChunk.reduce(_.unionByName(_))
    } finally { fs.delete(spillPath, true); () }
  }

  /** SimHash bit width: 60 (the md5-prefix hash supplies 60 bits). */
  val SimHashBits = 60

  /** Folds token hashes into the 60 SimHash bit counters (+1 when the
    * bit is set, -1 otherwise); finish takes the sign. One tight loop
    * per row instead of 60 conditional-sum aggregate columns. */
  private final class SimHashAgg
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Int], Long] {
    import org.apache.spark.sql.Encoder
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    def zero: Array[Int] = new Array[Int](SimHashBits)
    def reduce(b: Array[Int], h: Long): Array[Int] = {
      var i = 0
      while (i < SimHashBits) { b(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1); i += 1 }
      b
    }
    def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < SimHashBits) { a(i) += b(i); i += 1 }
      a
    }
    def finish(r: Array[Int]): Long = {
      var s = 0L; var i = 0
      while (i < SimHashBits) { if (r(i) > 0) s |= 1L << i; i += 1 }
      s
    }
    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
  }

  /** 60-bit SimHash signature: sign of the token-hash bit histogram. */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val sh = udaf(new SimHashAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    Partitioning.spread(
        df.select(col(idCol).as("__id"), col(textCol).as("__text")), col("__id"))
      .select(col("__id"), explode(split(normText(col("__text")), " ")).as("__tok"))
      .withColumn("__h", hash60(col("__tok")))
      .groupBy(col("__id")).agg(sh(col("__h")).as("simhash"))
  }

  /** Near-dup pairs with Hamming(simhash) <= maxDistance, banded into
    * four 15-bit chunks for the candidate join (pigeonhole: d<=3 means
    * at least one chunk is identical). */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxDistance: Int = 3): DataFrame = {
    require(maxDistance <= 3, "banding guarantees recall only for d<=3")
    val sig = simhash(df, textCol, idCol).cache()
    val chunks = (0 until 4).map(i =>
      struct(lit(i).as("band"),
        shiftright(col("simhash"), i * 15).bitwiseAND(lit(0x7FFFL)).as("h")))
    val buckets = sig.select(col("__id"), col("simhash"),
      explode(array(chunks: _*)).as("__b"))
      .select(col("__id"), col("simhash"), col("__b.band"), col("__b.h"))
    val a = buckets.as("a"); val b = buckets.as("b")
    val ham = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
    // hamming filter INSIDE the join condition: candidates from hot
    // 16-bit buckets are rejected during the hash-join probe instead of
    // being materialized, shuffled, and distinct'ed first
    a.join(b, col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
        col("a.__id") < col("b.__id") && ham <= maxDistance)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        ham.as("hamming"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity pairs ≥ threshold, via AllPairs
    * prefix filtering (Bayardo et al., WWW'07): order each doc's grams
    * rarest-first (global document frequency) and keep only the first
    * |A| - ⌈t·|A|⌉ + 1 as the join key — any pair with J ≥ t must share
    * a prefix gram. Joining on the rare prefix grams instead of all
    * grams removes the quadratic blowup on common n-grams; the survivor
    * pairs are verified exactly with array_intersect. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.6, n: Int = 3): DataFrame = {
    // the shingled docs feed THREE consumers (frequency pass, prefix
    // join, exact verify) — persist once instead of re-shingling per
    // branch; spills to disk when the corpus outgrows executor memory.
    // Grams are 64-bit hashes, not strings: the verify-stage
    // array_intersect over longs runs an order of magnitude faster than
    // string-set intersection, and the shuffles carry 8-byte keys.
    val docs = Partitioning.spread(
        df.select(col(idCol).as("__id"), col(textCol).as("__text")), col("__id"))
      .select(col("__id"), ngramHashes(col("__text"), n).as("__g"))
      .filter(size(col("__g")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count() // materializes the cache; picks verify path
    val grams = docs.select(col("__id"), size(col("__g")).as("__sz"),
      explode(col("__g")).as("__gram"))
    val freq = grams.groupBy(col("__gram")).agg(count(lit(1)).as("__df"))
    // Per-doc PPJoin prefix via AGGREGATE instead of a rank window
    // (optimization round 11, guide §2.3/§2.4): the r10 window
    // formulation shuffled every (doc, gram, df) row to its doc
    // partition and SORTED the whole partition before row_number could
    // rank; collect_list+sort_array does the identical (df, gram)
    // ordering per doc inside a hash aggregate — partial map-side
    // combining, no partition-wide sort — and slice() keeps only each
    // doc's prefix (rank <= sz - ceil(t*sz) + 1). Rank semantics are
    // unchanged: grams are distinct within a doc, so the (df, gram)
    // struct order is total and pos+1 equals the old row_number.
    val prefix = grams.join(freq, "__gram")
      .groupBy(col("__id"))
      .agg(max(col("__sz")).as("__sz"),
        sort_array(collect_list(struct(col("__df"), col("__gram")))).as("__gs"))
      .select(col("__id"), col("__sz"),
        posexplode(slice(col("__gs"), lit(1),
          (col("__sz") - ceil(lit(threshold) * col("__sz")) + 1).cast("int"))))
      .select(col("__id"), col("col.__gram").as("__gram"),
        (col("pos") + 1).as("__rank"), col("__sz"))
    // candidate join with the PPJoin length + positional prunes:
    //   length: J >= t forces min(|A|,|B|)/max(|A|,|B|) >= t
    //   position: overlap <= 1 + min(|A|-rankA, |B|-rankB) must reach
    //             ceil(t/(1+t) * (|A|+|B|))
    val reqOverlap = lit(threshold / (1 + threshold)) *
      (col("a.__sz") + col("b.__sz"))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.__gram") === col("b.__gram") && col("a.__id") < col("b.__id") &&
          col("b.__sz") >= lit(threshold) * col("a.__sz") &&
          col("a.__sz") >= lit(threshold) * col("b.__sz") &&
          (lit(1) + least(col("a.__sz") - col("a.__rank"),
            col("b.__sz") - col("b.__rank"))) >= reqOverlap)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    // Output-bounded verify at scale (same shape and boundary as
    // minhashPairs): persist candidates once (without the cache the
    // whole prefix pipeline executes once per broadcast — measured 2.5×
    // wall) and broadcast them into each gram-array stream, joining the
    // slimmed streams on the pair key — the corpus's gram ARRAYS never
    // shuffle (4.7 GB of the pipeline's 5.8 GB total at 500k docs once
    // Catalyst stopped broadcasting cand on its own). Below the
    // boundary the un-hinted single-reference chain is faster.
    val scalePath = nDocs > verifyBroadcastMinDocs(docs.sparkSession)
    val candP =
      if (scalePath) cand.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else cand
    val da = docs.select(col("__id").as("id_a"), col("__g").as("__ga"))
    val db = docs.select(col("__id").as("id_b"), col("__g").as("__gb"))
    val joined =
      if (scalePath)
        da.join(broadcast(candP), Seq("id_a"))
          .join(db.join(broadcast(candP), Seq("id_b")), Seq("id_a", "id_b"))
      else candP.join(da, "id_a").join(db, "id_b")
    val pairs = joined
      .withColumn("__inter", size(array_intersect(col("__ga"), col("__gb"))).cast("long"))
      .withColumn("jaccard",
        col("__inter").cast("double") /
          (size(col("__ga")) + size(col("__gb")) - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    // The pairs result (proportional to the duplicate count, not the
    // corpus) is materialized eagerly so the shingle cache can be
    // released NOW instead of leaking one MEMORY_AND_DISK corpus per
    // call for the life of the session. Lineage.truncate cuts the
    // lineage (so `docs` is no longer referenced) and its blocks are
    // reclaimed by the ContextCleaner once the returned frame is GC'd —
    // unlike persist(), which pins until an explicit unpersist.
    val out = Lineage.truncate(pairs)
    docs.unpersist()
    if (scalePath) candP.unpersist()
    out
  }

  /** Embedding near-dup pairs: random-hyperplane LSH prefilter + exact
    * cosine verify. Hyperplanes are seeded-deterministic.
    *
    * 60 sign bits banded into 4 × 15-bit chunks: 32k buckets per band
    * keeps bucket populations ~n/32k, so the candidate join stays near
    * the true-near-dup output size instead of degrading toward n²/buckets
    * (which a 4-bit band does on a clustered corpus). Pairs are
    * deduplicated across bands BEFORE the cosine verify, and the
    * vectors are joined back only for surviving candidates. */
  /** Exact brute-force cosine pairs — the O(n²) baseline the LSH path
    * ([[embeddingCosinePairs]]) approximates. Correct at any threshold
    * (LSH recall collapses below ~0.8 similarity); quadratic in rows,
    * so at scale partition one side and broadcast the other in blocks. */
  def embeddingCosinePairsExact(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val a = v.select(col("__id").as("id_a"), col("__v").as("__va"))
    val b = v.select(col("__id").as("id_b"), col("__v").as("__vb"))
    val cosSim = lit(1.0) - graft.functions.VectorFunctions
      .vecCosDistance(col("__va"), col("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosSim)
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  def embeddingCosinePairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, planes: Int = 60, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    require(planes % 4 == 0)
    val bandBits = planes / 4
    val sigCol = Similarity.hyperplaneSignature(col(vecCol), planes, dim, seed)
    val sig = df.select(col(idCol).as("__id"), col(vecCol).as("__v"), sigCol.as("__sig"))
    val chunks = (0 until 4).map(i =>
      struct(lit(i).as("band"),
        shiftright(col("__sig"), i * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("h")))
    val buckets = sig.select(col("__id"), explode(array(chunks: _*)).as("__b"))
      .select(col("__id"), col("__b.band"), col("__b.h"))
    val a = buckets.as("a"); val b = buckets.as("b")
    val cand = a.join(b, col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    val va = sig.select(col("__id").as("id_a"), col("__v").as("__va"))
    val vb = sig.select(col("__id").as("id_b"), col("__v").as("__vb"))
    val cosSim = lit(1.0) - graft.functions.VectorFunctions
      .vecCosDistance(col("__va"), col("__vb"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("cos_sim", cosSim)
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Cross-document line dedup (the RefinedWeb/CCNet boilerplate
    * remover): a line whose exact text occurs >= minRepeats times
    * corpus-wide is removed from EVERY document — navigation chrome,
    * footers, cookie banners. Returns (id, n_lines, n_kept, cleaned)
    * with the surviving lines rejoined in original order (null cleaned
    * when nothing survives).
    *
    * Line TEXT never shuffles, and nothing keys on the line value at
    * row granularity — the natural skew of this operator's own target
    * (a footer in 100M documents) would make a line-partitioned window
    * or join one hot task. Instead: (1) per-line DOCUMENT frequencies
    * by map-combined distinct aggregation over (hash, doc) pairs (the
    * hot line arrives pre-deduped per partition); (2) the >= minRepeats
    * survivors — boilerplate-sized by
    * nature — join back into the hash stream (AQE broadcasts them at
    * runtime; a pathologically large set falls back to a skew-split
    * SMJ on 8-byte rows); (3) per-document drop-sets of hashes, a
    * doc-count-sized shuffle; (4) the cleaned text is rebuilt IN PLACE
    * on the original row by an array filter against the doc's drop-set
    * — order preserved for free, no rebuild shuffle. Costs one extra
    * corpus scan vs a line-windowed formulation; buys zero hot
    * partitions. When boilerplate is widespread the per-doc drop table
    * outgrows the broadcast threshold and the final join shuffles the
    * corpus ONCE by doc id — linear and skew-free (ids are unique);
    * measured at 500k docs with a footer in 2/3 of them: 219 MB, one
    * flat stage, vs the windowed form's two line-text shuffles with the
    * footer concentrated in one task. Hash equality stands in for
    * string equality (2^-64 collisions), same adjudication as the
    * ngram oracle. */
  def dedupLinesAcrossDocs(df: DataFrame, textCol: String, idCol: String,
      minRepeats: Int = 2): DataFrame = {
    def linesOf(c: Column): Column =
      filter(transform(split(c, "\n"), l => trim(l)), l => length(l) > 0)
    val hashes = df.select(col(idCol).as("__id"),
      explode(linesOf(col(textCol))).as("__line"))
      .select(col("__id"), xxhash64(col("__line")).as("__h"))
    // cross-DOCUMENT frequency (countDistinct doc id), the RefinedWeb/
    // CCNet semantics: a line repeated only within one document is NOT
    // boilerplate. The distinct agg still keys on 8-byte hashes — the
    // extra expand/shuffle carries (hash, id) pairs, never line text.
    val repeated = hashes.groupBy(col("__h"))
      .agg(countDistinct(col("__id")).as("__c"))
      .filter(col("__c") >= minRepeats)
      .select(col("__h"))
    val dropsPerDoc = hashes.join(repeated, "__h")
      .groupBy(col("__id"))
      .agg(collect_set(col("__h")).as("__drop"))
    df.select(col(idCol), linesOf(col(textCol)).as("__ls"))
      .join(dropsPerDoc.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("__ls"),
        filter(col("__ls"), l => !coalesce(
          array_contains(col("__drop"), xxhash64(l)), lit(false))).as("__k"))
      .select(col(idCol),
        size(col("__ls")).cast("long").as("n_lines"),
        size(col("__k")).cast("long").as("n_kept"),
        when(size(col("__k")) > 0, array_join(col("__k"), "\n"))
          .otherwise(lit(null)).as("cleaned"))
  }

  /** Cross-document repeated-substring removal (the ExactSubstr pass of
    * Lee et al. 2022, arXiv:2107.06499, at word granularity): every
    * span of ≥ n consecutive words that appears in ≥ minDocs DISTINCT
    * documents is removed from every document (the remove-all-copies
    * policy, matching [[dedupLinesAcrossDocs]]; see
    * [[dedupSubstringsKeepOne]] for the keep-one-canonical policy Lee
    * et al. actually apply — remove-all deletes the content from the
    * corpus entirely, keep-one retains the earliest occurrence). A
    * span repeats iff
    * every one of its n-word windows repeats, so word positions covered
    * by any repeated window are exactly the repeated spans — no suffix
    * array needed.
    *
    * Scale shape (same grammar as the boilerplate op): window HASHES
    * shuffle — (doc, start, hash64) rows, linear in corpus words —
    * while the text never keys a row-granular stage; document
    * frequencies come from a map-side-combined distinct aggregate on
    * 8-byte hashes; per-doc drop-lists are doc-keyed; the rebuild is an
    * in-place array filter against the doc's own drop-list (kept-word
    * order free). Hash equality stands in for string equality (2^-64),
    * the standing adjudication. Returns (idCol, n_words, n_kept,
    * cleaned). */
  def dedupSubstrings(df: DataFrame, textCol: String, idCol: String,
      n: Int, minDocs: Int = 2): DataFrame =
    dedupSubstringsImpl(df, textCol, idCol, n, minDocs, keepOne = false)

  /** Keep-one-copy variant of [[dedupSubstrings]] — the policy Lee et
    * al. 2022 (arXiv:2107.06499 §4.2) actually apply in production
    * dedup runs: one CANONICAL occurrence of each repeated span
    * survives so the content itself stays in the corpus, while every
    * other occurrence is removed. ([[dedupSubstrings]] implements the
    * remove-all-copies policy; this one contrasts it.)
    *
    * Canonical occurrence of a window hash = the minimum (doc, start)
    * pair, packed into one long (`id * 2^31 + start` — exact while
    * id < 2^32 and start < 2^31, i.e. any in-memory document), so the
    * choice is a plain map-side-combined `min` that an external SQL
    * oracle replicates bit-for-bit. A position is removed iff some
    * NON-canonical repeated-window occurrence covers it — in the
    * canonical document the span's own windows are canonical, so the
    * earliest document keeps the span verbatim.
    *
    * Scale shape identical to [[dedupSubstrings]]: only (doc, start,
    * hash64) rows shuffle; the canonical pick rides the same hash-keyed
    * aggregate that computes document frequency. */
  def dedupSubstringsKeepOne(df: DataFrame, textCol: String, idCol: String,
      n: Int, minDocs: Int = 2): DataFrame =
    dedupSubstringsImpl(df, textCol, idCol, n, minDocs, keepOne = true)

  /** 64-bit word hash for the ExactSubstr window keys: FNV-1a over the
    * UTF-16 chars + a murmur3 fmix64 avalanche. Hash equality stands in
    * for string equality (the standing 2^-64 adjudication — the oracle
    * groups windows by STRING, so the hash function is engine-internal
    * and only its collision-freedom matters). */
  private def substrWordHash(s: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001B3L; i += 1 }
    // fmix64
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33; h
  }

  /** (start, windowHash) pairs of every n-word window, one linear pass
    * (optimization round 10): hash each word once, then roll a degree-
    * (n-1) polynomial in the 2^64 ring across the window — O(words)
    * multiply-adds, where the previous Column formulation built and
    * xxhashed an n-word STRING per window (O(words · n · wordlen) —
    * the dominant CPU of both ExactSubstr passes, paid twice since the
    * window table is deliberately recomputed rather than persisted). */
  private def substrWindows(n: Int): Column => Column = {
    val f = udf { (ws: Seq[String]) =>
      val len = ws.length
      val m = len - n + 1
      if (m <= 0) Array.empty[(Int, Long)]
      else {
        val C = 0x9E3779B97F4A7C15L // odd -> multiplication invertible mod 2^64
        val wh = new Array[Long](len)
        var i = 0
        while (i < len) { wh(i) = substrWordHash(ws(i)); i += 1 }
        var pow = 1L // C^(n-1)
        var k = 1
        while (k < n) { pow *= C; k += 1 }
        val out = new Array[(Int, Long)](m)
        var h = 0L
        k = 0
        while (k < n) { h = h * C + wh(k); k += 1 }
        out(0) = (0, h)
        var s = 1
        while (s < m) {
          h = (h - wh(s - 1) * pow) * C + wh(s + n - 1)
          out(s) = (s, h)
          s += 1
        }
        out
      }
    }.asNondeterministic() // deterministic in fact; blocks re-inlining
    c => f(c)
  }

  /** Distinct, ascending 64-bit hashes of a text's n-word shingles in
    * ONE pass (optimization round 10): per-word FNV+fmix hashes rolled
    * into a degree-(n-1) polynomial per window — replacing the
    * shingle-STRING construction + per-gram xxhash64 (O(words·n·len)
    * string building per doc; this is O(words) after word hashing).
    * Tokenization is [[shingles]]'s exactly (trim.toLowerCase.split).
    * Used by the n-gram Jaccard and decontamination ops, whose oracles
    * group grams by STRING — the hash is engine-internal, same 2^-64
    * collision adjudication as before (words carry no whitespace, so
    * word-wise equality == joined-string equality). */
  def ngramHashes(c: Column, n: Int): Column = {
    val f = udf { (text: String) =>
      if (text == null) Array.empty[Long]
      else {
        val words = text.trim.toLowerCase.split("\\s+")
        val m = words.length - n + 1
        if (m <= 0) Array.empty[Long]
        else {
          val C = 0x9E3779B97F4A7C15L
          val wh = new Array[Long](words.length)
          var i = 0
          while (i < words.length) { wh(i) = substrWordHash(words(i)); i += 1 }
          var pow = 1L
          var k = 1
          while (k < n) { pow *= C; k += 1 }
          val out = new scala.collection.mutable.TreeSet[Long]()
          var h = 0L
          k = 0
          while (k < n) { h = h * C + wh(k); k += 1 }
          out += h
          var s = 1
          while (s < m) {
            h = (h - wh(s - 1) * pow) * C + wh(s + n - 1)
            out += h
            s += 1
          }
          out.toArray
        }
      }
    }.asNondeterministic() // deterministic in fact; blocks re-inlining
    f(c)
  }

  /** Shared core of the two ExactSubstr policies — identical window
    * hashing, frequency aggregate and rebuild; they differ only in
    * whether each repeated window's canonical occurrence (min packed
    * (doc, start)) is exempt from coverage. */
  private def dedupSubstringsImpl(df: DataFrame, textCol: String,
      idCol: String, n: Int, minDocs: Int, keepOne: Boolean): DataFrame = {
    def wordsOf(c: Column): Column =
      filter(split(trim(coalesce(c, lit(""))), "\\s+"), w => length(w) > 0)
    val docs = df.select(col(idCol).as("__id"), wordsOf(col(textCol)).as("__ws"))
    val winsOf = substrWindows(n)
    val wins = docs.filter(size(col("__ws")) >= n)
      .select(col("__id"), explode(winsOf(col("__ws"))).as("__w"))
      .select(col("__id"), col("__w._1").as("__s"), col("__w._2").as("__h"))
    val packed = col("__id") * lit(1L << 31) + col("__s")
    val repeated = wins.groupBy(col("__h"))
      .agg(countDistinct(col("__id")).as("__c"),
        (if (keepOne) min(packed) else lit(null)).as("__canon"))
      .filter(col("__c") >= minDocs)
      .select(col("__h"), col("__canon"))
    val occurrences = wins.join(repeated, "__h")
    val dropStarts =
      (if (keepOne) occurrences.filter(packed =!= col("__canon"))
       else occurrences)
        .groupBy(col("__id"))
        .agg(collect_set(col("__s")).as("__drop"))
    docs.join(dropStarts, Seq("__id"), "left")
      .select(col("__id"),
        col("__ws"),
        filter(col("__ws"), (_, i) => coalesce(
          !exists(col("__drop"), s => i >= s && i <= s + (n - 1)),
          lit(true))).as("__k"))
      .select(col("__id").as(idCol),
        size(col("__ws")).cast("long").as("n_words"),
        size(col("__k")).cast("long").as("n_kept"),
        when(size(col("__k")) > 0, array_join(col("__k"), " "))
          .otherwise(lit(null)).as("cleaned"))
  }

  /** Benchmark decontamination (GPT-3 Appendix C / PaLM style): flag
    * every training document sharing at least one word n-gram with the
    * probe (evaluation) set. The probe gram set is small by nature —
    * distinct + broadcast into the corpus gram stream, so the corpus
    * never shuffles. Returns (id, n_hits, contaminated). */
  def contaminatedDocs(df: DataFrame, textCol: String, idCol: String,
      probes: DataFrame, probeTextCol: String, n: Int): DataFrame = {
    val probeGrams = probes
      .select(explode(ngramHashes(col(probeTextCol), n)).as("__h"))
      .distinct()
    // ngramHashes() already dedups per doc — no array_distinct
    val docGrams = df.select(col(idCol).as("__id"),
        explode_outer(ngramHashes(col(textCol), n)).as("__h"))
    docGrams
      .join(broadcast(probeGrams).withColumn("__hit", lit(1)), Seq("__h"), "left")
      .groupBy(col("__id").as(idCol))
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** Connected components over an undirected near-dup pair list — the
    * step that turns any pair-producing dedup op into a keep/drop
    * decision (one canonical doc per duplicate cluster).
    *
    * Hook-and-compress (Shiloach–Vishkin shape; same O(log d) round
    * bound as Kiveris et al.'s alternating large-star/small-star, on
    * the same linear shuffle): each outer pass HOOKS every node to the
    * minimum label in its closed neighborhood — comp(v) ← min(comp(v),
    * min over neighbors comp(u)) — then FULLY COMPRESSES the label
    * forest by pointer doubling (comp(v) ← comp(comp(v)) until depth
    * ≤ 1, label-table-sized self-joins only, the edge list untouched).
    * Compression makes each hook pass propagate across an entire tree
    * instead of one hop, so a diameter-d chain converges in O(log d)
    * edge passes where plain min-label needed d+1 — the pathological
    * 16-chain probe dropped from 17 edge passes to 2 (plus 4 cheap
    * label-sized jumps). Micro-cluster graphs (the realistic near-dup
    * shape, diameter 1–2) converge in 2 hook passes either way, and
    * pay only one no-change jump check extra.
    *
    * Scale shape: the edge list is hash-partitioned ONCE on the join
    * key and persisted, so each hook pass shuffles only the label table
    * (|V| rows); the per-neighbor mins combine map-side. Every
    * convergence check collects one changed-count (model-state-sized).
    * Lineage is truncated per materialization via [[Lineage.truncate]]
    * — set `graft.checkpoint.dir` for the fault-tolerant variant on a
    * real cluster. Throws if maxIters hook passes don't converge (with
    * compression that bounds diameter ≥ 2^maxIters — not a dedup pair
    * list). Returns (id, comp) for every id appearing in `pairs`; comp
    * is the smallest id in the component.
    *
    * Correctness of the stop rule: a hook pass with zero changes means
    * comp(v) ≤ comp(u) for every edge (u,v) in both directions, i.e.
    * comp is constant on each component; comp(v) is always an id inside
    * v's component and ≤ v (monotone min of ids), so the constant is
    * the component minimum. */
  /** Components of a pair list that is expected to be a DISJOINT STAR
    * FOREST — the shape every bucket-min canonicalization emits
    * (id_a = the bucket minimum, id_b = each other member, buckets
    * disjoint). Such a label forest is already depth 1, so the generic
    * hook-and-compress loop's edge persist + init + 2 hook passes + a
    * jump check (~5 materializations) collapse to: the pair list IS
    * the label table.
    *
    * The shape is VERIFIED, not trusted — one linear pass over the
    * (persisted) pair list checks all three properties at once:
    * (1) every id_b occurs exactly once, (2) every pair has
    * id_a < id_b, (3) no id appears on both sides (a bridge would
    * stitch two stars into one component the fast path can't see).
    * Any violation falls back to [[connectedComponents]], so callers
    * may use this whenever pairs are PROBABLY star-shaped; the check
    * costs one label-sized job vs the loop's several.
    * Output contract matches [[connectedComponents]] exactly:
    * (id, comp) for every id in `pairs`, comp = component minimum. */
  def starComponents(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val p = pairs.select(col(aCol).as("__a"), col(bCol).as("__b")).persist()
    try {
      // ONE aggregation job verifies all three star-forest properties
      // (r10 optimization — previously a groupBy job plus a semi-join
      // job): explode each pair into (id, side) occurrences and check
      // per id that it is never a duplicated/unordered leaf and never
      // on both sides (a bridge).
      val occ = p.select(explode(array(
          struct(col("__a").as("__id"), lit(0).as("__leaf"),
            lit(0).as("__ge")),
          struct(col("__b").as("__id"), lit(1).as("__leaf"),
            when(col("__a") >= col("__b"), 1).otherwise(0).as("__ge"))))
          .as("__o"))
        .select(col("__o.__id"), col("__o.__leaf"), col("__o.__ge"))
      val notStar = !occ.groupBy(col("__id"))
        .agg(sum(col("__leaf")).as("__nb"),
          max(col("__leaf")).as("__anyB"), min(col("__leaf")).as("__allB"),
          max(col("__ge")).as("__geMax"))
        .filter(col("__nb") > 1 || col("__geMax") === 1 ||
          (col("__anyB") === 1 && col("__allB") === 0))
        .isEmpty
      if (notStar) {
        connectedComponents(pairs, aCol, bCol)
      } else {
        // depth-1 forest: leaves point at their center, centers at
        // themselves; truncate so the result outlives the unpersist
        Lineage.truncate(
          p.select(col("__b").as("id"), col("__a").as("comp"))
            .unionByName(
              p.select(col("__a").as("id"), col("__a").as("comp")).distinct()))
      }
    } finally { p.unpersist(); () }
  }

  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col(aCol).as("__s"), col(bCol).as("__t"))
      .union(pairs.select(col(bCol).as("__s"), col(aCol).as("__t")))
      .distinct()
      .repartition(col("__t")) // hook joins reuse this partitioning
      .persist()
    try {
    // Round structure (r10 optimization — the label table is small, so
    // each MATERIALIZATION costs a whole Spark job; the round fusions
    // below halve the job count of the realistic diameter-1..3 graphs
    // with verdicts unchanged, CcSpec/probes pinned):
    //  - init+hook fused: identity labels make the first hook's
    //    neighbor labels just the neighbor IDS, so round 1 is one
    //    aggregation over the edge list — no separate identity-label
    //    materialization, no join;
    //  - hook+jump fused: each round materializes hook + ONE
    //    pointer-doubling jump in a single job (two observe() metrics
    //    on one plan; the label-sized hook subtree evaluates twice
    //    inside the job — cheaper than a second job). Deeper forests
    //    keep jumping in plain follow-up passes, so the O(log d)
    //    convergence bound is unchanged.
    // Changed-counts ride the SAME job via observe() — a separate
    // count() per pass doubled the job count at the 10M-edge probe.
    def jumpOf(hooked: DataFrame, obs: org.apache.spark.sql.Observation)
        : DataFrame =
      // compress: pointer-double — every comp value is itself a
      // labeled id (labels start as ids and evolve by min over label
      // values), so the self-join is total; a depth-1 forest converges
      // with one no-change jump.
      // NOTE on metrics across the duplicated subtree: `hooked` carries
      // its caller's CollectMetrics node, and the self-join below makes
      // that subtree appear on BOTH join branches. The metric is safe
      // ONLY because it is consumed as a zero/non-zero convergence
      // signal — each CollectMetricsExec instance still sees the full
      // row stream — never as a magnitude.
      hooked.as("l")
        .join(hooked.select(col("id").as("__jid"), col("comp").as("__jc")),
          col("comp") === col("__jid"))
        .select(col("id"), col("comp").as("__old"), col("__jc").as("comp"))
        .observe(obs,
          coalesce(sum(when(col("comp") < col("__old"), 1L).otherwise(0L)),
            lit(0L)).as("changed"))
        .select(col("id"), col("comp"))
    def changedMetric(obs: org.apache.spark.sql.Observation): Long =
      obs.get("changed").asInstanceOf[Long]
    var labels: DataFrame = null
    var hookChanged = 1L
    var it = 0
    while (hookChanged > 0 && it <= maxIters) {
      val hookObs = org.apache.spark.sql.Observation()
      val jumpObs = org.apache.spark.sql.Observation()
      // hook: min label over the closed neighborhood. __old is
      // projected away before the jump so the transient comparison
      // column never rides into the checkpoint (a third more bytes at
      // the 100M-edge probe otherwise).
      val hooked0 =
        if (labels == null)
          // round 1 on identity labels: neighbor label == neighbor id
          edges.groupBy(col("__s").as("id")).agg(min(col("__t")).as("__nc"))
            .select(col("id"), col("id").as("__old"),
              least(col("id"), col("__nc")).as("comp"))
        else {
          val nbrMin = edges
            .join(labels.select(col("id").as("__t"), col("comp").as("__tc")),
              "__t")
            .groupBy(col("__s").as("id"))
            .agg(min(col("__tc")).as("__nc"))
          labels.join(nbrMin, Seq("id"), "left")
            .select(col("id"), col("comp").as("__old"),
              least(col("comp"), coalesce(col("__nc"), col("comp"))).as("comp"))
        }
      // observe on ONE branch only — the same CollectMetrics node on
      // both sides of the self-join would be a duplicate-metric error
      val hooked = hooked0.observe(hookObs,
        coalesce(sum(when(col("comp") < col("__old"), 1L).otherwise(0L)),
          lit(0L)).as("changed"))
        .select(col("id"), col("comp"))
      // BISECT TOGGLE: materialize-then-jump (r9 shape)
      labels = Lineage.truncate(hooked)
      val jumped = jumpOf(labels, jumpObs)
      labels = Lineage.truncate(jumped)
      // evidence hook (set session conf graft.cc.plandump to a file
      // path): the fused hook+jump round's EXECUTED plan — this is how
      // the exchange-reuse claim below is demonstrated (the subtree is
      // otherwise invisible behind the eager checkpoint). Scale safety
      // of the fusion rests on the hook aggregation's exchange being
      // consumed as a ReusedExchange/stage-cache hit on the second join
      // branch, so the edge-sized part of the hook runs once per round.
      if (it == 0)
        pairs.sparkSession.conf.getOption("graft.cc.plandump").foreach { f =>
          val w = new java.io.PrintWriter(f)
          try w.write(jumped.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          finally w.close()
        }
      hookChanged = changedMetric(hookObs)
      var jumping = changedMetric(jumpObs) > 0
      while (jumping) {
        val obs = org.apache.spark.sql.Observation()
        labels = Lineage.truncate(jumpOf(labels, obs))
        jumping = changedMetric(obs) > 0
      }
      it += 1
    }
    require(hookChanged == 0L,
      s"connectedComponents: no convergence after $maxIters passes")
    labels
    } finally edges.unpersist()
  }
}
