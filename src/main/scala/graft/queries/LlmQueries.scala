package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.functions.TextAnalysis
import graft.multimodal.Multimodal
import QueryDsl._

/** Training-data pipeline operators on documents/embeddings (the LLM
  * extension surface). Exact dedup, text stats and brute-force ANN have
  * DuckDB oracles; MinHash/SimHash/LSH are pinned by DedupSpec.
  */
object LlmQueries {

  val queries: Map[String, Q] = Map(
    "dedup_exact" -> ((s, d) => {
      Dedup.exact(T(s, d, "documents"), "text", "doc_id")
        .groupBy(col("is_dup")).agg(count(lit(1)).as("n"))
        .orderBy(col("is_dup"))
    }),

    "dedup_minhash" -> ((s, d) => {
      Dedup.minhashPairs(T(s, d, "documents"), "text", "doc_id", threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dedup_simhash" -> ((s, d) => {
      Dedup.simhashPairs(T(s, d, "documents"), "text", "doc_id", maxDistance = 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dedup_ngram_jaccard" -> ((s, d) => {
      Dedup.ngramJaccardPairs(T(s, d, "documents"), "text", "doc_id",
        threshold = 0.4, n = 3)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // exact brute-force pairs at 0.45 (the synthetic embeddings have no
    // >0.8 near-dups; LSH at high threshold stays covered by similarity_lsh)
    "dedup_embedding" -> ((s, d) => {
      Dedup.embeddingCosinePairsExact(T(s, d, "embeddings"), "embedding", "vec_id",
        threshold = 0.45)
        .select(col("id_a"), col("id_b"), round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "similarity_topk" -> ((s, d) => {
      val emb = T(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.bruteForceTopKBatch(emb, "embedding", "vec_id",
        queries, "q_vec", "q_id", k = 10)
        .select(col("q_id"), col("vec_id"), round(col("cos_sim"), 6).as("cos_sim"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("q_id"), col("rank"))
    }),

    "similarity_lsh" -> ((s, d) => {
      // approximate path: rows-only (recall depends on LSH buckets)
      val emb = T(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.lshTopK(emb, "embedding", "vec_id",
        queries, "q_vec", "q_id", k = 10, maxFlips = 8)
        .select(col("q_id"), col("vec_id"), round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("q_id"), col("cos_sim").desc, col("vec_id"))
    }),

    "text_stats" -> ((s, d) => {
      T(s, d, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.subwordCount(col("text")).as("n_subwords"),
        round(TextAnalysis.punctRatio(col("text")), 6).as("punct_ratio"),
        round(TextAnalysis.stopwordRatio(col("text")), 6).as("stopword_ratio"),
        round(TextAnalysis.meanWordLength(col("text")), 6).as("mean_word_len"))
        .orderBy(col("doc_id"))
    }),

    "text_quality_langid" -> ((s, d) => {
      // langid heuristic + quality score: rows-only (UDF heuristics)
      T(s, d, "documents").select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    "multimodal_pipeline" -> ((s, d) => {
      // schema/batching plumbing smoke: decode-stub features + frame
      // sampling (id filter, not limit: limit order is not deterministic)
      val assets = Multimodal.syntheticAssets(s,
        T(s, d, "events").filter(col("event_id") < 3000))
      val feats = Multimodal.extractFeatures(Multimodal.resize(assets, 256, 256))
      val frames = Multimodal.frameSample(feats, 5000L)
      frames.groupBy(col("modality"))
        .agg(count(lit(1)).as("n_frames"),
          round(sum(graft.functions.VectorFunctions.vecElemSum(col("features"))), 4)
            .as("feat_sum"),
          max(col("meta.width")).cast("long").as("max_w"))
        .orderBy(col("modality"))
    })
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """WITH ranked AS (
           SELECT row_number() OVER (
             PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
             ORDER BY doc_id) AS rn
           FROM documents)
         SELECT rn > 1 AS is_dup, COUNT(*) AS n FROM ranked
         GROUP BY is_dup ORDER BY is_dup""",

    // exact word-3-gram Jaccard >= 0.4 (the PPJoin prunes in
    // Dedup.ngramJaccardPairs are lossless, so ground truth must match)
    "dedup_ngram_jaccard" ->
      """WITH w AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
           FROM documents),
         wi AS (
           SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i
           FROM w WHERE len(ws) >= 3),
         g AS (
           SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
           FROM wi),
         sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b,
           round(c / CAST(sa.n + sb.n - c AS DOUBLE), 4) AS jaccard
         FROM inter
         JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
         WHERE c / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.4
         ORDER BY id_a, id_b""",

    // exact cosine pairs, mirrored by list_cosine_similarity in double
    "dedup_embedding" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])) >= 0.45
         ORDER BY id_a, id_b""",

    "similarity_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5)
         SELECT q_id, vec_id, round(cos_sim, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank FROM (
           SELECT q.q_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.q_vec AS DOUBLE[])) AS cos_sim,
             row_number() OVER (PARTITION BY q.q_id
               ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.q_vec AS DOUBLE[])) DESC,
                        e.vec_id) AS rank
           FROM embeddings e CROSS JOIN q) t
         WHERE rank <= 10 ORDER BY q_id, rank""",

    "text_stats" ->
      """SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
           CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
                w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords,
           round(CASE WHEN length(regexp_replace(text, '\s', '', 'g')) = 0 THEN 0.0
             ELSE (length(regexp_replace(text, '\s', '', 'g'))
                 - length(regexp_replace(regexp_replace(text, '\s', '', 'g'), '[[:punct:]]', '', 'g')))
                / CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) END, 6) AS punct_ratio,
           round(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
               t -> list_contains(['the','a','an','of','to','in','and','is','it','that','for','on','with','as','was','at','by'], t)))
             / CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE), 6) AS stopword_ratio,
           round(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
               w -> length(w))) / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 6) AS mean_word_len
         FROM documents ORDER BY doc_id""",

    // the decode stub is deterministic arithmetic over sha256(event_id),
    // so the whole pipeline (modality routing, resize clamp, 5s frame
    // sampling, feature fold) has exact ground truth. FLOAT casts mirror
    // the float32 steps in Multimodal.fakeDecode.
    "multimodal_pipeline" ->
      """WITH a AS (
           SELECT event_id,
             sha256(CAST(event_id AS VARCHAR)) AS h,
             (event_id % 30000 + 1000) // 5000 + 1 AS n_fr,
             LEAST(CAST(event_id % 640 + 32 AS INT), 256) AS w
           FROM events WHERE event_id < 3000 AND event_id % 3 = 2),
         f AS (
           SELECT event_id, SUM(CAST(
               CAST(CAST('0x' || substr(h, 2*i + 1, 2) AS INT) AS FLOAT)
                 / CAST(255.0 AS FLOAT)
               + CAST(i % 7 AS FLOAT) * CAST(0.01 AS FLOAT) AS DOUBLE)) AS es
           FROM a CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i) t
           GROUP BY 1)
         SELECT 'video' AS modality, CAST(SUM(n_fr) AS BIGINT) AS n_frames,
           round(SUM(n_fr * es), 4) AS feat_sum, CAST(MAX(w) AS BIGINT) AS max_w
         FROM a JOIN f USING (event_id)"""
  )
}
