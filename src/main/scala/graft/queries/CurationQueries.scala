package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{C4Clean, GopherQuality, PiiFunctions, TextAnalysis, TextRepetition}
import graft.operators.{Clustering, Dedup, Sampling, TfIdf}
import QueryDsl._

/** Corpus-curation operators for training-data pipelines: Gopher-style
  * repetition quality filters, PII detection/redaction, TF-IDF keyword
  * extraction, distributed k-means over embeddings, and SemDeDup
  * semantic dedup (cluster-then-pair-within). Every entry has
  * a full DuckDB oracle — the repetition and PII paths are exact
  * integer/regex arithmetic, tf·idf pins tf/df integers alongside the
  * score, and k-means runs in quantized integer space so the oracle
  * replays the complete Lloyd iteration history bit-for-bit.
  */
object CurationQueries {

  val queries: Map[String, Q] = Map(
    // Gopher repetition filters (Rae et al. 2021 Table A1). Docs with
    // doc_id%7=0 are self-concatenated so the duplicate-gram metrics
    // exercise their nonzero range; 2-word re-lining gives the line
    // metrics a defined meaning on this single-line corpus.
    "text_repetition" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val t = when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" "), col("text"))).otherwise(col("text"))
      docs
        .select(col("doc_id"),
          TextRepetition.repetitionStats(TextRepetition.relinear(2)(t)).as("r"))
        .select(col("doc_id"),
          col("r.n_lines").cast("long").as("n_lines"),
          round(col("r.dup_line_frac"), 6).as("dup_line_frac"),
          round(col("r.dup_line_char_frac"), 6).as("dup_line_char_frac"),
          round(col("r.top2gram_char_frac"), 6).as("top2_frac"),
          round(col("r.top3gram_char_frac"), 6).as("top3_frac"),
          round(col("r.top4gram_char_frac"), 6).as("top4_frac"),
          round(col("r.dup5gram_char_frac"), 6).as("dup5_frac"))
        .orderBy(col("doc_id"))
    }),

    // PII scrub: deterministic planted email/IPv4/phone on doc_id%4=0
    // rows (the corpus itself is PII-free word soup), counts + the md5
    // of the redacted text so the oracle pins the full replace output.
    "text_pii_redact" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val planted = when(col("doc_id") % 4 === 0,
        concat(col("text"),
          lit(" reach user"), col("doc_id").cast("string"),
          lit("@example.com or 10.1."), (col("doc_id") % 200).cast("string"),
          lit(".7 tel (555) 123-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(col("text"))
      docs.select(col("doc_id"),
        PiiFunctions.emailCount(planted).cast("long").as("n_email"),
        PiiFunctions.ipv4Count(planted).cast("long").as("n_ipv4"),
        PiiFunctions.phoneCount(planted).cast("long").as("n_phone"),
        md5(PiiFunctions.redact(planted)).as("redacted_md5"))
        .orderBy(col("doc_id"))
    }),

    "text_tfidf" -> ((s, d) =>
      TfIdf.topTerms(T(s, d, "documents"), "doc_id", "text", k = 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
          round(col("score"), 4).as("score"))
        .orderBy(col("doc_id"), col("rank"))),

    // k=10 (the corpus plants 10 label clusters), 3 assignment passes;
    // output pins per-cluster membership mass (size, id-sum, label-sum)
    // and the exact quantized inertia.
    "cluster_kmeans" -> ((s, d) => {
      Clustering
        .kmeansQuantized(T(s, d, "embeddings"), "embedding", "vec_id",
          k = 10, iters = 3)
        .groupBy(col("cluster").cast("long").as("cluster"))
        .agg(count(lit(1)).as("n"),
          sum(col("vec_id")).as("sum_id"),
          sum(col("label").cast("long")).as("sum_label"),
          sum(col("distq")).as("inertia_q"))
        .orderBy(col("cluster"))
    }),

    // Gopher Table A1 composite verdict. Same doc_id%7 self-concat as
    // text_repetition so pass_repetition exercises both branches; the
    // word-soup corpus carries only 'the' from Gopher's required-word
    // list, so stop words are planted on a doc_id%3 schedule (0/1/2/3
    // hits ≈ 41/158/134/167 at sf0.01) — the established planted-PII
    // pattern, keeping every rule's both branches reachable.
    "text_gopher_quality" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val t = concat(
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" "), col("text"))).otherwise(col("text")),
        when(col("doc_id") % 3 === 0, lit(" of the and"))
          .when(col("doc_id") % 3 === 1, lit(" to")).otherwise(lit("")))
      docs.select(col("doc_id"), GopherQuality.flags(t).as("g"))
        .select(col("doc_id"),
          col("g.n_words").as("n_words"),
          round(col("g.mean_word_len"), 6).as("mean_wl"),
          col("g.stop_hits").as("stop_hits"),
          col("g.pass_words").as("pass_words"),
          col("g.pass_mean_wl").as("pass_mean_wl"),
          col("g.pass_symbols").as("pass_symbols"),
          col("g.pass_lines").as("pass_lines"),
          col("g.pass_alpha").as("pass_alpha"),
          col("g.pass_stops").as("pass_stops"),
          col("g.pass_repetition").as("pass_repetition"),
          col("g.keep").as("keep"))
        .orderBy(col("doc_id"))
    }),

    // C4 line/page cleaning. The soup corpus has no line structure or
    // punctuation, so the query plants a deterministic shape first:
    // 10-word lines (relinear), terminal '.' on lines whose char length
    // isn't divisible by 3, 'javascript' substituted for 'query' on
    // doc_id%11, a curly brace on %13, a lorem-ipsum line on %17 —
    // every rule's both branches fire.
    "text_c4_clean" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val t1 = when(col("doc_id") % 11 === 0,
        regexp_replace(col("text"), "\\bquery\\b", "javascript"))
        .otherwise(col("text"))
      val lined = TextRepetition.relinear(10)(t1)
      val punct = array_join(transform(split(lined, "\n"),
        l => when(length(l) % 3 =!= 0, concat(l, lit("."))).otherwise(l)), "\n")
      val planted = concat(punct,
        when(col("doc_id") % 13 === 0, lit(" {")).otherwise(lit("")),
        when(col("doc_id") % 17 === 0, lit("\nlorem ipsum.")).otherwise(lit("")))
      docs.select(col("doc_id"), C4Clean.clean(planted).as("c"))
        .select(col("doc_id"),
          col("c.n_lines").as("n_lines"),
          col("c.n_kept").as("n_kept"),
          col("c.doc_keep").as("doc_keep"),
          md5(col("c.cleaned")).as("cleaned_md5"))
        .orderBy(col("doc_id"))
    }),

    // cross-document boilerplate removal: 10-word lines planted as in
    // text_c4_clean, plus a constant footer line on doc_id%3!=2 (~2/3 of
    // the corpus) — the footer must vanish from every document, and any
    // naturally colliding relined 10-gram goes with it.
    "dedup_boilerplate" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val planted = concat(TextRepetition.relinear(10)(col("text")),
        when(col("doc_id") % 3 =!= 2,
          lit("\nsubscribe to our newsletter for updates today"))
          .otherwise(lit("")))
      Dedup.dedupLinesAcrossDocs(
          docs.select(col("doc_id"), planted.as("text")),
          "text", "doc_id", minRepeats = 2)
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          md5(col("cleaned")).as("cleaned_md5"))
        .orderBy(col("doc_id"))
    }),

    // eval-set decontamination: docs sharing any word 8-gram with the
    // probe set (doc_id%31) are flagged; a constant 8-word phrase is
    // planted on the probes AND on doc_id%23 training docs so planted
    // contamination exists beyond the probes' self-hits.
    "text_decontaminate" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val phrase = " alpha beta gamma delta epsilon zeta eta theta"
      val planted = docs.select(col("doc_id"),
        when(col("doc_id") % 31 === 0 || col("doc_id") % 23 === 0,
          concat(col("text"), lit(phrase))).otherwise(col("text")).as("text"))
      val probes = planted.filter(col("doc_id") % 31 === 0)
      Dedup.contaminatedDocs(planted, "text", "doc_id", probes, "text", n = 8)
        .orderBy(col("doc_id"))
    }),

    // token-budget mixture draw over the REAL source column (20
    // strata): kept is a prefix of the hash-rank order whose preceding
    // token mass is under the 1200-token budget (~44% of each stratum
    // at sf0.01).
    "sample_token_budget" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val withTok = docs.select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sampling.tokenBudget(withTok, col("source"), col("doc_id"),
          col("n_tokens"), budgetPerStratum = 1200L)
        .orderBy(col("doc_id"))
    }),

    // ExactSubstr repeated-substring removal (Lee et al. 2022): a
    // 12-word phrase planted on doc_id%4==1 (~1/4 of the corpus) must
    // vanish from every planted doc — its five 8-word windows repeat
    // cross-doc — and any naturally repeated 8-word span goes with it.
    "text_substring_dedup" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val phrase = " subscribe and share this curated corpus snippet with everyone you know"
      val planted = docs.select(col("doc_id"),
        when(col("doc_id") % 4 === 1, concat(col("text"), lit(phrase)))
          .otherwise(col("text")).as("text"))
      Dedup.dedupSubstrings(planted, "text", "doc_id", n = 8)
        .select(col("doc_id"), col("n_words"), col("n_kept"),
          md5(col("cleaned")).as("cleaned_md5"))
        .orderBy(col("doc_id"))
    }),

    // keep-one-copy ExactSubstr (Lee et al. 2022's production policy):
    // same planted phrase, but the EARLIEST planted doc (min doc_id
    // with doc_id%4==1) keeps it verbatim — only the other copies are
    // removed, so the content survives in the corpus exactly once.
    "text_substring_keep1" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val phrase = " subscribe and share this curated corpus snippet with everyone you know"
      val planted = docs.select(col("doc_id"),
        when(col("doc_id") % 4 === 1, concat(col("text"), lit(phrase)))
          .otherwise(col("text")).as("text"))
      Dedup.dedupSubstringsKeepOne(planted, "text", "doc_id", n = 8)
        .select(col("doc_id"), col("n_words"), col("n_kept"),
          md5(col("cleaned")).as("cleaned_md5"))
        .orderBy(col("doc_id"))
    }),

    // sequence packing (GPT-2/Pile concat-and-chunk training prep):
    // per REAL source stream in hash-rank order, each doc lands at
    // (window_id, offset) of the 512-token context grid; n_windows
    // counts boundary crossings. Same scale-safe prefix sum as the
    // token-budget draw — no stratum-sized window stage.
    "pack_sequences" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val withTok = docs.select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sampling.packWindows(withTok, col("source"), col("doc_id"),
          col("n_tokens"), contextLen = 512L)
        .orderBy(col("doc_id"))
    }),

    // TWO-LEVEL dedup (the RefinedWeb/Dolma production recipe): exact
    // PARAGRAPH dedup across documents first, THEN MinHash near-dup
    // over the paragraph-cleaned documents — composed as ONE entry
    // because the interaction is the point: paragraph removal changes
    // document signatures, so stage-2 pairs computed on raw text would
    // be wrong. Paragraphs = 15-word relined groups; a constant
    // promotional paragraph planted on doc_id%4==2 must vanish in
    // stage one (along with any naturally repeated relined paragraph),
    // and stage two's 16x4-band minhash verdict runs on the rebuilt
    // text — the oracle replays both stages end to end.
    "dedup_two_level" -> ((s, d) => {
      val docs = T(s, d, "documents")
      // coalesce: the oracle plants unconditionally (FROM documents
      // WHERE doc_id % 4 = 2), but Spark concat propagates null — a
      // null-text doc would lose its plant AND its n_paras here
      val planted = concat(
        coalesce(TextRepetition.relinear(15)(col("text")), lit("")),
        when(col("doc_id") % 4 === 2,
          lit("\nplease subscribe to this exclusive newsletter paragraph repeated verbatim across the crawl"))
          .otherwise(lit("")))
      // materialized once (r10 optimization): minhashDedup references
      // its input TWICE (signature build + verdict join-back) — lazy,
      // the whole boilerplate-removal pipeline (two corpus explodes,
      // the frequency aggregate, the drop-set join) re-executed for
      // the second reference; the before-plan showed 16 exchanges,
      // the checkpointed one half that
      val cleaned = graft.operators.Lineage.truncate(
        Dedup.dedupLinesAcrossDocs(
          docs.select(col("doc_id"), planted.as("text")),
          "text", "doc_id", minRepeats = 2))
      Dedup.minhashDedup(cleaned, "cleaned", "doc_id", threshold = 0.5)
        .select(col("doc_id"), col("n_lines").as("n_paras"), col("n_kept"),
          col("is_dup"))
        .orderBy(col("doc_id"))
    }),

    // SemDeDup: same k-means run (identical params → the oracle reuses
    // the Lloyd replay), then exact cosine pairs only WITHIN clusters.
    // At sf0.01 this finds 5 of the 14 corpus-wide >=0.45 pairs — the
    // published cross-cluster recall trade is part of what the oracle
    // pins, not an approximation to hide.
    "dedup_semantic" -> ((s, d) =>
      Clustering.semanticDedupPairs(T(s, d, "embeddings"), "embedding",
          "vec_id", threshold = 0.40, k = 10, iters = 3)
        .select(col("cluster").cast("long").as("cluster"),
          col("id_a"), col("id_b"), round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("id_a"), col("id_b")))
  )

  val oracles: Map[String, String] = Map(
    "text_repetition" ->
      """WITH d AS (SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' ' || text ELSE text END AS t
           FROM documents),
         w AS (SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(t)), '\s+'), x -> x <> '') AS ws
           FROM d),
         base AS (SELECT doc_id, ws, len(ws) AS nw,
             CASE WHEN len(ws) = 0 THEN 0
                  ELSE length(array_to_string(ws, ' ')) END AS nc
           FROM w),
         ln AS (SELECT doc_id, array_to_string(ws[2*i-1 : 2*i], ' ') AS line
                FROM (SELECT doc_id, ws, unnest(generate_series(1,
                        CAST(ceil(nw / 2.0) AS BIGINT))) AS i
                      FROM base WHERE nw > 0) t),
         lc AS (SELECT doc_id, line, COUNT(*) AS c FROM ln GROUP BY 1, 2),
         lstat AS (SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_lines,
             (SUM(c) - COUNT(*)) / CAST(SUM(c) AS DOUBLE) AS dlf,
             CASE WHEN SUM(c * length(line)) = 0 THEN 0.0
                  ELSE SUM(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END)
                       / CAST(SUM(c * length(line)) AS DOUBLE) END AS dlcf
           FROM lc GROUP BY doc_id),
         gr AS (SELECT doc_id, nc, n, array_to_string(ws[i : i+n-1], ' ') AS gram
                FROM (SELECT doc_id, ws, nc, ns.n,
                        unnest(generate_series(1, nw - ns.n + 1)) AS i
                      FROM base CROSS JOIN (SELECT unnest([2,3,4,5]) AS n) ns
                      WHERE nw >= ns.n) t),
         gc AS (SELECT doc_id, nc, n, gram, COUNT(*) AS c
                FROM gr GROUP BY 1, 2, 3, 4),
         top AS (SELECT doc_id, n, c * length(gram) / CAST(nc AS DOUBLE) AS frac
                 FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, n
                         ORDER BY c DESC, gram) AS rn FROM gc) t
                 WHERE rn = 1),
         dup5 AS (SELECT doc_id,
                    SUM(CASE WHEN c > 1 THEN c * length(gram) ELSE 0 END)
                      / CAST(any_value(nc) AS DOUBLE) AS frac
                  FROM gc WHERE n = 5 GROUP BY doc_id)
         SELECT d.doc_id,
           coalesce(lstat.n_lines, 0) AS n_lines,
           round(coalesce(lstat.dlf, 0.0), 6) AS dup_line_frac,
           round(coalesce(lstat.dlcf, 0.0), 6) AS dup_line_char_frac,
           round(coalesce(t2.frac, 0.0), 6) AS top2_frac,
           round(coalesce(t3.frac, 0.0), 6) AS top3_frac,
           round(coalesce(t4.frac, 0.0), 6) AS top4_frac,
           round(coalesce(dup5.frac, 0.0), 6) AS dup5_frac
         FROM d
         LEFT JOIN lstat USING (doc_id)
         LEFT JOIN (SELECT doc_id, frac FROM top WHERE n = 2) t2 USING (doc_id)
         LEFT JOIN (SELECT doc_id, frac FROM top WHERE n = 3) t3 USING (doc_id)
         LEFT JOIN (SELECT doc_id, frac FROM top WHERE n = 4) t4 USING (doc_id)
         LEFT JOIN dup5 USING (doc_id)
         ORDER BY d.doc_id""",

    "text_pii_redact" ->
      """WITH p AS (SELECT doc_id,
             CASE WHEN doc_id % 4 = 0 THEN
               text || ' reach user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or 10.1.' || CAST(doc_id % 200 AS VARCHAR)
                    || '.7 tel (555) 123-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             ELSE text END AS t
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(t,
             '\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b')) AS BIGINT) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g')) AS redacted_md5
         FROM p ORDER BY doc_id""",

    "text_tfidf" ->
      """WITH tk AS (SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                    x -> x <> '')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
         dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT COUNT(*) AS n FROM documents),
         sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                  tf.tf * ln(CAST(n.n AS DOUBLE) / dfq.df) AS score
                FROM tf JOIN dfq USING (term) CROSS JOIN n)
         SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           round(score, 4) AS score
         FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, term) AS rank FROM sc) t
         WHERE rank <= 3 ORDER BY doc_id, rank""",

    // every rule replicated generally (no corpus-constant shortcuts):
    // lines from '\n' (trim, drop empties), grams over lowercased
    // whitespace words, char mass over space-joined words
    "text_gopher_quality" -> (gopherCte + """
         SELECT doc_id, CAST(nw AS BIGINT) AS n_words, round(mean_wl, 6) AS mean_wl,
           CAST(stop_hits AS BIGINT) AS stop_hits,
           pass_words, pass_mean_wl, pass_symbols, pass_lines, pass_alpha,
           pass_stops, pass_repetition,
           (pass_words AND pass_mean_wl AND pass_symbols AND pass_lines
            AND pass_alpha AND pass_stops AND pass_repetition) AS keep
         FROM r ORDER BY doc_id"""),

    // the oracle rebuilds the planted document (10-word lines, '.'
    // plant, markers), then applies the same line/page rules over list
    // lambdas (order-preserving) — no corpus-constant shortcuts
    "text_c4_clean" ->
      """WITH t1 AS (SELECT doc_id,
             CASE WHEN doc_id % 11 = 0
                  THEN regexp_replace(text, '\bquery\b', 'javascript', 'g')
                  ELSE text END AS t
           FROM documents),
         w AS (SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(t)), '\s+'), x -> x <> '') AS ws
           FROM t1),
         ln0 AS (SELECT doc_id, i, array_to_string(ws[10*i-9 : 10*i], ' ') AS line
                 FROM (SELECT doc_id, ws,
                         unnest(generate_series(1, CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS i
                       FROM w WHERE len(ws) > 0) q),
         ln1 AS (SELECT doc_id, i,
                   CASE WHEN length(line) % 3 <> 0 THEN line || '.' ELSE line END AS line
                 FROM ln0),
         doc AS (SELECT d.doc_id,
             coalesce(lg.t, '')
               || CASE WHEN d.doc_id % 13 = 0 THEN ' {' ELSE '' END
               || CASE WHEN d.doc_id % 17 = 0 THEN chr(10) || 'lorem ipsum.' ELSE '' END AS t
           FROM documents d
           LEFT JOIN (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS t
                      FROM ln1 GROUP BY doc_id) lg ON lg.doc_id = d.doc_id),
         res AS (SELECT doc_id, t,
             list_filter(list_transform(str_split(t, chr(10)), x -> trim(x)), x -> x <> '') AS ls,
             list_filter(
               list_filter(list_transform(str_split(t, chr(10)), x -> trim(x)), x -> x <> ''),
               l -> regexp_matches(l, '[.!?"”'']$')
                    AND len(list_filter(regexp_split_to_array(l, '\s+'), x2 -> x2 <> '')) >= 3
                    AND NOT contains(lower(l), 'javascript')) AS kept
           FROM doc)
         SELECT doc_id,
           CAST(len(ls) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           (len(kept) >= 5 AND NOT contains(lower(t), 'lorem ipsum')
            AND NOT contains(t, '{')) AS doc_keep,
           CASE WHEN len(kept) >= 5 AND NOT contains(lower(t), 'lorem ipsum')
                     AND NOT contains(t, '{')
                THEN md5(array_to_string(kept, chr(10))) ELSE NULL END AS cleaned_md5
         FROM res ORDER BY doc_id""",

    "dedup_boilerplate" ->
      """WITH w AS (SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS ws
           FROM documents),
         ln0 AS (SELECT doc_id, i, array_to_string(ws[10*i-9 : 10*i], ' ') AS line
                 FROM (SELECT doc_id, ws,
                         unnest(generate_series(1, CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS i
                       FROM w WHERE len(ws) > 0) q),
         pl AS (SELECT doc_id, i AS pos, line FROM ln0
                UNION ALL
                SELECT doc_id, 1000000000 AS pos,
                  'subscribe to our newsletter for updates today' AS line
                FROM documents WHERE doc_id % 3 <> 2),
         freq AS (SELECT line, COUNT(DISTINCT doc_id) AS c FROM pl GROUP BY line),
         kept AS (SELECT pl.doc_id, pl.pos, pl.line
                  FROM pl JOIN freq USING (line) WHERE freq.c < 2),
         reb AS (SELECT doc_id, COUNT(*) AS n_kept,
                   md5(string_agg(line, chr(10) ORDER BY pos)) AS cleaned_md5
                 FROM kept GROUP BY doc_id),
         tot AS (SELECT doc_id, COUNT(*) AS n_lines FROM pl GROUP BY doc_id)
         SELECT d.doc_id, CAST(coalesce(t.n_lines, 0) AS BIGINT) AS n_lines,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept, r.cleaned_md5
         FROM documents d
         LEFT JOIN tot t ON t.doc_id = d.doc_id
         LEFT JOIN reb r ON r.doc_id = d.doc_id
         ORDER BY d.doc_id""",

    // string grams in SQL vs xxhash64 grams in Spark: hash equality ==
    // string equality modulo a 2^-64 collision — same adjudication as
    // the ngram-jaccard oracle
    "text_decontaminate" ->
      """WITH p AS (SELECT doc_id,
             CASE WHEN doc_id % 31 = 0 OR doc_id % 23 = 0
                  THEN text || ' alpha beta gamma delta epsilon zeta eta theta'
                  ELSE text END AS text
           FROM documents),
         w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM p),
         g AS (SELECT DISTINCT doc_id, array_to_string(ws[i : i+7], ' ') AS gram
               FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i
                     FROM w WHERE len(ws) >= 8) q),
         pg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 31 = 0),
         hits AS (SELECT g.doc_id, COUNT(*) AS n FROM g JOIN pg USING (gram) GROUP BY 1)
         SELECT p.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
           coalesce(h.n, 0) > 0 AS contaminated
         FROM p LEFT JOIN hits h USING (doc_id) ORDER BY p.doc_id""",

    "sample_token_budget" ->
      """WITH tok AS (SELECT doc_id, source,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS rk
           FROM documents)
         SELECT doc_id, source, n_tokens,
           coalesce(SUM(n_tokens) OVER (PARTITION BY source ORDER BY rk, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) < 1200 AS kept
         FROM tok ORDER BY doc_id""",

    // window/coverage replay: grams grouped by STRING (hash equality
    // stands in on the Spark side), covered = positions under any
    // cross-doc-repeated 8-word window, rebuild = uncovered words in
    // order
    "text_substring_dedup" ->
      """WITH p AS (SELECT doc_id,
             CASE WHEN doc_id % 4 = 1 THEN text ||
               ' subscribe and share this curated corpus snippet with everyone you know'
             ELSE text END AS t
           FROM documents),
         w AS (SELECT doc_id,
             list_filter(regexp_split_to_array(trim(t), '\s+'), x -> x <> '') AS ws
           FROM p),
         win AS (SELECT doc_id, i, array_to_string(ws[i : i + 7], ' ') AS g
                 FROM (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws) - 7)) AS i
                       FROM w WHERE len(ws) >= 8) q),
         rep AS (SELECT g FROM win GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
         cov AS (SELECT DISTINCT win.doc_id, win.i + o.k AS pos
                 FROM win JOIN rep USING (g)
                 CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS k) o),
         wordpos AS (SELECT doc_id, ix, ws[ix] AS word
                     FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS ix
                           FROM w WHERE len(ws) > 0) q),
         kept AS (SELECT wp.doc_id, wp.ix, wp.word
                  FROM wordpos wp LEFT JOIN cov
                    ON cov.doc_id = wp.doc_id AND cov.pos = wp.ix
                  WHERE cov.pos IS NULL),
         reb AS (SELECT doc_id, COUNT(*) AS n_kept,
                   md5(string_agg(word, ' ' ORDER BY ix)) AS cleaned_md5
                 FROM kept GROUP BY doc_id)
         SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
           CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
           reb.cleaned_md5
         FROM w LEFT JOIN reb USING (doc_id) ORDER BY w.doc_id""",

    // keep-one replay: identical coverage CTEs, except each repeated
    // window's canonical occurrence (min doc*2^31+start — 1-based
    // starts here vs Spark's 0-based, same ordering) never covers.
    "text_substring_keep1" ->
      """WITH p AS (SELECT doc_id,
             CASE WHEN doc_id % 4 = 1 THEN text ||
               ' subscribe and share this curated corpus snippet with everyone you know'
             ELSE text END AS t
           FROM documents),
         w AS (SELECT doc_id,
             list_filter(regexp_split_to_array(trim(t), '\s+'), x -> x <> '') AS ws
           FROM p),
         win AS (SELECT doc_id, i, array_to_string(ws[i : i + 7], ' ') AS g
                 FROM (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws) - 7)) AS i
                       FROM w WHERE len(ws) >= 8) q),
         rep AS (SELECT g, MIN(doc_id * 2147483648 + i) AS canon
                 FROM win GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
         cov AS (SELECT DISTINCT win.doc_id, win.i + o.k AS pos
                 FROM win JOIN rep USING (g)
                 CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS k) o
                 WHERE win.doc_id * 2147483648 + win.i <> rep.canon),
         wordpos AS (SELECT doc_id, ix, ws[ix] AS word
                     FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS ix
                           FROM w WHERE len(ws) > 0) q),
         kept AS (SELECT wp.doc_id, wp.ix, wp.word
                  FROM wordpos wp LEFT JOIN cov
                    ON cov.doc_id = wp.doc_id AND cov.pos = wp.ix
                  WHERE cov.pos IS NULL),
         reb AS (SELECT doc_id, COUNT(*) AS n_kept,
                   md5(string_agg(word, ' ' ORDER BY ix)) AS cleaned_md5
                 FROM kept GROUP BY doc_id)
         SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
           CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
           reb.cleaned_md5
         FROM w LEFT JOIN reb USING (doc_id) ORDER BY w.doc_id""",

    "pack_sequences" ->
      """WITH tok AS (SELECT doc_id, source,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS rk
           FROM documents),
         c AS (SELECT doc_id, source, n_tokens,
             coalesce(SUM(n_tokens) OVER (PARTITION BY source ORDER BY rk, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
           FROM tok)
         SELECT doc_id, source, n_tokens,
           CAST(bef // 512 AS BIGINT) AS window_id,
           CAST(bef % 512 AS BIGINT) AS "offset",
           CAST((bef + greatest(n_tokens, 1) - 1) // 512 - bef // 512 + 1 AS BIGINT) AS n_windows
         FROM c ORDER BY doc_id""",

    // both stages replayed end to end: paragraph rebuild (15-word
    // relined groups + the %4==2 plant, cross-doc-repeated lines
    // dropped), then the full minhash pipeline — same 60-bit md5-prefix
    // gram hash, same (a*h+b) mod 2^61-1 permutation constants, same
    // 16x4 banding and >=32/64 verdict — over the REBUILT text
    "dedup_two_level" ->
      (s"""WITH p(i, a, b) AS (VALUES ${LlmQueries.minhashPermRows}),""" + """
         w0 AS (SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS ws
           FROM documents),
         ln0 AS (SELECT doc_id, i AS pos, array_to_string(ws[15*i-14 : 15*i], ' ') AS line
                 FROM (SELECT doc_id, ws,
                         unnest(generate_series(1, CAST(ceil(len(ws) / 15.0) AS BIGINT))) AS i
                       FROM w0 WHERE len(ws) > 0) q),
         pl AS (SELECT doc_id, pos, line FROM ln0
                UNION ALL
                SELECT doc_id, 1000000000 AS pos,
                  'please subscribe to this exclusive newsletter paragraph repeated verbatim across the crawl' AS line
                FROM documents WHERE doc_id % 4 = 2),
         freq AS (SELECT line, COUNT(DISTINCT doc_id) AS c FROM pl GROUP BY line),
         kept AS (SELECT pl.doc_id, pl.pos, pl.line
                  FROM pl JOIN freq USING (line) WHERE freq.c < 2),
         tot AS (SELECT doc_id, COUNT(*) AS n_paras FROM pl GROUP BY doc_id),
         reb AS (SELECT doc_id, COUNT(*) AS n_kept,
                   string_agg(line, ' ' ORDER BY pos) AS t
                 FROM kept GROUP BY doc_id),
         d AS (SELECT doc_id AS id,
                 list_filter(regexp_split_to_array(trim(lower(t)), '\s+'), x -> x <> '') AS w
               FROM reb),
         g AS (SELECT id, w, unnest(generate_series(1, len(w) - 2)) AS i
               FROM d WHERE len(w) >= 3),
         gr AS (SELECT id,
                  ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 15))::BIGINT AS h
                FROM g),
         sig AS (SELECT gr.id, p.i,
                   CAST(min((p.a * gr.h + p.b) % 2305843009213693951) AS BIGINT) AS v
                 FROM gr CROSS JOIN p GROUP BY gr.id, p.i),
         bands AS (SELECT id, i // 4 AS band, list(v ORDER BY i) AS key
                   FROM sig GROUP BY id, i // 4),
         cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.key = b.key AND a.id < b.id),
         est AS (SELECT c.id_a, c.id_b,
                   CAST(sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) AS BIGINT) AS m
                 FROM cand c
                 JOIN sig sa ON sa.id = c.id_a
                 JOIN sig sb ON sb.id = c.id_b AND sb.i = sa.i
                 GROUP BY 1, 2),
         dup AS (SELECT DISTINCT id_b AS id FROM est WHERE m >= 32)
         SELECT doc.doc_id, CAST(coalesce(tot.n_paras, 0) AS BIGINT) AS n_paras,
           CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
           dup.id IS NOT NULL AS is_dup
         FROM documents doc
         LEFT JOIN tot ON tot.doc_id = doc.doc_id
         LEFT JOIN reb ON reb.doc_id = doc.doc_id
         LEFT JOIN dup ON dup.id = doc.doc_id
         ORDER BY doc.doc_id"""),

    // full replay of the quantized Lloyd history: init = 10 smallest
    // md5-rank ids, three assignment passes (a0/a1/a2) with two
    // centroid updates between them — all integer-exact.
    "cluster_kmeans" -> (kmeansLloydCte + """
         SELECT cid AS cluster, COUNT(*) AS n,
           CAST(SUM(vec_id) AS BIGINT) AS sum_id,
           CAST(SUM(label) AS BIGINT) AS sum_label,
           CAST(SUM(dist) AS BIGINT) AS inertia_q
         FROM g2 GROUP BY 1 ORDER BY 1"""),

    // same Lloyd replay, then exact cosine pairs within each final
    // cluster only.
    "dedup_semantic" -> (kmeansLloydCte + """,
         e AS (SELECT g2.cid AS cluster, g2.vec_id, emb.embedding
               FROM g2 JOIN embeddings emb USING (vec_id))
         SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
         FROM e a JOIN e b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])) >= 0.40
         ORDER BY id_a, id_b""")
  )

  /** Gopher Table A1 replay shared by the `text_gopher_quality` oracle
    * and the streaming-curation oracle: planted schedule (doc_id%7
    * self-concat + %3 stop plant), every rule replicated generally,
    * ending at `r` (doc_id, nw, mean_wl, stop_hits, pass_* flags); the
    * planted text itself stays addressable as d.t. */
  private[queries] lazy val gopherCte: String =
      """WITH d AS (SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' ' || text ELSE text END
               || CASE WHEN doc_id % 3 = 0 THEN ' of the and'
                       WHEN doc_id % 3 = 1 THEN ' to' ELSE '' END AS t
           FROM documents),
         w AS (SELECT doc_id, t,
             list_filter(regexp_split_to_array(trim(lower(t)), '\s+'), x -> x <> '') AS ws
           FROM d),
         base AS (SELECT doc_id, t, ws, len(ws) AS nw,
             CASE WHEN len(ws) = 0 THEN 0
                  ELSE length(array_to_string(ws, ' ')) END AS nc
           FROM w),
         ln AS (SELECT doc_id, trim(l) AS line
                FROM (SELECT doc_id, unnest(str_split(t, chr(10))) AS l FROM d) q
                WHERE trim(l) <> ''),
         lc AS (SELECT doc_id, line, COUNT(*) AS c FROM ln GROUP BY 1, 2),
         lstat AS (SELECT doc_id,
             (SUM(c) - COUNT(*)) / CAST(SUM(c) AS DOUBLE) AS dlf,
             CASE WHEN SUM(c * length(line)) = 0 THEN 0.0
                  ELSE SUM(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END)
                       / CAST(SUM(c * length(line)) AS DOUBLE) END AS dlcf,
             SUM(CASE WHEN regexp_matches(line, '^[•\-\*]') THEN c ELSE 0 END)
               / CAST(SUM(c) AS DOUBLE) AS bullet_frac,
             SUM(CASE WHEN regexp_matches(line, '(\.\.\.|…)$') THEN c ELSE 0 END)
               / CAST(SUM(c) AS DOUBLE) AS ell_frac
           FROM lc GROUP BY doc_id),
         gr AS (SELECT doc_id, nc, n, array_to_string(ws[i : i+n-1], ' ') AS gram
                FROM (SELECT doc_id, ws, nc, ns.n,
                        unnest(generate_series(1, nw - ns.n + 1)) AS i
                      FROM base CROSS JOIN (SELECT unnest([2,3,4,5]) AS n) ns
                      WHERE nw >= ns.n) t),
         gc AS (SELECT doc_id, nc, n, gram, COUNT(*) AS c
                FROM gr GROUP BY 1, 2, 3, 4),
         top AS (SELECT doc_id, n, c * length(gram) / CAST(nc AS DOUBLE) AS frac
                 FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, n
                         ORDER BY c DESC, gram) AS rn FROM gc) t
                 WHERE rn = 1),
         dup5 AS (SELECT doc_id,
                    SUM(CASE WHEN c > 1 THEN c * length(gram) ELSE 0 END)
                      / CAST(any_value(nc) AS DOUBLE) AS frac
                  FROM gc WHERE n = 5 GROUP BY doc_id),
         m AS (SELECT base.doc_id, nw,
             CASE WHEN nw = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) / nw END AS mean_wl,
             len(list_intersect(list_distinct(ws),
                 ['the','be','to','of','and','that','have','with'])) AS stop_hits,
             CASE WHEN nw = 0 THEN 0.0
                  ELSE len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
                       / CAST(nw AS DOUBLE) END AS alpha_frac,
             CASE WHEN nw = 0 THEN 0.0
                  ELSE (len(regexp_extract_all(t, '#')) + len(regexp_extract_all(t, '\.\.\.'))
                        + len(regexp_extract_all(t, '…'))) / CAST(nw AS DOUBLE) END AS symbol_ratio
           FROM base),
         r AS (SELECT m.doc_id, m.nw, m.mean_wl, m.stop_hits,
             (m.nw >= 50 AND m.nw <= 100000) AS pass_words,
             (m.mean_wl >= 3.0 AND m.mean_wl <= 10.0) AS pass_mean_wl,
             (m.symbol_ratio <= 0.1) AS pass_symbols,
             (coalesce(l.bullet_frac, 0.0) <= 0.9 AND coalesce(l.ell_frac, 0.0) <= 0.3) AS pass_lines,
             (m.alpha_frac >= 0.8) AS pass_alpha,
             (m.stop_hits >= 2) AS pass_stops,
             (coalesce(l.dlf, 0.0) <= 0.30 AND coalesce(l.dlcf, 0.0) <= 0.20
              AND coalesce(t2.frac, 0.0) <= 0.20 AND coalesce(t3.frac, 0.0) <= 0.18
              AND coalesce(t4.frac, 0.0) <= 0.16 AND coalesce(d5.frac, 0.0) <= 0.15) AS pass_repetition
           FROM m
           LEFT JOIN lstat l USING (doc_id)
           LEFT JOIN (SELECT doc_id, frac FROM top WHERE n = 2) t2 USING (doc_id)
           LEFT JOIN (SELECT doc_id, frac FROM top WHERE n = 3) t3 USING (doc_id)
           LEFT JOIN (SELECT doc_id, frac FROM top WHERE n = 4) t4 USING (doc_id)
           LEFT JOIN dup5 d5 USING (doc_id))"""

  /** Quantized Lloyd replay shared by the `cluster_kmeans` and
    * `dedup_semantic` oracles: init = k smallest md5-rank ids, three
    * assignment passes with two centroid updates, ending at `g2`
    * (vec_id, label, cid, dist) — all integer-exact so any engine
    * reproduces it bit-for-bit. */
  private lazy val kmeansLloydCte: String = // lazy: referenced above its definition during object init
      """WITH q AS (SELECT vec_id, label,
             list_transform(embedding, x ->
               CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
           FROM embeddings),
         c0 AS (SELECT rn - 1 AS cid, qv AS cv FROM (
                  SELECT qv, row_number() OVER (ORDER BY
                    ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
                    vec_id) AS rn
                  FROM q) t WHERE rn <= 10),
         a0 AS (SELECT vec_id, label, qv, cid, dist,
                  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                FROM (SELECT q.vec_id, q.label, q.qv, c.cid,
                        list_sum(list_transform(generate_series(1, len(q.qv)),
                          j -> (q.qv[j] - c.cv[j]) * (q.qv[j] - c.cv[j]))) AS dist
                      FROM q CROSS JOIN c0 c) t),
         g0 AS (SELECT vec_id, label, qv, cid FROM a0 WHERE rn = 1),
         u0 AS (SELECT cid, j,
                  CAST(round(CAST(SUM(qv[j]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cj
                FROM (SELECT cid, qv, unnest(generate_series(1, len(qv))) AS j
                      FROM g0) t GROUP BY cid, j),
         c1 AS (SELECT c0.cid, coalesce(nc.cv, c0.cv) AS cv
                FROM c0 LEFT JOIN (SELECT cid, list(cj ORDER BY j) AS cv
                                   FROM u0 GROUP BY cid) nc USING (cid)),
         a1 AS (SELECT vec_id, label, qv, cid, dist,
                  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                FROM (SELECT q.vec_id, q.label, q.qv, c.cid,
                        list_sum(list_transform(generate_series(1, len(q.qv)),
                          j -> (q.qv[j] - c.cv[j]) * (q.qv[j] - c.cv[j]))) AS dist
                      FROM q CROSS JOIN c1 c) t),
         g1 AS (SELECT vec_id, label, qv, cid FROM a1 WHERE rn = 1),
         u1 AS (SELECT cid, j,
                  CAST(round(CAST(SUM(qv[j]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cj
                FROM (SELECT cid, qv, unnest(generate_series(1, len(qv))) AS j
                      FROM g1) t GROUP BY cid, j),
         c2 AS (SELECT c1.cid, coalesce(nc.cv, c1.cv) AS cv
                FROM c1 LEFT JOIN (SELECT cid, list(cj ORDER BY j) AS cv
                                   FROM u1 GROUP BY cid) nc USING (cid)),
         a2 AS (SELECT vec_id, label, cid, dist,
                  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                FROM (SELECT q.vec_id, q.label, c.cid,
                        list_sum(list_transform(generate_series(1, len(q.qv)),
                          j -> (q.qv[j] - c.cv[j]) * (q.qv[j] - c.cv[j]))) AS dist
                      FROM q CROSS JOIN c2 c) t),
         g2 AS (SELECT vec_id, label, cid, dist FROM a2 WHERE rn = 1)"""
}
