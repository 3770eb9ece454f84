package graft.queries

/** DuckDB oracle SQL for the training-data extension operators
  * (graft.ops.*). Each mirrors its Spark query stage-for-stage; hashing
  * is md5 on both sides and every float is either derived from exact
  * integers or accumulated via DECIMAL(28,18), so results are
  * bit-identical.
  */
object ExtensionOracles {

  /** Shared CTE: normalized token list per document. */
  private val tokCte =
    """tok AS (SELECT doc_id,
      |  regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS l
      |FROM documents)""".stripMargin

  /** Shared CTEs: distinct word-3-gram shingles + per-doc sizes. */
  private val shingleCtes =
    s"""$tokCte,
       |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
       |        FROM tok WHERE len(l) >= 3),
       |sh AS MATERIALIZED (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g FROM pos),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  /** Shared CTE generator: q21's integer quality priority (the 4/3/3
    * rules) over any (doc_id, text) relation — the ONE SQL definition
    * backing q49's budget order, q57's budget stage and q61's quota
    * order; a weight tweak edits exactly one place. `extra` carries
    * additional pass-through columns (e.g. ", source"). */
  private def prioCteOver(rel: String, out: String, extra: String = ""): String =
    s"""$out AS (SELECT doc_id$extra,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       |    CAST(CASE WHEN CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
       |                   BETWEEN 20 AND 200 THEN 4 ELSE 0 END +
       |         CASE WHEN CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) /
       |                greatest(CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE), 1.0)
       |                   BETWEEN 3.0 AND 10.0 THEN 3 ELSE 0 END +
       |         CASE WHEN CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) /
       |                greatest(CAST(length(text) AS DOUBLE), 1.0) <= 0.1
       |              THEN 3 ELSE 0 END AS BIGINT) AS priority
       |  FROM $rel)""".stripMargin

  /** Shared CTEs: the q45 temperature-flattened per-source weight table
    * (`ws`: source, n_docs, n_tokens, weight) — the ONE SQL definition
    * backing q45's mix report and q62's per-doc sampling weight. */
  private val weightCtes =
    """per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |w AS (SELECT *,
      |    CAST(round(power(CAST(n_tokens AS DOUBLE), 0.3), 9) AS DECIMAL(20,9)) AS w9
      |  FROM per),
      |wt AS (SELECT SUM(w9) AS w_total FROM w),
      |ws AS (SELECT source, n_docs, n_tokens,
      |    round(CAST(w9 AS DOUBLE) / CAST(w_total AS DOUBLE), 12) AS weight
      |  FROM w, wt)""".stripMargin

  val q21TextStats: String =
    """SELECT doc_id, lang,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '''(s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+')) AS BIGINT) AS n_bpe_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars_raw,
      |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_chars,
      |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) /
      |    greatest(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) AS avg_token_len,
      |  CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) /
      |    greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
      |  CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|of|to|and|in|is|it|for)\b')) AS DOUBLE) /
      |    greatest(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) AS stopword_ratio,
      |  (CASE WHEN n_tokens BETWEEN 20 AND 200 THEN 0.4 ELSE 0.0 END +
      |   CASE WHEN avg_token_len BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0.0 END +
      |   CASE WHEN punct_ratio <= 0.1 THEN 0.3 ELSE 0.0 END) AS quality_score
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val q22LangId: String =
    """SELECT doc_id, lang AS lang_label,
      |  CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|of|to|and|in|is|it|for)\b')) AS BIGINT) AS n_en,
      |  CAST(len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|von|mit|ein|zu)\b')) AS BIGINT) AS n_de,
      |  CAST(len(regexp_extract_all(lower(text), '\b(el|la|los|las|que|y|en|un|una|por)\b')) AS BIGINT) AS n_es,
      |  CAST(len(regexp_extract_all(lower(text), '\b(le|les|et|un|une|pour|dans|sur|avec)\b')) AS BIGINT) AS n_fr,
      |  CASE WHEN n_en >= greatest(n_de, n_es, n_fr) THEN 'en'
      |       WHEN n_de >= greatest(n_es, n_fr) THEN 'de'
      |       WHEN n_es >= n_fr THEN 'es'
      |       ELSE 'fr' END AS lang_pred
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val q23Fingerprint: String =
    """SELECT doc_id,
      |  md5(norm) AS content_md5,
      |  substring(md5(norm), 1, 16) AS fp64_hex,
      |  md5(array_to_string(l[1:8], ' ')) AS prefix8_md5,
      |  list_min(list_transform(generate_series(1, greatest(len(l) - 7, 1)),
      |    i -> md5(array_to_string(l[i:i+7], ' ')))) AS winnow8_min
      |FROM (SELECT doc_id,
      |        trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
      |        regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS l
      |      FROM documents) t
      |ORDER BY doc_id""".stripMargin

  val q24ExactDedup: String =
    """SELECT group_key, canonical_id, group_size, members FROM (
      |  SELECT md5(array_to_string(
      |           regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+')[1:8],
      |           ' ')) AS group_key,
      |    min(doc_id) AS canonical_id,
      |    COUNT(*) AS group_size,
      |    array_to_string(list_transform(list_sort(list(doc_id))[1:20],
      |      x -> CAST(x AS VARCHAR)), ',') AS members
      |  FROM documents GROUP BY 1) t
      |WHERE group_size >= 2
      |ORDER BY group_key""".stripMargin

  /** Mirrors the stop-shingle cap (maxDocFreq=50): shingles above the
    * document-frequency cap are dropped BEFORE the inverted-index join,
    * and per-doc set sizes are recomputed over the capped sets — exactly
    * the Spark dataflow in Dedup.jaccardPairs. */
  val q25NgramJaccard: String =
    s"""WITH $shingleCtes,
       |rare AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= 50),
       |shc AS (SELECT sh.doc_id, sh.g FROM sh JOIN rare ON sh.g = rare.g),
       |szc AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
       |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
       |           FROM shc a JOIN shc b ON a.g = b.g AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2)
       |SELECT d1, d2, c AS n_common,
       |  CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) AS jaccard
       |FROM common
       |JOIN szc s1 ON d1 = s1.doc_id
       |JOIN szc s2 ON d2 = s2.doc_id
       |WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.5
       |ORDER BY d1, d2""".stripMargin

  /** Shared CTE chain (requires `shingleCtes`): the MinHash-LSH stages
    * from the stop-shingle cap (maxDocFreq=50, same capped set as q25)
    * through exact common-shingle counts of band-collision candidates —
    * q26 reports the verified pairs, q71 uses them as an exclusion set. */
  /** The banded-MinHash chain at a given stop-shingle cap — q26 uses the
    * production cap (50); q89 replays the standing-index probe at the
    * parity cap (10000, uncrossed at gate scale). */
  private def lshCtesAt(cap: Long): String =
    s"""rare AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= $cap),
      |shc AS (SELECT sh.doc_id, sh.g FROM sh JOIN rare ON sh.g = rare.g),
      |szc AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
      |sig AS (SELECT doc_id,
      |  min(substring(md5(g), 1, 8))  AS h0, min(substring(md5(g), 9, 8))  AS h1,
      |  min(substring(md5(g), 17, 8)) AS h2, min(substring(md5(g), 25, 8)) AS h3,
      |  min(substring(md5('#' || g), 1, 8))  AS h4, min(substring(md5('#' || g), 9, 8))  AS h5,
      |  min(substring(md5('#' || g), 17, 8)) AS h6, min(substring(md5('#' || g), 25, 8)) AS h7
      |  FROM shc GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, 0 AS band, md5(h0 || h1) AS bh FROM sig
      |  UNION ALL SELECT doc_id, 1, md5(h2 || h3) FROM sig
      |  UNION ALL SELECT doc_id, 2, md5(h4 || h5) FROM sig
      |  UNION ALL SELECT doc_id, 3, md5(h6 || h7) FROM sig),
      |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
      |         FROM bands x JOIN bands y
      |           ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
      |common AS (SELECT cand.d1, cand.d2, count(*) AS c
      |           FROM cand
      |           JOIN shc a ON cand.d1 = a.doc_id
      |           JOIN shc b ON cand.d2 = b.doc_id AND a.g = b.g
      |           GROUP BY 1, 2)""".stripMargin

  private val lshCtes = lshCtesAt(50)

  /** Mirrors q89: the standing-index probe ≡ the batch-touching
    * restriction of the whole-corpus banded chain at the same cap —
    * the write→probe path proven in the gate, not only in specs. */
  val q89IndexProbe: String =
    s"""WITH $shingleCtes,
       |${lshCtesAt(10000L)}
       |SELECT d1, d2,
       |  CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) AS jaccard
       |FROM common
       |JOIN szc s1 ON d1 = s1.doc_id
       |JOIN szc s2 ON d2 = s2.doc_id
       |WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.5
       |  AND (d1 % 5 = 0 OR d2 % 5 = 0)
       |ORDER BY d1, d2""".stripMargin

  /** Mirrors the stop-shingle cap (maxDocFreq=50) applied BEFORE the
    * MinHash signatures — same capped shingle set as q25. */
  val q26MinhashLsh: String =
    s"""WITH $shingleCtes,
       |$lshCtes
       |SELECT d1, d2,
       |  CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) AS jaccard
       |FROM common
       |JOIN szc s1 ON d1 = s1.doc_id
       |JOIN szc s2 ON d2 = s2.doc_id
       |WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.5
       |ORDER BY d1, d2""".stripMargin

  val q27Simhash: String = {
    val votes = (1 to 16).map { i =>
      s"sum(CASE WHEN substring(h, $i, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v$i"
    }.mkString(",\n  ")
    val bits = (1 to 16).map(i => s"(CASE WHEN v$i >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
    s"""WITH $tokCte,
       |t2 AS (SELECT doc_id, unnest(l) AS tok FROM tok),
       |h AS (SELECT doc_id, md5(tok) AS h FROM t2),
       |v AS (SELECT doc_id,
       |  $votes
       |  FROM h GROUP BY doc_id)
       |SELECT d.doc_id, $bits AS simhash16
       |FROM documents d LEFT JOIN v ON d.doc_id = v.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Mirrors q29: multi-probe LSH ANN, replayed END-TO-END — bucket
    * assignment included. Plane component (j, p) of table 0 is the
    * first 13 hex digits of md5('lsh:0:j:p') scaled into [-0.5, 0.5)
    * (every step IEEE-exact — the q92 md5-derivation trick, see
    * `Similarity.planeComponent`); signature bit j is the SIGN of the
    * decimal-exact projection; the probe ring is the 11 Hamming-≤2
    * masks over 4 planes; candidates score with the q28 decimal-exact
    * cosine rounded to 12 before ranking (ties by vec_id). The oracle
    * therefore proves the LSH structure itself — which vectors share a
    * bucket — not just the final ranking. */
  val q29AnnLsh: String =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE len(embedding) > 0),
      |x AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM e),
      |px AS (SELECT x.vec_id, j.j,
      |    CAST(CAST(x.embedding[x.i] AS DOUBLE) *
      |      (CAST(('0x' || substr(md5('lsh:0:' || CAST(j.j AS VARCHAR) || ':' ||
      |         CAST(x.i - 1 AS VARCHAR)), 1, 13)) AS BIGINT)
      |        / 4503599627370496.0 - 0.5) AS DECIMAL(28,18)) AS term
      |  FROM x CROSS JOIN range(0, 4) j(j)),
      |dj AS (SELECT vec_id, j, SUM(term) AS d FROM px GROUP BY vec_id, j),
      |sg AS (SELECT vec_id,
      |    CAST(SUM(CASE WHEN d >= 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS sig
      |  FROM dj GROUP BY vec_id),
      |mk AS (SELECT unnest([0,1,2,4,8,3,5,9,6,10,12]) AS m),
      |qp AS (SELECT s.vec_id AS query_id, xor(s.sig, CAST(mk.m AS BIGINT)) AS psig
      |       FROM sg s CROSS JOIN mk WHERE s.vec_id < 5),
      |cand AS (SELECT qp.query_id, s.vec_id
      |         FROM qp JOIN sg s ON s.sig = qp.psig AND s.vec_id <> qp.query_id),
      |nn AS (SELECT vec_id,
      |    SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
      |      AS DECIMAL(28,18))) AS n2
      |  FROM x GROUP BY vec_id),
      |pairs AS (SELECT c.query_id, c.vec_id, eq.embedding AS qe, ev.embedding AS ve
      |          FROM cand c
      |          JOIN e eq ON c.query_id = eq.vec_id
      |          JOIN e ev ON c.vec_id = ev.vec_id),
      |pe AS (SELECT query_id, vec_id, qe, ve,
      |         unnest(generate_series(1, len(qe))) AS i FROM pairs),
      |dots AS (SELECT query_id, vec_id,
      |    SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE) AS DECIMAL(28,18))) AS dot
      |  FROM pe GROUP BY 1, 2),
      |scored AS (SELECT d.query_id, d.vec_id,
      |    round(CAST(d.dot AS DOUBLE) /
      |      (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nv.n2 AS DOUBLE))), 12) AS cos
      |  FROM dots d
      |  JOIN nn nq ON d.query_id = nq.vec_id
      |  JOIN nn nv ON d.vec_id = nv.vec_id)
      |SELECT query_id, rank, neighbor_id, cos FROM (
      |  SELECT query_id, vec_id AS neighbor_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
      |  FROM scored) t
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  val q28BruteForceTopK: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
      |pairs AS (SELECT q.query_id, e.vec_id, q.qe, e.embedding AS emb
      |          FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      |expl AS (SELECT query_id, vec_id, qe, emb,
      |           unnest(generate_series(1, len(qe))) AS i
      |         FROM pairs),
      |dots AS (SELECT query_id, vec_id,
      |  SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(emb[i] AS DOUBLE) AS DECIMAL(28,18))) AS dot,
      |  SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE) AS DECIMAL(28,18))) AS qq,
      |  SUM(CAST(CAST(emb[i] AS DOUBLE) * CAST(emb[i] AS DOUBLE) AS DECIMAL(28,18))) AS ee
      |  FROM expl GROUP BY 1, 2),
      |scored AS (SELECT query_id, vec_id,
      |  CAST(dot AS DOUBLE) / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(ee AS DOUBLE))) AS cos
      |  FROM dots)
      |SELECT query_id, rank, neighbor_id FROM (
      |  SELECT query_id, vec_id AS neighbor_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
      |  FROM scored) t
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  val q36EmbeddingNearDup: String =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |x AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM e),
      |norms AS (SELECT vec_id,
      |  SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,18))) AS nn
      |  FROM x GROUP BY vec_id),
      |pairs AS (SELECT a.vec_id AS d1, b.vec_id AS d2, a.embedding AS ea, b.embedding AS eb
      |          FROM e a JOIN e b ON a.vec_id < b.vec_id),
      |pe AS (SELECT d1, d2, ea, eb, unnest(generate_series(1, len(ea))) AS i FROM pairs),
      |dots AS (SELECT d1, d2,
      |  SUM(CAST(CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE) AS DECIMAL(28,18))) AS dot
      |  FROM pe GROUP BY d1, d2),
      |scored AS (SELECT d1, d2,
      |  round(CAST(dot AS DOUBLE) /
      |    (sqrt(CAST(n1.nn AS DOUBLE)) * sqrt(CAST(n2.nn AS DOUBLE))), 12) AS cos
      |  FROM dots
      |  JOIN norms n1 ON d1 = n1.vec_id
      |  JOIN norms n2 ON d2 = n2.vec_id)
      |SELECT d1, d2, cos FROM scored
      |WHERE cos >= 0.45
      |ORDER BY d1, d2""".stripMargin

  /** Mirrors q93: semantic decontamination — q36's decimal-exact cosine
    * machinery applied to train × (val ∪ test) pairs, aggregated per
    * train vector. Zero-norm sides are excluded from scoring (the
    * engine's NaN rule) but every train vector keeps its audit row via
    * the final LEFT JOIN. */
  val q93SemanticDecontamination: String =
    """WITH e AS (SELECT vec_id, embedding,
      |    CASE WHEN substring(md5(CAST(vec_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
      |         WHEN substring(md5(CAST(vec_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM embeddings),
      |x AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM e),
      |norms AS (SELECT vec_id,
      |  SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,18))) AS nn
      |  FROM x GROUP BY vec_id),
      |pairs AS (SELECT a.vec_id AS d1, b.vec_id AS d2, a.embedding AS ea, b.embedding AS eb
      |          FROM e a JOIN e b ON a.split = 'train' AND b.split <> 'train'),
      |pe AS (SELECT d1, d2, ea, eb, unnest(generate_series(1, len(ea))) AS i FROM pairs),
      |dots AS (SELECT d1, d2,
      |  SUM(CAST(CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE) AS DECIMAL(28,18))) AS dot
      |  FROM pe GROUP BY d1, d2),
      |scored AS (SELECT d1, d2,
      |  round(CAST(dot AS DOUBLE) /
      |    (sqrt(CAST(n1.nn AS DOUBLE)) * sqrt(CAST(n2.nn AS DOUBLE))), 12) AS cos
      |  FROM dots
      |  JOIN norms n1 ON d1 = n1.vec_id
      |  JOIN norms n2 ON d2 = n2.vec_id
      |  WHERE CAST(n1.nn AS DOUBLE) > 0 AND CAST(n2.nn AS DOUBLE) > 0),
      |agg AS (SELECT d1 AS vec_id,
      |    CAST(COUNT(*) AS BIGINT) AS n_eval_partners, MAX(cos) AS max_cos
      |  FROM scored WHERE cos >= 0.45 GROUP BY d1)
      |SELECT t.vec_id,
      |  COALESCE(a.n_eval_partners, 0) AS n_eval_partners,
      |  a.max_cos,
      |  COALESCE(a.n_eval_partners, 0) > 0 AS quarantined
      |FROM (SELECT vec_id FROM e WHERE split = 'train') t
      |LEFT JOIN agg a ON t.vec_id = a.vec_id
      |ORDER BY t.vec_id""".stripMargin

  /** Mirrors q40: connected components over the exact q36 pair graph via
    * a recursive transitive-closure CTE (the UNION dedups, so cycles in
    * the undirected graph terminate), then component = min reachable id.
    * Reuses the q36 decimal-cosine pair derivation verbatim. */
  val q40NearDupClusters: String =
    """WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings),
      |x AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM e),
      |norms AS (SELECT vec_id,
      |  SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,18))) AS nn
      |  FROM x GROUP BY vec_id),
      |pairs AS (SELECT a.vec_id AS d1, b.vec_id AS d2, a.embedding AS ea, b.embedding AS eb
      |          FROM e a JOIN e b ON a.vec_id < b.vec_id),
      |pe AS (SELECT d1, d2, ea, eb, unnest(generate_series(1, len(ea))) AS i FROM pairs),
      |dots AS (SELECT d1, d2,
      |  SUM(CAST(CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE) AS DECIMAL(28,18))) AS dot
      |  FROM pe GROUP BY d1, d2),
      |scored AS (SELECT d1, d2,
      |  round(CAST(dot AS DOUBLE) /
      |    (sqrt(CAST(n1.nn AS DOUBLE)) * sqrt(CAST(n2.nn AS DOUBLE))), 12) AS cos
      |  FROM dots
      |  JOIN norms n1 ON d1 = n1.vec_id
      |  JOIN norms n2 ON d2 = n2.vec_id),
      |p AS (SELECT d1, d2 FROM scored WHERE cos >= 0.45),
      |edges AS (SELECT d1 AS a, d2 AS b FROM p
      |          UNION ALL SELECT d2 AS a, d1 AS b FROM p),
      |reach(v, r) AS (
      |  SELECT vec_id AS v, vec_id AS r FROM e
      |  UNION
      |  SELECT reach.v, edges.b AS r FROM reach JOIN edges ON reach.r = edges.a
      |),
      |comp AS (SELECT v AS vec_id, MIN(r) AS component FROM reach GROUP BY v)
      |SELECT vec_id, component, vec_id = component AS is_canonical
      |FROM comp
      |ORDER BY vec_id""".stripMargin

  /** Mirrors q37: duplicate-trigram fraction. The dup_frac expression is
    * one int→double cast per operand of a single IEEE division and
    * subtraction — identical trees on both engines, so no rounding is
    * needed for the hash to match. */
  val q37Repetition: String =
    s"""WITH $tokCte,
       |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
       |        FROM tok WHERE len(l) >= 3),
       |g AS (SELECT doc_id, array_to_string(l[i:i+2], ' ') AS gram FROM pos),
       |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       |               CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct
       |        FROM g GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(a.n_trigrams, 0) AS n_trigrams,
       |  COALESCE(a.n_distinct, 0) AS n_distinct,
       |  CASE WHEN COALESCE(a.n_trigrams, 0) > 0
       |       THEN 1.0 - CAST(a.n_distinct AS DOUBLE) / CAST(a.n_trigrams AS DOUBLE)
       |       ELSE 0.0 END AS dup_frac,
       |  (CASE WHEN COALESCE(a.n_trigrams, 0) > 0
       |        THEN 1.0 - CAST(a.n_distinct AS DOUBLE) / CAST(a.n_trigrams AS DOUBLE)
       |        ELSE 0.0 END) > 0.2 AS flagged
       |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Mirrors q39: the composed filter decision — same signal expressions
    * as the q21/q37 oracles, same first-failing-rule CASE ladder. All
    * ratio signals are single IEEE divisions (identical trees → identical
    * bits), so threshold comparisons land on the same side in both
    * engines. */
  val q39FilterPipeline: String =
    s"""WITH $tokCte,
       |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
       |        FROM tok WHERE len(l) >= 3),
       |g AS (SELECT doc_id, array_to_string(l[i:i+2], ' ') AS gram FROM pos),
       |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       |               CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct
       |        FROM g GROUP BY doc_id),
       |base AS (SELECT d.doc_id,
       |  CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT) AS n_tokens,
       |  CAST(length(regexp_replace(d.text, '\\s', '', 'g')) AS DOUBLE) /
       |    greatest(CAST(len(regexp_extract_all(d.text, '\\S+')) AS DOUBLE), 1.0) AS avg_token_len,
       |  CAST(length(regexp_replace(d.text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) /
       |    greatest(CAST(length(d.text) AS DOUBLE), 1.0) AS punct_ratio,
       |  CASE WHEN COALESCE(a.n_trigrams, 0) > 0
       |       THEN 1.0 - CAST(a.n_distinct AS DOUBLE) / CAST(a.n_trigrams AS DOUBLE)
       |       ELSE 0.0 END AS dup_frac
       |  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id)
       |SELECT doc_id, n_tokens, avg_token_len, punct_ratio, dup_frac,
       |  CASE WHEN n_tokens < 20 THEN 'too_short'
       |       WHEN n_tokens > 100000 THEN 'too_long'
       |       WHEN avg_token_len < 3.0 OR avg_token_len > 10.0 THEN 'token_shape'
       |       WHEN punct_ratio > 0.1 THEN 'punct'
       |       WHEN dup_frac > 0.2 THEN 'repetitive'
       |       ELSE 'keep' END AS reason,
       |  (CASE WHEN n_tokens < 20 THEN 'too_short'
       |        WHEN n_tokens > 100000 THEN 'too_long'
       |        WHEN avg_token_len < 3.0 OR avg_token_len > 10.0 THEN 'token_shape'
       |        WHEN punct_ratio > 0.1 THEN 'punct'
       |        WHEN dup_frac > 0.2 THEN 'repetitive'
       |        ELSE 'keep' END) = 'keep' AS keep
       |FROM base
       |ORDER BY doc_id""".stripMargin

  /** Mirrors q38: symmetric int8 quantization audit. scale is a single
    * division (bit-identical across engines); qi is floor over one
    * division+addition (identical trees → identical floor); only the
    * multiply-subtract error chain is rounded (FMA fusing differs per
    * engine, as in q34/q36). The final LEFT JOIN (like q37's from
    * documents) keeps a row for an EMPTY embedding — the unnest pipeline
    * would drop it while Spark's in-row HOFs still emit (scale null,
    * q_sum 0, q_min/q_max/max_err null). */
  val q38Quantize: String =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |x AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM e),
      |m AS (SELECT vec_id, MAX(abs(CAST(embedding[i] AS DOUBLE))) AS maxabs
      |      FROM x GROUP BY vec_id),
      |qx AS (SELECT x.vec_id,
      |         CAST(x.embedding[x.i] AS DOUBLE) AS xi,
      |         m.maxabs / CAST(127 AS DOUBLE) AS scale,
      |         CASE WHEN m.maxabs > 0
      |              THEN CAST(floor(CAST(x.embedding[x.i] AS DOUBLE) /
      |                     (m.maxabs / CAST(127 AS DOUBLE)) + 0.5) AS BIGINT)
      |              ELSE 0 END AS qi
      |       FROM x JOIN m ON x.vec_id = m.vec_id),
      |agg AS (SELECT vec_id,
      |    MAX(scale) AS scale,
      |    CAST(SUM(qi) AS BIGINT) AS q_sum,
      |    CAST(MIN(qi) AS BIGINT) AS q_min,
      |    CAST(MAX(qi) AS BIGINT) AS q_max,
      |    round(MAX(abs(qi * scale - xi)), 12) AS max_err
      |  FROM qx
      |  GROUP BY vec_id)
      |SELECT e.vec_id, a.scale,
      |  COALESCE(a.q_sum, 0) AS q_sum,
      |  a.q_min, a.q_max, a.max_err
      |FROM e LEFT JOIN agg a ON e.vec_id = a.vec_id
      |ORDER BY e.vec_id""".stripMargin

  /** Mirrors q92: JL random projection of the int8-quantized vectors.
    * The quantization replay is q38's verbatim; the sign matrix is
    * DERIVED on both sides — +1 iff the 32nd hex digit of
    * md5('rp:j:i') < '8' (j the 0-based output dim, i the 0-based
    * input dim) — so no side-channel table exists; every projected
    * coordinate is an exact BIGINT sum, hash-stable by construction.
    * Null/empty embeddings project to an empty list on both sides. */
  val q92RandomProjection: String =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |x AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM e),
      |m AS (SELECT vec_id, MAX(abs(CAST(embedding[i] AS DOUBLE))) AS maxabs
      |      FROM x GROUP BY vec_id),
      |qx AS (SELECT x.vec_id, x.i,
      |         m.maxabs / CAST(127 AS DOUBLE) AS scale,
      |         CASE WHEN m.maxabs > 0
      |              THEN CAST(floor(CAST(x.embedding[x.i] AS DOUBLE) /
      |                     (m.maxabs / CAST(127 AS DOUBLE)) + 0.5) AS BIGINT)
      |              ELSE 0 END AS qi
      |       FROM x JOIN m ON x.vec_id = m.vec_id),
      |py AS (SELECT qx.vec_id, j.j,
      |    CAST(SUM(CASE WHEN substring(md5('rp:' || CAST(j.j AS VARCHAR) || ':' ||
      |        CAST(qx.i - 1 AS VARCHAR)), 32, 1) < '8'
      |      THEN qx.qi ELSE -qx.qi END) AS INTEGER) AS y
      |  FROM qx CROSS JOIN range(0, 24) j(j)
      |  GROUP BY qx.vec_id, j.j),
      |proj AS (SELECT vec_id, list(y ORDER BY j) AS proj FROM py GROUP BY vec_id)
      |SELECT e.vec_id,
      |  m.maxabs / CAST(127 AS DOUBLE) AS scale,
      |  COALESCE(array_to_string(p.proj, ','), '') AS proj
      |FROM e
      |LEFT JOIN m ON e.vec_id = m.vec_id
      |LEFT JOIN proj p ON e.vec_id = p.vec_id
      |ORDER BY e.vec_id""".stripMargin

  /** Mirrors q41: top-5 TF-IDF terms per document. The score is one
    * multiply of an ln — rounded to 12 digits BEFORE ranking on both
    * sides (libm ln drifts ulps across engines), ties by term. */
  val q41Tfidf: String =
    s"""WITH $tokCte,
       |t AS (SELECT doc_id, unnest(l) AS term FROM tok),
       |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM t GROUP BY doc_id, term),
       |d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
       |scored AS (SELECT tf.doc_id, tf.term, tf.tf, d.df,
       |    round(CAST(tf.tf AS DOUBLE) * ln(n.n_docs / CAST(d.df AS DOUBLE)), 12) AS tfidf
       |  FROM tf JOIN d USING (term) CROSS JOIN n),
       |ranked AS (SELECT doc_id, term, tf, df, tfidf,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
       |  FROM scored)
       |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, tfidf
       |FROM ranked WHERE rank <= 5
       |ORDER BY doc_id, rank""".stripMargin

  /** Mirrors q48: unigram-LM scoring. Each per-token ln is rounded to 12
    * digits then summed as DECIMAL(28,12) (exact, order-free) on both
    * engines; bits_per_token divides by a literal ln(2). */
  val q48UnigramLogprob: String =
    s"""WITH $tokCte,
       |t AS (SELECT doc_id, unnest(l) AS tok FROM tok),
       |v AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY tok),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM t),
       |lp AS (SELECT t.doc_id,
       |    CAST(round(ln(CAST(v.cnt AS DOUBLE) / CAST(n.n_total AS DOUBLE)), 12)
       |         AS DECIMAL(28,12)) AS lp
       |  FROM t JOIN v USING (tok) CROSS JOIN n),
       |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    round(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 12) AS avg_logprob
       |  FROM lp GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(agg.n_tokens, 0) AS n_tokens,
       |  COALESCE(agg.avg_logprob, 0.0) AS avg_logprob,
       |  COALESCE(round(-agg.avg_logprob / 0.6931471805599453, 12), 0.0)
       |    AS bits_per_token
       |FROM documents d
       |LEFT JOIN agg ON d.doc_id = agg.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Mirrors q43: benchmark decontamination — test-split docs vs
    * train-split docs over the same capped shingle set as q25, splits by
    * the q32 md5 assignment. Pure integer counts, hash-exact. */
  val q43Decontamination: String =
    s"""WITH $shingleCtes,
       |rare AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= 50),
       |shc AS (SELECT sh.doc_id, sh.g FROM sh JOIN rare ON sh.g = rare.g),
       |sp AS (SELECT doc_id,
       |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
       |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |tst AS (SELECT shc.doc_id AS t_doc, shc.g
       |        FROM shc JOIN sp ON shc.doc_id = sp.doc_id WHERE sp.split = 'test'),
       |trn AS (SELECT shc.doc_id AS tr_doc, shc.g
       |        FROM shc JOIN sp ON shc.doc_id = sp.doc_id WHERE sp.split = 'train'),
       |shared AS (SELECT t_doc, tr_doc, CAST(COUNT(*) AS BIGINT) AS shared
       |           FROM tst JOIN trn ON tst.g = trn.g GROUP BY 1, 2),
       |agg AS (SELECT t_doc, CAST(COUNT(*) AS BIGINT) AS n_train_matches,
       |               CAST(MAX(shared) AS BIGINT) AS max_shared
       |        FROM shared WHERE shared >= 5 GROUP BY t_doc)
       |SELECT sp.doc_id,
       |  COALESCE(a.n_train_matches, 0) AS n_train_matches,
       |  COALESCE(a.max_shared, 0) AS max_shared,
       |  COALESCE(a.max_shared, 0) >= 5 AS contaminated
       |FROM sp LEFT JOIN agg a ON sp.doc_id = a.t_doc
       |WHERE sp.split = 'test'
       |ORDER BY sp.doc_id""".stripMargin

  /** Mirrors q42: sequence packing over the global token prefix sum —
    * plain windowed SUM here; the engine's bucketed decomposition must
    * equal it exactly (pure integer arithmetic, so hash-exact). */
  val q42SequencePacking: String =
    s"""WITH $tokCte,
       |c AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens FROM tok),
       |s AS (SELECT doc_id, n_tokens,
       |  COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
       |  FROM c)
       |SELECT doc_id, n_tokens,
       |  CAST(tokens_before // 2048 AS BIGINT) AS chunk_id,
       |  CAST(tokens_before % 2048 AS BIGINT) AS chunk_offset,
       |  (tokens_before % 2048) + n_tokens > 2048 AS spans_chunk
       |FROM s
       |ORDER BY doc_id""".stripMargin

  /** Mirrors q44: anonymized per-/24 access summary. The IP synthesis is
    * q20's (shared `syntheticRemoteIp`); masking and pseudonymization are
    * pure string/md5 operations both engines agree on byte-for-byte. */
  val q44IpAnonymize: String =
    """WITH ips AS (SELECT
      |    (event_id % 223 + 1) || '.' || (user_id % 256) || '.' ||
      |      ((event_id * 7) % 256) || '.' || ((event_id * 13) % 256) AS ip,
      |    (event_id % 223 + 1) || '.' || (user_id % 256) || '.' ||
      |      ((event_id * 7) % 256) || '.0' AS cidr24
      |  FROM events)
      |SELECT cidr24,
      |  COUNT(*) AS n_requests,
      |  COUNT(DISTINCT ip) AS n_ips,
      |  COUNT(DISTINCT substring(md5('graft-salt-v1:' || ip), 1, 16)) AS n_pseudonyms,
      |  MIN(substring(md5('graft-salt-v1:' || ip), 1, 16)) AS first_pseudonym
      |FROM ips
      |GROUP BY cidr24
      |ORDER BY cidr24""".stripMargin

  /** Mirrors q45: temperature-flattened source mixing weights. `power`
    * (libm, the one engine-dependent step) is rounded to 9 digits, the
    * normalizer is an exact DECIMAL sum, and the final division sees
    * bit-identical doubles on both engines. */
  val q45DomainMix: String =
    s"""WITH $weightCtes
       |SELECT source, n_docs, n_tokens, weight,
       |  CAST(FLOOR(weight * 100000) AS BIGINT) AS quota_100k
       |FROM ws
       |ORDER BY source""".stripMargin

  /** Mirrors q46: 10-stage length curriculum. The oracle uses the plain
    * single-task `row_number` NTILE (fine at oracle scale); the engine's
    * three-piece distributed rank must equal it exactly — everything is
    * integer arithmetic except the final single-division mean. */
  val q46Curriculum: String =
    """WITH c AS (SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |r AS (SELECT doc_id, n_tok,
      |    row_number() OVER (ORDER BY n_tok, doc_id) AS rnk,
      |    COUNT(*) OVER () AS n_total
      |  FROM c)
      |SELECT CAST((rnk - 1) * 10 // n_total + 1 AS BIGINT) AS bin,
      |  COUNT(*) AS n_docs,
      |  MIN(n_tok) AS min_tokens,
      |  MAX(n_tok) AS max_tokens,
      |  CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
      |  CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS avg_tokens
      |FROM r
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** Mirrors q47: semantic-dedup drop list over int8-quantized
    * embeddings. Pure integer arithmetic (the cos ≥ 0.45 test is
    * cross-multiplied squares), and deliberately NO float prefilter here:
    * the engine's guard band must be loose enough that pruning changes
    * nothing, or the hash breaks. */
  val q47SemanticDedup: String =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |x AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM e),
      |m AS (SELECT vec_id, MAX(abs(CAST(embedding[i] AS DOUBLE))) AS maxabs
      |      FROM x GROUP BY vec_id),
      |qx AS (SELECT x.vec_id, x.i,
      |         CASE WHEN m.maxabs > 0
      |              THEN CAST(floor(CAST(x.embedding[x.i] AS DOUBLE) /
      |                     (m.maxabs / CAST(127 AS DOUBLE)) + 0.5) AS BIGINT)
      |              ELSE 0 END AS qi
      |       FROM x JOIN m ON x.vec_id = m.vec_id),
      |n AS (SELECT vec_id, CAST(SUM(qi * qi) AS BIGINT) AS n2 FROM qx GROUP BY vec_id),
      |dots AS (SELECT a.vec_id AS v1, b.vec_id AS v2,
      |           CAST(SUM(a.qi * b.qi) AS BIGINT) AS dot
      |         FROM qx a JOIN qx b ON a.i = b.i AND a.vec_id < b.vec_id
      |         GROUP BY 1, 2),
      |sim AS (SELECT v1, v2 FROM dots
      |        JOIN n na ON v1 = na.vec_id
      |        JOIN n nb ON v2 = nb.vec_id
      |        WHERE dot > 0 AND 400 * dot * dot >= 81 * na.n2 * nb.n2)
      |SELECT v2 AS vec_id, MIN(v1) AS keeper_id, COUNT(*) AS n_better
      |FROM sim
      |GROUP BY v2
      |ORDER BY vec_id""".stripMargin

  val q30MultimodalMeta: String =
    """SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |       ELSE 'video' END AS media_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS payload_md5,
      |  CAST(ascii(text) AS BIGINT) AS head_byte
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Mirrors q49: greedy token-budget selection. The oracle uses the
    * plain windowed SUM over (priority DESC, doc_id); the engine's
    * three-piece distributed prefix must equal it exactly — priority and
    * token counts are integers, so the match is hash-exact. NOTE the
    * priority rules are q21's with integer weights; the double
    * comparisons (avg_token_len/punct_ratio bounds) evaluate identical
    * expression trees on both engines. */
  val q49TokenBudget: String =
    s"""WITH ${prioCteOver("documents", "s")},
       |p AS (SELECT doc_id, priority, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY priority DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS tokens_before
       |  FROM s)
       |SELECT doc_id, priority, n_tokens, tokens_before,
       |  tokens_before + n_tokens <= 20000 AS selected
       |FROM p
       |ORDER BY doc_id""".stripMargin

  /** Mirrors q50: top-50 vocabulary with cumulative corpus coverage.
    * Counts are exact longs; coverage is one division per row. */
  val q50VocabCoverage: String =
    s"""WITH $tokCte,
       |t AS (SELECT unnest(l) AS token FROM tok),
       |v AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM t GROUP BY token),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM t),
       |top AS (SELECT token, freq,
       |    CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank,
       |    CAST(SUM(freq) OVER (ORDER BY freq DESC, token
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_freq
       |  FROM v)
       |SELECT rank, token, freq, cum_freq,
       |  CAST(cum_freq AS DOUBLE) / CAST(n_total AS DOUBLE) AS coverage
       |FROM top CROSS JOIN n
       |WHERE rank <= 50
       |ORDER BY rank""".stripMargin

  /** Mirrors q51: per-document character entropy. Chars come from
    * regexp '.'-extraction on both engines; each -p·log2(p) term is
    * rounded to 12 digits and summed as DECIMAL(28,12), so the engines'
    * different summation orders cannot diverge. The char aggregates are
    * LEFT-joined with COALESCE: a document whose text yields zero
    * '.'-extractable chars (empty or newline-only) has no unnest rows,
    * but the engine still emits it (n_chars=0, entropy 0.0, flagged) —
    * an inner join here would silently drop it and break hash parity. */
  val q51CharEntropy: String =
    """WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS c
      |  FROM documents),
      |f AS (SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS k FROM ch GROUP BY 1, 2),
      |n AS (SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_chars,
      |             CAST(COUNT(*) AS BIGINT) AS n_unique FROM f GROUP BY doc_id),
      |e AS (SELECT f.doc_id,
      |    SUM(CAST(round(-(CAST(k AS DOUBLE) / CAST(n.n_chars AS DOUBLE)) *
      |      log2(CAST(k AS DOUBLE) / CAST(n.n_chars AS DOUBLE)), 12)
      |      AS DECIMAL(28,12))) AS s
      |  FROM f JOIN n ON f.doc_id = n.doc_id GROUP BY f.doc_id)
      |SELECT d.doc_id, COALESCE(n.n_chars, 0) AS n_chars,
      |  COALESCE(n.n_unique, 0) AS n_unique_chars,
      |  CAST(COALESCE(e.s, 0) AS DOUBLE) AS entropy_bits,
      |  CAST(COALESCE(e.s, 0) AS DOUBLE) < 3.5 AS flagged
      |FROM documents d
      |LEFT JOIN n ON d.doc_id = n.doc_id
      |LEFT JOIN e ON d.doc_id = e.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Mirrors q52: deterministic stratified sample — k smallest salted
    * doc-id hashes per language; the 13-hex-digit prefix order equals
    * the engine's 52-bit numeric order (fixed-width lowercase hex). */
  val q52StratifiedSample: String =
    """SELECT lang, CAST(rn AS BIGINT) AS sample_rank, doc_id FROM (
      |  SELECT lang, doc_id,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 13),
      |               doc_id) AS rn
      |  FROM documents) t
      |WHERE rn <= 20
      |ORDER BY lang, rn""".stripMargin

  /** Mirrors q57: the full training-set cascade, replayed stage-for-stage
    * — split, quality CASE ladder (q39), exact-dup canonical (q24 key),
    * capped-Jaccard pairs + recursive transitive closure (q25/q40),
    * capped-shingle decontamination vs the test split (q43), and the
    * greedy token budget (q49). Every stage's membership is the previous
    * stage's keepers; all stage decisions are integer/string-exact. */
  val q57PipelineDecision: String =
    """WITH RECURSIVE sp AS MATERIALIZED (SELECT doc_id, text,
      |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
      |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents),
      |tr AS MATERIALIZED (SELECT doc_id, text FROM sp WHERE split = 'train'),
      |tok1 AS (SELECT doc_id,
      |    regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS l
      |  FROM tr),
      |pos1 AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
      |         FROM tok1 WHERE len(l) >= 3),
      |g1 AS (SELECT doc_id, array_to_string(l[i:i+2], ' ') AS gram FROM pos1),
      |agg1 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tri,
      |                CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_dis
      |         FROM g1 GROUP BY doc_id),
      |qual AS (SELECT b.doc_id,
      |    CASE WHEN n_tokens < 20 THEN 'too_short'
      |         WHEN n_tokens > 100000 THEN 'too_long'
      |         WHEN avg_token_len < 3.0 OR avg_token_len > 10.0 THEN 'token_shape'
      |         WHEN punct_ratio > 0.1 THEN 'punct'
      |         WHEN dup_frac > 0.2 THEN 'repetitive'
      |         ELSE 'keep' END AS reason
      |  FROM (SELECT d.doc_id,
      |      CAST(len(regexp_extract_all(d.text, '\S+')) AS BIGINT) AS n_tokens,
      |      CAST(length(regexp_replace(d.text, '\s', '', 'g')) AS DOUBLE) /
      |        greatest(CAST(len(regexp_extract_all(d.text, '\S+')) AS DOUBLE), 1.0) AS avg_token_len,
      |      CAST(length(regexp_replace(d.text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) /
      |        greatest(CAST(length(d.text) AS DOUBLE), 1.0) AS punct_ratio,
      |      CASE WHEN COALESCE(a.n_tri, 0) > 0
      |           THEN 1.0 - CAST(a.n_dis AS DOUBLE) / CAST(a.n_tri AS DOUBLE)
      |           ELSE 0.0 END AS dup_frac
      |    FROM tr d LEFT JOIN agg1 a ON d.doc_id = a.doc_id) b),
      |keep1 AS MATERIALIZED (SELECT tr.doc_id, tr.text FROM tr
      |          JOIN qual ON tr.doc_id = qual.doc_id WHERE qual.reason = 'keep'),
      |k2 AS MATERIALIZED (SELECT doc_id, text,
      |    md5(array_to_string(
      |      regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+')[1:8],
      |      ' ')) AS gk
      |  FROM keep1),
      |canon AS (SELECT gk, MIN(doc_id) AS can FROM k2 GROUP BY gk),
      |dropx AS (SELECT k2.doc_id FROM k2 JOIN canon ON k2.gk = canon.gk
      |          WHERE k2.doc_id <> canon.can),
      |keep2 AS MATERIALIZED (SELECT k2.doc_id, k2.text FROM k2 JOIN canon ON k2.gk = canon.gk
      |          WHERE k2.doc_id = canon.can),
      |tok2 AS (SELECT doc_id,
      |    regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS l
      |  FROM keep2),
      |pos2 AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
      |         FROM tok2 WHERE len(l) >= 3),
      |sh2 AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g FROM pos2),
      |rare2 AS (SELECT g FROM sh2 GROUP BY g HAVING count(*) <= 50),
      |shc2 AS MATERIALIZED (SELECT sh2.doc_id, sh2.g FROM sh2 JOIN rare2 ON sh2.g = rare2.g),
      |sz2 AS (SELECT doc_id, count(*) AS n FROM shc2 GROUP BY doc_id),
      |com2 AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
      |         FROM shc2 a JOIN shc2 b ON a.g = b.g AND a.doc_id < b.doc_id
      |         GROUP BY 1, 2),
      |prs AS (SELECT d1, d2 FROM com2
      |        JOIN sz2 s1 ON d1 = s1.doc_id JOIN sz2 s2 ON d2 = s2.doc_id
      |        WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.5),
      |edges AS (SELECT d1 AS a, d2 AS b FROM prs
      |          UNION ALL SELECT d2 AS a, d1 AS b FROM prs),
      |reach(v, r) AS (
      |  SELECT doc_id AS v, doc_id AS r FROM keep2
      |  UNION
      |  SELECT reach.v, edges.b AS r FROM reach JOIN edges ON reach.r = edges.a),
      |comp AS (SELECT v AS doc_id, MIN(r) AS component FROM reach GROUP BY v),
      |dropn AS (SELECT doc_id FROM comp WHERE doc_id <> component),
      |keep3 AS MATERIALIZED (SELECT keep2.doc_id, keep2.text FROM keep2
      |          LEFT JOIN dropn ON keep2.doc_id = dropn.doc_id
      |          WHERE dropn.doc_id IS NULL),
      |pop AS MATERIALIZED (SELECT doc_id, text FROM keep3
      |        UNION ALL SELECT doc_id, text FROM sp WHERE split = 'test'),
      |tokp AS (SELECT doc_id,
      |    regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS l
      |  FROM pop),
      |posp AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
      |         FROM tokp WHERE len(l) >= 3),
      |shp AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g FROM posp),
      |rarep AS (SELECT g FROM shp GROUP BY g HAVING count(*) <= 50),
      |shcp AS MATERIALIZED (SELECT shp.doc_id, shp.g FROM shp JOIN rarep ON shp.g = rarep.g),
      |ovl AS (SELECT trn.doc_id AS tr_doc, tst.doc_id AS t_doc, count(*) AS shared
      |        FROM (SELECT shcp.doc_id, g FROM shcp JOIN sp ON shcp.doc_id = sp.doc_id
      |              WHERE sp.split <> 'test') trn
      |        JOIN (SELECT shcp.doc_id, g FROM shcp JOIN sp ON shcp.doc_id = sp.doc_id
      |              WHERE sp.split = 'test') tst ON trn.g = tst.g
      |        GROUP BY 1, 2),
      |contam AS (SELECT DISTINCT tr_doc AS doc_id FROM ovl WHERE shared >= 5),
      |keep4 AS MATERIALIZED (SELECT keep3.doc_id, keep3.text FROM keep3
      |          LEFT JOIN contam ON keep3.doc_id = contam.doc_id
      |          WHERE contam.doc_id IS NULL),
      |""".stripMargin + prioCteOver("keep4", "pq") + """,
      |bsel AS (SELECT doc_id,
      |    (CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY priority DESC, doc_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |     + n_tokens) <= 8000 AS selected
      |  FROM pq),
      |verdicts AS (SELECT tr.doc_id,
      |    CASE WHEN qual.reason <> 'keep' THEN 'quality:' || qual.reason
      |         WHEN dropx.doc_id IS NOT NULL THEN 'exact_dup'
      |         WHEN dropn.doc_id IS NOT NULL THEN 'near_dup'
      |         WHEN contam.doc_id IS NOT NULL THEN 'contaminated'
      |         WHEN NOT bsel.selected THEN 'over_budget'
      |         ELSE 'keep' END AS verdict
      |  FROM tr
      |  JOIN qual ON tr.doc_id = qual.doc_id
      |  LEFT JOIN dropx ON tr.doc_id = dropx.doc_id
      |  LEFT JOIN dropn ON tr.doc_id = dropn.doc_id
      |  LEFT JOIN contam ON tr.doc_id = contam.doc_id
      |  LEFT JOIN bsel ON tr.doc_id = bsel.doc_id)
      |SELECT doc_id, verdict, verdict = 'keep' AS selected
      |FROM verdicts
      |ORDER BY doc_id""".stripMargin

  /** Mirrors q53: cross-document repetition — distinct 3-gram document
    * frequencies over the q25 shingle CTE; pure integer counts plus one
    * division. Documents shorter than 3 tokens have no grams and are
    * absent on both sides. */
  val q53CrossDocRepetition: String =
    s"""WITH $shingleCtes,
       |df AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY g)
       |SELECT sh.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_grams,
       |  CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       |  CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(COUNT(*) AS DOUBLE) AS shared_frac,
       |  CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(COUNT(*) AS DOUBLE) >= 0.5 AS flagged
       |FROM sh JOIN df ON sh.g = df.g
       |GROUP BY sh.doc_id
       |ORDER BY sh.doc_id""".stripMargin

  /** Mirrors q58: BM25 top-20 against the fixed query-term set. Every
    * float rule from q41/q48 applies: idf and each per-term partial are
    * rounded to 12 digits (libm ln), the per-doc sum runs over
    * DECIMAL(28,12), and the BM25 constants appear as the same decimal
    * literals on both sides (2.2 and 0.25 are parsed, never computed).
    * The arithmetic is the same left-associated expression tree as the
    * Spark side, so partials are bit-identical. */
  val q58Bm25: String =
    s"""WITH $tokCte,
       |d AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl, l FROM tok),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |               CAST(SUM(dl) AS BIGINT) AS n_total FROM d),
       |t AS (SELECT doc_id, dl, unnest(l) AS term FROM d),
       |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM t WHERE term IN ('spark', 'vector', 'merge', 'window')
       |       GROUP BY doc_id, dl, term),
       |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |sc AS (SELECT tf.doc_id, tf.dl,
       |    CAST(round(
       |      round(ln((CAST(tot.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5) /
       |               (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0), 12)
       |      * (CAST(tf.tf AS DOUBLE) * 2.2)
       |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE) /
       |          (CAST(tot.n_total AS DOUBLE) / CAST(tot.n_docs AS DOUBLE)))), 12)
       |      AS DECIMAL(28,12)) AS part
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN tot),
       |agg AS (SELECT doc_id, CAST(MIN(dl) AS BIGINT) AS n_tokens,
       |    CAST(COUNT(*) AS BIGINT) AS n_hit_terms, SUM(part) AS sc
       |  FROM sc GROUP BY doc_id),
       |topk AS (SELECT * FROM agg ORDER BY CAST(sc AS DOUBLE) DESC, doc_id LIMIT 20)
       |SELECT doc_id, n_tokens, n_hit_terms, CAST(sc AS DOUBLE) AS score
       |FROM topk
       |ORDER BY doc_id""".stripMargin

  /** Mirrors q172 (`ops.Retrieval.q172QueryExpansion`): the Rocchio
    * loop replayed move-for-move — seed BM25 top-10, feedback term
    * mass excluding seed terms, corpus df for exactly those terms,
    * round(idf,12)·tfSum rounded 12 with (w DESC, term) ties, then
    * the second BM25 pass over seed ∪ expansion, top-15. Both top-k
    * cuts rank over the DOUBLE cast of the decimal sum — the
    * q58/q151/q156/q157 discipline, matching bm25TopK's ordering. */
  val q172QueryExpansion: String =
    s"""WITH $tokCte,
       |d AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl, l FROM tok),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |               CAST(SUM(dl) AS BIGINT) AS n_total FROM d),
       |t AS (SELECT doc_id, dl, unnest(l) AS term FROM d),
       |tf1 AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM t WHERE term IN ('spark', 'vector', 'merge', 'window')
       |       GROUP BY doc_id, dl, term),
       |df1 AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf1 GROUP BY term),
       |sc1 AS (SELECT tf1.doc_id,
       |    CAST(round(
       |      round(ln((CAST(tot.n_docs AS DOUBLE) - CAST(df1.df AS DOUBLE) + 0.5) /
       |               (CAST(df1.df AS DOUBLE) + 0.5) + 1.0), 12)
       |      * (CAST(tf1.tf AS DOUBLE) * 2.2)
       |      / (CAST(tf1.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tf1.dl AS DOUBLE) /
       |          (CAST(tot.n_total AS DOUBLE) / CAST(tot.n_docs AS DOUBLE)))), 12)
       |      AS DECIMAL(28,12)) AS part
       |  FROM tf1 JOIN df1 USING (term) CROSS JOIN tot),
       |top1 AS (SELECT doc_id FROM (SELECT doc_id, SUM(part) AS sc
       |    FROM sc1 GROUP BY doc_id)
       |  ORDER BY CAST(sc AS DOUBLE) DESC, doc_id LIMIT 10),
       |fb AS (SELECT t.term, CAST(COUNT(*) AS BIGINT) AS tf_sum
       |  FROM t JOIN top1 USING (doc_id)
       |  WHERE t.term NOT IN ('spark', 'vector', 'merge', 'window')
       |  GROUP BY t.term),
       |dfq AS (SELECT t.term, CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS df
       |  FROM t JOIN fb ON t.term = fb.term GROUP BY t.term),
       |exp AS (SELECT term FROM (
       |    SELECT fb.term,
       |      round(round(ln((CAST(tot.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5) /
       |             (CAST(dfq.df AS DOUBLE) + 0.5) + 1.0), 12)
       |        * CAST(fb.tf_sum AS DOUBLE), 12) AS w
       |    FROM fb JOIN dfq USING (term) CROSS JOIN tot)
       |  ORDER BY w DESC, term LIMIT 4),
       |q2 AS (SELECT term FROM exp
       |  UNION ALL SELECT * FROM (VALUES ('spark'), ('vector'),
       |    ('merge'), ('window')) AS s(term)),
       |tf2 AS (SELECT t.doc_id, t.dl, t.term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM t JOIN q2 ON t.term = q2.term
       |  GROUP BY t.doc_id, t.dl, t.term),
       |df2 AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf2 GROUP BY term),
       |sc2 AS (SELECT tf2.doc_id, tf2.dl,
       |    CAST(round(
       |      round(ln((CAST(tot.n_docs AS DOUBLE) - CAST(df2.df AS DOUBLE) + 0.5) /
       |               (CAST(df2.df AS DOUBLE) + 0.5) + 1.0), 12)
       |      * (CAST(tf2.tf AS DOUBLE) * 2.2)
       |      / (CAST(tf2.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tf2.dl AS DOUBLE) /
       |          (CAST(tot.n_total AS DOUBLE) / CAST(tot.n_docs AS DOUBLE)))), 12)
       |      AS DECIMAL(28,12)) AS part
       |  FROM tf2 JOIN df2 USING (term) CROSS JOIN tot),
       |agg2 AS (SELECT doc_id, CAST(MIN(dl) AS BIGINT) AS n_tokens,
       |    CAST(COUNT(*) AS BIGINT) AS n_hit_terms, SUM(part) AS sc
       |  FROM sc2 GROUP BY doc_id),
       |topk AS (SELECT * FROM agg2
       |  ORDER BY CAST(sc AS DOUBLE) DESC, doc_id LIMIT 15)
       |SELECT doc_id, n_tokens, n_hit_terms, CAST(sc AS DOUBLE) AS score
       |FROM topk
       |ORDER BY doc_id""".stripMargin

  /** Mirrors q96: q58's BM25 replay restricted to the SURVIVING
    * documents — a tombstone-masked index must rank, count df and
    * average dl exactly as if the dead docs never existed. */
  val q96IndexDeleteProbe: String =
    s"""WITH $tokCte,
       |d AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl, l FROM tok
       |      WHERE doc_id % 5 <> 0),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |               CAST(SUM(dl) AS BIGINT) AS n_total FROM d),
       |t AS (SELECT doc_id, dl, unnest(l) AS term FROM d),
       |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM t WHERE term IN ('spark', 'vector', 'merge', 'window')
       |       GROUP BY doc_id, dl, term),
       |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |sc AS (SELECT tf.doc_id, tf.dl,
       |    CAST(round(
       |      round(ln((CAST(tot.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5) /
       |               (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0), 12)
       |      * (CAST(tf.tf AS DOUBLE) * 2.2)
       |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE) /
       |          (CAST(tot.n_total AS DOUBLE) / CAST(tot.n_docs AS DOUBLE)))), 12)
       |      AS DECIMAL(28,12)) AS part
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN tot),
       |agg AS (SELECT doc_id, CAST(MIN(dl) AS BIGINT) AS n_tokens,
       |    CAST(COUNT(*) AS BIGINT) AS n_hit_terms, SUM(part) AS sc
       |  FROM sc GROUP BY doc_id),
       |topk AS (SELECT * FROM agg ORDER BY CAST(sc AS DOUBLE) DESC, doc_id LIMIT 20)
       |SELECT doc_id, n_tokens, n_hit_terms, CAST(sc AS DOUBLE) AS score
       |FROM topk
       |ORDER BY doc_id""".stripMargin

  /** Mirrors q100: q58's BM25 replay over the DERIVED v2 corpus —
    * the synced index must rank exactly like a fresh build of it.
    * v2 replays the engine's derivation: %7=0 removed, %7=1 changed
    * (query terms appended), %7=2 re-added at max(doc_id)+1-shifted
    * ids with a different mutation. */
  val q100IndexSyncProbe: String =
    """WITH v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 1 THEN text || ' spark spark window'
      |         ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents),
      |    text || ' merge vector'
      |  FROM documents WHERE doc_id % 7 = 2),
      |tok AS (SELECT doc_id,
      |  regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS l
      |FROM v2),
      |d AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl, l FROM tok),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |               CAST(SUM(dl) AS BIGINT) AS n_total FROM d),
      |t AS (SELECT doc_id, dl, unnest(l) AS term FROM d),
      |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM t WHERE term IN ('spark', 'vector', 'merge', 'window')
      |       GROUP BY doc_id, dl, term),
      |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
      |sc AS (SELECT tf.doc_id, tf.dl,
      |    CAST(round(
      |      round(ln((CAST(tot.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5) /
      |               (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0), 12)
      |      * (CAST(tf.tf AS DOUBLE) * 2.2)
      |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE) /
      |          (CAST(tot.n_total AS DOUBLE) / CAST(tot.n_docs AS DOUBLE)))), 12)
      |      AS DECIMAL(28,12)) AS part
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN tot),
      |agg AS (SELECT doc_id, CAST(MIN(dl) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS n_hit_terms, SUM(part) AS sc
      |  FROM sc GROUP BY doc_id),
      |topk AS (SELECT * FROM agg ORDER BY CAST(sc AS DOUBLE) DESC, doc_id LIMIT 20)
      |SELECT doc_id, n_tokens, n_hit_terms, CAST(sc AS DOUBLE) AS score
      |FROM topk
      |ORDER BY doc_id""".stripMargin

  /** Mirrors q59: sliding 64-token windows at stride 48. Chunk count
    * and offsets are exact integer arithmetic; the per-chunk hash is md5
    * of the space-joined clamped slice on both sides. */
  val q59Chunking: String =
    s"""WITH $tokCte,
       |c AS (SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n
       |      FROM tok WHERE len(l) >= 1),
       |nc AS (SELECT doc_id, l, n,
       |    1 + CASE WHEN n > 64 THEN (n - 64 + 47) // 48 ELSE 0 END AS n_chunks
       |  FROM c),
       |ch AS (SELECT doc_id, l, n,
       |    unnest(generate_series(0, n_chunks - 1)) AS chunk_id
       |  FROM nc)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(chunk_id * 48 + 1 AS BIGINT) AS chunk_start,
       |  CAST(least(64, n - chunk_id * 48) AS BIGINT) AS chunk_len,
       |  md5(array_to_string(l[(chunk_id * 48 + 1):(chunk_id * 48 + 64)], ' '))
       |    AS chunk_md5
       |FROM ch
       |ORDER BY doc_id, chunk_id""".stripMargin

  /** Shared CTE: the q20 synthesized access-log line, rebuilt verbatim
    * (the q20-oracle field formulas, concatenated in line order with
    * single-space separators — mirrors LogParsing.syntheticLogLine). */
  private val logLineCte =
    """line AS (SELECT event_id,
      |  'owner' || (user_id % 4) ||
      |  ' bucket' || (event_id % 3) ||
      |  ' [' || strftime(ts, '%d/%b/%Y:%H:%M:%S') || ' +0000] ' ||
      |  (event_id % 223 + 1) || '.' || (user_id % 256) || '.' ||
      |    ((event_id * 7) % 256) || '.' || ((event_id * 13) % 256) ||
      |  ' ' || CASE WHEN event_type = 'purchase'
      |           THEN 'arn:aws:sts::123456789012:assumed-role/Deploy/i-' || event_id
      |         WHEN event_type = 'click'
      |           THEN 'arn:aws:iam::123456789012:user/u' || user_id
      |         ELSE '-' END ||
      |  ' REQ' || event_id ||
      |  ' REST.' || upper(event_type) || '.OBJECT' ||
      |  ' data/k' || (event_id % 50) || '.bin' ||
      |  ' "GET /bucket' || (event_id % 3) || '/data/k' || (event_id % 50) ||
      |    '.bin HTTP/1.1"' ||
      |  ' ' || CASE WHEN value < 10 THEN '404' ELSE '200' END ||
      |  ' ' || CASE WHEN value < 10 THEN 'NoSuchKey' ELSE '-' END ||
      |  ' ' || CASE WHEN value < 50 THEN '-'
      |              ELSE CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR) END ||
      |  ' ' || CAST(CAST(floor(value * 1000) AS BIGINT) AS VARCHAR) ||
      |  ' 15 5 "-" "Mozilla/5.0 (Test; x64)" - hostIdExample123 SigV4' ||
      |  ' ECDHE-RSA-AES128-GCM-SHA256 AuthHeader' ||
      |  ' bucket' || (event_id % 3) || '.s3.us-west-2.amazonaws.com TLSv1.2' AS l
      |FROM events)""".stripMargin

  /** Mirrors q60: PII scan + redaction over the synthesized log lines.
    * Same RE2-safe patterns, same fixed redaction order (emails → IPs →
    * digit runs), and the same STAGED counting — each class counted on
    * the text its redaction pass sees, so counts reconcile with
    * placeholders exactly. DuckDB's regexp_replace needs the explicit
    * 'g' flag to match Spark's replace-all default. */
  val q60PiiRedact: String =
    s"""WITH $logLineCte,
       |staged AS (SELECT event_id, l,
       |    regexp_replace(l,
       |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g')
       |      AS after_emails
       |  FROM line),
       |staged2 AS (SELECT event_id, l, after_emails,
       |    regexp_replace(after_emails,
       |      '([0-9]{1,3}\\.){3}[0-9]{1,3}', '<IP>', 'g') AS after_ips
       |  FROM staged)
       |SELECT event_id,
       |  CAST(len(regexp_extract_all(l,
       |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(after_emails,
       |    '([0-9]{1,3}\\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(after_ips, '[0-9]{4,}')) AS BIGINT)
       |    AS n_digit_runs,
       |  md5(regexp_replace(after_ips, '[0-9]{4,}', '<NUM>', 'g')) AS redacted_md5
       |FROM staged2
       |ORDER BY event_id""".stripMargin

  /** Mirrors q61: per-source quota by the q49 priority. The oracle's
    * per-source `row_number` (priority DESC, doc_id) must equal the
    * engine's bounded top_k aggregate exactly — integer priorities,
    * deterministic tie-break. */
  val q61SourceQuota: String =
    s"""WITH ${prioCteOver("documents", "s", ", source")},
       |r AS (SELECT source, doc_id, priority,
       |    row_number() OVER (PARTITION BY source
       |                       ORDER BY priority DESC, doc_id) AS quota_rank
       |  FROM s)
       |SELECT source, CAST(quota_rank AS BIGINT) AS quota_rank, doc_id, priority
       |FROM r WHERE quota_rank <= 50
       |ORDER BY source, quota_rank""".stripMargin

  /** Mirrors q62: Efraimidis–Spirakis weighted sample under the q45
    * weight table (per-doc weight = source weight / source doc count).
    * u is exact dyadic arithmetic on the 52-bit hash; ln is rounded to
    * 12 digits before the division and the key after it, mirroring the
    * Spark expression tree exactly. */
  val q62WeightedSample: String =
    s"""WITH $weightCtes,
       |keyed AS (SELECT d.doc_id, d.source, ws.weight,
       |    round(-round(ln((CAST(('0x' || substring(md5('wsample:' ||
       |        CAST(d.doc_id AS VARCHAR)), 1, 13))::BIGINT AS DOUBLE) + 1.0) /
       |        4503599627370496.0), 12) /
       |      (ws.weight / CAST(ws.n_docs AS DOUBLE)), 12) AS sample_key
       |  FROM documents d JOIN ws USING (source)),
       |topk AS (SELECT * FROM keyed ORDER BY sample_key, doc_id LIMIT 100)
       |SELECT doc_id, source, weight, sample_key
       |FROM topk
       |ORDER BY doc_id""".stripMargin

  /** Mirrors q63: snapshot diff against the deterministically-derived
    * next corpus version (drop %11, rewrite %7, append %13 shifted past
    * max(doc_id) — data-derived, so the shift never collides with real
    * ids). Pure md5 fingerprint comparison over a full-outer join —
    * hash-exact by construction. */
  val q63SnapshotDiff: String =
    """WITH a AS (SELECT doc_id, md5(text) AS md5_a FROM documents),
      |b0 AS (SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END AS text
      |  FROM documents WHERE doc_id % 11 <> 0),
      |bnew AS (SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id,
      |    text
      |  FROM documents WHERE doc_id % 13 = 0),
      |b AS (SELECT doc_id, md5(text) AS md5_b FROM
      |  (SELECT * FROM b0 UNION ALL SELECT * FROM bnew)),
      |j AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, a.md5_a, b.md5_b
      |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
      |SELECT doc_id,
      |  CASE WHEN md5_a IS NULL THEN 'added'
      |       WHEN md5_b IS NULL THEN 'removed'
      |       WHEN md5_a = md5_b THEN 'unchanged'
      |       ELSE 'changed' END AS status,
      |  md5_a, md5_b
      |FROM j
      |ORDER BY doc_id""".stripMargin

  /** Mirrors q66: bigram LM scoring — conditional ln(c(w1,w2)/c1(w1))
    * where c1 counts bigram STARTS (the conditional sums to 1, no
    * smoothing needed on the training corpus itself). Per-occurrence
    * decimal sums + 12-digit rounding + literal ln(2), per q48's rules;
    * zero-bigram documents kept via LEFT JOIN + COALESCE (q51 lesson). */
  val q66BigramLogprob: String =
    s"""WITH $tokCte,
       |bi AS (SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
       |  FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM tok)),
       |b AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb FROM bi GROUP BY 1, 2),
       |u AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bi GROUP BY 1),
       |lp AS (SELECT bi.doc_id,
       |    CAST(round(ln(CAST(b.cb AS DOUBLE) / CAST(u.c1 AS DOUBLE)), 12)
       |         AS DECIMAL(28,12)) AS lp
       |  FROM bi JOIN b USING (w1, w2) JOIN u USING (w1)),
       |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |    round(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 12) AS avg_logprob
       |  FROM lp GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(a.n_bigrams, 0) AS n_bigrams,
       |  COALESCE(a.avg_logprob, 0.0) AS avg_logprob,
       |  COALESCE(round(-a.avg_logprob / 0.6931471805599453, 12), 0.0)
       |    AS bits_per_bigram
       |FROM documents d
       |LEFT JOIN agg a ON d.doc_id = a.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Mirrors q69: per-source unigram KL divergence from the corpus
    * pool. The ln argument is the exact integer cross-ratio
    * (k·nc)/(ns·ck) evaluated in the same doubles; ln rounded to 12,
    * each p·ln contribution rounded to 12 into DECIMAL(28,12) (q48's
    * rules), ln(2) a literal, kl_bits derived from the ROUNDED nats. */
  val q69SourceDivergence: String =
    """WITH st AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS k FROM (
      |    SELECT d.source, unnest(regexp_extract_all(
      |      trim(regexp_replace(lower(d.text), '\s+', ' ', 'g')), '\S+')) AS w
      |    FROM documents d) GROUP BY source, w),
      |c AS (SELECT w, CAST(SUM(k) AS BIGINT) AS ck FROM st GROUP BY w),
      |s AS (SELECT source, CAST(SUM(k) AS BIGINT) AS ns FROM st GROUP BY source),
      |n AS (SELECT CAST(SUM(ck) AS BIGINT) AS nc FROM c),
      |t AS (SELECT st.source, st.k, s.ns,
      |    round(ln((CAST(st.k AS DOUBLE) * CAST(n.nc AS DOUBLE)) /
      |             (CAST(s.ns AS DOUBLE) * CAST(c.ck AS DOUBLE))), 12) AS lnterm
      |  FROM st JOIN c USING (w) JOIN s USING (source) CROSS JOIN n),
      |x AS (SELECT source, ns,
      |    CAST(round((CAST(k AS DOUBLE) / CAST(ns AS DOUBLE)) * lnterm, 12)
      |         AS DECIMAL(28,12)) AS t2
      |  FROM t),
      |agg AS (SELECT source, MAX(ns) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS n_terms,
      |    round(CAST(SUM(t2) AS DOUBLE), 12) AS kl_nats
      |  FROM x GROUP BY source)
      |SELECT source, n_tokens, n_terms, kl_nats,
      |  round(kl_nats / 0.6931471805599453, 12) AS kl_bits
      |FROM agg
      |ORDER BY source""".stripMargin

  /** Mirrors q70: exact substring-level duplication. Same 52-bit-md5
    * gram hash, same >= 2 corpus-occurrence criterion, same
    * merge-overlapping-windows span union via gaps-and-islands; all
    * integer arithmetic until the final exact-ratio round(…, 12).
    * DuckDB's generate_series rejects lateral column parameters, so the
    * position axis is a corpus-max-length series joined on
    * i <= length - 19 — short docs get zero rows and return through the
    * LEFT JOIN. */
  val q70SubstringDup: String =
    """WITH mx AS (SELECT MAX(length(text)) AS m FROM documents),
      |g AS (
      |  SELECT d.doc_id, CAST(t.i AS BIGINT) AS pos,
      |    ('0x'||substr(md5(substr(d.text, CAST(t.i AS INT), 20)),1,13))::BIGINT AS h
      |  FROM documents d
      |  JOIN (SELECT unnest(generate_series(1, (SELECT m FROM mx))) AS i) t
      |    ON t.i <= length(d.text) - 19),
      |dup AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2),
      |p AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
      |b AS (SELECT doc_id, pos,
      |    CASE WHEN lag(pos) OVER w IS NULL
      |         OR pos - lag(pos) OVER w > 20 THEN 1 ELSE 0 END AS brk
      |  FROM p WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |isl AS (SELECT doc_id, pos,
      |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM b),
      |cov AS (SELECT doc_id, island, MIN(pos) AS mn, MAX(pos) AS mx,
      |    CAST(COUNT(*) AS BIGINT) AS np
      |  FROM isl GROUP BY doc_id, island),
      |per AS (SELECT doc_id, CAST(SUM(np) AS BIGINT) AS dp,
      |    CAST(SUM(mx - mn + 20) AS BIGINT) AS dc
      |  FROM cov GROUP BY doc_id)
      |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
      |  COALESCE(per.dp, 0) AS dup_positions,
      |  COALESCE(per.dc, 0) AS dup_chars,
      |  round(CAST(COALESCE(per.dc, 0) AS DOUBLE) /
      |        CAST(GREATEST(length(d.text), 1) AS DOUBLE), 12) AS dup_frac
      |FROM documents d
      |LEFT JOIN per ON d.doc_id = per.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Mirrors q71: hard negatives = BM25 top-10 per query doc (query
    * terms = the doc's distinct tokens, uncapped — this fixture's
    * uniform vocabulary makes any df cutoff keep-all-or-none; idf does
    * the downweighting), minus self and minus MinHash-LSH near-dup
    * partners (the shared `lshCtes` chain). The per-term part is q58's
    * exact formula — same double rounding, same DECIMAL(28,12) sum;
    * rank ties break by doc_id, matching the engine's top_k
    * (score desc, id asc) order. */
  val q71HardNegatives: String =
    s"""WITH $shingleCtes,
       |$lshCtes,
       |pairs AS (SELECT d1, d2 FROM common
       |  JOIN szc s1 ON common.d1 = s1.doc_id
       |  JOIN szc s2 ON common.d2 = s2.doc_id
       |  WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.5),
       |d AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl, l FROM tok),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |               CAST(SUM(dl) AS BIGINT) AS n_total FROM d),
       |qt AS (SELECT DISTINCT doc_id AS query_id, unnest(l) AS term
       |       FROM d WHERE doc_id % 100 = 0),
       |t AS (SELECT doc_id, dl, unnest(l) AS term FROM d),
       |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM t WHERE term IN (SELECT term FROM qt)
       |       GROUP BY doc_id, dl, term),
       |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |inform AS (SELECT qt.query_id, qt.term FROM qt JOIN dfreq USING (term)),
       |hn_champs AS (SELECT term, doc_id FROM (
       |    SELECT term, doc_id,
       |      row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn
       |    FROM tf) z WHERE rn <= 1000),
       |hn_cand AS (SELECT DISTINCT i.query_id, c.doc_id
       |  FROM hn_champs c JOIN inform i USING (term)
       |  WHERE c.doc_id <> i.query_id),
       |parts AS (SELECT i.query_id, tf.doc_id,
       |    CAST(round(
       |      round(ln((CAST(tot.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5) /
       |               (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0), 12)
       |      * (CAST(tf.tf AS DOUBLE) * 2.2)
       |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE) /
       |          (CAST(tot.n_total AS DOUBLE) / CAST(tot.n_docs AS DOUBLE)))), 12)
       |      AS DECIMAL(28,12)) AS part
       |  FROM tf JOIN inform i USING (term) JOIN dfreq USING (term) CROSS JOIN tot
       |  JOIN hn_cand ON hn_cand.query_id = i.query_id AND hn_cand.doc_id = tf.doc_id
       |  WHERE tf.doc_id <> i.query_id),
       |scored AS (SELECT query_id, doc_id, SUM(part) AS sc
       |           FROM parts GROUP BY query_id, doc_id),
       |kept AS (SELECT s.query_id, s.doc_id, s.sc FROM scored s
       |  LEFT JOIN (SELECT d1 AS a, d2 AS b FROM pairs
       |             UNION ALL SELECT d2, d1 FROM pairs) e
       |    ON s.query_id = e.a AND s.doc_id = e.b
       |  WHERE e.a IS NULL),
       |rk AS (SELECT query_id, doc_id, CAST(sc AS DOUBLE) AS score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY CAST(sc AS DOUBLE) DESC, doc_id) AS BIGINT) AS rank
       |  FROM kept)
       |SELECT query_id, rank, doc_id, score FROM rk
       |WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  /** Mirrors q98: the contrastive triples — the q71 BM25+exclusion
    * machinery with the query set being the SALTED-DRAW anchors (docs
    * with a MinHash partner, 64 smallest md5('contrastive:'||id) keys),
    * positives = min partner, negatives = the rank-ordered top-4 kept
    * scores assembled into a list. */
  val q98ContrastiveSet: String =
    s"""WITH $shingleCtes,
       |$lshCtes,
       |pairs AS (SELECT d1, d2 FROM common
       |  JOIN szc s1 ON common.d1 = s1.doc_id
       |  JOIN szc s2 ON common.d2 = s2.doc_id
       |  WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.5),
       |sym AS (SELECT d1 AS a, d2 AS p FROM pairs
       |        UNION ALL SELECT d2, d1 FROM pairs),
       |anch AS (SELECT a AS doc_id, MIN(p) AS pos_id FROM sym GROUP BY a
       |         ORDER BY md5('contrastive:'||CAST(a AS VARCHAR)), a LIMIT 64),
       |d AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl, l FROM tok),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |               CAST(SUM(dl) AS BIGINT) AS n_total FROM d),
       |qt AS (SELECT DISTINCT an.doc_id AS query_id, unnest(d.l) AS term
       |       FROM anch an JOIN d ON an.doc_id = d.doc_id),
       |t AS (SELECT doc_id, dl, unnest(l) AS term FROM d),
       |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM t WHERE term IN (SELECT term FROM qt)
       |       GROUP BY doc_id, dl, term),
       |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |inform AS (SELECT qt.query_id, qt.term FROM qt JOIN dfreq USING (term)),
       |hn_champs AS (SELECT term, doc_id FROM (
       |    SELECT term, doc_id,
       |      row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn
       |    FROM tf) z WHERE rn <= 1000),
       |hn_cand AS (SELECT DISTINCT i.query_id, c.doc_id
       |  FROM hn_champs c JOIN inform i USING (term)
       |  WHERE c.doc_id <> i.query_id),
       |parts AS (SELECT i.query_id, tf.doc_id,
       |    CAST(round(
       |      round(ln((CAST(tot.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5) /
       |               (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0), 12)
       |      * (CAST(tf.tf AS DOUBLE) * 2.2)
       |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE) /
       |          (CAST(tot.n_total AS DOUBLE) / CAST(tot.n_docs AS DOUBLE)))), 12)
       |      AS DECIMAL(28,12)) AS part
       |  FROM tf JOIN inform i USING (term) JOIN dfreq USING (term) CROSS JOIN tot
       |  JOIN hn_cand ON hn_cand.query_id = i.query_id AND hn_cand.doc_id = tf.doc_id
       |  WHERE tf.doc_id <> i.query_id),
       |scored AS (SELECT query_id, doc_id, SUM(part) AS sc
       |           FROM parts GROUP BY query_id, doc_id),
       |kept AS (SELECT s.query_id, s.doc_id, s.sc FROM scored s
       |  LEFT JOIN sym e ON s.query_id = e.a AND s.doc_id = e.p
       |  WHERE e.a IS NULL),
       |rk AS (SELECT query_id, doc_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY CAST(sc AS DOUBLE) DESC, doc_id) AS BIGINT) AS rank
       |  FROM kept),
       |negs AS (SELECT query_id, list(doc_id ORDER BY rank) AS neg_ids
       |  FROM rk WHERE rank <= 4 GROUP BY query_id)
       |SELECT a.doc_id, a.pos_id,
       |  COALESCE(array_to_string(n.neg_ids, ','), '') AS neg_ids
       |FROM anch a LEFT JOIN negs n ON a.doc_id = n.query_id
       |ORDER BY a.doc_id""".stripMargin

  /** Mirrors q72: leakage-safe splits — q32's split CASE, the shared
    * `lshCtes` pair chain, symmetrized edges restricted to eval
    * partners, and a LEFT JOIN + COALESCE so leak-free docs keep their
    * row. All integers/strings — hash-exact by construction. */
  val q72LeakageSafeSplit: String =
    s"""WITH $shingleCtes,
       |$lshCtes,
       |pairs AS (SELECT d1, d2 FROM common
       |  JOIN szc s1 ON common.d1 = s1.doc_id
       |  JOIN szc s2 ON common.d2 = s2.doc_id
       |  WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.5),
       |sym AS (SELECT d1 AS a, d2 AS b FROM pairs
       |        UNION ALL SELECT d2, d1 FROM pairs),
       |sp AS (SELECT doc_id,
       |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
       |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |leaks AS (SELECT sym.a AS doc_id, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM sym JOIN sp ON sym.b = sp.doc_id AND sp.split <> 'train'
       |  GROUP BY sym.a),
       |ex AS (SELECT d.doc_id, md5(d.text) AS k, sp.split
       |  FROM documents d JOIN sp ON d.doc_id = sp.doc_id),
       |ge AS (SELECT k,
       |    SUM(CASE WHEN split <> 'train' THEN 1 ELSE 0 END) AS ge
       |  FROM ex GROUP BY k),
       |exn AS (SELECT ex.doc_id,
       |    ge.ge - CASE WHEN ex.split <> 'train' THEN 1 ELSE 0 END AS ne
       |  FROM ex JOIN ge USING (k))
       |SELECT sp.doc_id, sp.split,
       |  CAST(COALESCE(leaks.n, 0) + exn.ne AS BIGINT) AS n_eval_partners,
       |  NOT (sp.split = 'train' AND COALESCE(leaks.n, 0) + exn.ne > 0) AS keep
       |FROM sp
       |LEFT JOIN leaks ON sp.doc_id = leaks.doc_id
       |JOIN exn ON sp.doc_id = exn.doc_id
       |ORDER BY sp.doc_id""".stripMargin

  /** Mirrors q73: stride-scheduled mixture interleave. Reuses the q45
    * weight CTEs; the per-source shuffle order is the salted 52-bit md5
    * (single-task ROW_NUMBER here mirrors the engine's bucket-prefix
    * rank exactly); mix_key = (rank − 0.5) / weight as the RAW double
    * quotient — rank and weight are bit-identical on both sides, so
    * the division is too, while a 12-digit re-round can land on a
    * decimal tie the two engines resolve differently. */
  val q73MixtureInterleave: String =
    s"""WITH $weightCtes,
       |r AS (SELECT doc_id, source,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY ('0x'||substr(md5('mix:'||CAST(doc_id AS VARCHAR)),1,13))::BIGINT,
       |        doc_id) AS BIGINT) AS src_rank
       |  FROM documents),
       |k AS (SELECT r.doc_id, r.source, r.src_rank,
       |    (CAST(r.src_rank AS DOUBLE) - 0.5) / ws.weight AS mix_key
       |  FROM r JOIN ws USING (source)),
       |topn AS (SELECT * FROM k ORDER BY mix_key, source, doc_id LIMIT 200)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY mix_key, source, doc_id) AS BIGINT)
       |    AS global_pos,
       |  doc_id, source, src_rank, mix_key
       |FROM topn ORDER BY global_pos""".stripMargin

  /** Mirrors q74: the cross-source near-dup matrix — the shared
    * `lshCtes` verified pairs, source-labeled on both ends, unordered
    * via least/greatest. Pure integers — hash-exact. */
  val q74SourceOverlap: String =
    s"""WITH $shingleCtes,
       |$lshCtes,
       |pairs AS (SELECT d1, d2 FROM common
       |  JOIN szc s1 ON common.d1 = s1.doc_id
       |  JOIN szc s2 ON common.d2 = s2.doc_id
       |  WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.5),
       |lab AS (SELECT least(a.source, b.source) AS source_a,
       |               greatest(a.source, b.source) AS source_b
       |  FROM pairs
       |  JOIN documents a ON pairs.d1 = a.doc_id
       |  JOIN documents b ON pairs.d2 = b.doc_id)
       |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM lab
       |GROUP BY source_a, source_b
       |ORDER BY source_a, source_b""".stripMargin

  /** Mirrors q75: per-source shingle diversity. Same doc-distinct
    * shingle set; zero-shingle sources survive via LEFT JOIN +
    * COALESCE on BOTH sides (the q51 rule); the ratio is an exact
    * integer quotient. */
  val q75SourceDiversity: String =
    s"""WITH $shingleCtes,
       |j AS (SELECT sh.doc_id, sh.g, d.source
       |      FROM sh JOIN documents d USING (doc_id)),
       |t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |             CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct
       |      FROM j GROUP BY source),
       |nd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
       |       FROM documents GROUP BY source)
       |SELECT nd.source, nd.n_docs,
       |  COALESCE(t.n_grams, 0) AS n_grams,
       |  COALESCE(t.n_distinct, 0) AS n_distinct,
       |  CAST(COALESCE(t.n_distinct, 0) AS DOUBLE) /
       |    CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS DOUBLE) AS distinct_ratio
       |FROM nd
       |LEFT JOIN t ON nd.source = t.source
       |ORDER BY nd.source""".stripMargin

  /** Mirrors q76: embedding hard negatives — q28's exact decimal
    * cosine ranking (full corpus, so the engine's k' margin construction
    * must land on identical rows), minus cos ≥ 0.30 POSITIVE partners
    * of the query vectors (q36's pair derivation at the lower
    * too-close-to-be-a-negative bar), re-ranked in original-rank
    * order. */
  val q76EmbeddingNegatives: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
      |cand AS (SELECT q.query_id, e.vec_id, q.qe, e.embedding AS emb
      |         FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      |expl AS (SELECT query_id, vec_id, qe, emb,
      |           unnest(generate_series(1, len(qe))) AS i
      |         FROM cand),
      |dots AS (SELECT query_id, vec_id,
      |  SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(emb[i] AS DOUBLE) AS DECIMAL(28,18))) AS dot,
      |  SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE) AS DECIMAL(28,18))) AS qq,
      |  SUM(CAST(CAST(emb[i] AS DOUBLE) * CAST(emb[i] AS DOUBLE) AS DECIMAL(28,18))) AS ee
      |  FROM expl GROUP BY 1, 2),
      |scored AS (SELECT query_id, vec_id,
      |  CAST(dot AS DOUBLE) / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(ee AS DOUBLE))) AS cos
      |  FROM dots),
      |e2 AS (SELECT vec_id, embedding FROM embeddings),
      |x2 AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM e2),
      |norms2 AS (SELECT vec_id,
      |  SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,18))) AS nn
      |  FROM x2 GROUP BY vec_id),
      |pr2 AS (SELECT a.vec_id AS d1, b.vec_id AS d2, a.embedding AS ea, b.embedding AS eb
      |        FROM e2 a JOIN e2 b ON a.vec_id < b.vec_id),
      |pe2 AS (SELECT d1, d2, ea, eb, unnest(generate_series(1, len(ea))) AS i FROM pr2),
      |dots2 AS (SELECT d1, d2,
      |  SUM(CAST(CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE) AS DECIMAL(28,18))) AS dot
      |  FROM pe2 GROUP BY d1, d2),
      |nd AS (SELECT d1, d2 FROM (SELECT d1, d2,
      |    round(CAST(dot AS DOUBLE) /
      |      (sqrt(CAST(n1.nn AS DOUBLE)) * sqrt(CAST(n2.nn AS DOUBLE))), 12) AS cos
      |  FROM dots2
      |  JOIN norms2 n1 ON d1 = n1.vec_id
      |  JOIN norms2 n2 ON d2 = n2.vec_id) s WHERE cos >= 0.30),
      |part AS (SELECT d1 AS query_id, d2 AS neighbor_id FROM nd WHERE d1 < 5
      |         UNION ALL SELECT d2, d1 FROM nd WHERE d2 < 5),
      |ranked AS (SELECT query_id, vec_id AS neighbor_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS r0
      |  FROM scored),
      |kept AS (SELECT r.query_id, r.neighbor_id, r.r0 FROM ranked r
      |  LEFT JOIN part p ON r.query_id = p.query_id AND r.neighbor_id = p.neighbor_id
      |  WHERE p.query_id IS NULL)
      |SELECT query_id, rank, neighbor_id FROM (
      |  SELECT query_id, neighbor_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY r0) AS BIGINT) AS rank
      |  FROM kept) t
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Mirrors q67: the per-source data card. Reuses q39's verdict
    * expressions verbatim for keep_rate, q24's md5 8-token-prefix key
    * for dup_rate, and computes the exact lower median as the
    * (n+1)//2-th order statistic over the token-count histogram —
    * integer rank arithmetic on both sides, rates as one IEEE division
    * rounded to 12 digits. Top language ties break to the smallest
    * lang code (ORDER BY c DESC, lang ≡ the engine's min over
    * (-count, lang) structs). */
  val q67DataCard: String =
    s"""WITH $tokCte,
       |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
       |        FROM tok WHERE len(l) >= 3),
       |g AS (SELECT doc_id, array_to_string(l[i:i+2], ' ') AS gram FROM pos),
       |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       |               CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct
       |        FROM g GROUP BY doc_id),
       |base AS (SELECT d.doc_id, d.source, d.lang,
       |  md5(array_to_string(
       |    regexp_extract_all(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g')), '\\S+')[1:8],
       |    ' ')) AS gk,
       |  CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT) AS nt,
       |  CAST(length(regexp_replace(d.text, '\\s', '', 'g')) AS DOUBLE) /
       |    greatest(CAST(len(regexp_extract_all(d.text, '\\S+')) AS DOUBLE), 1.0) AS avg_token_len,
       |  CAST(length(regexp_replace(d.text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) /
       |    greatest(CAST(length(d.text) AS DOUBLE), 1.0) AS punct_ratio,
       |  CASE WHEN COALESCE(a.n_trigrams, 0) > 0
       |       THEN 1.0 - CAST(a.n_distinct AS DOUBLE) / CAST(a.n_trigrams AS DOUBLE)
       |       ELSE 0.0 END AS dup_frac
       |  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
       |keeps AS (SELECT *,
       |  (CASE WHEN nt < 20 THEN 'too_short'
       |        WHEN nt > 100000 THEN 'too_long'
       |        WHEN avg_token_len < 3.0 OR avg_token_len > 10.0 THEN 'token_shape'
       |        WHEN punct_ratio > 0.1 THEN 'punct'
       |        WHEN dup_frac > 0.2 THEN 'repetitive'
       |        ELSE 'keep' END) = 'keep' AS keep
       |  FROM base),
       |per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       |    CAST(SUM(nt) AS BIGINT) AS total_tokens,
       |    CAST(COUNT(DISTINCT gk) AS BIGINT) AS n_uniq,
       |    CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
       |  FROM keeps GROUP BY source),
       |lc AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM keeps GROUP BY source, lang),
       |top AS (SELECT source, lang AS top_lang, c AS top_cnt FROM (
       |    SELECT *, row_number() OVER (PARTITION BY source ORDER BY c DESC, lang) AS rn
       |    FROM lc) WHERE rn = 1),
       |hist AS (SELECT source, nt, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM keeps GROUP BY source, nt),
       |rk AS (SELECT source, (CAST(SUM(c) AS BIGINT) + 1) // 2 AS k
       |  FROM hist GROUP BY source),
       |cum AS (SELECT source, nt, c,
       |    SUM(c) OVER (PARTITION BY source ORDER BY nt) AS cm FROM hist),
       |med AS (SELECT cum.source, nt AS median_tokens
       |  FROM cum JOIN rk USING (source) WHERE cm >= k AND cm - c < k)
       |SELECT per.source, n_docs, n_langs, top_lang,
       |  round(CAST(top_cnt AS DOUBLE) / CAST(n_docs AS DOUBLE), 12) AS top_lang_share,
       |  total_tokens, median_tokens,
       |  round(1.0 - CAST(n_uniq AS DOUBLE) / CAST(n_docs AS DOUBLE), 12) AS dup_rate,
       |  round(CAST(n_keep AS DOUBLE) / CAST(n_docs AS DOUBLE), 12) AS keep_rate
       |FROM per JOIN top USING (source) JOIN med USING (source)
       |ORDER BY source""".stripMargin

  /** Mirrors q68: the learned quality classifier, with TRAINING replayed
    * exactly — 15 full-batch gradient steps as 15 generated CTEs (the
    * fixed iteration count is data, like q65's merges), each one
    * aggregate over the feature relation. Per-row gradient terms are
    * rounded to 12 digits into DECIMAL(28,12) sums, the sigmoid to 9
    * digits before use (libm exp ulp divergence), and the weight update
    * round(w − 4·(g/n), 12) copies the engine's expression tree
    * token-for-token, so every iteration's weights are bit-identical. */
  /** The shared q68 CTE chain (feature build + the 15 replayed GD
    * iterations + per-doc round-9 scores in `sc`) — q68 reads per-doc
    * rows from it, q97 bins them into a calibration table. */
  /** The q68 GD + scoring CTE chain, parametrized by the TRAINING
    * relation (`feats` = train on everything, q68/q97/q170; `tfeats`
    * = the q202 held-out variant, which appends its own split CTEs).
    * Scoring (`sc`) always covers ALL feats. */
  private def q68ScoredCtesOver(trainRel: String,
                                extraCtes: String = ""): String = {
    val z = "(i.w0 + i.w1*f.x1 + i.w2*f.x2 + i.w3*f.x3 + i.w4*f.x4)"
    val gsum = (j: Int, x: String) =>
      s"SUM(CAST(round((p - y) * $x, 12) AS DECIMAL(28,12))) AS g$j"
    val iterCtes = (1 to 15).map { k =>
      s"""it$k AS MATERIALIZED (SELECT
         |  round(w0 - 4.0 * (CAST(g0 AS DOUBLE) / n), 12) AS w0,
         |  round(w1 - 4.0 * (CAST(g1 AS DOUBLE) / n), 12) AS w1,
         |  round(w2 - 4.0 * (CAST(g2 AS DOUBLE) / n), 12) AS w2,
         |  round(w3 - 4.0 * (CAST(g3 AS DOUBLE) / n), 12) AS w3,
         |  round(w4 - 4.0 * (CAST(g4 AS DOUBLE) / n), 12) AS w4
         |FROM (SELECT w0, w1, w2, w3, w4, n,
         |    ${gsum(0, "1.0")}, ${gsum(1, "x1")}, ${gsum(2, "x2")},
         |    ${gsum(3, "x3")}, ${gsum(4, "x4")}
         |  FROM (SELECT f.*, i.w0, i.w1, i.w2, i.w3, i.w4, nn.n,
         |      round(1.0/(1.0 + exp(-$z)), 9) AS p
         |    FROM $trainRel f CROSS JOIN it${k - 1} i CROSS JOIN nn)
         |  GROUP BY w0, w1, w2, w3, w4, n))""".stripMargin
    }.mkString(",\n")
    val zm = z.replace("i.w", "m.w")
    s"""WITH $tokCte,
       |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
       |        FROM tok WHERE len(l) >= 3),
       |g AS (SELECT doc_id, array_to_string(l[i:i+2], ' ') AS gram FROM pos),
       |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       |               CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct
       |        FROM g GROUP BY doc_id),
       |fb AS (SELECT d.doc_id,
       |  CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT) AS nt,
       |  CAST(length(regexp_replace(d.text, '\\s', '', 'g')) AS DOUBLE) /
       |    greatest(CAST(len(regexp_extract_all(d.text, '\\S+')) AS DOUBLE), 1.0) AS atl,
       |  CAST(length(regexp_replace(d.text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) /
       |    greatest(CAST(length(d.text) AS DOUBLE), 1.0) AS pr,
       |  CASE WHEN COALESCE(a.n_trigrams, 0) > 0
       |       THEN 1.0 - CAST(a.n_distinct AS DOUBLE) / CAST(a.n_trigrams AS DOUBLE)
       |       ELSE 0.0 END AS dupf
       |  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
       |feats AS MATERIALIZED (SELECT doc_id,
       |  CAST(nt AS DOUBLE) / 20.0 - 1.0 AS x1, atl / 10.0 AS x2,
       |  pr AS x3, dupf AS x4,
       |  CASE WHEN (CASE WHEN nt < 20 THEN 'too_short'
       |        WHEN nt > 100000 THEN 'too_long'
       |        WHEN atl < 3.0 OR atl > 10.0 THEN 'token_shape'
       |        WHEN pr > 0.1 THEN 'punct'
       |        WHEN dupf > 0.2 THEN 'repetitive'
       |        ELSE 'keep' END) = 'keep' THEN 1.0 ELSE 0.0 END AS y
       |  FROM fb),$extraCtes
       |nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM $trainRel),
       |it0 AS (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
       |        CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3,
       |        CAST(0.0 AS DOUBLE) AS w4),
       |$iterCtes,
       |sc AS MATERIALIZED (SELECT f.doc_id, round(1.0/(1.0 + exp(-$zm)), 9) AS score, f.y
       |  FROM feats f CROSS JOIN it15 m)""".stripMargin
  }

  private val q68ScoredCtes: String = q68ScoredCtesOver("feats")

  val q68QualityModel: String =
    s"""$q68ScoredCtes
       |SELECT doc_id, score, score >= 0.5 AS predicted, y = 1.0 AS label,
       |  (score >= 0.5) = (y = 1.0) AS correct
       |FROM sc
       |ORDER BY doc_id""".stripMargin

  /** Mirrors q97: reliability-calibration bins over the q68 scores —
    * per score decile, how many docs, the mean predicted probability
    * (DECIMAL-summed round-9 scores, one final rounded divide) and the
    * empirical keep rate. floor(score*10) is one IEEE multiply+floor of
    * a round-9 double — identical bins on both engines; score = 1.0
    * folds into the top bin. */
  val q97QualityCalibration: String =
    s"""$q68ScoredCtes,
       |b AS (SELECT CAST(least(floor(score * 10), 9) AS BIGINT) AS bin,
       |    CAST(score AS DECIMAL(20,9)) AS sd, y
       |  FROM sc)
       |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  round(CAST(SUM(sd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 12) AS mean_score,
       |  round(CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS DOUBLE) /
       |        CAST(COUNT(*) AS DOUBLE), 12) AS keep_rate
       |FROM b GROUP BY bin
       |ORDER BY bin""".stripMargin

  /** Mirrors q65: trainer-true BPE token counts, REPLAYED from the
    * merge table the query persists (merges are data, not code — the
    * oracle applies the exact same greedy rules). Encoding: a word's
    * symbol list is a string with every symbol wrapped in chr(31)
    * markers (`␟sym␟␟sym␟…`), so a merge of (l, r) is a plain
    * left-to-right `replace` of `␟l␟␟r␟` with `␟lr␟` — string replace
    * continues scanning AFTER each replacement, which is exactly the
    * engine's non-overlapping merge pass, and the full wrapping means a
    * pattern can never straddle a symbol boundary (assumes corpus words
    * never contain the \\x1F control char — they are \\S+ tokens of
    * generated prose). Each recursive step applies the LOWEST-rank
    * applicable merge (ORDER BY rank LIMIT 1 — the engine's pick);
    * words stop recursing when nothing applies; the surviving symbol
    * count is half the marker count. Distinct words replay once, then
    * join back to per-doc occurrences; documents with no words keep a
    * COALESCE'd zero (the q51 LEFT JOIN lesson). */
  /** The shared BPE-replay CTE chain (merges-from-data greedy
    * application, per-doc subword totals in `b`) — the q65 tail reads
    * per-doc rows from it, the q87 tail aggregates per language. */
  private val bpeReplayCtes: String =
    s"""WITH RECURSIVE
      |m AS (SELECT "rank" AS mrank,
      |    chr(31)||l||chr(31)||chr(31)||r||chr(31) AS pat,
      |    chr(31)||l||r||chr(31) AS rep
      |  FROM read_parquet('${graft.ops.Bpe.MergesPath}/*.parquet')),
      |docword AS (SELECT doc_id,
      |    unnest(regexp_extract_all(lower(text), '\\S+')) AS word
      |  FROM documents),
      |w AS (SELECT DISTINCT word FROM docword),
      |steps AS (
      |  SELECT word,
      |    chr(31)||array_to_string(regexp_extract_all(word, '.'),
      |      chr(31)||chr(31))||chr(31) AS s
      |  FROM w
      |  UNION ALL
      |  SELECT word, replace(s,
      |      (SELECT pat FROM m WHERE contains(st.s, pat) ORDER BY mrank LIMIT 1),
      |      (SELECT rep FROM m WHERE contains(st.s, pat) ORDER BY mrank LIMIT 1)) AS s
      |  FROM steps st
      |  WHERE EXISTS (SELECT 1 FROM m WHERE contains(st.s, pat))),
      |wc AS (SELECT word,
      |    (length(s) - length(replace(s, chr(31), ''))) // 2 AS n
      |  FROM steps st
      |  WHERE NOT EXISTS (SELECT 1 FROM m WHERE contains(st.s, pat))),
      |b AS (SELECT doc_id, SUM(wc.n) AS n
      |  FROM docword JOIN wc USING (word) GROUP BY doc_id)""".stripMargin

  val q65BpeTokens: String =
    s"""$bpeReplayCtes
      |SELECT d.doc_id,
      |  CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT) AS n_ws_tokens,
      |  CAST(COALESCE(b.n, 0) AS BIGINT) AS n_bpe_tokens
      |FROM documents d
      |LEFT JOIN b ON d.doc_id = b.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Mirrors q87: per-language tokenizer fertility — the q65 replay
    * aggregated by lang; fertility is one IEEE double divide of two
    * exact longs, rounded 9 (the q45 pattern). */
  val q87TokenizerFertility: String =
    s"""$bpeReplayCtes
      |SELECT d.lang, COUNT(*) AS n_docs,
      |  CAST(SUM(len(regexp_extract_all(d.text, '\\S+'))) AS BIGINT) AS n_ws_tokens,
      |  CAST(SUM(COALESCE(b.n, 0)) AS BIGINT) AS n_bpe_tokens,
      |  round(CAST(SUM(COALESCE(b.n, 0)) AS DOUBLE) /
      |        CAST(SUM(len(regexp_extract_all(d.text, '\\S+'))) AS DOUBLE), 9)
      |    AS fertility
      |FROM documents d
      |LEFT JOIN b ON d.doc_id = b.doc_id
      |GROUP BY d.lang
      |ORDER BY d.lang""".stripMargin

  /** Mirrors q91: the token-ID sequences — the q65 replay carried one
    * step further. Each word's terminal symbol string (the recursion's
    * fixed point) splits back into its symbols (strip the outer
    * markers, split on the doubled one), each symbol joins its id from
    * the PERSISTED vocab table (OOV → -1, the engine's unk sentinel),
    * per-word id lists concatenate in word order. Positions ride
    * DuckDB's zipped parallel unnest (list + its range — same-length
    * lists unnest in lockstep). */
  val q91TokenIds: String =
    s"""$bpeReplayCtes,
      |vocab AS (SELECT id, tok
      |  FROM read_parquet('${graft.ops.Bpe.VocabPath}/*.parquet')),
      |wfin AS (SELECT word, s FROM steps st
      |  WHERE NOT EXISTS (SELECT 1 FROM m WHERE contains(st.s, pat))),
      |wsyms AS (SELECT word,
      |    string_split(substr(s, 2, length(s) - 2), chr(31)||chr(31)) AS syms
      |  FROM wfin),
      |wsym AS (SELECT word, unnest(syms) AS sym,
      |    unnest(range(1, len(syms) + 1)) AS spos
      |  FROM wsyms),
      |wids AS (SELECT word, list(COALESCE(v.id, -1) ORDER BY spos) AS ids
      |  FROM wsym LEFT JOIN vocab v ON wsym.sym = v.tok
      |  GROUP BY word),
      |dwp AS (SELECT doc_id, unnest(wl) AS word,
      |    unnest(range(1, len(wl) + 1)) AS wpos
      |  FROM (SELECT doc_id,
      |      regexp_extract_all(lower(text), '\\S+') AS wl FROM documents)),
      |docids AS (SELECT dwp.doc_id,
      |    flatten(list(wids.ids ORDER BY wpos)) AS ids
      |  FROM dwp JOIN wids USING (word) GROUP BY dwp.doc_id)
      |SELECT d.doc_id,
      |  COALESCE(array_to_string(di.ids, ','), '') AS token_ids,
      |  CAST(len(COALESCE(di.ids, CAST([] AS INTEGER[]))) AS BIGINT) AS n_tokens
      |FROM documents d LEFT JOIN docids di ON d.doc_id = di.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Mirrors q77: DSIR hashed-feature importance weights. Features are
    * unigrams plus space-joined bigrams of the normalized token list;
    * the bucket is the 52-bit md5-prefix integer mod 128 (both operands
    * non-negative, so `%` matches Spark's `pmod`). Determinism: the
    * per-bucket log ratio is ln of an exact integer cross-ratio rounded
    * to 12 into DECIMAL(28,12); per-doc sums weight the decimal by the
    * integer occurrence count (q66's k-weighting), and the top-50 cut
    * breaks weight ties by doc_id. */
  val q77DsirImportance: String =
    s"""WITH $tokCte,
       |uni AS (SELECT doc_id, unnest(l) AS f FROM tok),
       |big AS (SELECT doc_id, l[i] || ' ' || l[i + 1] AS f
       |  FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM tok)),
       |fb AS (SELECT doc_id,
       |    ('0x' || substr(md5(f), 1, 13))::BIGINT % 128 AS b
       |  FROM (SELECT doc_id, f FROM uni UNION ALL SELECT doc_id, f FROM big)),
       |fbs AS (SELECT fb.doc_id, d.source, fb.b FROM fb
       |        JOIN documents d ON fb.doc_id = d.doc_id),
       |tc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM fbs
       |       WHERE source = 'src0' GROUP BY b),
       |rc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM fbs
       |       WHERE source <> 'src0' GROUP BY b),
       |nt AS (SELECT COALESCE(SUM(ct), 0) AS nt FROM tc),
       |nr AS (SELECT COALESCE(SUM(cr), 0) AS nr FROM rc),
       |lm AS (SELECT gs.b,
       |    CAST(round(ln((CAST(COALESCE(tc.ct, 0) + 1 AS DOUBLE) * CAST(nr.nr + 128 AS DOUBLE)) /
       |                  (CAST(COALESCE(rc.cr, 0) + 1 AS DOUBLE) * CAST(nt.nt + 128 AS DOUBLE))), 12)
       |         AS DECIMAL(28,12)) AS lnterm
       |  FROM (SELECT unnest(range(0, 128)) AS b) gs
       |  LEFT JOIN tc ON gs.b = tc.b LEFT JOIN rc ON gs.b = rc.b
       |  CROSS JOIN nt CROSS JOIN nr),
       |dk AS (SELECT doc_id, source, b, CAST(COUNT(*) AS BIGINT) AS k
       |  FROM fbs WHERE source <> 'src0' GROUP BY doc_id, source, b),
       |w AS (SELECT dk.doc_id, CAST(SUM(dk.k) AS BIGINT) AS n_feats,
       |    round(CAST(SUM(lm.lnterm * CAST(dk.k AS DECIMAL(9,0))) AS DOUBLE), 12) AS logweight
       |  FROM dk JOIN lm ON dk.b = lm.b GROUP BY dk.doc_id)
       |SELECT w.doc_id, d.source, w.n_feats, w.logweight
       |FROM w JOIN documents d ON w.doc_id = d.doc_id
       |ORDER BY w.logweight DESC, w.doc_id
       |LIMIT 50""".stripMargin

  /** Mirrors q78: per-UTC-day event-type KL vs the all-time pool — the
    * q69 math with (source → day, token → event_type). The day is
    * integer floor-division of epoch nanos (non-negative on this data,
    * so DuckDB's floor `//` equals Spark's truncating `DIV`). */
  val q78TemporalDrift: String =
    """WITH st AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
      |    event_type AS w, CAST(COUNT(*) AS BIGINT) AS k
      |  FROM events GROUP BY 1, 2),
      |c AS (SELECT w, CAST(SUM(k) AS BIGINT) AS ck FROM st GROUP BY w),
      |s AS (SELECT day, CAST(SUM(k) AS BIGINT) AS ns FROM st GROUP BY day),
      |n AS (SELECT CAST(SUM(ck) AS BIGINT) AS nc FROM c),
      |t AS (SELECT st.day, st.k, s.ns,
      |    round(ln((CAST(st.k AS DOUBLE) * CAST(n.nc AS DOUBLE)) /
      |             (CAST(s.ns AS DOUBLE) * CAST(c.ck AS DOUBLE))), 12) AS lnterm
      |  FROM st JOIN c USING (w) JOIN s USING (day) CROSS JOIN n),
      |x AS (SELECT day, ns,
      |    CAST(round((CAST(k AS DOUBLE) / CAST(ns AS DOUBLE)) * lnterm, 12)
      |         AS DECIMAL(28,12)) AS t2
      |  FROM t),
      |agg AS (SELECT day, MAX(ns) AS n_events,
      |    CAST(COUNT(*) AS BIGINT) AS n_types,
      |    round(CAST(SUM(t2) AS DOUBLE), 12) AS kl_nats
      |  FROM x GROUP BY day)
      |SELECT day, n_events, n_types, kl_nats,
      |  round(kl_nats / 0.6931471805599453, 12) AS kl_bits
      |FROM agg
      |ORDER BY day""".stripMargin

  /** Mirrors q79: padding efficiency under width-64 length buckets with
    * batch-of-8 padding. All-integer until the single IEEE division
    * (identical operands on both engines — q37's no-rounding rule);
    * `greatest(n-1, 0)` keeps the dividend non-negative so floor and
    * truncating division agree. */
  val q79LengthBuckets: String =
    """WITH t AS (SELECT CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
      |  FROM documents),
      |a AS (SELECT greatest(n - 1, 0) // 64 AS bucket,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens
      |  FROM t GROUP BY 1)
      |SELECT bucket, (bucket + 1) * 64 AS bucket_cap, n_docs, n_tokens,
      |  ((n_docs + 7) // 8) * 8 * ((bucket + 1) * 64) AS padded_tokens,
      |  CAST(n_tokens AS DOUBLE) /
      |    CAST(((n_docs + 7) // 8) * 8 * ((bucket + 1) * 64) AS DOUBLE) AS efficiency
      |FROM a
      |ORDER BY bucket""".stripMargin

  /** Mirrors q80: canonical selection over MinHash-LSH clusters — the
    * q26 pair stage, a recursive-CTE closure seeded from every document
    * (q40's pattern), then the max-n_chars/min-doc_id winner per
    * component via a windowed rank. */
  val q80CanonicalDocs: String =
    s"""WITH RECURSIVE $shingleCtes,
       |$lshCtes,
       |p AS (SELECT d1, d2 FROM common
       |  JOIN szc s1 ON common.d1 = s1.doc_id
       |  JOIN szc s2 ON common.d2 = s2.doc_id
       |  WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.5),
       |xk AS (SELECT doc_id, md5(text) AS k FROM documents),
       |xr AS (SELECT k, MIN(doc_id) AS m FROM xk GROUP BY k),
       |xe AS (SELECT xr.m AS d1, xk.doc_id AS d2
       |  FROM xk JOIN xr USING (k) WHERE xk.doc_id <> xr.m),
       |pu AS (SELECT d1, d2 FROM p UNION ALL SELECT d1, d2 FROM xe),
       |edges AS (SELECT d1 AS a, d2 AS b FROM pu
       |          UNION ALL SELECT d2 AS a, d1 AS b FROM pu),
       |reach(v, r) AS (
       |  SELECT doc_id AS v, doc_id AS r FROM documents
       |  UNION
       |  SELECT reach.v, edges.b AS r FROM reach JOIN edges ON reach.r = edges.a),
       |comp AS (SELECT v AS doc_id, MIN(r) AS component FROM reach GROUP BY v),
       |cj AS (SELECT comp.doc_id, comp.component, d.n_chars
       |       FROM comp JOIN documents d ON comp.doc_id = d.doc_id),
       |sz2 AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members
       |        FROM cj GROUP BY component),
       |r AS (SELECT doc_id, component,
       |    ROW_NUMBER() OVER (PARTITION BY component
       |                       ORDER BY n_chars DESC, doc_id) AS rn
       |  FROM cj),
       |can AS (SELECT component, doc_id AS canonical_id FROM r WHERE rn = 1)
       |SELECT cj.doc_id, cj.component, can.canonical_id, sz2.n_members,
       |  cj.doc_id = can.canonical_id AS keep
       |FROM cj
       |JOIN can ON cj.component = can.component
       |JOIN sz2 ON cj.component = sz2.component
       |ORDER BY cj.doc_id""".stripMargin

  /** Mirrors q81: k-means assignment REPLAYED from the centroid table the
    * query persists (centroids are data, not code — the q65 merges
    * pattern). Both engines snap vectors to the same fixed-point grid
    * (`floor(x·1000 + 0.5)` — one correctly-rounded IEEE multiply each)
    * and the argmin runs on exact INTEGER squared distances, ties to the
    * smaller cluster id; no float sum exists on either side. A vector
    * with an empty embedding never reaches the distance CTE, so the
    * LEFT JOIN + COALESCE lands it in cluster 0 at distance 0 — the same
    * outcome as the engine's all-ties argmin. */
  /** The shared k-means-assignment CTE chain (centroids-from-data exact
    * integer argmin) — q81 and q83 replay the same assignment, each
    * against the centroid table its own query persisted. */
  private def kmeansAssignCtes(centroidsPath: String): String =
    s"""c AS (SELECT cluster, qc
       |  FROM read_parquet('$centroidsPath/*.parquet')),
       |e AS (SELECT vec_id, embedding FROM embeddings),
       |x AS (SELECT vec_id, embedding,
       |    unnest(generate_series(1, len(embedding))) AS i FROM e),
       |q AS (SELECT vec_id, i,
       |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qi
       |  FROM x),
       |d AS (SELECT q.vec_id, c.cluster,
       |    CAST(SUM((q.qi - c.qc[CAST(q.i AS INT)]) *
       |             (q.qi - c.qc[CAST(q.i AS INT)])) AS BIGINT) AS d
       |  FROM q CROSS JOIN c
       |  GROUP BY q.vec_id, c.cluster),
       |r AS (SELECT vec_id, cluster, d,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |  FROM d)""".stripMargin

  val q81EmbeddingClusters: String =
    s"""WITH ${kmeansAssignCtes(graft.ops.Clustering.CentroidsPath)}
       |SELECT e.vec_id,
       |  CAST(COALESCE(r.cluster, 0) AS INT) AS cluster,
       |  COALESCE(r.d, 0) AS sq_dist
       |FROM e LEFT JOIN r ON e.vec_id = r.vec_id AND r.rn = 1
       |ORDER BY e.vec_id""".stripMargin

  /** Mirrors q95: water-filling mixture allocation — the closed form
    * replayed move-for-move: per-lang token totals, saturation order by
    * availability/weight ratio (an IEEE divide of exact longs — both
    * engines sort identical doubles), prefix sums, the synthetic m = 0
    * candidate, smallest valid saturation count, and the one rounded-9
    * divide per unsaturated allocation. */
  val q95MixtureAllocation: String =
    """WITH a AS (SELECT lang,
      |    CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS a,
      |    CAST(1 AS BIGINT) AS w
      |  FROM documents GROUP BY lang),
      |t AS (SELECT CAST(SUM(a) AS BIGINT) AS tot_a, CAST(SUM(w) AS BIGINT) AS tot_w,
      |    CAST(COUNT(*) AS BIGINT) AS n_groups FROM a),
      |r AS (SELECT a.lang, a.a, a.w, t.tot_a, t.tot_w, t.n_groups,
      |    t.tot_a * 8 // 10 AS budget,
      |    CAST(a.a AS DOUBLE) / CAST(a.w AS DOUBLE) AS ratio
      |  FROM a CROSS JOIN t),
      |rk AS (SELECT *, CAST(row_number() OVER (ORDER BY ratio, lang) AS BIGINT) AS rk,
      |    CAST(SUM(a) OVER (ORDER BY ratio, lang
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS satA,
      |    CAST(SUM(w) OVER (ORDER BY ratio, lang
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS satW,
      |    lead(ratio, 1, CAST('infinity' AS DOUBLE))
      |      OVER (ORDER BY ratio, lang) AS next_ratio
      |  FROM r),
      |cand AS (
      |  SELECT rk AS m, satA, satW, budget, tot_w, n_groups, next_ratio FROM rk
      |  UNION ALL
      |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |    budget, tot_w, n_groups, ratio FROM rk WHERE rk = 1),
      |valid AS (SELECT m, satA, satW FROM cand
      |  WHERE (m = n_groups AND budget >= satA)
      |     OR (m < n_groups AND
      |         CAST(budget - satA AS DOUBLE) / CAST(tot_w - satW AS DOUBLE)
      |           <= next_ratio)),
      |ms AS (SELECT m, satA, satW FROM valid ORDER BY m LIMIT 1)
      |SELECT rk.lang, rk.a AS n_avail, rk.budget,
      |  rk.rk <= ms.m AS saturated,
      |  CASE WHEN rk.rk <= ms.m THEN CAST(rk.a AS DOUBLE)
      |       ELSE round(CAST(rk.w * (rk.budget - ms.satA) AS DOUBLE) /
      |                  CAST(rk.tot_w - ms.satW AS DOUBLE), 9) END AS allocated
      |FROM rk CROSS JOIN ms
      |ORDER BY rk.lang""".stripMargin

  /** Mirrors q94: cluster–label purity — the q81 assignment replay (from
    * q94's OWN persisted centroid table) joined to the ground-truth
    * labels, the per-cluster majority picked by (count DESC, label) —
    * the engine's min(struct(-c, label)) total order. */
  val q94ClusterPurity: String =
    s"""WITH ${kmeansAssignCtes(graft.ops.Clustering.PurityCentroidsPath)},
       |asg AS (SELECT e.vec_id, CAST(COALESCE(r.cluster, 0) AS INT) AS cluster
       |  FROM e LEFT JOIN r ON e.vec_id = r.vec_id AND r.rn = 1),
       |lc AS (SELECT a.cluster, b.label, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM asg a JOIN embeddings b ON a.vec_id = b.vec_id
       |  GROUP BY 1, 2),
       |rk AS (SELECT cluster, label, c,
       |    CAST(SUM(c) OVER (PARTITION BY cluster) AS BIGINT) AS n_vectors,
       |    row_number() OVER (PARTITION BY cluster ORDER BY c DESC, label) AS rn
       |  FROM lc)
       |SELECT cluster, n_vectors, label AS top_label, c AS n_top,
       |  round(CAST(c AS DOUBLE) / CAST(n_vectors AS DOUBLE), 9) AS purity
       |FROM rk WHERE rn = 1
       |ORDER BY cluster""".stripMargin

  /** Mirrors q88: per-source exact length quantiles — histogram +
    * cumulative window over aggregated (source, count) rows, each band
    * picked as MIN(v) where cum ≥ k with integer-exact k = ceil(q·n). */
  val q88LengthQuantiles: String =
    """WITH h AS (SELECT source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS v,
      |    COUNT(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |t AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1),
      |cum AS (SELECT h.source, h.v, h.c, t.n,
      |    SUM(h.c) OVER (PARTITION BY h.source ORDER BY h.v) AS cum
      |  FROM h JOIN t USING (source))
      |SELECT source, n AS n_docs,
      |  MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS p50,
      |  MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN v END) AS p90,
      |  MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN v END) AS p99
      |FROM cum
      |GROUP BY source, n
      |ORDER BY source""".stripMargin

  /** Mirrors q85: the ordered conversion funnel — stage k's earliest
    * time strictly after the user's stage-(k−1) time, chained min
    * aggregates exactly as the engine computes them; epoch-nanos BIGINT
    * on both sides. */
  val q85EventFunnel: String =
    """WITH v AS (SELECT user_id, MIN(epoch_ns(ts)) AS t_view
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t_click
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.t_view
      |  GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t_purchase
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t_click
      |  GROUP BY 1),
      |u AS (SELECT DISTINCT user_id FROM events)
      |SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
      |  CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
      |            WHEN c.user_id IS NOT NULL THEN 2
      |            WHEN v.user_id IS NOT NULL THEN 1
      |            ELSE 0 END AS BIGINT) AS stage
      |FROM u
      |LEFT JOIN v ON u.user_id = v.user_id
      |LEFT JOIN c ON u.user_id = c.user_id
      |LEFT JOIN p ON u.user_id = p.user_id
      |ORDER BY u.user_id""".stripMargin

  /** Mirrors q86: cohort retention — distinct user-day grain, cohort =
    * first active day, exact long counts per (cohort, offset) cell. */
  val q86RetentionCohorts: String =
    """WITH ud AS (SELECT DISTINCT user_id,
      |    CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day FROM events),
      |co AS (SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY 1),
      |sz AS (SELECT cohort_day, COUNT(*) AS n_cohort FROM co GROUP BY 1)
      |SELECT c.cohort_day, u.day - c.cohort_day AS day_offset,
      |  sz.n_cohort, COUNT(*) AS n_active
      |FROM ud u
      |JOIN co c ON u.user_id = c.user_id
      |JOIN sz ON sz.cohort_day = c.cohort_day
      |GROUP BY 1, 2, 3
      |ORDER BY c.cohort_day, day_offset""".stripMargin

  /** Mirrors q83: cluster-balanced sample — q81's centroid-replayed
    * assignment (from the query's OWN persisted centroid table) feeding
    * q52's salted min-hash reservoir, stratum = cluster. The 13-hex-digit
    * md5 prefix order equals the engine's 52-bit numeric order. */
  val q83ClusterSample: String =
    s"""WITH ${kmeansAssignCtes(graft.ops.Clustering.SampleCentroidsPath)},
       |a AS (SELECT e.vec_id, CAST(COALESCE(r.cluster, 0) AS INT) AS cluster
       |  FROM e LEFT JOIN r ON e.vec_id = r.vec_id AND r.rn = 1),
       |s AS (SELECT cluster, vec_id,
       |    row_number() OVER (PARTITION BY cluster
       |      ORDER BY substring(md5('csample:' || CAST(vec_id AS VARCHAR)), 1, 13),
       |               vec_id) AS rn
       |  FROM a)
       |SELECT cluster, CAST(rn AS BIGINT) AS sample_rank, vec_id
       |FROM s WHERE rn <= 20
       |ORDER BY cluster, rn""".stripMargin

  /** Mirrors q84: the daily rollup computed DIRECTLY over raw events —
    * the engine answers from its materialized hourly partials, so hash
    * equality proves the maintenance is lossless. Decimal sum / q17's
    * epoch-day idiom; the HLL estimate column is excluded (sketch
    * internals — q31's rule). */
  /** Mirrors q99: per-day exact p50/p95 of the cent-binned value — the
    * q88 histogram selection over floor(value·100) bins (one IEEE
    * multiply+floor, identical on both engines), k = ceil(q·n) integer
    * arithmetic. The engine answers from its appended histogram
    * partials; this aggregates raw events — equality proves the
    * partials lossless for the declared metric. */
  val q99RollupQuantiles: String =
    """WITH e AS (SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
      |    CAST(floor(value * 100) AS BIGINT) AS bin
      |  FROM events),
      |h AS (SELECT day, bin, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
      |t AS (SELECT day, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1),
      |cum AS (SELECT h.day, h.bin, h.c, t.n,
      |    SUM(h.c) OVER (PARTITION BY h.day ORDER BY h.bin) AS cum
      |  FROM h JOIN t USING (day))
      |SELECT day, n AS n_events,
      |  MIN(CASE WHEN cum >= (n + 1) // 2 THEN bin END) AS p50_cents,
      |  MIN(CASE WHEN cum >= (19 * n + 19) // 20 THEN bin END) AS p95_cents
      |FROM cum GROUP BY day, n
      |ORDER BY day""".stripMargin

  val q84RollupMaintenance: String =
    """SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
      |  MIN(value) AS min_value,
      |  MAX(value) AS max_value
      |FROM events
      |GROUP BY 1
      |ORDER BY day""".stripMargin

  /** Mirrors q82: duplicate-span removal. The span CTEs are q70's chain
    * verbatim (k = 20); the rewrite slices the text between consecutive
    * spans — each gap segment starts where the previous span's character
    * extent ends (prev mx + k) — plus the tail after the last span, and
    * re-concatenates them in position order. md5 of the cleaned text pins
    * the exact bytes; spanless documents pass through via COALESCE. */
  val q82SpanRemoval: String =
    """WITH mx AS (SELECT MAX(length(text)) AS m FROM documents),
      |g AS (
      |  SELECT d.doc_id, CAST(t.i AS BIGINT) AS pos,
      |    ('0x'||substr(md5(substr(d.text, CAST(t.i AS INT), 20)),1,13))::BIGINT AS h
      |  FROM documents d
      |  JOIN (SELECT unnest(generate_series(1, (SELECT m FROM mx))) AS i) t
      |    ON t.i <= length(d.text) - 19),
      |dup AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2),
      |p AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
      |b AS (SELECT doc_id, pos,
      |    CASE WHEN lag(pos) OVER w IS NULL
      |         OR pos - lag(pos) OVER w > 20 THEN 1 ELSE 0 END AS brk
      |  FROM p WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |isl AS (SELECT doc_id, pos,
      |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM b),
      |cov AS (SELECT doc_id, island, MIN(pos) AS mn, MAX(pos) AS mx
      |  FROM isl GROUP BY doc_id, island),
      |seg AS (SELECT doc_id, mn,
      |    COALESCE(lag(mx) OVER (PARTITION BY doc_id ORDER BY mn), 1 - 20) + 20 AS cur
      |  FROM cov),
      |tl AS (SELECT doc_id, MAX(mx) + 20 AS st FROM cov GROUP BY doc_id),
      |segs AS (
      |  SELECT doc_id, cur AS st, mn - cur AS ln FROM seg
      |  UNION ALL
      |  SELECT t.doc_id, t.st, length(d.text) - t.st + 1 AS ln
      |  FROM tl t JOIN documents d USING (doc_id)),
      |cl AS (SELECT s.doc_id,
      |    string_agg(substr(d.text, CAST(s.st AS INT), CAST(s.ln AS INT)),
      |               '' ORDER BY s.st) AS clean,
      |    CAST(COUNT(*) - 1 AS BIGINT) AS n_spans
      |  FROM segs s JOIN documents d USING (doc_id)
      |  GROUP BY s.doc_id)
      |SELECT d.doc_id,
      |  CAST(length(d.text) AS BIGINT) AS n_chars,
      |  COALESCE(cl.n_spans, 0) AS n_spans,
      |  CAST(length(COALESCE(cl.clean, d.text)) AS BIGINT) AS clean_chars,
      |  CAST(length(d.text) - length(COALESCE(cl.clean, d.text)) AS BIGINT)
      |    AS removed_chars,
      |  md5(COALESCE(cl.clean, d.text)) AS clean_md5
      |FROM documents d
      |LEFT JOIN cl ON d.doc_id = cl.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Mirrors q101 (`ops.Web`): the same deterministic messy-URL
    * synthesis from (doc_id, source, lang), then the canonicalization
    * rules replayed step-for-step in DuckDB's regex/list functions —
    * lowercase scheme+host, strip `www.` and default ports, drop
    * trailing slash and fragment, remove tracking params, sort and
    * rejoin survivors. */
  val q101UrlCanonicalize: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |    (CASE doc_id % 3 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'https' ELSE 'http' END)
      |    || '://'
      |    || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)
      |    || upper(source) || '.Example.com'
      |    || (CASE WHEN doc_id % 5 = 0 THEN
      |          (CASE WHEN doc_id % 3 = 2 THEN ':80' ELSE ':443' END) ELSE '' END)
      |    || '/docs/' || doc_id
      |    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
      |    || (CASE doc_id % 3 WHEN 0 THEN '?utm_source=feed&ref=' || lang
      |                        WHEN 1 THEN '?b=2&a=1&utm_campaign=x' ELSE '' END)
      |    || (CASE WHEN doc_id % 7 = 0 THEN '#sec' ELSE '' END) AS url_raw
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id, url_raw,
      |    lower(regexp_extract(url_raw, '^([A-Za-z]+)://', 1)) AS scheme,
      |    regexp_extract(url_raw, '^[A-Za-z]+://([^/?#]+)', 1) AS hostport,
      |    regexp_extract(url_raw, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
      |    regexp_extract(url_raw, '\?([^#]*)', 1) AS q
      |  FROM raw),
      |norm AS (
      |  SELECT doc_id, url_raw, scheme,
      |    regexp_replace(regexp_replace(lower(hostport), ':[0-9]+$', ''),
      |                   '^www\.', '') AS host,
      |    regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
      |    CASE WHEN path = '' THEN '/'
      |         ELSE regexp_replace(path, '(.+)/$', '\1') END AS cpath,
      |    array_to_string(list_sort(list_filter(string_split(q, '&'),
      |        x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid)='))),
      |      '&') AS cq,
      |    regexp_matches(q, '(^|&)(utm_[^=]*|fbclid|gclid)=') AS had_tracking
      |  FROM parts)
      |SELECT doc_id, url_raw,
      |  scheme || '://' || host
      |    || (CASE WHEN port <> '' AND NOT ((scheme = 'https' AND port = '443')
      |                                   OR (scheme = 'http' AND port = '80'))
      |             THEN ':' || port ELSE '' END)
      |    || cpath
      |    || (CASE WHEN cq <> '' THEN '?' || cq ELSE '' END) AS canonical_url,
      |  host, regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain, had_tracking
      |FROM norm ORDER BY doc_id""".stripMargin

  /** Mirrors q102 (`ops.TimeSeries`): per-user hourly aggregate, a
    * generate_series spine over each user's [first, last] hour, LEFT
    * JOIN, and LAST_VALUE IGNORE NULLS forward fill — hour index in
    * exact integer division (`epoch_us // 3.6e9` ≡ engine's nanos DIV). */
  val q102GapFill: String =
    """WITH hr AS (
      |  SELECT user_id, epoch_us(ts) // 3600000000 AS hour_idx,
      |         CAST(COUNT(*) AS BIGINT) AS n_events,
      |         SUM(CAST(value AS DECIMAL(28,6))) AS hv
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT user_id, MIN(hour_idx) mn, MAX(hour_idx) mx FROM hr GROUP BY 1),
      |spine AS (SELECT user_id, UNNEST(generate_series(mn, mx)) AS hour_idx FROM span),
      |joined AS (
      |  SELECT s.user_id, s.hour_idx,
      |    COALESCE(h.n_events, 0) AS n_events, h.hv
      |  FROM spine s LEFT JOIN hr h
      |    ON s.user_id = h.user_id AND s.hour_idx = h.hour_idx)
      |SELECT user_id, hour_idx, CAST(n_events AS BIGINT) AS n_events,
      |  CAST(LAST_VALUE(hv IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY hour_idx
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS filled_value,
      |  (n_events = 0) AS is_gap
      |FROM joined ORDER BY user_id, hour_idx""".stripMargin

  /** Mirrors q103: DuckDB GROUPING SETS with GROUPING(source, lang) as
    * the same bit-composed grouping id Spark's grouping_id() emits. */
  val q103GroupingSets: String =
    """SELECT CAST(GROUPING(source, lang) AS BIGINT) AS gid, source, lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |GROUP BY GROUPING SETS ((source), (lang), (source, lang), ())
      |ORDER BY gid, source NULLS FIRST, lang NULLS FIRST""".stripMargin

  /** Mirrors q105 (`ops.TimeSeries.hourlyAnomalies`): hourly decimal
    * sums, trailing RANGE 24..1 PRECEDING window moments, the q34
    * determinism idiom — variance rounded to 12 digits before both the
    * guard and the sqrt, z rounded to 12. */
  val q105HourlyAnomaly: String =
    """WITH hr AS (
      |  SELECT user_id, epoch_us(ts) // 3600000000 AS hour_idx,
      |         SUM(CAST(value AS DECIMAL(28,6))) AS hv
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT user_id, hour_idx, CAST(hv AS DOUBLE) AS value,
      |    CAST(COUNT(hv) OVER tw AS BIGINT) AS n_obs,
      |    CAST(SUM(hv) OVER tw AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(CAST(hv AS DOUBLE) * CAST(hv AS DOUBLE) AS DECIMAL(28,6)))
      |         OVER tw AS DOUBLE) AS sxx
      |  FROM hr
      |  WINDOW tw AS (PARTITION BY user_id ORDER BY hour_idx
      |                RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      |sc AS (
      |  SELECT user_id, hour_idx, value, n_obs,
      |    round((sxx - sx * sx / n_obs) / (n_obs - 1), 12) AS vr,
      |    sx / n_obs AS mean
      |  FROM m)
      |SELECT user_id, hour_idx, value, n_obs,
      |  CASE WHEN n_obs >= 8 AND vr > 0
      |       THEN round((value - mean) / sqrt(vr), 12) END AS z,
      |  COALESCE(CASE WHEN n_obs >= 8 AND vr > 0
      |       THEN abs(round((value - mean) / sqrt(vr), 12)) > 3.0 END,
      |    FALSE) AS is_anomaly
      |FROM sc ORDER BY user_id, hour_idx""".stripMargin

  /** Mirrors q106 (`ops.Web.q106UrlDedup`): the mirrored two-spelling
    * synthesis, canonicalization, and the per-canonical-URL collapse. */
  val q106UrlDedup: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0
      |      THEN 'HTTPS://WWW.Mirror.Example.com:443/page/' || (doc_id // 2)
      |           || '/?utm_source=a&x=1#top'
      |      ELSE 'https://mirror.example.com/page/' || (doc_id // 2)
      |           || '?x=1&gclid=g' END AS url_raw
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id, url_raw,
      |    lower(regexp_extract(url_raw, '^([A-Za-z]+)://', 1)) AS scheme,
      |    regexp_extract(url_raw, '^[A-Za-z]+://([^/?#]+)', 1) AS hostport,
      |    regexp_extract(url_raw, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
      |    regexp_extract(url_raw, '\?([^#]*)', 1) AS q
      |  FROM raw),
      |norm AS (
      |  SELECT doc_id, url_raw, scheme,
      |    regexp_replace(regexp_replace(lower(hostport), ':[0-9]+$', ''),
      |                   '^www\.', '') AS host,
      |    regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
      |    CASE WHEN path = '' THEN '/'
      |         ELSE regexp_replace(path, '(.+)/$', '\1') END AS cpath,
      |    array_to_string(list_sort(list_filter(string_split(q, '&'),
      |        x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid)='))),
      |      '&') AS cq,
      |    regexp_matches(q, '(^|&)(utm_[^=]*|fbclid|gclid)=') AS had_tracking
      |  FROM parts),
      |canon AS (
      |  SELECT doc_id, url_raw, had_tracking,
      |    scheme || '://' || host
      |      || (CASE WHEN port <> '' AND NOT ((scheme = 'https' AND port = '443')
      |                                     OR (scheme = 'http' AND port = '80'))
      |               THEN ':' || port ELSE '' END)
      |      || cpath
      |      || (CASE WHEN cq <> '' THEN '?' || cq ELSE '' END) AS canonical_url
      |  FROM norm)
      |SELECT canonical_url,
      |  CAST(COUNT(*) AS BIGINT) AS n_urls,
      |  CAST(COUNT(DISTINCT url_raw) AS BIGINT) AS n_spellings,
      |  MIN(doc_id) AS keeper_doc_id,
      |  bool_or(had_tracking) AS any_tracking
      |FROM canon GROUP BY canonical_url
      |ORDER BY canonical_url""".stripMargin

  /** Mirrors q108 (`ops.SnapshotDiff.applyChangelog`): the oracle
    * replays q63's snapshot-B derivation DIRECTLY — the engine must
    * reconstruct it through changelog extraction + merge apply, so
    * hash equality proves the CDC round trip is the identity. */
  val q108SnapshotApply: String =
    """WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END AS text
      |  FROM documents WHERE doc_id % 11 <> 0
      |  UNION ALL
      |  SELECT doc_id + (SELECT m FROM mx) + 1, text
      |  FROM documents WHERE doc_id % 13 = 0)
      |SELECT doc_id, md5(text) AS md5 FROM b ORDER BY doc_id""".stripMargin

  /** Mirrors q109 (`ops.Fuzzy`): the tweak-keyed titles, the
    * tweak-stable block slice, the ≤64 block cap, and exact
    * Levenshtein ≤ 2 within blocks. */
  val q109FuzzyDedup: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 1 THEN 'x' || substr(text, 2, 31)
      |         WHEN doc_id % 5 = 2 THEN substr(text, 1, 32) || 'q'
      |         ELSE substr(text, 1, 32) END AS title
      |  FROM documents),
      |b AS (SELECT doc_id, title, substr(title, 9, 8) AS blk FROM t),
      |ok AS (SELECT blk FROM b GROUP BY blk HAVING COUNT(*) <= 64)
      |SELECT l.doc_id AS d1, r.doc_id AS d2,
      |  CAST(levenshtein(l.title, r.title) AS BIGINT) AS dist
      |FROM b l JOIN ok ON l.blk = ok.blk
      |JOIN b r ON l.blk = r.blk AND l.doc_id < r.doc_id
      |WHERE levenshtein(l.title, r.title) <= 2
      |ORDER BY d1, d2""".stripMargin

  /** Mirrors q110 (`ops.Graph.pageRank`, 3 rounds): the link synthesis
    * replayed, then each round unrolled as a CTE block following the
    * exact determinism recipe — per-edge share double-divided, rounded
    * to 12, summed as DECIMAL; teleport+damping combined in double on
    * the exact sums; round result rounded to 12. */
  val q110PageRank: String = {
    def iter(i: Int): String =
      s"""c$i AS (SELECT e.dst AS id, CAST(round(r.rank / e.deg, 12) AS DECIMAL(28,12)) AS c
         |  FROM r${i - 1} r JOIN es e ON r.id = e.src),
         |dm$i AS (SELECT COALESCE(SUM(CAST(r.rank AS DECIMAL(28,12))), 0) AS dm
         |  FROM r${i - 1} r LEFT JOIN deg d ON r.id = d.src WHERE d.src IS NULL),
         |r$i AS (SELECT n.id,
         |    round(0.15 / (SELECT n FROM nn) + 0.85 *
         |      (COALESCE(CAST(s.sc AS DOUBLE), 0.0) +
         |       CAST((SELECT dm FROM dm$i) AS DOUBLE) / (SELECT n FROM nn)), 12) AS rank
         |  FROM nodes n
         |  LEFT JOIN (SELECT id, SUM(c) AS sc FROM c$i GROUP BY id) s ON n.id = s.id)""".stripMargin
    s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(id) AS mx FROM nodes),
       |edges AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT id AS src, (id * 7 + 13) % ((SELECT mx FROM nn) + 1) AS dst
       |    FROM nodes WHERE id % 17 <> 0
       |    UNION ALL
       |    SELECT id AS src, (id * 31 + 101) % ((SELECT mx FROM nn) + 1) AS dst
       |    FROM nodes WHERE id % 17 <> 0)
       |  WHERE dst IN (SELECT id FROM nodes)),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
       |es AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON e.src = d.src),
       |r0 AS (SELECT id, round(1.0 / (SELECT n FROM nn), 12) AS rank FROM nodes),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)}
       |SELECT id AS doc_id, rank FROM r3 ORDER BY doc_id""".stripMargin
  }

  /** Mirrors q113 (`ops.SetSimilarity.prefixFilterJoin`): exact
    * distinct-shingle-set Jaccard ≥ 0.6 pairs. The oracle pays the
    * all-pairs quadratic the prefix filter prunes; both sides compute
    * jaccard as int/int in double, threshold on the unrounded value,
    * and round to 6 only for the emitted column. */
  val q113ExactJaccard: String =
    s"""WITH $shingleCtes,
       |d AS (SELECT doc_id, list(g) AS toks FROM sh GROUP BY doc_id),
       |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
       |    len(list_intersect(a.toks, b.toks)) AS inter,
       |    len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS uni
       |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
       |SELECT d1, d2, CAST(inter AS BIGINT) AS inter,
       |  round(inter * 1.0 / uni, 6) AS jac
       |FROM p WHERE inter * 1.0 / uni >= 0.8
       |ORDER BY d1, d2""".stripMargin

  /** Mirrors q114 (`ops.Graph.triangleCounts`): the block-community
    * link synthesis, then naive a<b<c triple-join triangle
    * enumeration — the oracle is orientation-free; the engine's
    * degree-ordered orientation must produce the same per-node
    * counts. */
  val q114TriangleCount: String =
    """WITH nodes AS (SELECT doc_id AS id FROM documents),
      |e AS (
      |  SELECT src, dst FROM (
      |    SELECT id AS src, id + 1 AS dst FROM nodes
      |    UNION ALL SELECT id, id + 2 FROM nodes
      |    UNION ALL SELECT id, id + 3 FROM nodes)
      |  WHERE src // 25 = dst // 25 AND dst IN (SELECT id FROM nodes)),
      |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |        FROM e WHERE src <> dst),
      |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |        FROM und e1 JOIN und e2 ON e1.b = e2.a
      |        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
      |pern AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM (
      |    SELECT x AS id FROM tri
      |    UNION ALL SELECT y FROM tri
      |    UNION ALL SELECT z FROM tri) GROUP BY id)
      |SELECT n.id AS doc_id, COALESCE(pern.n, 0) AS n_triangles
      |FROM nodes n LEFT JOIN pern ON n.id = pern.id
      |ORDER BY doc_id""".stripMargin

  /** Mirrors q122 (`ops.Fuzzy.multiBlockPairs`, 3 slices): the
    * mid-tweak title key, the three positional block passes unioned,
    * per-pass hot-block caps, min-dist pair dedup. */
  val q122MultiBlockFuzzy: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 1 THEN 'x' || substr(text, 2, 31)
      |         WHEN doc_id % 5 = 2 THEN substr(text, 1, 32) || 'q'
      |         WHEN doc_id % 5 = 3 THEN substr(text, 1, 11) || 'm' || substr(text, 13, 20)
      |         ELSE substr(text, 1, 32) END AS title
      |  FROM documents),
      |b AS (SELECT doc_id, title,
      |        CAST(s AS VARCHAR) || ':' || substr(title, s * 10 + 1, 10) AS blk
      |      FROM t CROSS JOIN (SELECT unnest([0, 1, 2]) AS s)),
      |ok AS (SELECT blk FROM b GROUP BY blk HAVING COUNT(*) <= 64),
      |p AS (SELECT l.doc_id AS d1, r.doc_id AS d2,
      |        CAST(levenshtein(l.title, r.title) AS BIGINT) AS dist
      |      FROM b l JOIN ok ON l.blk = ok.blk
      |      JOIN b r ON l.blk = r.blk AND l.doc_id < r.doc_id
      |      WHERE levenshtein(l.title, r.title) <= 2)
      |SELECT d1, d2, MIN(dist) AS dist FROM p GROUP BY d1, d2
      |ORDER BY d1, d2""".stripMargin

  /** Mirrors q121 (`ops.Selection.ecdf`): the oracle pays the global
    * percent_rank window the engine's bucketed prefix avoids; the
    * score divides exact longs in double on both sides. */
  val q121Ecdf: String =
    """WITH t AS (SELECT doc_id,
      |    CAST(n_chars AS DOUBLE) /
      |      CAST(greatest(len(regexp_extract_all(text, '\S+')), 1) AS DOUBLE) AS ratio
      |  FROM documents)
      |SELECT doc_id, round(ratio, 6) AS ratio,
      |  round(percent_rank() OVER (ORDER BY ratio), 6) AS pct
      |FROM t ORDER BY doc_id""".stripMargin

  /** Mirrors q120 (`ops.Baskets.q120ProductFamilies`): the q116 pair
    * derivation, then min-reachability components via a recursive CTE
    * (the q40 pattern) with singleton parts as their own family. */
  val q120ProductFamilies: String =
    """WITH RECURSIVE p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |ok AS (SELECT l_orderkey FROM p GROUP BY l_orderkey
      |       HAVING count(*) BETWEEN 2 AND 1024),
      |pr AS (SELECT a.l_partkey AS i1, b.l_partkey AS i2
      |  FROM p a JOIN p b ON a.l_orderkey = b.l_orderkey
      |                   AND a.l_partkey < b.l_partkey
      |  JOIN ok ON a.l_orderkey = ok.l_orderkey
      |  GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= 3),
      |nodes AS (SELECT DISTINCT l_partkey AS id FROM lineitem),
      |edges AS (SELECT i1 AS a, i2 AS b FROM pr
      |          UNION ALL SELECT i2 AS a, i1 AS b FROM pr),
      |reach(v, r) AS (
      |  SELECT id AS v, id AS r FROM nodes
      |  UNION
      |  SELECT reach.v, edges.b AS r FROM reach JOIN edges ON reach.r = edges.a),
      |comp AS (SELECT v AS id, MIN(r) AS family FROM reach GROUP BY v),
      |sz AS (SELECT family, CAST(count(*) AS BIGINT) AS family_size
      |       FROM comp GROUP BY family)
      |SELECT comp.id AS part_id, comp.family, sz.family_size
      |FROM comp JOIN sz USING (family)
      |ORDER BY part_id""".stripMargin

  /** Mirrors q119 (`ops.Clustering.groupCentroids`/`centroidCosines`):
    * the q110 determinism recipe per stage — coordinates rounded to 12
    * and summed as DECIMAL, means re-rounded, dot/norm as
    * rounded-product DECIMAL sums, final cosine rounded to 6. */
  val q119CentroidCosines: String =
    """WITH x AS (SELECT label AS g, embedding,
      |    unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
      |cd AS (SELECT g, i,
      |    round(CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE), 12)
      |      AS DECIMAL(28,12))) AS DOUBLE) / count(*), 12) AS c
      |  FROM x GROUP BY g, i),
      |nr AS (SELECT g, sum(CAST(round(c * c, 12) AS DECIMAL(28,12))) AS nrm
      |       FROM cd GROUP BY g),
      |dt AS (SELECT a.g AS g1, b.g AS g2,
      |    sum(CAST(round(a.c * b.c, 12) AS DECIMAL(28,12))) AS dot
      |  FROM cd a JOIN cd b ON a.i = b.i AND a.g < b.g GROUP BY a.g, b.g)
      |SELECT CAST(dt.g1 AS BIGINT) AS l1, CAST(dt.g2 AS BIGINT) AS l2,
      |  round(CAST(dot AS DOUBLE) /
      |    sqrt(CAST(n1.nrm AS DOUBLE) * CAST(n2.nrm AS DOUBLE)), 6) AS cos
      |FROM dt JOIN nr n1 ON dt.g1 = n1.g JOIN nr n2 ON dt.g2 = n2.g
      |ORDER BY l1, l2""".stripMargin

  /** Mirrors q118 (`ops.Baskets.itemCosine`): binary-cosine
    * item-item similarity from the q116 co-occurrence counts — the
    * threshold compares the unrounded double on both sides; the
    * emitted `cos` rounds to 6. */
  val q118ItemCosine: String =
    """WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |ok AS (SELECT l_orderkey FROM p GROUP BY l_orderkey
      |       HAVING count(*) BETWEEN 2 AND 1024),
      |pr AS (SELECT a.l_partkey AS i1, b.l_partkey AS i2,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM p a JOIN p b ON a.l_orderkey = b.l_orderkey
      |                   AND a.l_partkey < b.l_partkey
      |  JOIN ok ON a.l_orderkey = ok.l_orderkey
      |  GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= 2),
      |f AS (SELECT l_partkey AS i, CAST(count(*) AS BIGINT) AS f
      |      FROM p GROUP BY l_partkey)
      |SELECT pr.i1, pr.i2, pr.n, f1.f AS f1, f2.f AS f2,
      |  round(pr.n / sqrt(CAST(f1.f * f2.f AS DOUBLE)), 6) AS cos
      |FROM pr JOIN f f1 ON pr.i1 = f1.i JOIN f f2 ON pr.i2 = f2.i
      |WHERE pr.n / sqrt(CAST(f1.f * f2.f AS DOUBLE)) >= 0.08
      |ORDER BY i1, i2""".stripMargin

  /** Mirrors q117 (`ops.RangeJoin.scd2Lookup`): the synthesized
    * 3-version user dimension with the [10,11] validity gap, LEFT
    * BETWEEN join, NULL-tier group kept (NULLS FIRST pinned — DuckDB
    * defaults NULLS LAST, Spark asc_nulls_first). */
  val q117Scd2Join: String =
    """WITH d0 AS (SELECT min(epoch_us(ts) // 86400000000) AS dmin FROM events),
      |e AS (SELECT event_id, user_id, event_type,
      |    epoch_us(ts) // 86400000000 - (SELECT dmin FROM d0) AS rd FROM events),
      |u AS (SELECT DISTINCT user_id FROM events),
      |dim AS (SELECT user_id, k,
      |    CASE k WHEN 0 THEN 0 WHEN 1 THEN 12 ELSE 20 END AS lo,
      |    CASE k WHEN 0 THEN 9 WHEN 1 THEN 19 ELSE 29 END AS hi,
      |    (user_id + k) % 3 AS tier
      |  FROM u CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)),
      |j AS (SELECT e.event_type, d.tier FROM e LEFT JOIN dim d
      |      ON e.user_id = d.user_id AND e.rd BETWEEN d.lo AND d.hi)
      |SELECT tier, event_type, CAST(count(*) AS BIGINT) AS n
      |FROM j GROUP BY tier, event_type
      |ORDER BY tier NULLS FIRST, event_type""".stripMargin

  /** Mirrors q115 (`ops.TimeSeries.q115MarkovTransitions` via
    * `SkewWindows.adjacentPairs`): the one-window lead formulation the
    * chunked engine path must reproduce exactly. */
  val q115MarkovTransitions: String =
    """WITH o AS (SELECT event_type AS cur,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      |  FROM events),
      |c AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
      |      FROM o WHERE nxt IS NOT NULL GROUP BY cur, nxt),
      |t AS (SELECT cur, SUM(n) AS tot FROM c GROUP BY cur)
      |SELECT c.cur, c.nxt, c.n, round(c.n * 1.0 / t.tot, 6) AS p
      |FROM c JOIN t USING (cur) ORDER BY cur, nxt""".stripMargin

  /** Mirrors q116 (`ops.Baskets.frequentPairs`): the self-join
    * formulation of in-row pair generation; support and the (absent
    * here) basket cap mirror the engine parameters. */
  val q116FrequentPairs: String =
    """WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |ok AS (SELECT l_orderkey FROM p GROUP BY l_orderkey
      |       HAVING count(*) BETWEEN 2 AND 1024)
      |SELECT a.l_partkey AS i1, b.l_partkey AS i2, CAST(count(*) AS BIGINT) AS n
      |FROM p a JOIN p b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |JOIN ok ON a.l_orderkey = ok.l_orderkey
      |GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= 3
      |ORDER BY i1, i2""".stripMargin

  /** Mirrors q111 (`ops.RangeJoin.intervalOverlap`): the deterministic
    * per-event windows, then a plain inequality join — the oracle pays
    * the quadratic the bucketed engine path avoids. Floor-seconds via
    * `epoch_us // 1000000` (DuckDB's double cast would round). */
  val q111IntervalOverlap: String =
    """WITH iv AS (SELECT event_id, event_type,
      |    epoch_us(ts) // 1000000 AS s,
      |    epoch_us(ts) // 1000000 + 60 + event_id % 240 AS e
      |  FROM events)
      |SELECT a.event_id AS a_id, b.event_id AS b_id, a.event_type,
      |  least(a.e, b.e) - greatest(a.s, b.s) AS overlap_s
      |FROM iv a JOIN iv b
      |  ON a.event_type = b.event_type AND a.s <= b.e AND b.s <= a.e
      |WHERE a.event_id % 2 = 0 AND b.event_id % 2 = 1
      |ORDER BY a_id, b_id""".stripMargin

  /** Mirrors q104 (`ops.Privacy.kAnonymousRelease`, k=50): measures
    * released only when the cell's distinct-user count clears k. */
  val q104KAnonymity: String =
    """WITH cells AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu,
      |    CAST(COUNT(*) AS BIGINT) AS ne,
      |    SUM(CAST(value AS DECIMAL(28,6))) AS tv
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day_idx,
      |  CASE WHEN nu >= 50 THEN nu END AS n_users,
      |  CASE WHEN nu >= 50 THEN ne END AS n_events,
      |  CASE WHEN nu >= 50 THEN CAST(tv AS DOUBLE) END AS total_value,
      |  (nu < 50) AS suppressed
      |FROM cells ORDER BY event_type, day_idx""".stripMargin

  /** Mirrors q123 (`ops.Labeling.q123PreferencePairs`): the q39 verdict
    * ladder with source carried through, then the bounded earliest-8
    * keep/reject streams rank-paired per source. The oracle pays the
    * per-source row_number windows the engine's bounded `top_k`
    * aggregate avoids. */
  val q123PreferencePairs: String =
    s"""WITH $tokCte,
       |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
       |        FROM tok WHERE len(l) >= 3),
       |g AS (SELECT doc_id, array_to_string(l[i:i+2], ' ') AS gram FROM pos),
       |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tri,
       |               CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_dis
       |        FROM g GROUP BY doc_id),
       |v AS (SELECT doc_id, source, n_tokens,
       |  CASE WHEN n_tokens < 20 THEN 'too_short'
       |       WHEN n_tokens > 100000 THEN 'too_long'
       |       WHEN avg_token_len < 3.0 OR avg_token_len > 10.0 THEN 'token_shape'
       |       WHEN punct_ratio > 0.1 THEN 'punct'
       |       WHEN dup_frac > 0.2 THEN 'repetitive'
       |       ELSE 'keep' END AS reason
       |  FROM (SELECT d.doc_id, d.source,
       |      CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT) AS n_tokens,
       |      CAST(length(regexp_replace(d.text, '\\s', '', 'g')) AS DOUBLE) /
       |        greatest(CAST(len(regexp_extract_all(d.text, '\\S+')) AS DOUBLE), 1.0) AS avg_token_len,
       |      CAST(length(regexp_replace(d.text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) /
       |        greatest(CAST(length(d.text) AS DOUBLE), 1.0) AS punct_ratio,
       |      CASE WHEN COALESCE(a.n_tri, 0) > 0
       |           THEN 1.0 - CAST(a.n_dis AS DOUBLE) / CAST(a.n_tri AS DOUBLE)
       |           ELSE 0.0 END AS dup_frac
       |    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id) b),
       |ch AS (SELECT source, doc_id, n_tokens,
       |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rank
       |       FROM v WHERE reason = 'keep'),
       |rj AS (SELECT source, doc_id, n_tokens, reason,
       |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rank
       |       FROM v WHERE reason <> 'keep')
       |SELECT ch.source, CAST(ch.rank AS BIGINT) AS rank,
       |  ch.doc_id AS chosen_id, rj.doc_id AS rejected_id,
       |  ch.n_tokens AS chosen_tokens, rj.n_tokens AS rejected_tokens,
       |  ch.n_tokens - rj.n_tokens AS margin_tokens,
       |  rj.reason AS reject_reason
       |FROM ch JOIN rj ON ch.source = rj.source AND ch.rank = rj.rank
       |WHERE ch.rank <= 8
       |ORDER BY ch.source, ch.rank""".stripMargin

  /** Mirrors q124 (`ops.Labeling.q124LabelVote`): the deterministic
    * md5 pseudo-votes and the majority argmax (most votes, ties to the
    * lexicographically smallest label) via a windowed rank. */
  val q124LabelVote: String =
    """WITH v AS (SELECT doc_id,
      |    substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 1) AS h
      |  FROM documents CROSS JOIN (SELECT unnest([1, 2, 3]) AS j)),
      |lab AS (SELECT doc_id,
      |    CASE WHEN h < '6' THEN 'good' WHEN h < 'b' THEN 'ok'
      |         ELSE 'bad' END AS label FROM v),
      |c AS (SELECT doc_id, label, CAST(COUNT(*) AS BIGINT) AS n
      |      FROM lab GROUP BY doc_id, label),
      |r AS (SELECT doc_id, label, n,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, label) AS rn,
      |    CAST(SUM(n) OVER (PARTITION BY doc_id) AS BIGINT) AS nv,
      |    CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS nl
      |  FROM c)
      |SELECT doc_id, nv AS n_votes, label AS majority, n AS n_majority,
      |  (nl = 1) AS unanimous
      |FROM r WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  /** Mirrors q125 (`ops.Normalization.q125NormalizedDedup`): the
    * deterministic dirty renderings (mod-3 verbatim/upcase/commas),
    * the casefold/strip/collapse normalization, q24's prefix-8 key and
    * group shape. */
  val q125NormalizedDedup: String =
    """WITH r AS (SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN text
      |         WHEN doc_id % 3 = 1 THEN upper(text)
      |         ELSE regexp_replace(text, ' ', ', ', 'g') END AS rendered
      |  FROM documents)
      |SELECT norm_md5, canonical_id, group_size, members FROM (
      |  SELECT md5(array_to_string(regexp_extract_all(
      |           trim(regexp_replace(
      |             regexp_replace(lower(rendered), '[^a-z0-9\s]', '', 'g'),
      |             '\s+', ' ', 'g')), '\S+')[1:8], ' ')) AS norm_md5,
      |    min(doc_id) AS canonical_id,
      |    COUNT(*) AS group_size,
      |    array_to_string(list_transform(list_sort(list(doc_id))[1:20],
      |      x -> CAST(x AS VARCHAR)), ',') AS members
      |  FROM r GROUP BY 1) t
      |WHERE group_size >= 2
      |ORDER BY norm_md5""".stripMargin

  /** Mirrors q126 (`ops.Splits.balanceAudit`): observed per-(source,
    * split) counts vs corpus-wide shares; the χ² is the same fixed
    * three-term left-to-right expression over exact longs, and
    * `flagged` compares the ROUNDED statistic on both sides. */
  val q126SplitBalance: String =
    """WITH d AS (SELECT source,
      |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
      |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents),
      |per AS (SELECT source,
      |    CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
      |    CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
      |    CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
      |  FROM d GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_train) AS BIGINT) AS t_train,
      |               CAST(SUM(n_val) AS BIGINT) AS t_val,
      |               CAST(SUM(n_test) AS BIGINT) AS t_test FROM per),
      |x AS (SELECT source, n_train, n_val, n_test,
      |    CAST(n_train + n_val + n_test AS DOUBLE) AS n,
      |    CAST(t_train + t_val + t_test AS DOUBLE) AS ta,
      |    t_train, t_val, t_test
      |  FROM per CROSS JOIN tot),
      |e AS (SELECT source, n_train, n_val, n_test,
      |    n * (CAST(t_train AS DOUBLE) / ta) AS e1,
      |    n * (CAST(t_val AS DOUBLE) / ta) AS e2,
      |    n * (CAST(t_test AS DOUBLE) / ta) AS e3
      |  FROM x),
      |ch AS (SELECT source, n_train, n_val, n_test,
      |    round(
      |      (CASE WHEN e1 > 0 THEN (CAST(n_train AS DOUBLE) - e1) * (CAST(n_train AS DOUBLE) - e1) / e1 ELSE 0 END)
      |      + (CASE WHEN e2 > 0 THEN (CAST(n_val AS DOUBLE) - e2) * (CAST(n_val AS DOUBLE) - e2) / e2 ELSE 0 END)
      |      + (CASE WHEN e3 > 0 THEN (CAST(n_test AS DOUBLE) - e3) * (CAST(n_test AS DOUBLE) - e3) / e3 ELSE 0 END),
      |      6) AS chi2
      |  FROM e)
      |SELECT source, n_train, n_val, n_test, chi2, (chi2 > 5.991) AS flagged
      |FROM ch ORDER BY source""".stripMargin

  /** Mirrors q127 (`ops.Standardize.outlierSummary`): per-dim moments
    * from exact rounded-decimal sums (cross-row float sums are not
    * order-free; decimals are — the q42 rule applied to moments), then
    * the per-vector |z| summary. */
  val q127EmbeddingStandardize: String =
    """WITH x AS (SELECT vec_id, embedding,
      |    unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
      |e AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
      |        CAST(embedding[i] AS DOUBLE) AS xi FROM x),
      |st AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(round(xi, 6) AS DECIMAL(28,6))) AS s1,
      |    SUM(CAST(round(xi * xi, 12) AS DECIMAL(28,12))) AS s2
      |  FROM e GROUP BY dim),
      |ms AS (SELECT dim,
      |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
      |    sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) -
      |      (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) *
      |      (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 0)) AS sigma
      |  FROM st),
      |z AS (SELECT e.vec_id,
      |    CASE WHEN ms.sigma > 0 THEN abs((e.xi - ms.mu) / ms.sigma)
      |         ELSE 0.0 END AS za
      |  FROM e JOIN ms ON e.dim = ms.dim)
      |SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_dims,
      |  round(MAX(za), 6) AS z_max,
      |  CAST(SUM(CASE WHEN za > 2.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM z GROUP BY vec_id
      |ORDER BY vec_id""".stripMargin

  /** Mirrors q128 (`ops.SkewWindows.trailingEwma` α=0.5, lookback 8):
    * the lag formulation of the same FIXED left-to-right 8-term
    * weighted sum — term j is the j-th most recent available value
    * with exact binary weight 0.5^j, so the doubles are bit-identical
    * to the engine's array formulation. */
  val q128Ewma: String =
    """WITH o AS (SELECT user_id, event_id, value,
      |    lag(value, 1) OVER w AS v1, lag(value, 2) OVER w AS v2,
      |    lag(value, 3) OVER w AS v3, lag(value, 4) OVER w AS v4,
      |    lag(value, 5) OVER w AS v5, lag(value, 6) OVER w AS v6,
      |    lag(value, 7) OVER w AS v7
      |  FROM events WHERE value IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, event_id,
      |  round((value
      |    + CASE WHEN v1 IS NOT NULL THEN 0.5 * v1 ELSE 0 END
      |    + CASE WHEN v2 IS NOT NULL THEN 0.25 * v2 ELSE 0 END
      |    + CASE WHEN v3 IS NOT NULL THEN 0.125 * v3 ELSE 0 END
      |    + CASE WHEN v4 IS NOT NULL THEN 0.0625 * v4 ELSE 0 END
      |    + CASE WHEN v5 IS NOT NULL THEN 0.03125 * v5 ELSE 0 END
      |    + CASE WHEN v6 IS NOT NULL THEN 0.015625 * v6 ELSE 0 END
      |    + CASE WHEN v7 IS NOT NULL THEN 0.0078125 * v7 ELSE 0 END)
      |   / (1.0
      |    + CASE WHEN v1 IS NOT NULL THEN 0.5 ELSE 0 END
      |    + CASE WHEN v2 IS NOT NULL THEN 0.25 ELSE 0 END
      |    + CASE WHEN v3 IS NOT NULL THEN 0.125 ELSE 0 END
      |    + CASE WHEN v4 IS NOT NULL THEN 0.0625 ELSE 0 END
      |    + CASE WHEN v5 IS NOT NULL THEN 0.03125 ELSE 0 END
      |    + CASE WHEN v6 IS NOT NULL THEN 0.015625 ELSE 0 END
      |    + CASE WHEN v7 IS NOT NULL THEN 0.0078125 ELSE 0 END), 6) AS ewma
      |FROM o ORDER BY user_id, event_id""".stripMargin

  /** Mirrors q130 (`ops.TimeSeries.q130SessionPaths`): the q14 30-min
    * gap sessionization (epoch-µs integer comparison ≡ the engine's
    * nanos), per-session event-type list capped at 12, path counts at
    * support ≥ 3. */
  val q130SessionPaths: String =
    """WITH o AS (SELECT user_id, ts, event_id, event_type,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |m AS (SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN prev IS NULL
      |              OR epoch_us(ts) - epoch_us(prev) > 1800000000
      |         THEN 1 ELSE 0 END AS strt
      |  FROM o),
      |sN AS (SELECT user_id, ts, event_id, event_type,
      |    SUM(strt) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m),
      |p AS (SELECT user_id, sid,
      |    array_to_string((list(event_type ORDER BY ts, event_id))[1:12], '>') AS path,
      |    CAST(COUNT(*) AS BIGINT) AS len
      |  FROM sN GROUP BY user_id, sid)
      |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(len) AS BIGINT) AS n_events
      |FROM p GROUP BY path HAVING COUNT(*) >= 3
      |ORDER BY path""".stripMargin

  /** Mirrors q131 (`ops.TimeSeries.trendSlope`): exact long/decimal
    * regression moments over hours-since-start, then the SAME fixed
    * double expression tree for the closed form. */
  val q131TrendSlope: String =
    """WITH e AS (SELECT user_id,
      |    epoch_us(ts) // 3600000000 AS h, value AS y
      |  FROM events WHERE value IS NOT NULL),
      |h0 AS (SELECT MIN(h) AS h0 FROM e),
      |x AS (SELECT user_id, h - (SELECT h0 FROM h0) AS x, y FROM e),
      |agg AS (SELECT user_id,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    SUM(CAST(round(y, 6) AS DECIMAL(18,6))) AS sy,
      |    SUM(CAST(CAST(round(y, 6) AS DECIMAL(18,6)) * x AS DECIMAL(38,6))) AS sxy
      |  FROM x GROUP BY user_id),
      |d AS (SELECT user_id, n,
      |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
      |    CAST(sxx AS DOUBLE) AS sxxd, CAST(sy AS DOUBLE) AS syd,
      |    CAST(sxy AS DOUBLE) AS sxyd
      |  FROM agg),
      |f AS (SELECT user_id, n,
      |    nd * sxxd - sxd * sxd AS den,
      |    (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS slope0,
      |    syd, sxd, nd
      |  FROM d)
      |SELECT user_id, n AS n_points,
      |  CASE WHEN den > 0 THEN round(slope0, 6) END AS slope,
      |  CASE WHEN den > 0 THEN round((syd - slope0 * sxd) / nd, 6) END AS intercept
      |FROM f ORDER BY user_id""".stripMargin

  /** Mirrors q132 (`ops.Graph.negativeEdges` over the q114 community
    * graph): md5(id:j) mod |V| candidates, self/true-edge filtering on
    * the canonical (min, max) pair, first 3 survivors by attempt
    * order. */
  val q132NegativeEdges: String =
    """WITH nodes AS (SELECT doc_id AS id FROM documents),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(id) AS mn FROM nodes),
      |edges AS (SELECT a.id AS src, a.id + o.o AS dst
      |  FROM nodes a CROSS JOIN (SELECT unnest([1, 2, 3]) AS o) o
      |  WHERE (a.id // 25) = ((a.id + o.o) // 25)
      |    AND EXISTS (SELECT 1 FROM nodes v WHERE v.id = a.id + o.o)),
      |cd AS (SELECT s.id AS src, j.j AS j,
      |    (CAST(('0x' || substr(md5(CAST(s.id AS VARCHAR) || ':' ||
      |        CAST(j.j AS VARCHAR)), 1, 8)) AS BIGINT) % nn.n) + nn.mn AS partner
      |  FROM nodes s CROSS JOIN nn
      |  CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8]) AS j) j),
      |-- note: the candidate CTE and its column must NOT share a name —
      |-- DuckDB resolves the bare name inside the correlated subqueries
      |-- to the CTE, silently breaking the anti condition
      |ok AS (SELECT src, j, partner FROM cd
      |  WHERE partner <> src
      |    AND EXISTS (SELECT 1 FROM nodes v WHERE v.id = cd.partner)
      |    AND NOT EXISTS (SELECT 1 FROM edges e
      |      WHERE e.src = least(cd.src, cd.partner)
      |        AND e.dst = greatest(cd.src, cd.partner))),
      |r AS (SELECT src, partner,
      |    row_number() OVER (PARTITION BY src ORDER BY j) AS rank
      |  FROM ok)
      |SELECT src AS doc_id, CAST(rank AS BIGINT) AS rank, partner AS neg_id
      |FROM r WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  /** Mirrors q133 (`ops.Collocations.pmiPairs`): capped sorted
    * distinct token sets (the marginals count the SAME capped sets),
    * in-row-pair counts replayed as a self-join, the identical
    * ln-ratio expression rounded to 6. */
  val q133PmiCollocations: String =
    s"""WITH $tokCte,
       |cap AS (SELECT doc_id, list_sort(list_distinct(l))[1:48] AS ts FROM tok),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM cap),
       |t AS (SELECT doc_id, unnest(ts) AS tk FROM cap),
       |marg AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS df FROM t GROUP BY tk),
       |pr AS (SELECT a.tk AS t1, b.tk AS t2, CAST(COUNT(*) AS BIGINT) AS n_pair
       |       FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.tk < b.tk
       |       GROUP BY a.tk, b.tk HAVING COUNT(*) >= 5)
       |SELECT t1, t2, n_pair,
       |  round(ln(CAST(n_pair AS DOUBLE) * CAST(n.nd AS DOUBLE) /
       |    (CAST(m1.df AS DOUBLE) * CAST(m2.df AS DOUBLE))), 6) AS pmi
       |FROM pr
       |JOIN marg m1 ON pr.t1 = m1.tk
       |JOIN marg m2 ON pr.t2 = m2.tk
       |CROSS JOIN n
       |WHERE round(ln(CAST(n_pair AS DOUBLE) * CAST(n.nd AS DOUBLE) /
       |    (CAST(m1.df AS DOUBLE) * CAST(m2.df AS DOUBLE))), 6) > 0
       |ORDER BY t1, t2""".stripMargin

  /** Mirrors q134 (`ops.Dedup.horizonNearDupPairs`): q26's banded
    * chain restricted to |Δday| ≤ 7 with day = doc_id % 120 — the
    * engine's time-bucketed band key only BOUNDS the join; the result
    * set is exactly this restriction. */
  val q134HorizonDedup: String =
    s"""WITH $shingleCtes,
       |$lshCtes
       |SELECT d1, d2,
       |  CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) AS jaccard
       |FROM common
       |JOIN szc s1 ON d1 = s1.doc_id
       |JOIN szc s2 ON d2 = s2.doc_id
       |WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.5
       |  AND abs((d1 % 120) - (d2 % 120)) <= 7
       |ORDER BY d1, d2""".stripMargin

  /** Mirrors q135 (`ops.KmvSketch.q135KmvDistinct`): the md5-prefix
    * fraction order statistics — rank ≤ 128 per source — make the KMV
    * estimate a hash-exact replay, not a tolerance check. */
  /** Mirrors q64 (`ops.ProductQuantization.q64PqAnn`): the persisted
    * integer codebook replayed end-to-end in exact integer arithmetic —
    * unit-snap (grid snap, exact integer norm, one IEEE divide + round
    * per component; sqrt of an exact integer is correctly rounded so
    * both engines compute identical longs), per-subspace encode argmin
    * (ties to the smaller ki), ADC lookup-sum, top-R candidate cut
    * (R = max(50, n/10), ties to the smaller vec_id), and the exact
    * squared-L2 re-rank of survivors. Training itself is the one step
    * not replayed (the q81/q94 persisted-model rule). */
  val q64PqAnn: String =
    s"""WITH cb AS (SELECT mi, ki, qc
       |  FROM read_parquet('${graft.ops.ProductQuantization.CodebookPath}/*.parquet')),
       |e AS (SELECT vec_id, embedding FROM embeddings
       |      WHERE embedding IS NOT NULL AND len(embedding) > 0),
       |x AS (SELECT vec_id, embedding,
       |    unnest(generate_series(1, len(embedding))) AS i FROM e),
       |q0 AS (SELECT vec_id, i,
       |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qi
       |  FROM x),
       |nrm AS (SELECT vec_id, CAST(SUM(qi * qi) AS BIGINT) AS n2
       |        FROM q0 GROUP BY vec_id),
       |u AS (SELECT q0.vec_id, q0.i,
       |    CAST(floor(CAST(q0.qi * 1000 AS DOUBLE) /
       |         sqrt(CAST(nrm.n2 AS DOUBLE)) + 0.5) AS BIGINT) AS ui
       |  FROM q0 JOIN nrm ON q0.vec_id = nrm.vec_id WHERE nrm.n2 > 0),
       |sub AS (SELECT vec_id, CAST((i - 1) // 8 AS INT) AS mi,
       |    CAST((i - 1) % 8 + 1 AS INT) AS j, ui FROM u),
       |dist AS (SELECT s.vec_id, s.mi, c.ki,
       |    CAST(SUM((s.ui - c.qc[s.j]) * (s.ui - c.qc[s.j])) AS BIGINT) AS d
       |  FROM sub s JOIN cb c ON s.mi = c.mi GROUP BY s.vec_id, s.mi, c.ki),
       |code AS (SELECT vec_id, mi, ki FROM (
       |    SELECT vec_id, mi, ki,
       |      row_number() OVER (PARTITION BY vec_id, mi ORDER BY d, ki) AS rn
       |    FROM dist) z WHERE rn = 1),
       |qv AS (SELECT vec_id AS query_id, mi, j, ui FROM sub WHERE vec_id < 5),
       |tab AS (SELECT q.query_id, c.mi, c.ki,
       |    CAST(SUM((q.ui - c.qc[q.j]) * (q.ui - c.qc[q.j])) AS BIGINT) AS d
       |  FROM qv q JOIN cb c ON q.mi = c.mi GROUP BY q.query_id, c.mi, c.ki),
       |adist AS (SELECT t.query_id, co.vec_id, CAST(SUM(t.d) AS BIGINT) AS ad
       |  FROM code co JOIN tab t ON co.mi = t.mi AND co.ki = t.ki
       |  WHERE co.vec_id <> t.query_id
       |  GROUP BY t.query_id, co.vec_id),
       |rr AS (SELECT GREATEST(50, COUNT(*) // 10) AS r FROM nrm WHERE n2 > 0),
       |cand AS (SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY ad, vec_id) AS rn
       |    FROM adist) z WHERE rn <= (SELECT r FROM rr)),
       |ex AS (SELECT ca.query_id, ca.vec_id,
       |    CAST(SUM((uq.ui - uc.ui) * (uq.ui - uc.ui)) AS BIGINT) AS sq_dist
       |  FROM cand ca
       |  JOIN u uq ON uq.vec_id = ca.query_id
       |  JOIN u uc ON uc.vec_id = ca.vec_id AND uc.i = uq.i
       |  GROUP BY ca.query_id, ca.vec_id)
       |SELECT query_id, rank, neighbor_id, sq_dist FROM (
       |  SELECT query_id, vec_id AS neighbor_id, sq_dist,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY sq_dist, vec_id) AS BIGINT) AS rank
       |  FROM ex) z
       |WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  val q135KmvDistinct: String =
    s"""WITH $tokCte,
       |t AS (SELECT DISTINCT d.source, x.tk
       |      FROM (SELECT doc_id, unnest(l) AS tk FROM tok) x
       |      JOIN documents d ON x.doc_id = d.doc_id),
       |fr AS (SELECT DISTINCT source,
       |    CAST(('0x' || substr(md5(tk), 1, 8)) AS BIGINT) / 4294967296.0 AS frac
       |  FROM t),
       |rk AS (SELECT source, frac,
       |    row_number() OVER (PARTITION BY source ORDER BY frac) AS rn
       |  FROM fr),
       |ex AS (SELECT source, CAST(COUNT(DISTINCT tk) AS BIGINT) AS exact_distinct
       |       FROM t GROUP BY source),
       |st AS (SELECT source,
       |    CAST(SUM(CASE WHEN rn <= 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    MAX(CASE WHEN rn = 128 THEN frac END) AS u128
       |  FROM rk GROUP BY source)
       |SELECT st.source, ex.exact_distinct, st.n_kept,
       |  round(CASE WHEN st.n_kept < 128 THEN CAST(st.n_kept AS DOUBLE)
       |             ELSE 127.0 / st.u128 END, 6) AS kmv_est,
       |  round((round(CASE WHEN st.n_kept < 128 THEN CAST(st.n_kept AS DOUBLE)
       |               ELSE 127.0 / st.u128 END, 6) -
       |         CAST(ex.exact_distinct AS DOUBLE)) /
       |        CAST(ex.exact_distinct AS DOUBLE), 6) AS rel_err
       |FROM st JOIN ex ON st.source = ex.source
       |ORDER BY st.source""".stripMargin

  /** Mirrors q136 (`ops.KmvSketch.overlapMatrix`): per-source min-128
    * fraction sets replayed as order statistics, pairwise merged min-k,
    * and the identical union/intersection/Jaccard estimate expressions.
    * Every estimate is a deterministic equality (see q135). */
  val q136SourceOverlap: String =
    s"""WITH $tokCte,
       |t AS (SELECT DISTINCT d.source, x.tk
       |      FROM (SELECT doc_id, unnest(l) AS tk FROM tok) x
       |      JOIN documents d ON x.doc_id = d.doc_id),
       |fr AS (SELECT DISTINCT source,
       |    CAST(('0x' || substr(md5(tk), 1, 8)) AS BIGINT) / 4294967296.0 AS frac
       |  FROM t),
       |rk AS (SELECT source, frac,
       |    row_number() OVER (PARTITION BY source ORDER BY frac) AS rn
       |  FROM fr),
       |kv AS (SELECT source, frac FROM rk WHERE rn <= 128),
       |srcs AS (SELECT DISTINCT source FROM kv),
       |pr AS (SELECT a.source AS s1, b.source AS s2
       |       FROM srcs a JOIN srcs b ON a.source < b.source),
       |mg0 AS (SELECT p.s1, p.s2, k.frac
       |        FROM pr p JOIN kv k ON k.source = p.s1 OR k.source = p.s2
       |        GROUP BY p.s1, p.s2, k.frac),
       |mgr AS (SELECT s1, s2, frac,
       |    row_number() OVER (PARTITION BY s1, s2 ORDER BY frac) AS rn
       |  FROM mg0),
       |mg AS (SELECT s1, s2, frac, rn FROM mgr WHERE rn <= 128),
       |st AS (SELECT mg.s1, mg.s2,
       |    CAST(COUNT(*) AS BIGINT) AS m,
       |    MAX(CASE WHEN mg.rn = 128 THEN mg.frac END) AS u128,
       |    CAST(SUM(CASE WHEN x.frac IS NOT NULL AND y.frac IS NOT NULL
       |                  THEN 1 ELSE 0 END) AS BIGINT) AS shared
       |  FROM mg
       |  LEFT JOIN kv x ON x.source = mg.s1 AND x.frac = mg.frac
       |  LEFT JOIN kv y ON y.source = mg.s2 AND y.frac = mg.frac
       |  GROUP BY mg.s1, mg.s2)
       |SELECT s1, s2,
       |  round(CASE WHEN m < 128 THEN CAST(m AS DOUBLE)
       |             ELSE 127.0 / u128 END, 6) AS union_est,
       |  round((CAST(shared AS DOUBLE) / CAST(m AS DOUBLE)) *
       |    (CASE WHEN m < 128 THEN CAST(m AS DOUBLE)
       |          ELSE 127.0 / u128 END), 6) AS inter_est,
       |  round(CAST(shared AS DOUBLE) / CAST(m AS DOUBLE), 6) AS jaccard_est
       |FROM st ORDER BY s1, s2""".stripMargin

  /** Mirrors q137 (`ops.Labeling.kappaByPair`): the q124 synthetic
    * labels, the three annotator pairs, one conditional aggregate, and
    * the FIXED left-to-right p_e sum (good, ok, bad). */
  val q137AnnotatorKappa: String =
    """WITH lab AS (SELECT doc_id,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':1'), 1, 1) < '6' THEN 'good'
      |         WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':1'), 1, 1) < 'b' THEN 'ok'
      |         ELSE 'bad' END AS l1,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':2'), 1, 1) < '6' THEN 'good'
      |         WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':2'), 1, 1) < 'b' THEN 'ok'
      |         ELSE 'bad' END AS l2,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':3'), 1, 1) < '6' THEN 'good'
      |         WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':3'), 1, 1) < 'b' THEN 'ok'
      |         ELSE 'bad' END AS l3
      |  FROM documents),
      |p AS (SELECT 1 AS j1, 2 AS j2, l1 AS la, l2 AS lb FROM lab
      |      UNION ALL SELECT 1, 3, l1, l3 FROM lab
      |      UNION ALL SELECT 2, 3, l2, l3 FROM lab),
      |a AS (SELECT j1, j2,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
      |    CAST(SUM(CASE WHEN la = 'good' THEN 1 ELSE 0 END) AS BIGINT) AS a_good,
      |    CAST(SUM(CASE WHEN lb = 'good' THEN 1 ELSE 0 END) AS BIGINT) AS b_good,
      |    CAST(SUM(CASE WHEN la = 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS a_ok,
      |    CAST(SUM(CASE WHEN lb = 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS b_ok,
      |    CAST(SUM(CASE WHEN la = 'bad' THEN 1 ELSE 0 END) AS BIGINT) AS a_bad,
      |    CAST(SUM(CASE WHEN lb = 'bad' THEN 1 ELSE 0 END) AS BIGINT) AS b_bad
      |  FROM p GROUP BY j1, j2),
      |k AS (SELECT j1, j2, n,
      |    CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) AS po_raw,
      |    CAST(a_good AS DOUBLE) / CAST(n AS DOUBLE) * (CAST(b_good AS DOUBLE) / CAST(n AS DOUBLE)) +
      |    CAST(a_ok   AS DOUBLE) / CAST(n AS DOUBLE) * (CAST(b_ok   AS DOUBLE) / CAST(n AS DOUBLE)) +
      |    CAST(a_bad  AS DOUBLE) / CAST(n AS DOUBLE) * (CAST(b_bad  AS DOUBLE) / CAST(n AS DOUBLE)) AS pe_raw
      |  FROM a)
      |SELECT j1, j2, n AS n_items,
      |  round(po_raw, 6) AS po,
      |  round(pe_raw, 6) AS pe,
      |  round(CASE WHEN pe_raw < 1.0
      |        THEN (po_raw - pe_raw) / (1.0 - pe_raw) END, 6) AS kappa
      |FROM k ORDER BY j1, j2""".stripMargin

  /** Mirrors q138 (`ops.Dedup.containmentPairs`): q25's capped common
    * counts scored in BOTH directions, the ≥ 5-shingle floor and the
    * 0.6 containment bar. */
  val q138Containment: String =
    s"""WITH $shingleCtes,
       |rare AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= 50),
       |shc AS (SELECT sh.doc_id, sh.g FROM sh JOIN rare ON sh.g = rare.g),
       |szc AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
       |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
       |           FROM shc a JOIN shc b ON a.g = b.g AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       |bidir AS (
       |  SELECT d1 AS contained_id, d2 AS container_id, c AS n_common,
       |         s1.n AS n_contained
       |  FROM common JOIN szc s1 ON d1 = s1.doc_id
       |  UNION ALL
       |  SELECT d2, d1, c, s2.n
       |  FROM common JOIN szc s2 ON d2 = s2.doc_id)
       |SELECT contained_id, container_id, CAST(n_common AS BIGINT) AS n_common,
       |  CAST(n_contained AS BIGINT) AS n_contained,
       |  CAST(n_common AS DOUBLE) / CAST(n_contained AS DOUBLE) AS containment
       |FROM bidir
       |WHERE n_contained >= 5
       |  AND CAST(n_common AS DOUBLE) / CAST(n_contained AS DOUBLE) >= 0.6
       |ORDER BY contained_id, container_id""".stripMargin

  /** Mirrors q139 (`ops.TimeSeries.growthAccounting`): distinct
    * (user, day), first-active days, yesterday/tomorrow presence
    * probes, aggregated per ACTIVE day (churn into a zero-active day
    * is unreported on both sides by contract). */
  val q139GrowthAccounting: String =
    """WITH ud AS (SELECT DISTINCT user_id,
      |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day FROM events),
      |f AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id),
      |st AS (SELECT ud.day,
      |    CAST(COUNT(*) AS BIGINT) AS n_active,
      |    CAST(SUM(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |    CAST(SUM(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
      |    CAST(SUM(CASE WHEN ud.day <> f.first_day AND p.user_id IS NULL
      |             THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      |  FROM ud
      |  JOIN f ON ud.user_id = f.user_id
      |  LEFT JOIN ud p ON p.user_id = ud.user_id AND p.day = ud.day - 1
      |  GROUP BY ud.day),
      |ch AS (SELECT a.day + 1 AS day, CAST(COUNT(*) AS BIGINT) AS n_churned
      |  FROM ud a LEFT JOIN ud nx
      |    ON nx.user_id = a.user_id AND nx.day = a.day + 1
      |  WHERE nx.user_id IS NULL
      |  GROUP BY a.day + 1)
      |SELECT st.day, st.n_active, st.n_new, st.n_retained, st.n_resurrected,
      |  COALESCE(ch.n_churned, 0) AS n_churned
      |FROM st LEFT JOIN ch ON st.day = ch.day
      |ORDER BY st.day""".stripMargin

  /** Mirrors q140 (`ops.KmvSketch.trailingDistinct`): for each ACTIVE
    * hour, the min-128 fraction order statistics of the distinct users
    * in the trailing 24 h — replayed from the raw window, which equals
    * the engine's merged hourly partials because min-k merge is exact
    * (min-k(A∪B) = min-k(min-k(A) ∪ min-k(B))). */
  val q140TrailingDistinct: String =
    """WITH eh AS (SELECT DISTINCT
      |    CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h, user_id FROM events),
      |hrs AS (SELECT DISTINCT h FROM eh),
      |win AS (SELECT DISTINCT hrs.h AS hour_idx, eh.user_id
      |        FROM hrs JOIN eh ON eh.h BETWEEN hrs.h - 23 AND hrs.h),
      |fr AS (SELECT DISTINCT hour_idx,
      |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      / 4294967296.0 AS frac
      |  FROM win),
      |rk AS (SELECT hour_idx, frac,
      |    row_number() OVER (PARTITION BY hour_idx ORDER BY frac) AS rn
      |  FROM fr),
      |st AS (SELECT hour_idx,
      |    CAST(SUM(CASE WHEN rn <= 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |    MAX(CASE WHEN rn = 128 THEN frac END) AS u128
      |  FROM rk GROUP BY hour_idx)
      |SELECT hour_idx, n_kept,
      |  round(CASE WHEN n_kept < 128 THEN CAST(n_kept AS DOUBLE)
      |             ELSE 127.0 / u128 END, 6) AS kmv_est
      |FROM st ORDER BY hour_idx""".stripMargin

  /** Mirrors q141 (`ops.KmvSketch.q141SketchStoreServe`): weekly and
    * all-time (-1) distinct-user min-128 order statistics replayed from
    * RAW events — equality with the engine's three-append store serve
    * is the mergeability proof (a mid-day append cut forces the serve
    * to merge multiple partials for the split days). */
  val q141SketchStoreServe: String =
    """WITH ud AS (SELECT DISTINCT
      |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) // 7 AS week, user_id
      |  FROM events),
      |uu AS (SELECT week, user_id FROM ud
      |       UNION SELECT CAST(-1 AS BIGINT), user_id FROM ud),
      |fr AS (SELECT DISTINCT week,
      |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      / 4294967296.0 AS frac
      |  FROM uu),
      |rk AS (SELECT week, frac,
      |    row_number() OVER (PARTITION BY week ORDER BY frac) AS rn
      |  FROM fr),
      |st AS (SELECT week,
      |    CAST(SUM(CASE WHEN rn <= 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |    MAX(CASE WHEN rn = 128 THEN frac END) AS u128
      |  FROM rk GROUP BY week)
      |SELECT week, n_kept,
      |  round(CASE WHEN n_kept < 128 THEN CAST(n_kept AS DOUBLE)
      |             ELSE 127.0 / u128 END, 6) AS kmv_est
      |FROM st ORDER BY week""".stripMargin

  /** Mirrors q145 (`ops.KmvSketch.q145StreamedSketchServe`): identical
    * replay shape to [[q141SketchStoreServe]] but grouped by FORTNIGHT
    * (day // 14) — equality with the engine's STREAM-maintained store
    * (three user-sliced micro-batches via `kmvDailyStream`) proves
    * streaming maintenance ≡ a from-scratch sketch of the raw union. */
  val q145StreamedSketchServe: String =
    """WITH ud AS (SELECT DISTINCT
      |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) // 14 AS fortnight, user_id
      |  FROM events),
      |uu AS (SELECT fortnight, user_id FROM ud
      |       UNION SELECT CAST(-1 AS BIGINT), user_id FROM ud),
      |fr AS (SELECT DISTINCT fortnight,
      |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      / 4294967296.0 AS frac
      |  FROM uu),
      |rk AS (SELECT fortnight, frac,
      |    row_number() OVER (PARTITION BY fortnight ORDER BY frac) AS rn
      |  FROM fr),
      |st AS (SELECT fortnight,
      |    CAST(SUM(CASE WHEN rn <= 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |    MAX(CASE WHEN rn = 128 THEN frac END) AS u128
      |  FROM rk GROUP BY fortnight)
      |SELECT fortnight, n_kept,
      |  round(CASE WHEN n_kept < 128 THEN CAST(n_kept AS DOUBLE)
      |             ELSE 127.0 / u128 END, 6) AS kmv_est
      |FROM st ORDER BY fortnight""".stripMargin

  /** Mirrors q146 (`ops.Attribution.q146StreamedAttribution`): the
    * identical interval join in SQL — every purchase paired with every
    * same-user click at most 4 h (14 400 000 000 µs) before it.
    * Equality with the engine's result proves the STREAMED inner join
    * (two file sources, 3 chronological micro-batches each, watermarked
    * state) emits exactly the batch join's pairs. */
  val q146StreamedAttribution: String =
    """WITH c AS (SELECT user_id, event_id AS click_id,
      |                 epoch_us(ts) AS click_us
      |           FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, event_id AS purchase_id,
      |             epoch_us(ts) AS purchase_us
      |      FROM events WHERE event_type = 'purchase')
      |SELECT p.user_id, c.click_id, p.purchase_id,
      |       c.click_us, p.purchase_us
      |FROM p JOIN c ON p.user_id = c.user_id
      |WHERE p.purchase_us >= c.click_us
      |  AND p.purchase_us <= c.click_us + 14400000000
      |ORDER BY p.user_id, c.click_id, p.purchase_id""".stripMargin

  /** Mirrors q147 (`ops.StreamingGates.q147StreamedSessions`): the
    * gap-merge replay of `session_window(t, 30 min)` — a new session
    * starts when the gap to the previous same-user event is ≥ 30 min
    * (session windows are end-EXCLUSIVE: an event landing exactly at
    * last + gap opens a new one), end = last event + 30 min. Sum rides
    * DECIMAL(28,6) on both sides (the q34 float rule). Equality proves
    * the streaming state store's session merge across micro-batches ≡
    * the batch gap-merge. */
  val q147StreamedSessions: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
      |d AS (SELECT user_id, us, value,
      |        CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us)
      |                  IS NULL
      |               OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
      |                  >= 1800000000
      |             THEN 1 ELSE 0 END AS ns
      |      FROM e),
      |s AS (SELECT user_id, us, value,
      |        SUM(ns) OVER (PARTITION BY user_id ORDER BY us
      |                      ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM d)
      |SELECT user_id, MIN(us) AS session_start_us,
      |       MAX(us) + 1800000000 AS session_end_us,
      |       CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  /** Mirrors q148 (`ops.StreamingGates.q148StreamedDedup`): the
    * per-user argmin — the row `dropDuplicatesWithinWatermark` keeps
    * when batches arrive chronologically and each slice is pre-sorted
    * by (ts, event_id). */
  val q148StreamedDedup: String =
    """SELECT user_id, event_id AS first_event_id,
      |       epoch_us(ts) AS first_us, event_type
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |                                   ORDER BY ts, event_id) AS rn
      |      FROM events)
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** Mirrors q142 (`ops.Experiment.abTest`): the md5-prefix variant
    * assignment, per-user event-type counts, exact long moments with
    * the variant's FULL unit count, and the identical fixed Welch
    * expressions (significance tests the ROUNDED z on both sides). */
  val q142AbTest: String =
    """WITH ev AS (SELECT user_id, event_type,
      |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      % 2 AS variant
      |  FROM events),
      |u AS (SELECT
      |    CAST(COUNT(DISTINCT CASE WHEN variant = 0 THEN user_id END) AS BIGINT) AS n_a,
      |    CAST(COUNT(DISTINCT CASE WHEN variant = 1 THEN user_id END) AS BIGINT) AS n_b
      |  FROM ev),
      |pu AS (SELECT event_type, variant, user_id,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM ev GROUP BY 1, 2, 3),
      |m AS (SELECT event_type,
      |    CAST(SUM(CASE WHEN variant = 0 THEN c ELSE 0 END) AS BIGINT) AS s1_a,
      |    CAST(SUM(CASE WHEN variant = 0 THEN c * c ELSE 0 END) AS BIGINT) AS s2_a,
      |    CAST(SUM(CASE WHEN variant = 1 THEN c ELSE 0 END) AS BIGINT) AS s1_b,
      |    CAST(SUM(CASE WHEN variant = 1 THEN c * c ELSE 0 END) AS BIGINT) AS s2_b
      |  FROM pu GROUP BY event_type),
      |x AS (SELECT m.event_type, u.n_a, u.n_b,
      |    CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
      |    CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
      |    (CAST(s2_a AS DOUBLE) - CAST(s1_a AS DOUBLE) * CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE))
      |      / (CAST(n_a AS DOUBLE) - 1.0) AS var_a,
      |    (CAST(s2_b AS DOUBLE) - CAST(s1_b AS DOUBLE) * CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE))
      |      / (CAST(n_b AS DOUBLE) - 1.0) AS var_b
      |  FROM m CROSS JOIN u),
      |y AS (SELECT event_type, n_a, n_b,
      |    round(CASE WHEN n_a >= 2 AND n_b >= 2 THEN mean_a END, 6) AS mean_a,
      |    round(CASE WHEN n_a >= 2 AND n_b >= 2 THEN mean_b END, 6) AS mean_b,
      |    round(CASE WHEN n_a >= 2 AND n_b >= 2
      |            AND var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE) > 0
      |          THEN (mean_a - mean_b) /
      |               sqrt(var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE))
      |          END, 6) AS z
      |  FROM x)
      |SELECT event_type, n_a, n_b, mean_a, mean_b, z,
      |  abs(z) > 1.96 AS significant
      |FROM y ORDER BY event_type""".stripMargin

  /** Mirrors q143 (`ops.QualityAudit.q143QualityAudit`): every metric
    * replayed as a conditional aggregate over one scan of orders with
    * the customer RI flag left-joined in; `passed` compares the SAME
    * rounded metric against the threshold on both sides. */
  val q143QualityAudit: String =
    """WITH f AS (SELECT o.*, (c.c_custkey IS NOT NULL) AS ri_hit
      |  FROM orders o
      |  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      |    ON o.o_custkey = c.c_custkey),
      |m AS (SELECT
      |  round(CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS completeness_o_custkey,
      |  round(CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS uniqueness_o_orderkey,
      |  round(CAST(COUNT(DISTINCT o_custkey) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS uniqueness_o_custkey,
      |  round(CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS domain_o_orderstatus,
      |  round(CAST(SUM(CASE WHEN o_totalprice > 0.0 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS range_o_totalprice,
      |  round(CAST(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$') THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS pattern_o_orderpriority,
      |  round(CAST(SUM(CASE WHEN ri_hit THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS ri_o_custkey_customer
      |  FROM f),
      |s AS (
      |  SELECT 'completeness_o_custkey' AS check_name, completeness_o_custkey AS metric FROM m
      |  UNION ALL SELECT 'uniqueness_o_orderkey', uniqueness_o_orderkey FROM m
      |  UNION ALL SELECT 'uniqueness_o_custkey', uniqueness_o_custkey FROM m
      |  UNION ALL SELECT 'domain_o_orderstatus', domain_o_orderstatus FROM m
      |  UNION ALL SELECT 'range_o_totalprice', range_o_totalprice FROM m
      |  UNION ALL SELECT 'pattern_o_orderpriority', pattern_o_orderpriority FROM m
      |  UNION ALL SELECT 'ri_o_custkey_customer', ri_o_custkey_customer FROM m)
      |SELECT check_name, metric, 1.0 AS threshold, metric >= 1.0 AS passed
      |FROM s ORDER BY check_name""".stripMargin

  /** Mirrors q144 (`ops.Drift.q144PsiDrift`): the same integer split
    * day, Laplace-smoothed shares and fixed PSI expression tree; the
    * feature totals sum the ROUNDED terms through decimal(18,6) so the
    * two engines' aggregation orders cannot ulp-drift the hash. */
  val q144PsiDrift: String =
    """WITH sp AS (SELECT (MIN(epoch_us(ts) // 86400000000)
      |    + MAX(epoch_us(ts) // 86400000000) + 1) // 2 AS split FROM events),
      |e AS (SELECT epoch_us(ts) // 86400000000 AS day,
      |    (epoch_us(ts) // 3600000000) % 24 AS hr, event_type FROM events),
      |fb AS (
      |  SELECT CASE WHEN day < split THEN 'base' ELSE 'cur' END AS period,
      |    'event_type' AS feature, event_type AS bin FROM e, sp
      |  UNION ALL
      |  SELECT CASE WHEN day < split THEN 'base' ELSE 'cur' END,
      |    'hour_of_day', lpad(CAST(hr AS VARCHAR), 2, '0') FROM e, sp),
      |c AS (SELECT feature, bin,
      |    CAST(SUM(CASE WHEN period = 'base' THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
      |    CAST(SUM(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      |  FROM fb GROUP BY 1, 2),
      |t AS (SELECT feature, CAST(SUM(n_base) AS BIGINT) AS t_base,
      |    CAST(SUM(n_cur) AS BIGINT) AS t_cur,
      |    CAST(COUNT(*) AS BIGINT) AS n_bins
      |  FROM c GROUP BY 1),
      |x AS (SELECT c.feature, c.bin, n_base, n_cur,
      |    (CAST(n_base AS DOUBLE) + 0.5)
      |      / (CAST(t_base AS DOUBLE) + 0.5 * CAST(n_bins AS DOUBLE)) AS pb,
      |    (CAST(n_cur AS DOUBLE) + 0.5)
      |      / (CAST(t_cur AS DOUBLE) + 0.5 * CAST(n_bins AS DOUBLE)) AS pc
      |  FROM c JOIN t ON c.feature = t.feature),
      |y AS (SELECT feature, bin, n_base, n_cur,
      |    round(pb, 6) AS p_base, round(pc, 6) AS p_cur,
      |    round((pc - pb) * ln(pc / pb), 6) AS psi_term FROM x),
      |tot AS (SELECT feature, '__total' AS bin,
      |    CAST(SUM(n_base) AS BIGINT) AS n_base,
      |    CAST(SUM(n_cur) AS BIGINT) AS n_cur,
      |    CAST(NULL AS DOUBLE) AS p_base, CAST(NULL AS DOUBLE) AS p_cur,
      |    CAST(SUM(CAST(psi_term AS DECIMAL(18,6))) AS DOUBLE) AS psi_term
      |  FROM y GROUP BY feature)
      |SELECT feature, bin, n_base, n_cur, p_base, p_cur, psi_term,
      |  CAST(NULL AS VARCHAR) AS verdict FROM y
      |UNION ALL
      |SELECT feature, bin, n_base, n_cur, p_base, p_cur, psi_term,
      |  CASE WHEN psi_term < 0.1 THEN 'stable'
      |       WHEN psi_term < 0.25 THEN 'drifting'
      |       ELSE 'shifted' END FROM tot
      |ORDER BY feature, bin""".stripMargin

  /** Mirrors q129 (`ops.FeatureHash.q129FeatureHash`): the same
    * md5-prefix uint32 mod 64 bucket per token, counted per doc. The
    * oracle pays the raw-token unnest the engine's in-row run counting
    * avoids. */
  val q129FeatureHash: String =
    s"""WITH $tokCte,
       |t AS (SELECT doc_id, unnest(l) AS tk FROM tok),
       |b AS (SELECT doc_id,
       |    CAST(('0x' || substr(md5(tk), 1, 8)) AS BIGINT) % 64 AS bucket
       |  FROM t)
       |SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS n
       |FROM b GROUP BY doc_id, bucket
       |ORDER BY doc_id, bucket""".stripMargin

  /** Mirrors q149 (`ops.Boilerplate.removeFrequentGrams`): 3-gram
    * document frequency over the corpus, the integer percent bar
    * (100·df ≥ n_docs ⇔ df ≥ ceil(n/100)), covered token positions via
    * the gram start offsets, and the cleaned text re-joined in order —
    * md5 pins exact bytes. Docs with < 3 tokens generate no grams and
    * keep everything; fully-covered docs hash the empty string on both
    * sides. */
  val q149BoilerplateRemoval: String =
    s"""WITH $tokCte,
       |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok),
       |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
       |        FROM tok WHERE len(l) >= 3),
       |g AS (SELECT doc_id, i, array_to_string(l[i:i+2], ' ') AS g FROM pos),
       |df AS (SELECT g, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |       FROM g GROUP BY g),
       |freq AS (SELECT g FROM df, nd WHERE df * 100 >= n),
       |cov AS (SELECT DISTINCT a.doc_id, a.i + o AS p
       |        FROM g a JOIN freq USING (g),
       |             unnest(generate_series(0, 2)) AS t(o)),
       |tokpos AS (SELECT doc_id, j, l[j] AS tk
       |           FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS j
       |                 FROM tok)),
       |kept AS (SELECT t.doc_id, t.j, t.tk
       |         FROM tokpos t LEFT JOIN cov c
       |           ON t.doc_id = c.doc_id AND t.j = c.p
       |         WHERE c.p IS NULL),
       |clean AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY j) AS txt,
       |                 CAST(COUNT(*) AS BIGINT) AS n_kept
       |          FROM kept GROUP BY doc_id)
       |SELECT tok.doc_id,
       |  CAST(len(l) AS BIGINT) AS n_tokens,
       |  CAST(len(l) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
       |  CASE WHEN len(l) = 0 THEN 0.0
       |       ELSE CAST(len(l) - coalesce(n_kept, 0) AS DOUBLE) /
       |            CAST(len(l) AS DOUBLE) END AS removed_frac,
       |  md5(coalesce(txt, '')) AS clean_md5
       |FROM tok LEFT JOIN clean USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Mirrors q150 (`ops.HeavyHitters.heavyTokens`): the exact top-20
    * token frequencies — the engine's SpaceSaving candidate pass is a
    * pure pruning device (stage-2 counts are exact), so the oracle is
    * the plain global count the sketch avoids shuffling. */
  val q150HeavyTokens: String =
    s"""WITH $tokCte,
       |t AS (SELECT unnest(l) AS token FROM tok),
       |c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
       |      FROM t GROUP BY token)
       |SELECT token, cnt FROM c
       |ORDER BY cnt DESC, token
       |LIMIT 20""".stripMargin

  /** Mirrors q151 (`ops.Hybrid.hybridRrf`): BM25 top-50 with probe doc
    * 0's distinct tokens as the query (the q58 float discipline —
    * round-12 idf and partials, DECIMAL(28,12) sum, rank over the
    * DOUBLE cast exactly as the engine windows), cosine top-50 against
    * probe vector 0 (the q36 decimal dot/norms, round-12, zero-norm
    * rows excluded), and the RRF sum as two round-12 reciprocal terms
    * added in DECIMAL(28,12). */
  val q151HybridRrf: String =
    s"""WITH $tokCte,
       |terms AS (SELECT DISTINCT unnest(l) AS term FROM tok WHERE doc_id = 0),
       |d AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl, l FROM tok
       |      WHERE doc_id <> 0),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |               CAST(SUM(dl) AS BIGINT) AS n_total FROM d),
       |t AS (SELECT doc_id, dl, unnest(l) AS term FROM d),
       |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM t JOIN terms USING (term)
       |       GROUP BY doc_id, dl, term),
       |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |sc AS (SELECT tf.doc_id,
       |    CAST(round(
       |      round(ln((CAST(tot.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5) /
       |               (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0), 12)
       |      * (CAST(tf.tf AS DOUBLE) * 2.2)
       |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE) /
       |          (CAST(tot.n_total AS DOUBLE) / CAST(tot.n_docs AS DOUBLE)))), 12)
       |      AS DECIMAL(28,12)) AS part
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN tot),
       |agg AS (SELECT doc_id, CAST(SUM(part) AS DOUBLE) AS score
       |        FROM sc GROUP BY doc_id),
       |lexall AS (SELECT doc_id, score FROM agg
       |           ORDER BY score DESC, doc_id LIMIT 50),
       |lex AS (SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
       |      AS rank_lex FROM lexall),
       |e AS (SELECT vec_id, embedding FROM embeddings),
       |q AS (SELECT embedding AS qe FROM e WHERE vec_id = 0),
       |qn AS (SELECT SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)
       |                 AS DECIMAL(28,18))) AS qq
       |       FROM (SELECT qe, unnest(generate_series(1, len(qe))) AS i FROM q)),
       |x AS (SELECT vec_id, embedding, qe,
       |             unnest(generate_series(1, len(embedding))) AS i
       |      FROM e, q WHERE vec_id <> 0),
       |dots AS (SELECT vec_id,
       |    SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)
       |        AS DECIMAL(28,18))) AS dot,
       |    SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
       |        AS DECIMAL(28,18))) AS nn
       |  FROM x GROUP BY vec_id),
       |cosd AS (SELECT vec_id,
       |    round(CAST(dot AS DOUBLE) /
       |      (sqrt(CAST(nn AS DOUBLE)) * sqrt(CAST(qq AS DOUBLE))), 12) AS cos
       |  FROM dots, qn WHERE CAST(nn AS DOUBLE) > 0 AND CAST(qq AS DOUBLE) > 0),
       |denseall AS (SELECT vec_id, cos FROM cosd
       |             ORDER BY cos DESC, vec_id LIMIT 50),
       |dense AS (SELECT vec_id AS doc_id,
       |    CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT)
       |      AS rank_dense FROM denseall),
       |fused AS (SELECT coalesce(l.doc_id, dn.doc_id) AS doc_id,
       |    l.rank_lex, dn.rank_dense,
       |    coalesce(CAST(round(1.0 / (60 + l.rank_lex), 12) AS DECIMAL(28,12)),
       |             CAST(0 AS DECIMAL(28,12))) +
       |    coalesce(CAST(round(1.0 / (60 + dn.rank_dense), 12) AS DECIMAL(28,12)),
       |             CAST(0 AS DECIMAL(28,12))) AS rrf
       |  FROM lex l FULL OUTER JOIN dense dn ON l.doc_id = dn.doc_id),
       |top AS (SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT 20)
       |SELECT doc_id, rank_lex, rank_dense, CAST(rrf AS DOUBLE) AS rrf_score
       |FROM top
       |ORDER BY doc_id""".stripMargin

  /** Mirrors q152 (`ops.HeavyHitters.q152StreamedHeavyUsers`): the
    * exact top-20 requesters — the streamed SpaceSaving store is a
    * maintenance + pruning device (the serve's counts are exact
    * stage-2 recounts), so hash equality against the plain global
    * top-k proves the stream-maintained candidates covered it. */
  val q152StreamedHeavyUsers: String =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM events GROUP BY user_id
      |ORDER BY cnt DESC, user_id
      |LIMIT 20""".stripMargin

  /** Mirrors q153 (`ops.SkipGram.skipgramSummary`): ±2-window positive
    * pairs, two negatives per center occurrence drawn by exact
    * inverse-CDF over the capped unigram^0.75 table (q62's dyadic md5
    * uniform, q45's round-9 pow decimals, prefix boundaries compared
    * in double), summarized per (center, label). The oracle probes the
    * CDF with a direct interval join — the engine's bucket-equality
    * join must select the identical vocab row. */
  val q153SkipgramPairs: String =
    s"""WITH $tokCte,
       |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
       |        FROM tok WHERE len(l) >= 1),
       |pospairs AS (SELECT p.doc_id, p.l[p.i] AS center, p.l[j] AS context
       |  FROM pos p,
       |       unnest(generate_series(greatest(p.i - 2, 1),
       |                              least(p.i + 2, len(p.l)))) AS t(j)
       |  WHERE j <> p.i),
       |tt AS (SELECT unnest(l) AS tk FROM tok),
       |counts AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS cnt FROM tt
       |           GROUP BY tk ORDER BY cnt DESC, tk LIMIT 4096),
       |cdf AS (SELECT tk,
       |    CAST(round(pow(CAST(cnt AS DOUBLE), 0.75), 9) AS DECIMAL(20,9)) AS w9,
       |    SUM(CAST(round(pow(CAST(cnt AS DOUBLE), 0.75), 9) AS DECIMAL(20,9)))
       |      OVER (ORDER BY tk ROWS UNBOUNDED PRECEDING) AS hi
       |  FROM counts),
       |cdf2 AS (SELECT tk, hi - w9 AS lo, hi FROM cdf),
       |wt AS (SELECT MAX(hi) AS w FROM cdf2),
       |draws AS (SELECT doc_id, i, l[i] AS center, j,
       |    (CAST(('0x' || substr(md5('neg:' || CAST(doc_id AS VARCHAR) || ':' ||
       |       CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 13)) AS BIGINT)
       |     + 1) / 4503599627370496.0 AS u
       |  FROM pos, unnest(generate_series(1, 2)) AS s(j)),
       |negs AS (SELECT d.doc_id, d.center, c.tk AS context
       |  FROM draws d, cdf2 c, wt
       |  WHERE CAST(c.lo AS DOUBLE) < d.u * CAST(wt.w AS DOUBLE)
       |    AND d.u * CAST(wt.w AS DOUBLE) <= CAST(c.hi AS DOUBLE)),
       |pairs AS (SELECT center, context, CAST(1 AS BIGINT) AS label FROM pospairs
       |          UNION ALL
       |          SELECT center, context, CAST(0 AS BIGINT) AS label FROM negs)
       |SELECT center, label, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(COUNT(DISTINCT context) AS BIGINT) AS n_ctx,
       |  CAST(CAST(SUM(CAST(CAST(('0x' || substr(md5(context), 1, 13)) AS BIGINT)
       |         AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS ctx_hash
       |FROM pairs GROUP BY center, label
       |ORDER BY center, label""".stripMargin

  /** Mirrors q154 (`ops.Unigram.q154UnigramIds`): the maximum-
    * likelihood Viterbi segmentation replayed from the PERSISTED piece
    * table (the q65/q91 persisted-model pattern) — scores are BIGINT
    * sums of round-12 fixed-point log-probs, so no float enters a
    * comparison on either engine. One recursive step per character
    * builds the best-score and chosen-length lists; a second recursion
    * walks the backpointers; ids join from the same table (unseen
    * piece → −1, the UNK contract, logp12 −100·10¹² as the engine's
    * `Unigram.UnkLogp12`). */
  /** The shared unigram-DP CTE chain (persisted piece table → per-word
    * best-score + chosen-length lists → backpointer walk with piece
    * strings and a step counter). The q154 tail joins ids back; the
    * q155 tail reads the total from the DP's own best list. */
  private val unigramDpCtes: String =
    s"""WITH RECURSIVE
       |probs AS (SELECT id, piece, len, logp12
       |  FROM read_parquet('${graft.ops.Unigram.ProbsPath}/*.parquet')),
       |docword AS (SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '\\S+')) AS word,
       |    unnest(range(1, len(regexp_extract_all(lower(text), '\\S+')) + 1))
       |      AS wpos
       |  FROM documents),
       |w AS (SELECT DISTINCT word FROM docword),
       |steps AS (
       |  SELECT word, 0 AS j, [CAST(0 AS BIGINT)] AS bests,
       |         CAST([] AS BIGINT[]) AS lens
       |  FROM w
       |  UNION ALL
       |  SELECT word, j + 1,
       |    list_append(bests, COALESCE(
       |      (SELECT st.bests[st.j + 2 - p.len] + p.logp12 FROM probs p
       |       WHERE p.len <= st.j + 1
       |         AND substr(st.word, st.j + 2 - p.len, p.len) = p.piece
       |       ORDER BY st.bests[st.j + 2 - p.len] + p.logp12 DESC, p.len DESC
       |       LIMIT 1),
       |      st.bests[st.j + 1] - 100000000000000)),
       |    list_append(lens, COALESCE(
       |      (SELECT CAST(p.len AS BIGINT) FROM probs p
       |       WHERE p.len <= st.j + 1
       |         AND substr(st.word, st.j + 2 - p.len, p.len) = p.piece
       |       ORDER BY st.bests[st.j + 2 - p.len] + p.logp12 DESC, p.len DESC
       |       LIMIT 1),
       |      CAST(1 AS BIGINT)))
       |  FROM steps st
       |  WHERE st.j < length(st.word)),
       |fin AS (SELECT word, lens, bests[length(word) + 1] AS best
       |        FROM steps WHERE j = length(word)),
       |walk AS (
       |  SELECT word, lens, CAST(length(word) AS BIGINT) AS pos,
       |         CAST([] AS VARCHAR[]) AS rev
       |  FROM fin
       |  UNION ALL
       |  SELECT word, lens, pos - lens[CAST(pos AS INT)],
       |    list_append(rev, substr(word,
       |      CAST(pos - lens[CAST(pos AS INT)] + 1 AS INT),
       |      CAST(lens[CAST(pos AS INT)] AS INT)))
       |  FROM walk WHERE pos > 0),
       |wpieces AS (SELECT word, list_reverse(rev) AS pieces
       |            FROM walk WHERE pos = 0)""".stripMargin

  val q154UnigramIds: String =
    s"""$unigramDpCtes,
       |wids0 AS (SELECT word, unnest(pieces) AS piece,
       |                 unnest(range(1, len(pieces) + 1)) AS ppos
       |          FROM wpieces),
       |wids AS (SELECT word, list(COALESCE(p.id, -1) ORDER BY ppos) AS ids,
       |                CAST(COUNT(*) AS BIGINT) AS n
       |         FROM wids0 LEFT JOIN probs p USING (piece) GROUP BY word),
       |perdoc AS (SELECT dw.doc_id,
       |    string_agg(array_to_string(wi.ids, ' '), ' ' ORDER BY dw.wpos)
       |      AS ids_str,
       |    CAST(SUM(wi.n) AS BIGINT) AS n_pieces
       |  FROM docword dw JOIN wids wi USING (word) GROUP BY dw.doc_id)
       |SELECT d.doc_id,
       |  CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT) AS n_ws_tokens,
       |  CAST(COALESCE(p.n_pieces, 0) AS BIGINT) AS n_pieces,
       |  COALESCE(p.ids_str, '') AS ids_str
       |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Mirrors q156 (`ops.Rag.ragContext`): q59's chunk windows re-keyed
    * to one packed long, q58's BM25 float discipline over the chunk
    * units, rank over the DOUBLE cast exactly as the engine windows,
    * and the budget cut on a BIGINT running total. */
  val q156RagContext: String =
    s"""WITH $tokCte,
       |c AS (SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n
       |      FROM tok WHERE len(l) >= 1),
       |nc AS (SELECT doc_id, l, n,
       |    1 + CASE WHEN n > 64 THEN (n - 64 + 47) // 48 ELSE 0 END AS n_chunks
       |  FROM c),
       |ch AS (SELECT doc_id, l,
       |    unnest(generate_series(0, n_chunks - 1)) AS chunk_id
       |  FROM nc),
       |d AS (SELECT doc_id * 100000 + chunk_id AS doc_id,
       |    CAST(len(l[(chunk_id * 48 + 1):(chunk_id * 48 + 64)]) AS BIGINT) AS dl,
       |    l[(chunk_id * 48 + 1):(chunk_id * 48 + 64)] AS l
       |  FROM ch),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |               CAST(SUM(dl) AS BIGINT) AS n_total FROM d),
       |t AS (SELECT doc_id, dl, unnest(l) AS term FROM d),
       |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM t WHERE term IN ('spark', 'vector', 'merge', 'window')
       |       GROUP BY doc_id, dl, term),
       |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |sc AS (SELECT tf.doc_id, tf.dl,
       |    CAST(round(
       |      round(ln((CAST(tot.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5) /
       |               (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0), 12)
       |      * (CAST(tf.tf AS DOUBLE) * 2.2)
       |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE) /
       |          (CAST(tot.n_total AS DOUBLE) / CAST(tot.n_docs AS DOUBLE)))), 12)
       |      AS DECIMAL(28,12)) AS part
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN tot),
       |agg AS (SELECT doc_id, CAST(MIN(dl) AS BIGINT) AS n_tokens,
       |        CAST(SUM(part) AS DOUBLE) AS score
       |  FROM sc GROUP BY doc_id),
       |topk AS (SELECT doc_id, n_tokens, score FROM agg
       |         ORDER BY score DESC, doc_id LIMIT 40),
       |rk AS (SELECT doc_id, n_tokens, score,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
       |      AS rank FROM topk),
       |cum AS (SELECT doc_id, n_tokens, score, rank,
       |    CAST(SUM(n_tokens) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cum_tokens
       |  FROM rk)
       |SELECT rank, doc_id // 100000 AS src_doc_id,
       |  doc_id % 100000 AS chunk_id, n_tokens, cum_tokens, score
       |FROM cum WHERE cum_tokens <= 512
       |ORDER BY rank""".stripMargin

  /** Mirrors q157 (`ops.Ltr.ltrFeatures`): the q58 BM25 chain with
    * probe-doc terms, rank over the DOUBLE cast, exact set-count
    * Jaccard over the q25 shingle CTEs (inclusion–exclusion union),
    * round-9 length ratio, and the q151 dense cosine restricted to the
    * candidates — near_dup is the COALESCE'd 0.45 bar. */
  val q157LtrFeatures: String =
    s"""WITH $tokCte,
       |terms AS (SELECT DISTINCT unnest(l) AS term FROM tok WHERE doc_id = 0),
       |d AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl, l FROM tok
       |      WHERE doc_id <> 0),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |               CAST(SUM(dl) AS BIGINT) AS n_total FROM d),
       |t AS (SELECT doc_id, dl, unnest(l) AS term FROM d),
       |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM t JOIN terms USING (term)
       |       GROUP BY doc_id, dl, term),
       |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |sc AS (SELECT tf.doc_id, tf.dl,
       |    CAST(round(
       |      round(ln((CAST(tot.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5) /
       |               (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0), 12)
       |      * (CAST(tf.tf AS DOUBLE) * 2.2)
       |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE) /
       |          (CAST(tot.n_total AS DOUBLE) / CAST(tot.n_docs AS DOUBLE)))), 12)
       |      AS DECIMAL(28,12)) AS part
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN tot),
       |agg AS (SELECT doc_id, CAST(MIN(dl) AS BIGINT) AS n_tokens,
       |        CAST(SUM(part) AS DOUBLE) AS bm25
       |  FROM sc GROUP BY doc_id),
       |topk AS (SELECT doc_id, n_tokens, bm25 FROM agg
       |         ORDER BY bm25 DESC, doc_id LIMIT 30),
       |rk AS (SELECT doc_id, n_tokens, bm25,
       |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
       |      AS rank FROM topk),
       |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
       |        FROM tok WHERE len(l) >= 3),
       |sh AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
       |       FROM pos),
       |pgn AS (SELECT CAST(COUNT(*) AS BIGINT) AS pgc FROM sh WHERE doc_id = 0),
       |pn AS (SELECT CAST(len(l) AS BIGINT) AS pnt FROM tok WHERE doc_id = 0),
       |cgn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS cgc
       |        FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS ic
       |          FROM sh a JOIN sh p ON a.g = p.g AND p.doc_id = 0
       |          WHERE a.doc_id <> 0 GROUP BY a.doc_id),
       |lex AS (SELECT rk.doc_id, rk.rank, rk.bm25,
       |    CASE WHEN COALESCE(cgn.cgc, 0) + pgn.pgc - COALESCE(inter.ic, 0) = 0
       |         THEN 0.0
       |         ELSE round(CAST(COALESCE(inter.ic, 0) AS DOUBLE) /
       |              CAST(COALESCE(cgn.cgc, 0) + pgn.pgc -
       |                   COALESCE(inter.ic, 0) AS DOUBLE), 9) END AS jaccard,
       |    round(CAST(rk.n_tokens AS DOUBLE) / CAST(pn.pnt AS DOUBLE), 9)
       |      AS len_ratio
       |  FROM rk LEFT JOIN cgn USING (doc_id) LEFT JOIN inter USING (doc_id),
       |       pgn, pn),
       |e AS (SELECT vec_id, embedding FROM embeddings),
       |q AS (SELECT embedding AS qe FROM e WHERE vec_id = 0),
       |qn AS (SELECT SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)
       |                 AS DECIMAL(28,18))) AS qq
       |       FROM (SELECT qe, unnest(generate_series(1, len(qe))) AS i FROM q)),
       |x AS (SELECT vec_id, embedding, qe,
       |             unnest(generate_series(1, len(embedding))) AS i
       |      FROM e, q
       |      WHERE vec_id <> 0 AND vec_id IN (SELECT doc_id FROM rk)),
       |dots AS (SELECT vec_id,
       |    SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)
       |        AS DECIMAL(28,18))) AS dot,
       |    SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
       |        AS DECIMAL(28,18))) AS nn
       |  FROM x GROUP BY vec_id),
       |cosd AS (SELECT vec_id,
       |    round(CAST(dot AS DOUBLE) /
       |      (sqrt(CAST(nn AS DOUBLE)) * sqrt(CAST(qq AS DOUBLE))), 12) AS cos
       |  FROM dots, qn WHERE CAST(nn AS DOUBLE) > 0 AND CAST(qq AS DOUBLE) > 0)
       |SELECT l.doc_id, l.rank, l.bm25, l.jaccard, l.len_ratio, c.cos,
       |  COALESCE(c.cos >= 0.45, FALSE) AS near_dup
       |FROM lex l LEFT JOIN cosd c ON l.doc_id = c.vec_id
       |ORDER BY l.doc_id""".stripMargin

  /** Mirrors q155 (`ops.Unigram.q155UnigramPerplexity`): total NLL per
    * doc = −Σ word best scores (exact BIGINTs straight from the DP's
    * best list), piece counts from the walk, the keep verdict by
    * integer cross-multiply, avg reported via the identical double
    * division chain. */
  val q155UnigramPerplexity: String =
    s"""$unigramDpCtes,
       |wstat AS (SELECT f.word, -(f.best) AS nll12w,
       |                 CAST(len(wp.pieces) AS BIGINT) AS npieces
       |          FROM fin f JOIN wpieces wp USING (word)),
       |perdoc AS (SELECT dw.doc_id,
       |    CAST(SUM(ws.nll12w) AS BIGINT) AS nll12,
       |    CAST(SUM(ws.npieces) AS BIGINT) AS n_pieces
       |  FROM docword dw JOIN wstat ws USING (word) GROUP BY dw.doc_id)
       |SELECT d.doc_id,
       |  CAST(COALESCE(p.n_pieces, 0) AS BIGINT) AS n_pieces,
       |  CAST(COALESCE(p.nll12, 0) AS BIGINT) AS nll12,
       |  CASE WHEN COALESCE(p.n_pieces, 0) = 0 THEN 0.0
       |       ELSE round(CAST(p.nll12 AS DOUBLE) / 1000000000000.0 /
       |                  CAST(p.n_pieces AS DOUBLE), 9) END AS avg_nll,
       |  COALESCE(p.nll12, 0) <=
       |    ${graft.ops.Unigram.NllPerPieceBar12} * COALESCE(p.n_pieces, 0)
       |    AS keep
       |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Mirrors q160 (`ops.Phrase.q160PhraseSearch`): the top-6 corpus
    * bigrams re-selected from scratch (ties lexicographic), then each
    * phrase answered by the SAME positional adjacency join the index
    * path runs — integer counts end to end, per-phrase best doc by
    * (occ DESC, doc_id). */
  val q160PhraseSearch: String =
    s"""WITH $tokCte,
       |posi AS (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
       |         FROM tok WHERE len(l) >= 1),
       |sel AS (SELECT l[i] AS w1, l[i + 1] AS w2,
       |               CAST(COUNT(*) AS BIGINT) AS cnt
       |        FROM posi WHERE i < len(l)
       |        GROUP BY w1, w2 ORDER BY cnt DESC, w1, w2 LIMIT 6),
       |pos AS (SELECT doc_id, l[i] AS term, i AS pos FROM posi),
       |hits AS (SELECT s.w1, s.w2, p1.doc_id,
       |                CAST(COUNT(*) AS BIGINT) AS occ
       |  FROM sel s
       |  JOIN pos p1 ON p1.term = s.w1
       |  JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
       |             AND p2.term = s.w2
       |  GROUP BY s.w1, s.w2, p1.doc_id),
       |best AS (SELECT w1, w2, doc_id, occ,
       |    row_number() OVER (PARTITION BY w1, w2
       |                       ORDER BY occ DESC, doc_id) AS r
       |  FROM hits)
       |SELECT h.w1 || ' ' || h.w2 AS phrase,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(h.occ) AS BIGINT) AS n_occurrences,
       |  MAX(b.doc_id) AS top_doc_id,
       |  MAX(b.occ) AS top_doc_occ
       |FROM hits h
       |JOIN best b ON b.w1 = h.w1 AND b.w2 = h.w2 AND b.r = 1
       |GROUP BY h.w1, h.w2
       |ORDER BY phrase""".stripMargin

  /** Mirrors q161 (`ops.KneserNey.q161KnBigramScore`): interpolated-KN
    * model tables rebuilt from the 80% split as exact integer counts,
    * held-out docs scored through the IDENTICAL double expression
    * chain (discount 0.75, add-half continuation), ln rounded to 12
    * digits before the decimal occurrence-weighted sum — the q66
    * determinism recipe. */
  val q161KnBigramScore: String =
    s"""WITH $tokCte,
       |posi AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
       |         FROM tok WHERE len(l) >= 2),
       |bp AS (SELECT doc_id, l[i] AS w1, l[i + 1] AS w2,
       |              CAST(COUNT(*) AS BIGINT) AS k
       |       FROM posi GROUP BY doc_id, w1, w2),
       |tb AS (SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS c
       |       FROM bp WHERE doc_id % 5 <> 0 GROUP BY w1, w2),
       |ctx AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1,
       |               CAST(COUNT(*) AS BIGINT) AS n1fw
       |        FROM tb GROUP BY w1),
       |cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1pr
       |         FROM tb GROUP BY w2),
       |tot AS (SELECT
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM tb) AS big_types,
       |    (SELECT CAST(COUNT(*) AS BIGINT)
       |     FROM (SELECT w1 FROM tb UNION SELECT w2 FROM tb)) AS vocab),
       |pr AS (SELECT h.doc_id, h.k,
       |    CASE WHEN cx.c1 IS NOT NULL THEN
       |      (greatest(CAST(COALESCE(t2.c, 0) AS DOUBLE) - 0.75, 0.0)
       |       + 0.75 * CAST(cx.n1fw AS DOUBLE) *
       |         ((CAST(COALESCE(cn.n1pr, 0) AS DOUBLE) + 0.5) /
       |          (CAST(t.big_types AS DOUBLE)
       |           + 0.5 * CAST(t.vocab AS DOUBLE))))
       |      / CAST(cx.c1 AS DOUBLE)
       |    ELSE
       |      (CAST(COALESCE(cn.n1pr, 0) AS DOUBLE) + 0.5) /
       |      (CAST(t.big_types AS DOUBLE) + 0.5 * CAST(t.vocab AS DOUBLE))
       |    END AS p
       |  FROM bp h
       |  LEFT JOIN tb t2 ON t2.w1 = h.w1 AND t2.w2 = h.w2
       |  LEFT JOIN ctx cx ON cx.w1 = h.w1
       |  LEFT JOIN cont cn ON cn.w2 = h.w2
       |  CROSS JOIN tot t
       |  WHERE h.doc_id % 5 = 0),
       |per AS (SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
       |    SUM(CAST(round(ln(p), 12) AS DECIMAL(28,12)) *
       |        CAST(k AS DECIMAL(9,0))) AS slp
       |  FROM pr GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(COALESCE(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |  COALESCE(round(CAST(per.slp AS DOUBLE) /
       |                 CAST(per.n_bigrams AS DOUBLE), 12), 0.0)
       |    AS avg_logprob,
       |  COALESCE(round(-(round(CAST(per.slp AS DOUBLE) /
       |                         CAST(per.n_bigrams AS DOUBLE), 12)) /
       |                 0.6931471805599453, 12), 0.0) AS bits_per_bigram
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
       |LEFT JOIN per ON d.doc_id = per.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Mirrors q162 (`ops.VectorStore.q162StreamedIvfStore`): the integer
    * nearest-centroid assignment replayed from the PERSISTED q162
    * centroid table (q81's replay, different quantizer path) — equality
    * against the streamed store's read-back proves foreachBatch ingest
    * ≡ direct assignment. */
  val q162StreamedIvfStore: String =
    s"""WITH ${kmeansAssignCtes(graft.ops.VectorStore.StreamCentroidsPath)}
       |SELECT e.vec_id,
       |  CAST(COALESCE(r.cluster, 0) AS INT) AS cluster,
       |  COALESCE(r.d, 0) AS sq_dist
       |FROM e LEFT JOIN r ON e.vec_id = r.vec_id AND r.rn = 1
       |ORDER BY e.vec_id""".stripMargin

  /** Mirrors q163 (`ops.Coreset.q163KcenterCoreset`): the greedy
    * k-center selection unrolled move-for-move — fixed-point snap,
    * max-norm seed (ties to smaller vec_id), m−1 rounds of
    * argmax-running-min (same ties), final assignment by (distance,
    * center id). Every distance is an exact BIGINT; empty/NULL vectors
    * coalesce to distance 0 everywhere (the q81 convention). */
  val q163KcenterCoreset: String = {
    val m = graft.ops.Coreset.M
    val base =
      """e AS (SELECT vec_id, embedding FROM embeddings),
        |x AS (SELECT vec_id, embedding,
        |    unnest(generate_series(1, len(embedding))) AS i FROM e),
        |q AS MATERIALIZED (SELECT vec_id, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qi
        |  FROM x),
        |n AS MATERIALIZED (SELECT vec_id, CAST(SUM(qi * qi) AS BIGINT) AS nrm
        |      FROM q GROUP BY vec_id),
        |c1 AS MATERIALIZED (SELECT vec_id AS cid
        |  FROM (SELECT e.vec_id, COALESCE(n.nrm, 0) AS nrm
        |        FROM e LEFT JOIN n USING (vec_id))
        |  ORDER BY nrm DESC, vec_id LIMIT 1)""".stripMargin
    def cdist(k: Int) =
      s"""cd$k AS MATERIALIZED (SELECT q.vec_id,
         |    CAST(SUM((q.qi - cq.qi) * (q.qi - cq.qi)) AS BIGINT) AS d
         |  FROM q JOIN (SELECT q2.i, q2.qi FROM q q2, c$k
         |               WHERE q2.vec_id = c$k.cid) cq ON q.i = cq.i
         |  GROUP BY q.vec_id)""".stripMargin
    val d1 =
      """d1 AS MATERIALIZED (SELECT e.vec_id, COALESCE(cd1.d, 0) AS mind
        |       FROM e LEFT JOIN cd1 USING (vec_id))""".stripMargin
    val steps = (2 to m).map { k =>
      val chosen = (1 until k).map(j => s"SELECT cid FROM c$j")
        .mkString(" UNION ALL ")
      val pick =
        s"""c$k AS MATERIALIZED (SELECT d${k - 1}.vec_id AS cid FROM d${k - 1}
           |  WHERE d${k - 1}.vec_id NOT IN ($chosen)
           |  ORDER BY d${k - 1}.mind DESC, d${k - 1}.vec_id LIMIT 1)""".stripMargin
      val dNext =
        if (k == m) ""
        else s""",
           |d$k AS MATERIALIZED (SELECT d${k - 1}.vec_id,
           |    least(d${k - 1}.mind, COALESCE(cd$k.d, 0)) AS mind
           |  FROM d${k - 1} LEFT JOIN cd$k USING (vec_id))""".stripMargin
      s"$pick,\n${cdist(k)}$dNext"
    }.mkString(",\n")
    val ad = (1 to m).map { k =>
      s"""SELECT e.vec_id, $k AS rank, c$k.cid, COALESCE(cd$k.d, 0) AS d
         |  FROM e LEFT JOIN cd$k USING (vec_id) CROSS JOIN c$k""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH $base,
       |${cdist(1)},
       |$d1,
       |$steps,
       |ad AS (
       |  $ad),
       |rk AS (SELECT vec_id, cid, rank, d,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |  FROM ad)
       |SELECT vec_id, cid AS center_id, CAST(rank AS BIGINT) AS center_rank,
       |  d AS sq_dist
       |FROM rk WHERE rn = 1
       |ORDER BY vec_id""".stripMargin
  }

  /** Mirrors q164 (`ops.VectorStore.q164IvfLifecycle`): the lifecycle
    * replayed from persisted centroids + raw embeddings — assignment
    * (q81 CTEs), the delete rule (vec_id % 7 = 3), the probe-cell
    * choice (vec 0's integer distance to each centroid, ties to the
    * smaller cell), and the in-cell top-10 by (distance, vec_id).
    * Matching the engine's post-compaction probe proves ingest, delete,
    * compaction and pruning preserved content. */
  val q164IvfLifecycle: String =
    s"""WITH ${kmeansAssignCtes(graft.ops.VectorStore.LifecycleCentroidsPath)},
       |asg AS (SELECT e.vec_id, CAST(COALESCE(r.cluster, 0) AS INT) AS cluster
       |        FROM e LEFT JOIN r ON e.vec_id = r.vec_id AND r.rn = 1),
       |qv AS (SELECT i, qi FROM q WHERE vec_id = 0),
       |cqi AS (SELECT c.cluster,
       |    unnest(generate_series(1, len(c.qc))) AS i, c.qc AS qc FROM c),
       |cdist AS (SELECT cqi.cluster,
       |    CAST(SUM((qv.qi - cqi.qc[CAST(cqi.i AS INT)]) *
       |             (qv.qi - cqi.qc[CAST(cqi.i AS INT)])) AS BIGINT) AS d
       |  FROM cqi JOIN qv USING (i) GROUP BY cqi.cluster),
       |probecells AS (SELECT cluster FROM cdist ORDER BY d, cluster LIMIT 2),
       |pdist AS (SELECT q.vec_id,
       |    CAST(SUM((q.qi - qv.qi) * (q.qi - qv.qi)) AS BIGINT) AS d
       |  FROM q JOIN qv USING (i) GROUP BY q.vec_id),
       |cand AS (SELECT a.vec_id, a.cluster, COALESCE(p.d, 0) AS d
       |  FROM asg a LEFT JOIN pdist p USING (vec_id)
       |  WHERE a.cluster IN (SELECT cluster FROM probecells)
       |    AND a.vec_id % 7 <> 3)
       |SELECT CAST(row_number() OVER (ORDER BY d, vec_id) AS BIGINT) AS rank,
       |  vec_id, cluster, d AS sq_dist
       |FROM cand ORDER BY d, vec_id LIMIT 10""".stripMargin

  /** Mirrors q170 (`ops.QualityModel.q170IsotonicCalibration`): the
    * PAV fit replayed through the minimax closed form
    * iso(i) = max_{j≤i} min_{k≥i} rate(j..k). Interval rationals are
    * ordered by their 10^12-scaled integer floor (exact while distinct
    * bin rationals differ by ≥ 1/n² — any gate-scale corpus); the
    * reported value is the chosen interval's own k/n, one IEEE
    * division of exact longs rounded to 12, which equals the engine's
    * pooled division wherever the rationals are equal. */
  val q170IsotonicCalibration: String =
    s"""$q68ScoredCtes,
       |bb AS (SELECT CAST(least(floor(score * 10), 9) AS BIGINT) AS bin,
       |    CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS k
       |  FROM sc GROUP BY 1),
       |bins AS (SELECT bin, n, k,
       |    CAST(row_number() OVER (ORDER BY bin) AS BIGINT) AS i FROM bb),
       |iv AS (SELECT j.i AS ji, k2.i AS ki,
       |    CAST(SUM(m.n) AS BIGINT) AS nn, CAST(SUM(m.k) AS BIGINT) AS kk
       |  FROM bins j JOIN bins k2 ON k2.i >= j.i
       |  JOIN bins m ON m.i BETWEEN j.i AND k2.i
       |  GROUP BY j.i, k2.i),
       |ivs AS (SELECT ji, ki, nn, kk,
       |    kk * 1000000000000 // nn AS s12 FROM iv),
       |step1 AS (SELECT b.i AS i, v.ji, v.kk, v.nn, v.s12,
       |    row_number() OVER (PARTITION BY b.i, v.ji
       |                       ORDER BY v.s12, v.ki) AS rn
       |  FROM bins b JOIN ivs v ON v.ji <= b.i AND v.ki >= b.i),
       |step2 AS (SELECT i, kk, nn,
       |    row_number() OVER (PARTITION BY i
       |                       ORDER BY s12 DESC, ji) AS rn2
       |  FROM step1 WHERE rn = 1),
       |iso AS (SELECT i,
       |    round(CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE), 12) AS iso_rate
       |  FROM step2 WHERE rn2 = 1)
       |SELECT b.bin, b.n AS n_docs,
       |  round(CAST(b.k AS DOUBLE) / CAST(b.n AS DOUBLE), 12) AS raw_rate,
       |  iso.iso_rate
       |FROM bins b JOIN iso ON b.i = iso.i
       |ORDER BY b.bin""".stripMargin

  /** Mirrors q171 (`ops.Dedup.q171DedupAttribution`): the three tiers
    * replayed from scratch — exact full-text md5 groups, the q24
    * prefix-8 key, and the q26 verified banded chain (cap 50) — then
    * the same first-tier attribution and 3-row cumulative report. */
  val q171DedupAttribution: String =
    s"""WITH $shingleCtes,
       |${lshCtesAt(50)},
       |v3 AS (SELECT DISTINCT d2 AS doc_id
       |  FROM common
       |  JOIN szc s1 ON d1 = s1.doc_id
       |  JOIN szc s2 ON d2 = s2.doc_id
       |  WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.5),
       |v1 AS (SELECT doc_id FROM (SELECT doc_id,
       |    min(doc_id) OVER (PARTITION BY md5(text)) AS mn FROM documents)
       |  WHERE doc_id <> mn),
       |v2 AS (SELECT doc_id FROM (SELECT doc_id,
       |    min(doc_id) OVER (PARTITION BY md5(array_to_string(
       |      regexp_extract_all(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
       |        '\\S+')[1:8], ' '))) AS mn FROM documents)
       |  WHERE doc_id <> mn),
       |tagged AS (SELECT doc_id, 1 AS tier FROM v1
       |  UNION ALL SELECT doc_id, 2 FROM v2
       |  UNION ALL SELECT doc_id, 3 FROM v3),
       |firstt AS (SELECT doc_id, MIN(tier) AS tier FROM tagged GROUP BY doc_id),
       |caught AS (SELECT tier, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_caught
       |           FROM tagged GROUP BY tier),
       |marg AS (SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_marginal
       |         FROM firstt GROUP BY tier),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents),
       |tiers AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'exact_text'),
       |    (CAST(2 AS BIGINT), 'prefix8'),
       |    (CAST(3 AS BIGINT), 'neardup')) AS t(tier, tier_name))
       |SELECT t.tier, t.tier_name,
       |  COALESCE(c.n_caught, 0) AS n_caught,
       |  COALESCE(m.n_marginal, 0) AS n_marginal,
       |  tot.n_total - CAST(SUM(COALESCE(m.n_marginal, 0))
       |    OVER (ORDER BY t.tier
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS n_remaining
       |FROM tiers t
       |LEFT JOIN caught c ON t.tier = c.tier
       |LEFT JOIN marg m ON t.tier = m.tier
       |CROSS JOIN tot
       |ORDER BY t.tier""".stripMargin

  /** Mirrors q174 (`ops.Unigram.q174TokenizerCompare`): BOTH persisted
    * tokenizers replayed — the q65 recursive merge chain and the q154
    * integer-DP chain — nested as derived-table WITHs (their CTE names
    * collide, so each lives in its own subquery scope), then the same
    * per-source totals and rounded-9 fertility divides. */
  val q174TokenizerCompare: String =
    s"""SELECT d.source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(len(regexp_extract_all(d.text, '\\S+'))) AS BIGINT)
       |    AS n_ws_tokens,
       |  CAST(SUM(COALESCE(bp.n, 0)) AS BIGINT) AS n_bpe_tokens,
       |  CAST(SUM(COALESCE(un.np, 0)) AS BIGINT) AS n_uni_pieces,
       |  round(CAST(SUM(COALESCE(bp.n, 0)) AS DOUBLE) /
       |        CAST(SUM(len(regexp_extract_all(d.text, '\\S+'))) AS DOUBLE), 9)
       |    AS bpe_fertility,
       |  round(CAST(SUM(COALESCE(un.np, 0)) AS DOUBLE) /
       |        CAST(SUM(len(regexp_extract_all(d.text, '\\S+'))) AS DOUBLE), 9)
       |    AS uni_fertility,
       |  round(CAST(SUM(COALESCE(bp.n, 0)) AS DOUBLE) /
       |        CAST(SUM(COALESCE(un.np, 0)) AS DOUBLE), 9) AS bpe_vs_uni
       |FROM documents d
       |LEFT JOIN (
       |  $bpeReplayCtes
       |  SELECT doc_id, n FROM b) bp ON d.doc_id = bp.doc_id
       |LEFT JOIN (
       |  $unigramDpCtes
       |  SELECT dw.doc_id, CAST(SUM(len(wp.pieces)) AS BIGINT) AS np
       |  FROM docword dw JOIN wpieces wp USING (word)
       |  GROUP BY dw.doc_id) un ON d.doc_id = un.doc_id
       |GROUP BY d.source
       |ORDER BY d.source""".stripMargin

  /** Mirrors q165 (`ops.SpanCorruption.q165SpanCorruption`): the same
    * 52-bit md5 span draws, one per half-segment, replayed with list
    * slicing — inputs, sentinels and targets reassemble identically or
    * the string hash breaks. */
  val q165SpanCorruption: String =
    s"""WITH $tokCte,
       |base AS (SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n,
       |                CAST(len(l) // 2 AS BIGINT) AS seg FROM tok),
       |st AS (SELECT doc_id, l, n, seg, seg >= 3 AS eligible,
       |    1 + (CAST(('0x' || substr(md5('span:' ||
       |           CAST(doc_id AS VARCHAR) || ':0'), 1, 13)) AS BIGINT)
       |         % greatest(seg - 2, 1)) AS start0,
       |    seg + 1 + (CAST(('0x' || substr(md5('span:' ||
       |           CAST(doc_id AS VARCHAR) || ':1'), 1, 13)) AS BIGINT)
       |         % greatest(seg - 2, 1)) AS start1
       |  FROM base)
       |SELECT doc_id, n AS n_tokens,
       |  CASE WHEN eligible THEN COALESCE(array_to_string(
       |    l[1:CAST(start0 - 1 AS INT)] || ['<extra_id_0>'] ||
       |    l[CAST(start0 + 3 AS INT):CAST(start1 - 1 AS INT)] ||
       |    ['<extra_id_1>'] ||
       |    l[CAST(start1 + 3 AS INT):CAST(n AS INT)], ' '), '')
       |  ELSE COALESCE(array_to_string(l, ' '), '') END AS input_text,
       |  CASE WHEN eligible THEN
       |    '<extra_id_0> ' ||
       |    array_to_string(l[CAST(start0 AS INT):CAST(start0 + 2 AS INT)], ' ') ||
       |    ' <extra_id_1> ' ||
       |    array_to_string(l[CAST(start1 AS INT):CAST(start1 + 2 AS INT)], ' ') ||
       |    ' <extra_id_2>'
       |  ELSE '' END AS target_text
       |FROM st ORDER BY doc_id""".stripMargin

  /** Mirrors q173 (`ops.SpanCorruption.q173CropPairs`): the same two
    * md5 crop draws over the legal start range, list-sliced views and
    * the positional-overlap count replayed exactly. */
  val q173CropPairs: String =
    s"""WITH $tokCte,
       |base AS (SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n,
       |    greatest(CAST(len(l) // 2 AS BIGINT), 1) AS clen FROM tok),
       |st AS (SELECT doc_id, l, n, clen, n >= 4 AS eligible,
       |    1 + (CAST(('0x' || substr(md5('crop:' ||
       |      CAST(doc_id AS VARCHAR) || ':0'), 1, 13)) AS BIGINT)
       |      % greatest(n - clen + 1, 1)) AS sa,
       |    1 + (CAST(('0x' || substr(md5('crop:' ||
       |      CAST(doc_id AS VARCHAR) || ':1'), 1, 13)) AS BIGINT)
       |      % greatest(n - clen + 1, 1)) AS sb
       |  FROM base)
       |SELECT doc_id, n AS n_tokens,
       |  CASE WHEN eligible THEN COALESCE(array_to_string(
       |    l[CAST(sa AS INT):CAST(sa + clen - 1 AS INT)], ' '), '')
       |  ELSE COALESCE(array_to_string(l, ' '), '') END AS crop_a,
       |  CASE WHEN eligible THEN COALESCE(array_to_string(
       |    l[CAST(sb AS INT):CAST(sb + clen - 1 AS INT)], ' '), '')
       |  ELSE COALESCE(array_to_string(l, ' '), '') END AS crop_b,
       |  CASE WHEN eligible THEN
       |    greatest(0, least(sa, sb) + clen - greatest(sa, sb))
       |  ELSE n END AS overlap
       |FROM st ORDER BY doc_id""".stripMargin

  /** Mirrors q166 (`ops.Novelty.q166DocNovelty`): per-doc distinct
    * 3-gram df replayed from raw text — matching the engine's
    * store-served df proves the standing sidecar again (the q158
    * argument, now for the df=1 tail instead of the frequent head). */
  val q166DocNovelty: String =
    s"""WITH $shingleCtes,
       |df AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY g),
       |per AS (SELECT sh.doc_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_grams,
       |    CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_unique
       |  FROM sh JOIN df USING (g) GROUP BY sh.doc_id)
       |SELECT d.doc_id,
       |  COALESCE(per.n_grams, 0) AS n_grams,
       |  COALESCE(per.n_unique, 0) AS n_unique,
       |  COALESCE(round(CAST(per.n_unique AS DOUBLE) /
       |                 CAST(per.n_grams AS DOUBLE), 12), 0.0) AS novelty
       |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Mirrors q167 (`ops.QuantileNorm.q167QuantileNormalize`): the same
    * aggregated CDF tables, midpoint within-source quantile and
    * type-1 pooled inverse decided by the identical integer
    * cross-multiply — no float in any comparison. */
  val q167QuantileNormalize: String =
    """WITH sc AS (SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS v
      |  FROM documents),
      |sv AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS cnt
      |       FROM sc GROUP BY source, v),
      |srccum AS (SELECT source, v, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
      |      AS BIGINT) AS below
      |  FROM sv),
      |srctot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_s
      |           FROM sv GROUP BY source),
      |pooled AS (SELECT v, CAST(SUM(cnt) AS BIGINT) AS pcnt
      |           FROM sv GROUP BY v),
      |pooledcum AS (SELECT v AS w,
      |    CAST(SUM(pcnt) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_g
      |  FROM pooled),
      |ntot AS (SELECT CAST(SUM(pcnt) AS BIGINT) AS n_total FROM pooled),
      |mapping AS (SELECT s2.source, s2.v,
      |    round(CAST(2 * s2.below + s2.cnt AS DOUBLE) /
      |          CAST(2 * st.n_s AS DOUBLE), 12) AS q,
      |    MIN(pc.w) AS norm_v
      |  FROM srccum s2
      |  JOIN srctot st USING (source)
      |  CROSS JOIN ntot nt
      |  JOIN pooledcum pc
      |    ON 2 * st.n_s * pc.cum_g >= nt.n_total * (2 * s2.below + s2.cnt)
      |  GROUP BY s2.source, s2.v, s2.below, s2.cnt, st.n_s, nt.n_total)
      |SELECT d.doc_id, d.source, d.v, m.q, m.norm_v
      |FROM sc d JOIN mapping m USING (source, v)
      |ORDER BY d.doc_id""".stripMargin

  /** Mirrors q168 (`ops.SpanCorruption.q168FimTransform`): the same
    * md5 cut draws mod (n+1), ordered, replayed with list slicing into
    * the PSM string. */
  val q168FimTransform: String =
    s"""WITH $tokCte,
       |base AS (SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n FROM tok),
       |cuts AS (SELECT doc_id, l, n,
       |    CAST(('0x' || substr(md5('fim:' ||
       |      CAST(doc_id AS VARCHAR) || ':0'), 1, 13)) AS BIGINT)
       |      % (n + 1) AS c1,
       |    CAST(('0x' || substr(md5('fim:' ||
       |      CAST(doc_id AS VARCHAR) || ':1'), 1, 13)) AS BIGINT)
       |      % (n + 1) AS c2
       |  FROM base),
       |oc AS (SELECT doc_id, l, n, least(c1, c2) AS lo,
       |              greatest(c1, c2) AS hi FROM cuts)
       |SELECT doc_id, n AS n_tokens, lo AS cut_lo, hi AS cut_hi,
       |  CASE WHEN n >= 4 THEN
       |    '<fim_prefix> ' ||
       |    COALESCE(array_to_string(l[1:CAST(lo AS INT)], ' '), '') ||
       |    ' <fim_suffix> ' ||
       |    COALESCE(array_to_string(l[CAST(hi + 1 AS INT):CAST(n AS INT)], ' '), '') ||
       |    ' <fim_middle> ' ||
       |    COALESCE(array_to_string(l[CAST(lo + 1 AS INT):CAST(hi AS INT)], ' '), '')
       |  ELSE COALESCE(array_to_string(l, ' '), '') END AS psm
       |FROM oc ORDER BY doc_id""".stripMargin

  /** Mirrors q175 (`ops.Distinctive.q175DistinctiveTerms`): Monroe
    * log-odds with an informative Dirichlet prior (a0 = 100 spread by
    * corpus usage), both lns rounded 12 before subtraction, z rounded
    * 12, top-5 per source by (z DESC, term). */
  val q175DistinctiveTerms: String =
    """WITH tok AS (SELECT source,
      |  regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS l
      |FROM documents),
      |t AS (SELECT source, unnest(l) AS term FROM tok),
      |yst AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS y_s
      |  FROM t GROUP BY 1, 2),
      |ns AS (SELECT source, CAST(SUM(y_s) AS BIGINT) AS n_s FROM yst GROUP BY 1),
      |yt AS (SELECT term, CAST(SUM(y_s) AS BIGINT) AS y_all FROM yst GROUP BY 1),
      |tot AS (SELECT CAST(SUM(y_all) AS BIGINT) AS n_all FROM yt),
      |sc AS (SELECT yst.source, yst.term, yst.y_s, yt.y_all,
      |    100.0 * CAST(yt.y_all AS DOUBLE) / CAST(tot.n_all AS DOUBLE) AS a_t,
      |    CAST(yt.y_all - yst.y_s AS DOUBLE) AS y_r,
      |    CAST(tot.n_all - ns.n_s AS DOUBLE) AS n_r,
      |    CAST(ns.n_s AS DOUBLE) AS n_s_d
      |  FROM yst JOIN yt USING (term) JOIN ns USING (source) CROSS JOIN tot),
      |z AS (SELECT source, term, y_s, y_all - y_s AS y_rest,
      |    round((round(ln((CAST(y_s AS DOUBLE) + a_t) /
      |             (n_s_d + 100.0 - CAST(y_s AS DOUBLE) - a_t)), 12)
      |         - round(ln((y_r + a_t) / (n_r + 100.0 - y_r - a_t)), 12))
      |      / sqrt(1.0 / (CAST(y_s AS DOUBLE) + a_t) + 1.0 / (y_r + a_t)),
      |      12) AS z_score
      |  FROM sc),
      |ranked AS (SELECT source, term, z_score, y_s AS y_source, y_rest,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY z_score DESC, term) AS BIGINT) AS rank
      |  FROM z)
      |SELECT source, rank, term, z_score, y_source, y_rest
      |FROM ranked WHERE rank <= 5
      |ORDER BY source, rank""".stripMargin

  /** One q176 query's metric row — the bm25 replay (the q172 CTE
    * family) + graded-gain histogram IDCG, per-part rounding into a
    * DECIMAL sum (the q58 discipline). */
  private def irMetricsSelect(qid: Int, terms: Seq[String], k: Int): String = {
    val m = terms.length
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""(WITH $tokCte,
       |d AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl, l FROM tok),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |               CAST(SUM(dl) AS BIGINT) AS n_total FROM d),
       |t AS (SELECT doc_id, dl, unnest(l) AS term FROM d),
       |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM t WHERE term IN ($inList) GROUP BY 1, 2, 3),
       |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |scp AS (SELECT tf.doc_id,
       |    CAST(round(
       |      round(ln((CAST(tot.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5) /
       |               (CAST(dfq.df AS DOUBLE) + 0.5) + 1.0), 12)
       |      * (CAST(tf.tf AS DOUBLE) * 2.2)
       |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE) /
       |          (CAST(tot.n_total AS DOUBLE) / CAST(tot.n_docs AS DOUBLE)))), 12)
       |      AS DECIMAL(28,12)) AS part
       |  FROM tf JOIN dfq USING (term) CROSS JOIN tot),
       |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit, SUM(part) AS sc
       |  FROM scp GROUP BY 1),
       |topk AS (SELECT doc_id, n_hit,
       |    CAST(ROW_NUMBER() OVER (ORDER BY CAST(sc AS DOUBLE) DESC, doc_id)
       |      AS BIGINT) AS rank
       |  FROM agg ORDER BY CAST(sc AS DOUBLE) DESC, doc_id LIMIT $k),
       |ta AS (SELECT
       |    coalesce(round(1.0 / MIN(CASE WHEN n_hit = $m THEN rank END), 12),
       |      0.0) AS mrr,
       |    round(CAST(COUNT(CASE WHEN n_hit = $m THEN 1 END) AS DOUBLE) / $k,
       |      12) AS p_at_k,
       |    SUM(CAST(round((pow(2.0, CAST(n_hit AS DOUBLE)) - 1.0) /
       |        log2(CAST(rank AS DOUBLE) + 1.0), 12) AS DECIMAL(28,12))) AS dcg
       |  FROM topk),
       |gains AS (SELECT doc_id, CAST(COUNT(DISTINCT term) AS BIGINT) AS g
       |  FROM t WHERE term IN ($inList) GROUP BY doc_id),
       |hist AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt FROM gains GROUP BY g),
       |cum AS (SELECT g, cnt, SUM(cnt) OVER (ORDER BY g DESC) AS cum FROM hist),
       |ranks AS (SELECT g, unnest(generate_series(CAST(cum - cnt + 1 AS BIGINT),
       |    CAST(least(cum, $k) AS BIGINT))) AS r
       |  FROM cum WHERE cum - cnt + 1 <= least(cum, $k)),
       |ideal AS (SELECT SUM(CAST(round((pow(2.0, CAST(g AS DOUBLE)) - 1.0) /
       |    log2(CAST(r AS DOUBLE) + 1.0), 12) AS DECIMAL(28,12))) AS idcg
       |  FROM ranks),
       |nr AS (SELECT CAST(coalesce(SUM(CASE WHEN g = $m THEN cnt END), 0)
       |    AS BIGINT) AS n_rel FROM hist)
       |SELECT CAST($qid AS BIGINT) AS query_id, nr.n_rel, ta.mrr,
       |  ta.p_at_k AS p_at_$k,
       |  CASE WHEN ideal.idcg IS NULL OR ideal.idcg = 0 THEN 0.0
       |       ELSE round(CAST(coalesce(ta.dcg, 0) AS DOUBLE) /
       |                   CAST(ideal.idcg AS DOUBLE), 12)
       |  END AS ndcg_at_$k
       |FROM ta CROSS JOIN ideal CROSS JOIN nr)""".stripMargin
  }

  /** Mirrors q176 (`ops.IrMetrics.q176IrMetrics`): the fixed 3-query
    * workload's MRR / P@10 / graded nDCG@10, each query an independent
    * bm25 + histogram replay. */
  val q176IrMetrics: String = Seq(
      irMetricsSelect(1, Seq("dup", "key"), 10),
      irMetricsSelect(2, Seq("spark", "vector", "merge", "window"), 10),
      irMetricsSelect(3, Seq("dup", "scan", "sort"), 10))
    .mkString("", "\nUNION ALL\n", "\nORDER BY query_id")

  /** Shared q177/q181 CTE chain: the all-pairs exact decimal-cosine
    * directed top-k ranking (the q28/q36 recipe), ending in `top`. */
  private def knnTopCtes(k: Int): String =
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
       |x AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM e),
       |norms AS MATERIALIZED (SELECT vec_id,
       |    SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
       |      AS DECIMAL(28,18))) AS n2
       |  FROM x GROUP BY vec_id),
       |pairs AS (SELECT a.vec_id AS src, b.vec_id AS dst,
       |    a.embedding AS ea, b.embedding AS eb
       |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
       |pe AS (SELECT src, dst, ea, eb,
       |    unnest(generate_series(1, len(ea))) AS i FROM pairs),
       |dots AS (SELECT src, dst,
       |    SUM(CAST(CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)
       |      AS DECIMAL(28,18))) AS dot
       |  FROM pe GROUP BY 1, 2),
       |scored AS (SELECT d.src, d.dst,
       |    round(CAST(d.dot AS DOUBLE) /
       |      (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 12) AS cos
       |  FROM dots d
       |  JOIN norms na ON d.src = na.vec_id
       |  JOIN norms nb ON d.dst = nb.vec_id),
       |ranked AS (SELECT src, dst, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY src
       |      ORDER BY cos DESC, dst) AS BIGINT) AS rank
       |  FROM scored WHERE NOT isnan(cos)),
       |top AS MATERIALIZED (SELECT * FROM ranked WHERE rank <= $k)""".stripMargin

  /** Mirrors q177 (`ops.KnnGraph.q177MutualKnn`): exact decimal-cosine
    * top-5 per vector (the q28/q36 recipe), mutual pairs with both
    * directed ranks. */
  val q177MutualKnn: String =
    s"""WITH ${knnTopCtes(5)}
       |SELECT f.src AS v1, f.dst AS v2, f.cos AS cos,
       |  f.rank AS rank_fwd, r.rank AS rank_rev
       |FROM top f JOIN top r ON f.src = r.dst AND f.dst = r.src AND f.src < f.dst
       |ORDER BY v1, v2""".stripMargin

  /** Mirrors q181 (`ops.KnnGraph.q181KnnHubness`): in-degree of the
    * directed exact top-5 graph, hub flag at ≥ 2k. */
  val q181KnnHubness: String =
    s"""WITH ${knnTopCtes(5)},
       |hub AS (SELECT dst AS vec_id, CAST(COUNT(*) AS BIGINT) AS in_degree
       |  FROM top GROUP BY dst)
       |SELECT e.vec_id,
       |  COALESCE(h.in_degree, 0) AS in_degree,
       |  COALESCE(h.in_degree, 0) >= 10 AS is_hub
       |FROM e LEFT JOIN hub h USING (vec_id)
       |ORDER BY e.vec_id""".stripMargin

  /** Mirrors q184 (`ops.KnnGraph.q184MutualKnnClusters`): mutual top-5
    * edges at cos ≥ 0.4, connected components via the q40 recursive
    * reach, canonical = min id. */
  val q184MutualKnnClusters: String =
    s"""WITH RECURSIVE ${knnTopCtes(5)},
       |mu AS (SELECT f.src AS d1, f.dst AS d2
       |  FROM top f JOIN top r ON f.src = r.dst AND f.dst = r.src
       |    AND f.src < f.dst
       |  WHERE f.cos >= 0.4),
       |ed AS (SELECT d1 AS a, d2 AS b FROM mu
       |  UNION ALL SELECT d2 AS a, d1 AS b FROM mu),
       |reach(v, r) AS (
       |  SELECT vec_id AS v, vec_id AS r FROM e
       |  UNION
       |  SELECT reach.v, ed.b AS r FROM reach JOIN ed ON reach.r = ed.a
       |),
       |comp AS (SELECT v AS vec_id, MIN(r) AS component FROM reach GROUP BY v),
       |sz AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |  FROM comp GROUP BY component)
       |SELECT comp.vec_id, comp.component, sz.cluster_size,
       |  comp.vec_id = comp.component AS is_canonical
       |FROM comp JOIN sz USING (component)
       |ORDER BY comp.vec_id""".stripMargin

  /** Mirrors q185 (`ops.SnapshotDiff.q185ReleaseCard`): the q63 derived
    * next version, fingerprint full-outer diff, per-(source, status)
    * doc and token sums. */
  val q185ReleaseCard: String =
    """WITH a AS (SELECT doc_id, source, text FROM documents),
      |mx AS (SELECT MAX(doc_id) AS mx FROM a),
      |bb AS (SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END AS text
      |  FROM a WHERE doc_id % 11 <> 0
      |  UNION ALL
      |  SELECT a.doc_id + mx.mx + 1 AS doc_id, a.text
      |  FROM a CROSS JOIN mx WHERE a.doc_id % 13 = 0),
      |src AS (SELECT doc_id, source FROM a
      |  UNION ALL
      |  SELECT a.doc_id + mx.mx + 1 AS doc_id, a.source
      |  FROM a CROSS JOIN mx WHERE a.doc_id % 13 = 0),
      |fa AS (SELECT doc_id, md5(text) AS m,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok FROM a),
      |fb AS (SELECT doc_id, md5(text) AS m,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok FROM bb),
      |d AS (SELECT COALESCE(fa.doc_id, fb.doc_id) AS doc_id,
      |    CASE WHEN fa.m IS NULL THEN 'added'
      |         WHEN fb.m IS NULL THEN 'removed'
      |         WHEN fa.m = fb.m THEN 'unchanged'
      |         ELSE 'changed' END AS status,
      |    COALESCE(fa.tok, 0) AS tok_a, COALESCE(fb.tok, 0) AS tok_b
      |  FROM fa FULL OUTER JOIN fb ON fa.doc_id = fb.doc_id)
      |SELECT s.source, d.status, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(d.tok_a) AS BIGINT) AS tokens_old,
      |  CAST(SUM(d.tok_b) AS BIGINT) AS tokens_new,
      |  CAST(SUM(d.tok_b) - SUM(d.tok_a) AS BIGINT) AS token_delta
      |FROM d JOIN src s USING (doc_id)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Mirrors q186 (`ops.Drift.q186KsDrift`): exact two-sample KS per
    * source over token counts — both ECDFs on the shared distinct-value
    * grid, F's rounded 12 before the difference, argmax at min v. */
  val q186KsDrift: String =
    """WITH vv AS (SELECT source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS v
      |  FROM documents),
      |c AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM vv GROUP BY 1, 2),
      |ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM c GROUP BY 1),
      |gv AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cg FROM c GROUP BY 1),
      |gcum AS (SELECT v, CAST(SUM(cg) OVER (ORDER BY v) AS BIGINT) AS cum_g
      |  FROM gv),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_all FROM c),
      |grid AS (SELECT ns.source, ns.n_s, g.v
      |  FROM ns CROSS JOIN (SELECT v FROM gcum) g),
      |cums AS (SELECT grid.source, grid.n_s, grid.v,
      |    CAST(COALESCE(SUM(c.c) OVER (PARTITION BY grid.source
      |      ORDER BY grid.v), 0) AS BIGINT) AS cum_s
      |  FROM grid LEFT JOIN c ON grid.source = c.source AND grid.v = c.v),
      |gaps AS (SELECT cums.source, cums.n_s, cums.v, tot.n_all,
      |    abs(round(CAST(cum_s AS DOUBLE) / CAST(n_s AS DOUBLE), 12)
      |      - round(CAST(gcum.cum_g - cum_s AS DOUBLE) /
      |              CAST(tot.n_all - n_s AS DOUBLE), 12)) AS gap
      |  FROM cums JOIN gcum USING (v) CROSS JOIN tot),
      |d AS (SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_source,
      |    CAST(MAX(n_all - n_s) AS BIGINT) AS n_rest, MAX(gap) AS ks_d
      |  FROM gaps GROUP BY source),
      |at AS (SELECT g.source, CAST(MIN(g.v) AS BIGINT) AS at_value
      |  FROM gaps g JOIN d ON g.source = d.source AND g.gap = d.ks_d
      |  GROUP BY g.source)
      |SELECT d.source, d.n_source, d.n_rest, d.ks_d, at.at_value
      |FROM d JOIN at ON d.source = at.source
      |ORDER BY d.source""".stripMargin

  /** Mirrors q187 (`ops.Drift.q187RankSumEffect`): 2U from aggregated
    * value counts (exact integer, decimal-summed), one rounded-12
    * division to AUC, rank-biserial = 2·AUC − 1. */
  val q187RankSumEffect: String =
    """WITH vv AS (SELECT source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS v
      |  FROM documents),
      |c AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM vv GROUP BY 1, 2),
      |ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM c GROUP BY 1),
      |g AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cg,
      |    CAST(SUM(SUM(c)) OVER (ORDER BY v) AS BIGINT) AS cum_g
      |  FROM c GROUP BY v),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_all FROM c),
      |wc AS (SELECT c.source, c.v, c.c,
      |    CAST(SUM(c.c) OVER (PARTITION BY c.source ORDER BY c.v)
      |      AS BIGINT) AS cum_s,
      |    g.cg, g.cum_g, tot.n_all
      |  FROM c JOIN g USING (v) CROSS JOIN tot),
      |terms AS (SELECT source, n_all,
      |    CAST(c * (2 * ((cum_g - cg) - (cum_s - c)) + (cg - c))
      |      AS DECIMAL(38,0)) AS u2_term
      |  FROM wc),
      |agg AS (SELECT source, SUM(u2_term) AS u2, MAX(n_all) AS n_all
      |  FROM terms GROUP BY source)
      |SELECT agg.source, ns.n_s AS n_source,
      |  CAST(agg.n_all - ns.n_s AS BIGINT) AS n_rest,
      |  round(CAST(agg.u2 AS DOUBLE) /
      |    (2.0 * CAST(ns.n_s AS DOUBLE) *
      |     CAST(agg.n_all - ns.n_s AS DOUBLE)), 12) AS auc,
      |  round(2.0 * round(CAST(agg.u2 AS DOUBLE) /
      |    (2.0 * CAST(ns.n_s AS DOUBLE) *
      |     CAST(agg.n_all - ns.n_s AS DOUBLE)), 12) - 1.0, 12)
      |    AS rank_biserial
      |FROM agg JOIN ns USING (source)
      |ORDER BY agg.source""".stripMargin

  /** Mirrors q188 (`ops.Distinctive.q188ZipfSlope`): ln-ln least
    * squares over the per-source top-100 term head — rounded lns,
    * rounded-product decimal moment sums, closed-form slope + r². */
  val q188ZipfSlope: String =
    """WITH tok AS (SELECT source,
      |  regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS l
      |FROM documents),
      |t AS (SELECT source, unnest(l) AS term FROM tok),
      |tf AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS f
      |  FROM t GROUP BY 1, 2),
      |head AS (SELECT source, f, r FROM (
      |    SELECT source, f,
      |      CAST(ROW_NUMBER() OVER (PARTITION BY source
      |        ORDER BY f DESC, term) AS BIGINT) AS r
      |    FROM tf) WHERE r <= 100),
      |pts AS (SELECT source,
      |    round(ln(CAST(r AS DOUBLE)), 12) AS x,
      |    round(ln(CAST(f AS DOUBLE)), 12) AS y
      |  FROM head),
      |sums AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(round(x, 12) AS DECIMAL(28,12))) AS sx,
      |    SUM(CAST(round(y, 12) AS DECIMAL(28,12))) AS sy,
      |    SUM(CAST(round(x * x, 12) AS DECIMAL(28,12))) AS sxx,
      |    SUM(CAST(round(y * y, 12) AS DECIMAL(28,12))) AS syy,
      |    SUM(CAST(round(x * y, 12) AS DECIMAL(28,12))) AS sxy
      |  FROM pts GROUP BY source),
      |fin AS (SELECT source, n,
      |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
      |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dx,
      |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dy
      |  FROM sums)
      |SELECT source, n AS n_terms, round(num / dx, 12) AS zipf_slope,
      |  round(num * num / (dx * dy), 12) AS r2
      |FROM fin ORDER BY source""".stripMargin

  /** Mirrors q180 (`ops.TimeSeries.q180PathSurprisal`): the q115
    * transition model turned into per-user average surprisal — each
    * −ln p rounded 12 into a decimal sum, mean rounded 12. */
  val q180PathSurprisal: String =
    """WITH ev AS (SELECT user_id, ts, event_id, event_type FROM events),
      |pr AS (SELECT user_id, event_type AS cur,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS nxt
      |  FROM ev),
      |p2 AS (SELECT user_id, cur, nxt FROM pr WHERE nxt IS NOT NULL),
      |cnt AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM p2 GROUP BY 1, 2),
      |tot AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS tot FROM cnt GROUP BY 1),
      |model AS (SELECT cnt.cur, cnt.nxt,
      |    CAST(round(-ln(CAST(cnt.n AS DOUBLE) / CAST(tot.tot AS DOUBLE)), 12)
      |      AS DECIMAL(28,12)) AS surprisal
      |  FROM cnt JOIN tot USING (cur))
      |SELECT p2.user_id, CAST(COUNT(*) AS BIGINT) AS n_transitions,
      |  round(CAST(SUM(m.surprisal) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 12)
      |    AS avg_surprisal
      |FROM p2 JOIN model m ON p2.cur = m.cur AND p2.nxt = m.nxt
      |GROUP BY p2.user_id
      |ORDER BY p2.user_id""".stripMargin

  /** Mirrors q182 (`ops.Clustering.q182SourceClusterEntropy`): the q81
    * assignment replay from q182's persisted centroids, then per-source
    * Shannon entropy over the cluster distribution (rounded-part
    * decimal sums, the q41/q48 rules). */
  val q182SourceClusterEntropy: String = {
    val lnK = java.lang.Double.toString(math.log(8.0))
    s"""WITH ${kmeansAssignCtes(graft.ops.Clustering.SourceEntropyCentroidsPath)},
       |asg AS (SELECT e.vec_id, CAST(COALESCE(r.cluster, 0) AS INT) AS cluster
       |  FROM e LEFT JOIN r ON e.vec_id = r.vec_id AND r.rn = 1),
       |src AS (SELECT doc_id AS vec_id, source FROM documents),
       |cnts AS (SELECT s.source, a.cluster, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM asg a JOIN src s USING (vec_id) GROUP BY 1, 2),
       |tots AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnts GROUP BY 1),
       |parts AS (SELECT cnts.source, tots.n,
       |    CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
       |      ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 12)
       |      AS DECIMAL(28,12)) AS part
       |  FROM cnts JOIN tots USING (source))
       |SELECT source, MAX(n) AS n_docs,
       |  CAST(COUNT(*) AS BIGINT) AS n_clusters_used,
       |  round(CAST(SUM(part) AS DOUBLE), 12) AS entropy,
       |  round(CAST(SUM(part) AS DOUBLE) / $lnK, 12) AS entropy_norm
       |FROM parts GROUP BY source
       |ORDER BY source""".stripMargin
  }

  /** Mirrors q183 (`ops.Mixing.q183TemperatureMix`): temperature-scaled
    * sampling weights — shares and powers rounded 12, normalizer an
    * exact decimal sum. */
  val q183TemperatureMix: String =
    """WITH t AS (SELECT source,
      |    CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS n_total FROM t),
      |sweep AS (SELECT source, n_tokens,
      |    round(CAST(n_tokens AS DOUBLE) / CAST(n_total AS DOUBLE), 12) AS p_natural,
      |    unnest(CAST([0.5, 0.7, 1.0] AS DOUBLE[])) AS alpha
      |  FROM t CROSS JOIN tot),
      |w AS (SELECT *, CAST(round(pow(p_natural, alpha), 12) AS DECIMAL(28,12)) AS w
      |  FROM sweep),
      |nm AS (SELECT alpha, SUM(w) AS tot FROM w GROUP BY alpha)
      |SELECT w.source, w.alpha, w.n_tokens, w.p_natural,
      |  round(CAST(w.w AS DOUBLE) / CAST(nm.tot AS DOUBLE), 12) AS q_weight,
      |  round(round(CAST(w.w AS DOUBLE) / CAST(nm.tot AS DOUBLE), 12) /
      |    w.p_natural, 12) AS boost
      |FROM w JOIN nm USING (alpha)
      |ORDER BY w.source, w.alpha""".stripMargin

  /** Mirrors q178 (`ops.Graph.q178LabelPropagation`): the 3 synchronous
    * most-frequent-neighbor-label rounds unrolled — argmax via
    * (cnt DESC, label) row_number, isolated nodes keep their label. */
  val q178LabelPropagation: String = {
    def round_(prev: String, cur: String): String =
      s"""c$cur AS (SELECT u.src, l.label, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM und u JOIN $prev l ON u.dst = l.id GROUP BY 1, 2),
         |b$cur AS (SELECT src AS id, label AS next FROM (
         |    SELECT src, label, ROW_NUMBER() OVER (PARTITION BY src
         |      ORDER BY cnt DESC, label) AS rn FROM c$cur) WHERE rn = 1),
         |$cur AS (SELECT p.id, coalesce(b$cur.next, p.label) AS label
         |  FROM $prev p LEFT JOIN b$cur USING (id))""".stripMargin
    s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
       |raw AS (SELECT id AS src, id + x.o AS dst
       |  FROM nodes CROSS JOIN (SELECT unnest([1, 2, 3]) AS o) x
       |  WHERE id // 25 = (id + x.o) // 25),
       |ed AS (SELECT src, dst FROM raw WHERE dst IN (SELECT id FROM nodes)),
       |und AS (SELECT src, dst FROM ed WHERE src <> dst
       |  UNION SELECT dst AS src, src AS dst FROM ed WHERE src <> dst),
       |l0 AS (SELECT id, id AS label FROM nodes),
       |${round_("l0", "l1")},
       |${round_("l1", "l2")},
       |${round_("l2", "l3")},
       |sizes AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size
       |  FROM l3 GROUP BY label)
       |SELECT l3.id AS doc_id, l3.label AS community, sizes.community_size
       |FROM l3 JOIN sizes USING (label)
       |ORDER BY doc_id""".stripMargin
  }

  /** Mirrors q179 (`ops.KnnGraph.q179TruncationRecall`): the full-dim
    * and 16-dim-prefix exact top-10 per probe, overlap@10. */
  val q179TruncationRecall: String =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |q AS (SELECT vec_id AS query_id, embedding AS qe FROM e WHERE vec_id < 8),
      |pairs AS (SELECT q.query_id, e.vec_id, q.qe, e.embedding AS emb
      |  FROM e, q WHERE e.vec_id <> q.query_id),
      |pe AS (SELECT query_id, vec_id, qe, emb,
      |    unnest(generate_series(1, len(qe))) AS i FROM pairs),
      |dots AS (SELECT query_id, vec_id,
      |    SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(emb[i] AS DOUBLE) AS DECIMAL(28,18))) AS dot_f,
      |    SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE) AS DECIMAL(28,18))) AS qq_f,
      |    SUM(CAST(CAST(emb[i] AS DOUBLE) * CAST(emb[i] AS DOUBLE) AS DECIMAL(28,18))) AS ee_f,
      |    SUM(CASE WHEN i <= 16 THEN
      |      CAST(CAST(qe[i] AS DOUBLE) * CAST(emb[i] AS DOUBLE) AS DECIMAL(28,18)) END) AS dot_t,
      |    SUM(CASE WHEN i <= 16 THEN
      |      CAST(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE) AS DECIMAL(28,18)) END) AS qq_t,
      |    SUM(CASE WHEN i <= 16 THEN
      |      CAST(CAST(emb[i] AS DOUBLE) * CAST(emb[i] AS DOUBLE) AS DECIMAL(28,18)) END) AS ee_t
      |  FROM pe GROUP BY 1, 2),
      |scored AS (SELECT query_id, vec_id,
      |    round(CAST(dot_f AS DOUBLE) /
      |      (sqrt(CAST(qq_f AS DOUBLE)) * sqrt(CAST(ee_f AS DOUBLE))), 12) AS cf,
      |    round(CAST(dot_t AS DOUBLE) /
      |      (sqrt(CAST(qq_t AS DOUBLE)) * sqrt(CAST(ee_t AS DOUBLE))), 12) AS ct
      |  FROM dots),
      |tf_ AS (SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id, ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cf DESC, vec_id) AS r FROM scored WHERE NOT isnan(cf))
      |  WHERE r <= 10),
      |tt AS (SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id, ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY ct DESC, vec_id) AS r FROM scored WHERE NOT isnan(ct))
      |  WHERE r <= 10),
      |ov AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
      |  FROM tf_ JOIN tt USING (query_id, vec_id) GROUP BY 1)
      |SELECT qq.query_id, coalesce(ov.n_overlap, 0) AS n_overlap,
      |  round(CAST(coalesce(ov.n_overlap, 0) AS DOUBLE) / 10, 12) AS recall_at_k
      |FROM (SELECT query_id FROM q) qq LEFT JOIN ov USING (query_id)
      |ORDER BY query_id""".stripMargin

  /** Mirrors q189 (`ops.Valuation.q189SourceShapley`): the coverage-
    * game closed form — distinct (source, 3-gram) pairs, per-gram
    * carrier counts, each gram's 1/n rounded 12 into a decimal sum. */
  val q189SourceShapley: String =
    """WITH tok AS (SELECT source,
      |  regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS l
      |FROM documents),
      |pos AS (SELECT source, l, unnest(generate_series(1, len(l) - 2)) AS i
      |        FROM tok WHERE len(l) >= 3),
      |st AS (SELECT DISTINCT source, array_to_string(l[i:i+2], ' ') AS g FROM pos),
      |tc AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_sources FROM st GROUP BY g),
      |vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab FROM tc)
      |SELECT st.source,
      |  CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN tc.n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unique_grams,
      |  CAST(SUM(CAST(round(1.0 / CAST(tc.n_sources AS DOUBLE), 12)
      |    AS DECIMAL(28,12))) AS DOUBLE) AS shapley,
      |  round(CAST(SUM(CAST(round(1.0 / CAST(tc.n_sources AS DOUBLE), 12)
      |      AS DECIMAL(28,12))) AS DOUBLE) / CAST(vocab.n_vocab AS DOUBLE), 12)
      |    AS vocab_share
      |FROM st JOIN tc USING (g) CROSS JOIN vocab
      |GROUP BY st.source, vocab.n_vocab
      |ORDER BY st.source""".stripMargin

  /** Mirrors q190 (`ops.Winnowing.q190Winnowing`): per-doc k=3-gram
    * 60-bit md5-prefix hashes, w=8 window minima (prefix windows
    * included — both engines' md5/hex-parse agree), distinct selected
    * set, then the q25 capped inverted-index pair machinery. */
  val q190Winnowing: String =
    s"""WITH $tokCte,
       |h AS (SELECT doc_id,
       |    list_transform(generate_series(1, len(l) - 2),
       |      i -> CAST(('0x' || substr(md5(array_to_string(l[i:i+2], ' ')), 1, 15))
       |        AS BIGINT)) AS hs
       |  FROM tok WHERE len(l) >= 3),
       |fp AS (SELECT DISTINCT doc_id,
       |    unnest(list_distinct(list_transform(generate_series(1, len(hs)),
       |      e -> list_min(hs[greatest(1, e - 7):e])))) AS f
       |  FROM h),
       |stop AS (SELECT f FROM fp GROUP BY f HAVING count(*) > 50),
       |fpc AS (SELECT fp.doc_id, fp.f FROM fp
       |        WHERE f NOT IN (SELECT f FROM stop)),
       |sz AS (SELECT doc_id, count(*) AS n FROM fpc GROUP BY doc_id),
       |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
       |           FROM fpc a JOIN fpc b ON a.f = b.f AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2)
       |SELECT d1, d2, c AS n_common,
       |  CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) AS winnow_sim
       |FROM common JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
       |WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.5
       |ORDER BY d1, d2""".stripMargin

  /** Mirrors q191 (`ops.Experiment.q191Cuped`): the q144 half-span
    * split, one (user → x, y) aggregate, exact decimal moments, θ and
    * mean(X) rounded 12 before the per-arm adjustment, outputs rounded
    * 6 with the q142 n ≥ 2 guard. */
  val q191Cuped: String =
    """WITH ev AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
      |  FROM events),
      |span AS (SELECT (min(day) + max(day) + 1) // 2 AS s FROM ev),
      |pu AS (SELECT user_id,
      |    CAST(SUM(CASE WHEN day < span.s THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN day >= span.s THEN 1 ELSE 0 END) AS BIGINT) AS y
      |  FROM ev CROSS JOIN span GROUP BY user_id, span.s),
      |pv AS (SELECT user_id, x, y,
      |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      % 2 AS variant
      |  FROM pu),
      |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
      |    CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy
      |  FROM pv),
      |th AS (SELECT
      |    round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 12) AS theta,
      |    round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 12) AS mx_all
      |  FROM mom),
      |arm AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(x) AS DECIMAL(38,0)) AS ax,
      |    CAST(SUM(y) AS DECIMAL(38,0)) AS ay,
      |    CAST(SUM(x * x) AS DECIMAL(38,0)) AS axx,
      |    CAST(SUM(y * y) AS DECIMAL(38,0)) AS ayy,
      |    CAST(SUM(x * y) AS DECIMAL(38,0)) AS axy
      |  FROM pv GROUP BY variant),
      |ex AS (SELECT variant, n_users, th.theta, th.mx_all,
      |    CAST(ax AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_x,
      |    CAST(ay AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_y,
      |    (CAST(axx AS DOUBLE) - CAST(ax AS DOUBLE) * CAST(ax AS DOUBLE)
      |      / CAST(n_users AS DOUBLE)) / (CAST(n_users AS DOUBLE) - 1.0) AS var_x,
      |    (CAST(ayy AS DOUBLE) - CAST(ay AS DOUBLE) * CAST(ay AS DOUBLE)
      |      / CAST(n_users AS DOUBLE)) / (CAST(n_users AS DOUBLE) - 1.0) AS var_y,
      |    (CAST(axy AS DOUBLE) - CAST(ax AS DOUBLE) * CAST(ay AS DOUBLE)
      |      / CAST(n_users AS DOUBLE)) / (CAST(n_users AS DOUBLE) - 1.0) AS cov_xy
      |  FROM arm CROSS JOIN th),
      |fin AS (SELECT variant, n_users, theta,
      |    mean_y, mean_y - theta * (mean_x - mx_all) AS mean_c,
      |    var_y,
      |    var_y + theta * theta * var_x - 2.0 * theta * cov_xy AS var_c
      |  FROM ex)
      |SELECT variant, n_users,
      |  round(CASE WHEN n_users >= 2 THEN mean_y END, 6) AS mean_y,
      |  round(CASE WHEN n_users >= 2 THEN mean_c END, 6) AS mean_cuped,
      |  round(CASE WHEN n_users >= 2 THEN var_y END, 6) AS var_y,
      |  round(CASE WHEN n_users >= 2 THEN var_c END, 6) AS var_cuped,
      |  theta,
      |  round(CASE WHEN n_users >= 2 AND var_y > 0
      |    THEN 1.0 - var_c / var_y END, 6) AS var_reduction
      |FROM fin ORDER BY variant""".stripMargin

  /** Mirrors q192 (`ops.Benford.q192Benford`): first digit from exact
    * integer cents (floor(p·100 + 0.5), then the Long's leading
    * decimal char), grid-completed counts, ln-ratio expectations and
    * chi-square terms rounded 6, decimal-summed totals, 15.507 cut. */
  val q192Benford: String =
    """WITH c AS (SELECT o_orderpriority AS segment,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders WHERE o_totalprice > 0),
      |d AS (SELECT segment,
      |    CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM c),
      |cnt AS (SELECT segment, digit, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM d GROUP BY 1, 2),
      |tot AS (SELECT segment, CAST(SUM(n) AS BIGINT) AS t FROM cnt GROUP BY 1),
      |grid AS (SELECT tot.segment, tot.t, g.digit, COALESCE(cnt.n, 0) AS n
      |  FROM tot CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS digit) g
      |  LEFT JOIN cnt ON cnt.segment = tot.segment AND cnt.digit = g.digit),
      |terms AS (SELECT segment, digit, n, t,
      |    round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share,
      |    round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6) AS benford_p,
      |    round((CAST(n AS DOUBLE)
      |        - CAST(t AS DOUBLE) * round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6))
      |      * (CAST(n AS DOUBLE)
      |        - CAST(t AS DOUBLE) * round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6))
      |      / (CAST(t AS DOUBLE) * round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6)), 6)
      |      AS chi2_term
      |  FROM grid)
      |SELECT segment, CAST(digit AS VARCHAR) AS bin, n, share, benford_p,
      |  chi2_term, CAST(NULL AS VARCHAR) AS verdict
      |FROM terms
      |UNION ALL
      |SELECT segment, '__total', CAST(SUM(n) AS BIGINT),
      |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
      |  CAST(SUM(CAST(chi2_term AS DECIMAL(18,6))) AS DOUBLE),
      |  CASE WHEN CAST(SUM(CAST(chi2_term AS DECIMAL(18,6))) AS DOUBLE) > 15.507
      |       THEN 'reject' ELSE 'consistent' END
      |FROM terms GROUP BY segment
      |ORDER BY segment, bin""".stripMargin

  /** Mirrors q193 (`ops.Conformal.q193Conformal`): q32 md5 split,
    * exact decimal moments → rounded-12 line, rounded-6 residuals,
    * q̂ = the ⌈(n+1)(1−α)⌉-th smallest via the value-aggregated
    * cumulative (the q167 exact-order-statistic recipe), coverage on
    * the test split. */
  val q193Conformal: String =
    """WITH base AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS y,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
      |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents),
      |cal AS (SELECT * FROM base WHERE split <> 'test'),
      |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS DECIMAL(38,0)) AS sx, CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(SUM(x*x) AS DECIMAL(38,0)) AS sxx, CAST(SUM(x*y) AS DECIMAL(38,0)) AS sxy
      |  FROM cal),
      |fit AS (SELECT n AS n_cal,
      |    round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 12) AS slope,
      |    round((CAST(sy AS DOUBLE) - round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 12) * CAST(sx AS DOUBLE))
      |      / CAST(n AS DOUBLE), 12) AS intercept
      |  FROM mom),
      |res AS (SELECT fit.n_cal, fit.slope, fit.intercept,
      |    round(abs(CAST(y AS DOUBLE) - (intercept + slope * CAST(x AS DOUBLE))), 6) AS r
      |  FROM cal CROSS JOIN fit),
      |byr AS (SELECT n_cal, slope, intercept, r, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM res GROUP BY 1,2,3,4),
      |cum AS (SELECT *, CAST(SUM(c) OVER (ORDER BY r) AS BIGINT) AS cum FROM byr),
      |qh AS (SELECT n_cal, slope, intercept, MIN(r) AS q_hat FROM cum
      |  WHERE cum >= least(CAST(ceil((CAST(n_cal AS DOUBLE)+1.0)*0.9) AS BIGINT), n_cal)
      |  GROUP BY 1,2,3),
      |ev AS (SELECT base.source,
      |    CASE WHEN round(abs(CAST(y AS DOUBLE) - (intercept + slope * CAST(x AS DOUBLE))), 6)
      |           <= q_hat THEN 1 ELSE 0 END AS covered,
      |    qh.q_hat, qh.slope, qh.intercept
      |  FROM base CROSS JOIN qh WHERE split = 'test')
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_eval,
      |  CAST(SUM(covered) AS BIGINT) AS n_covered,
      |  round(CAST(SUM(covered) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE), 6) AS coverage,
      |  MAX(q_hat) AS q_hat, MAX(slope) AS slope, MAX(intercept) AS intercept
      |FROM ev GROUP BY source
      |UNION ALL
      |SELECT '__overall', CAST(COUNT(*) AS BIGINT), CAST(SUM(covered) AS BIGINT),
      |  round(CAST(SUM(covered) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE), 6),
      |  MAX(q_hat), MAX(slope), MAX(intercept)
      |FROM ev
      |ORDER BY source""".stripMargin

  /** Mirrors q195 (`ops.ChangePoint.q195CusumDaily`): zero-filled
    * (type × day) grid, first-half baseline, rounded-12 deviations as
    * DECIMAL(28,12), S = P − min(0, running-min P) via two windows
    * over the grid, decimal alarm compare. */
  val q195CusumDaily: String =
    """WITH ev AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day
      |  FROM events),
      |cnt AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM ev GROUP BY 1,2),
      |days AS (SELECT DISTINCT day FROM cnt),
      |types AS (SELECT DISTINCT event_type FROM cnt),
      |grid AS (SELECT t.event_type, d.day, COALESCE(c.x, 0) AS x
      |  FROM types t CROSS JOIN days d
      |  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.day = d.day),
      |sp AS (SELECT (min(day) + max(day) + 1) // 2 AS s FROM days),
      |base AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n0,
      |    CAST(SUM(x) AS BIGINT) AS s1, CAST(SUM(x*x) AS BIGINT) AS s2
      |  FROM grid CROSS JOIN sp WHERE day < sp.s GROUP BY 1),
      |kb AS (SELECT event_type,
      |    round(CAST(s1 AS DOUBLE)/CAST(n0 AS DOUBLE), 12) AS mu,
      |    round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/CAST(n0 AS DOUBLE))
      |      / (CAST(n0 AS DOUBLE) - 1.0)), 12) AS sigma
      |  FROM base),
      |kb2 AS (SELECT *, round(sigma/2.0, 12) AS k, round(sigma*4.0, 12) AS h FROM kb),
      |sc AS (SELECT g.event_type, g.day,
      |    CAST(round(CAST(g.x AS DOUBLE) - kb2.mu - kb2.k, 12) AS DECIMAL(28,12)) AS y,
      |    kb2.mu, kb2.sigma, kb2.h
      |  FROM grid g JOIN kb2 USING (event_type)),
      |pw AS (SELECT *, SUM(y) OVER (PARTITION BY event_type ORDER BY day) AS p FROM sc),
      |sw AS (SELECT *, p - least(MIN(p) OVER (PARTITION BY event_type ORDER BY day),
      |    CAST(0 AS DECIMAL(28,12))) AS s FROM pw)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |  round(MAX(mu), 6) AS mu, round(MAX(sigma), 6) AS sigma,
      |  round(MAX(h), 6) AS h,
      |  round(CAST(MAX(s) AS DOUBLE), 6) AS max_s,
      |  CAST(MIN(CASE WHEN s > CAST(h AS DECIMAL(28,12)) THEN day END) AS BIGINT)
      |    AS alarm_day
      |FROM sw GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Mirrors q194 (`ops.Linkage.q194RecordLinkage`): the derived probe
    * view replayed move-for-move, the (nation, segment, ⌊bal/5000⌋)
    * block join, in-space u-rates rounded 12, FS weights ln(m/u) /
    * ln((1−m)/(1−u)) rounded 12 and decimal-summed, score > 0 emit,
    * match at score > 2 on the decimal. */
  val q194RecordLinkage: String =
    """WITH a AS (SELECT c_custkey AS a_id, c_name AS a_name,
      |    c_nationkey AS a_nat, c_acctbal AS a_bal, c_mktsegment AS a_seg
      |  FROM customer),
      |b AS (SELECT c_custkey + 1000000000 AS b_id,
      |    CASE WHEN c_custkey % 3 = 0 THEN upper(c_name) ELSE c_name END AS b_name,
      |    c_nationkey AS b_nat,
      |    CASE WHEN c_custkey % 4 = 0 THEN c_acctbal + 0.5 ELSE c_acctbal END AS b_bal,
      |    CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS b_seg
      |  FROM customer WHERE c_custkey % 7 <> 0),
      |pairs AS (SELECT a_id, b_id,
      |    CASE WHEN lower(a_name) = lower(b_name) THEN 1 ELSE 0 END AS g1,
      |    CASE WHEN a_name = b_name THEN 1 ELSE 0 END AS g2,
      |    CASE WHEN abs(a_bal - b_bal) <= 0.02 THEN 1 ELSE 0 END AS g3
      |  FROM a JOIN b ON a_nat = b_nat AND a_seg = b_seg
      |    AND floor(a_bal / 5000.0) = floor(b_bal / 5000.0)),
      |u AS (SELECT round(CAST(SUM(g1) AS DOUBLE)/COUNT(*), 12) AS u1,
      |    round(CAST(SUM(g2) AS DOUBLE)/COUNT(*), 12) AS u2,
      |    round(CAST(SUM(g3) AS DOUBLE)/COUNT(*), 12) AS u3
      |  FROM pairs),
      |sc AS (SELECT a_id, b_id, g1, g2, g3,
      |    CAST(CASE WHEN g1 = 1 THEN round(ln(0.95 / u1), 12)
      |         ELSE round(ln(0.05 / (1.0 - u1)), 12) END AS DECIMAL(28,12))
      |    + CAST(CASE WHEN g2 = 1 THEN round(ln(0.70 / u2), 12)
      |         ELSE round(ln(0.30 / (1.0 - u2)), 12) END AS DECIMAL(28,12))
      |    + CAST(CASE WHEN g3 = 1 THEN round(ln(0.90 / u3), 12)
      |         ELSE round(ln(0.10 / (1.0 - u3)), 12) END AS DECIMAL(28,12))
      |      AS score_d
      |  FROM pairs CROSS JOIN u)
      |SELECT a_id, b_id,
      |  CAST(g1 AS VARCHAR) || CAST(g2 AS VARCHAR) || CAST(g3 AS VARCHAR)
      |    AS pattern,
      |  round(CAST(score_d AS DOUBLE), 6) AS score,
      |  score_d > 2 AS is_match
      |FROM sc WHERE score_d > 0
      |ORDER BY a_id, b_id""".stripMargin

  /** Mirrors q196 (`ops.LshTuning.q196LshTuning`): the q26 signature
    * replay, each (b, r) split's band-collision candidates counted
    * against the exact Jaccard ≥ 0.5 truth of the capped sets. */
  val q196LshTuning: String = {
    def cfg(b: Int, r: Int): String = {
      val bands = (0 until b).map { i =>
        s"SELECT doc_id, $i AS band, md5(${(0 until r)
          .map(j => s"h${r * i + j}").mkString(" || ")}) AS bh FROM sig"
      }.mkString(" UNION ALL ")
      s"""SELECT $b AS n_bands, $r AS rows_per_band,
         |  CAST(COUNT(*) AS BIGINT) AS n_candidates,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
         |  CAST(SUM(CASE WHEN t.d1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hit
         |FROM (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |      FROM ($bands) x JOIN ($bands) y
         |        ON x.band = y.band AND x.bh = y.bh
         |        AND x.doc_id < y.doc_id) c
         |LEFT JOIN truth t ON c.d1 = t.d1 AND c.d2 = t.d2""".stripMargin
    }
    s"""WITH $shingleCtes,
       |rare AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= 50),
       |shc AS (SELECT sh.doc_id, sh.g FROM sh JOIN rare ON sh.g = rare.g),
       |szc AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
       |com AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM shc a JOIN shc b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (SELECT d1, d2 FROM com
       |  JOIN szc s1 ON d1 = s1.doc_id JOIN szc s2 ON d2 = s2.doc_id
       |  WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.5),
       |sig AS (SELECT doc_id,
       |  min(substring(md5(g), 1, 8))  AS h0, min(substring(md5(g), 9, 8))  AS h1,
       |  min(substring(md5(g), 17, 8)) AS h2, min(substring(md5(g), 25, 8)) AS h3,
       |  min(substring(md5('#' || g), 1, 8))  AS h4, min(substring(md5('#' || g), 9, 8))  AS h5,
       |  min(substring(md5('#' || g), 17, 8)) AS h6, min(substring(md5('#' || g), 25, 8)) AS h7
       |  FROM shc GROUP BY doc_id),
       |sweep AS (
       |${Seq((1, 8), (2, 4), (4, 2), (8, 1)).map(c => cfg(c._1, c._2))
            .mkString("\nUNION ALL\n")})
       |SELECT CAST(n_bands AS BIGINT) AS n_bands,
       |  CAST(rows_per_band AS BIGINT) AS rows_per_band,
       |  n_candidates, n_true, n_hit,
       |  round(CASE WHEN n_true > 0
       |    THEN CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE) END, 6) AS recall,
       |  round(CASE WHEN n_candidates > 0
       |    THEN CAST(n_hit AS DOUBLE) / CAST(n_candidates AS DOUBLE) END, 6)
       |    AS precision
       |FROM sweep ORDER BY n_bands""".stripMargin
  }

  /** Shared CTE chain: per-source word-3-gram frequencies WITH
    * multiplicity (no distinct — q197/q198's inequality statistics
    * weigh repeated grams). */
  private val gramFreqCtes =
    """tok AS (SELECT doc_id, source,
      |  regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS l
      |FROM documents),
      |pos AS (SELECT source, l, unnest(generate_series(1, len(l) - 2)) AS i
      |        FROM tok WHERE len(l) >= 3),
      |tf AS (SELECT source, array_to_string(l[i:i+2], ' ') AS g,
      |    CAST(COUNT(*) AS BIGINT) AS f
      |  FROM pos GROUP BY 1, 2)""".stripMargin

  /** Mirrors q197 (`ops.TailStats.q197HillTail`): top-(k+1) head per
    * source, ξ̂ from rounded-12 ln ratios decimal-summed, α = k/Σ. */
  val q197HillTail: String =
    s"""WITH $gramFreqCtes,
       |head AS (SELECT source, f, r FROM (
       |    SELECT source, f, CAST(ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY f DESC, g) AS BIGINT) AS r FROM tf) WHERE r <= 101),
       |kv AS (SELECT source, MAX(CASE WHEN r = 101 THEN f END) AS fk1,
       |    CAST(SUM(CASE WHEN r <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS k
       |  FROM head GROUP BY source),
       |s AS (SELECT h.source, kv.k,
       |    SUM(CAST(round(ln(CAST(h.f AS DOUBLE) / CAST(kv.fk1 AS DOUBLE)), 12)
       |      AS DECIMAL(28,12))) AS xs
       |  FROM head h JOIN kv USING (source)
       |  WHERE h.r <= 100 AND kv.fk1 IS NOT NULL
       |  GROUP BY h.source, kv.k)
       |SELECT source, k,
       |  round(CAST(xs AS DOUBLE) / CAST(k AS DOUBLE), 6) AS hill_xi,
       |  round(CASE WHEN xs > 0
       |    THEN CAST(k AS DOUBLE) / CAST(xs AS DOUBLE) END, 6) AS tail_alpha
       |FROM s ORDER BY source""".stripMargin

  /** Mirrors q198 (`ops.TailStats.q198Gini`): ascending rank over the
    * aggregated gram table, exact decimal Σf / Σi·f, one divide. */
  val q198Gini: String =
    s"""WITH $gramFreqCtes,
       |rk AS (SELECT source, f, CAST(ROW_NUMBER() OVER (PARTITION BY source
       |    ORDER BY f, g) AS BIGINT) AS i FROM tf),
       |gg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(f) AS DECIMAL(38,0)) AS sf,
       |    CAST(SUM(CAST(i AS DECIMAL(19,0)) * CAST(f AS DECIMAL(19,0)))
       |      AS DECIMAL(38,0)) AS sif
       |  FROM rk GROUP BY source)
       |SELECT source, n AS n_grams, CAST(sf AS BIGINT) AS total_mass,
       |  round((2.0 * CAST(sif AS DOUBLE)
       |      - (CAST(n AS DOUBLE) + 1.0) * CAST(sf AS DOUBLE))
       |    / (CAST(n AS DOUBLE) * CAST(sf AS DOUBLE)), 6) AS gini
       |FROM gg ORDER BY source""".stripMargin

  /** Mirrors q199 (`ops.Jackknife.q199Jackknife`): md5 % 20 blocks,
    * leave-one-block-out means from exact block sums (rounded 12),
    * θ̄ via a decimal sum, SE² = (G−1)/G · Σ dev². */
  val q199Jackknife: String =
    """WITH d AS (SELECT source,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      % 20 AS blk,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS y
      |  FROM documents),
      |pb AS (SELECT source, blk, CAST(COUNT(*) AS BIGINT) AS n_g,
      |    CAST(SUM(y) AS DECIMAL(38,0)) AS s_g
      |  FROM d GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(SUM(n_g) AS BIGINT) AS n,
      |    CAST(SUM(s_g) AS DECIMAL(38,0)) AS s,
      |    CAST(COUNT(*) AS BIGINT) AS gee
      |  FROM pb GROUP BY source),
      |lo AS (SELECT pb.source, tot.n, tot.gee,
      |    round((CAST(tot.s AS DOUBLE) - CAST(pb.s_g AS DOUBLE))
      |      / (CAST(tot.n AS DOUBLE) - CAST(pb.n_g AS DOUBLE)), 12) AS th
      |  FROM pb JOIN tot USING (source)),
      |m AS (SELECT source, MAX(n) AS n, MAX(gee) AS gee,
      |    round(CAST(SUM(CAST(th AS DECIMAL(28,12))) AS DOUBLE)
      |      / CAST(COUNT(*) AS DOUBLE), 12) AS thbar
      |  FROM lo GROUP BY source),
      |v AS (SELECT lo.source, MAX(m.n) AS n, MAX(m.gee) AS gee,
      |    MAX(m.thbar) AS thbar,
      |    SUM(CAST(round((lo.th - m.thbar) * (lo.th - m.thbar), 12)
      |      AS DECIMAL(28,12))) AS ss
      |  FROM lo JOIN m USING (source) GROUP BY lo.source)
      |SELECT source, n AS n_docs, gee AS n_blocks,
      |  round(thbar, 6) AS mean_loo,
      |  round(sqrt((CAST(gee AS DOUBLE) - 1.0) / CAST(gee AS DOUBLE)
      |    * CAST(ss AS DOUBLE)), 6) AS jk_se
      |FROM v ORDER BY source""".stripMargin

  /** Mirrors q200 (`ops.Absorbing.q200AbsorbingFunnel`): the q115
    * transition model pivoted to one row, (I−Q)h = r and (I−Q)t = 1
    * solved by Cramer's rule — fixed determinant expressions over
    * rounded-12 probabilities, outputs rounded 6. */
  val q200AbsorbingFunnel: String =
    """WITH pr AS (SELECT event_type AS cur,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS nxt
      |  FROM events),
      |cnt AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n FROM pr
      |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS t FROM cnt GROUP BY 1),
      |p AS (SELECT cnt.cur, cnt.nxt,
      |    round(CAST(cnt.n AS DOUBLE) / CAST(tot.t AS DOUBLE), 12) AS p
      |  FROM cnt JOIN tot USING (cur)),
      |m AS (SELECT
      |    MAX(CASE WHEN cur='click' AND nxt='click' THEN p ELSE 0 END) AS q11,
      |    MAX(CASE WHEN cur='click' AND nxt='signup' THEN p ELSE 0 END) AS q12,
      |    MAX(CASE WHEN cur='click' AND nxt='view' THEN p ELSE 0 END) AS q13,
      |    MAX(CASE WHEN cur='signup' AND nxt='click' THEN p ELSE 0 END) AS q21,
      |    MAX(CASE WHEN cur='signup' AND nxt='signup' THEN p ELSE 0 END) AS q22,
      |    MAX(CASE WHEN cur='signup' AND nxt='view' THEN p ELSE 0 END) AS q23,
      |    MAX(CASE WHEN cur='view' AND nxt='click' THEN p ELSE 0 END) AS q31,
      |    MAX(CASE WHEN cur='view' AND nxt='signup' THEN p ELSE 0 END) AS q32,
      |    MAX(CASE WHEN cur='view' AND nxt='view' THEN p ELSE 0 END) AS q33,
      |    MAX(CASE WHEN cur='click' AND nxt='purchase' THEN p ELSE 0 END) AS r1,
      |    MAX(CASE WHEN cur='signup' AND nxt='purchase' THEN p ELSE 0 END) AS r2,
      |    MAX(CASE WHEN cur='view' AND nxt='purchase' THEN p ELSE 0 END) AS r3
      |  FROM p),
      |a AS (SELECT 1.0-q11 AS a11, -q12 AS a12, -q13 AS a13,
      |             -q21 AS a21, 1.0-q22 AS a22, -q23 AS a23,
      |             -q31 AS a31, -q32 AS a32, 1.0-q33 AS a33, r1, r2, r3 FROM m),
      |d AS (SELECT *,
      |    a11*(a22*a33 - a23*a32) - a12*(a21*a33 - a23*a31)
      |      + a13*(a21*a32 - a22*a31) AS det
      |  FROM a),
      |h AS (SELECT
      |    (r1*(a22*a33-a23*a32) - a12*(r2*a33-a23*r3) + a13*(r2*a32-a22*r3)) / det AS h1,
      |    (a11*(r2*a33-a23*r3) - r1*(a21*a33-a23*a31) + a13*(a21*r3-r2*a31)) / det AS h2,
      |    (a11*(a22*r3-r2*a32) - a12*(a21*r3-r2*a31) + r1*(a21*a32-a22*a31)) / det AS h3,
      |    (1.0*(a22*a33-a23*a32) - a12*(1.0*a33-a23*1.0) + a13*(1.0*a32-a22*1.0)) / det AS t1,
      |    (a11*(1.0*a33-a23*1.0) - 1.0*(a21*a33-a23*a31) + a13*(a21*1.0-1.0*a31)) / det AS t2,
      |    (a11*(a22*1.0-1.0*a32) - a12*(a21*1.0-1.0*a31) + 1.0*(a21*a32-a22*a31)) / det AS t3
      |  FROM d)
      |SELECT * FROM (
      |  SELECT 'click' AS state, 'transient' AS kind,
      |    round(h1, 6) AS p_purchase, round(t1, 6) AS expected_steps FROM h
      |  UNION ALL SELECT 'signup', 'transient', round(h2, 6), round(t2, 6) FROM h
      |  UNION ALL SELECT 'view', 'transient', round(h3, 6), round(t3, 6) FROM h
      |  UNION ALL SELECT 'purchase', 'absorbing',
      |    CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
      |  UNION ALL SELECT 'error', 'absorbing',
      |    CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE))
      |ORDER BY state""".stripMargin

  /** Mirrors q201 (`ops.Correlation.q201Spearman`): doubled average
    * ranks (2·cum_below + c + 1, exact integers) from per-source value
    * counts, Pearson on the rank vectors via DECIMAL(38,0) moments,
    * exact one-distinct-value flatness guard. */
  val q201Spearman: String = {
    s"""WITH ${prioCteOver("documents", "pr", ", source")},
       |sig AS (SELECT doc_id, source, priority AS x, n_tokens AS y FROM pr),
       |cx AS (SELECT source, x, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM sig GROUP BY 1, 2),
       |rx AS (SELECT source, x,
       |    2 * CAST(COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      + cnt + 1 AS r2x
       |  FROM cx),
       |cy AS (SELECT source, y, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM sig GROUP BY 1, 2),
       |ry AS (SELECT source, y,
       |    2 * CAST(COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY y
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      + cnt + 1 AS r2y
       |  FROM cy),
       |wr AS (SELECT sig.source, sig.x, sig.y, rx.r2x, ry.r2y
       |  FROM sig JOIN rx ON sig.source = rx.source AND sig.x = rx.x
       |           JOIN ry ON sig.source = ry.source AND sig.y = ry.y),
       |mom AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(r2x) AS DECIMAL(38,0)) AS sx,
       |    CAST(SUM(r2y) AS DECIMAL(38,0)) AS sy,
       |    CAST(SUM(r2x * r2x) AS DECIMAL(38,0)) AS sxx,
       |    CAST(SUM(r2y * r2y) AS DECIMAL(38,0)) AS syy,
       |    CAST(SUM(r2x * r2y) AS DECIMAL(38,0)) AS sxy,
       |    MIN(x) = MAX(x) AS flat_x, MIN(y) = MAX(y) AS flat_y
       |  FROM wr GROUP BY source)
       |SELECT source, n AS n_docs,
       |  round(CASE WHEN NOT flat_x AND NOT flat_y THEN
       |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END, 6) AS rho
       |FROM mom ORDER BY source""".stripMargin
  }

  /** Mirrors q202 (`ops.QualityModel.q202AucHoldout`): the q68 GD
    * replayed over the train+val split only (the q32 md5 boundary:
    * first two md5 hex chars < 'e6'), scores on the test split, exact
    * tie-aware Mann–Whitney AUC per source + __overall. */
  val q202AucHoldout: String = {
    val trained = q68ScoredCtesOver("tfeats",
      """
        |tfeats AS MATERIALIZED (SELECT * FROM feats
        |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'),""".stripMargin)
    s"""$trained,
       |ev AS (SELECT d.source, sc.score, sc.y
       |  FROM sc JOIN documents d ON sc.doc_id = d.doc_id
       |  WHERE substr(md5(CAST(sc.doc_id AS VARCHAR)), 1, 2) >= 'e6'),
       |u AS (SELECT source, score, y FROM ev
       |  UNION ALL SELECT '__overall', score, y FROM ev),
       |c AS (SELECT source, score,
       |    CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS pos,
       |    CAST(SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS neg
       |  FROM u GROUP BY 1, 2),
       |w AS (SELECT *, CAST(COALESCE(SUM(neg) OVER (PARTITION BY source
       |    ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |    0) AS BIGINT) AS cnb FROM c)
       |SELECT source, CAST(SUM(pos) AS BIGINT) AS n_pos,
       |  CAST(SUM(neg) AS BIGINT) AS n_neg,
       |  round(CASE WHEN SUM(pos) > 0 AND SUM(neg) > 0 THEN
       |    CAST(SUM(CAST(pos * (2 * cnb + neg) AS DECIMAL(38,0))) AS DOUBLE)
       |    / (2.0 * CAST(SUM(pos) AS DOUBLE) * CAST(SUM(neg) AS DOUBLE))
       |    END, 6) AS auc
       |FROM w GROUP BY source ORDER BY source""".stripMargin
  }

  /** Mirrors q203 (`ops.Mmr.q203MmrRerank`): q58's BM25 top-30
    * (double-cast order), max-normalized rel, the q28 decimal-exact
    * cosine matrix over the candidates, then the MMR greedy UNROLLED
    * as 10 CTE steps (the q68 iterCtes precedent) — each step picks
    * argmax round(0.7·rel − 0.3·maxsim, 6) with min-doc_id ties. */
  val q203MmrRerank: String = {
    val steps = (2 to 10).map { k =>
      s"""s$k AS (SELECT r.doc_id, r.rel,
         |    round(0.7 * r.rel - 0.3 * COALESCE((SELECT MAX(c.cos)
         |      FROM cosm c, sel${k - 1} s
         |      WHERE (c.d1 = r.doc_id AND c.d2 = s.doc_id)
         |         OR (c.d2 = r.doc_id AND c.d1 = s.doc_id)), 0.0), 6) AS mmr
         |  FROM we r WHERE r.doc_id NOT IN (SELECT doc_id FROM sel${k - 1})
         |  ORDER BY mmr DESC, r.doc_id LIMIT 1),
         |sel$k AS MATERIALIZED (SELECT * FROM sel${k - 1}
         |  UNION ALL SELECT CAST($k AS BIGINT), doc_id, rel, mmr FROM s$k)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $tokCte,
       |d AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl, l FROM tok),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |               CAST(SUM(dl) AS BIGINT) AS n_total FROM d),
       |t AS (SELECT doc_id, dl, unnest(l) AS term FROM d),
       |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM t WHERE term IN ('spark', 'vector', 'merge', 'window')
       |       GROUP BY doc_id, dl, term),
       |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |sc AS (SELECT tf.doc_id,
       |    CAST(round(
       |      round(ln((CAST(tot.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5) /
       |               (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0), 12)
       |      * (CAST(tf.tf AS DOUBLE) * 2.2)
       |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE) /
       |          (CAST(tot.n_total AS DOUBLE) / CAST(tot.n_docs AS DOUBLE)))), 12)
       |      AS DECIMAL(28,12)) AS part
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN tot),
       |topk AS (SELECT doc_id, CAST(SUM(part) AS DOUBLE) AS score
       |  FROM sc GROUP BY doc_id
       |  ORDER BY CAST(SUM(part) AS DOUBLE) DESC, doc_id LIMIT 30),
       |mx AS (SELECT MAX(score) AS m FROM topk),
       |rel AS (SELECT doc_id, round(score / m, 12) AS rel
       |  FROM topk CROSS JOIN mx),
       |we AS MATERIALIZED (SELECT rel.doc_id, rel.rel, e.embedding
       |  FROM rel JOIN embeddings e ON rel.doc_id = e.vec_id),
       |px AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
       |    a.embedding AS ea, b.embedding AS eb
       |  FROM we a JOIN we b ON a.doc_id < b.doc_id),
       |pe AS (SELECT d1, d2, ea, eb,
       |    unnest(generate_series(1, len(ea))) AS i FROM px),
       |dots AS (SELECT d1, d2,
       |  SUM(CAST(CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)
       |    AS DECIMAL(28,18))) AS dot,
       |  SUM(CAST(CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE)
       |    AS DECIMAL(28,18))) AS aa,
       |  SUM(CAST(CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)
       |    AS DECIMAL(28,18))) AS bb
       |  FROM pe GROUP BY d1, d2),
       |cosm AS MATERIALIZED (SELECT d1, d2,
       |  round(CAST(dot AS DOUBLE) /
       |    (sqrt(CAST(aa AS DOUBLE)) * sqrt(CAST(bb AS DOUBLE))), 12) AS cos
       |  FROM dots),
       |s1 AS (SELECT doc_id, rel, round(0.7 * rel, 6) AS mmr FROM we
       |  ORDER BY round(0.7 * rel, 6) DESC, doc_id LIMIT 1),
       |sel1 AS MATERIALIZED (SELECT CAST(1 AS BIGINT) AS rank, doc_id, rel, mmr FROM s1),
       |$steps
       |SELECT rank, doc_id, rel, mmr AS mmr_score FROM sel10
       |ORDER BY rank""".stripMargin
  }

  /** Mirrors q204 (`ops.Correlation.q204KendallTau`): concordant/
    * discordant mass from the aggregated contingency-grid self-join
    * on x-inequality, τ-b tie corrections as exact decimals, double
    * n0 (n(n−1) overflows BIGINT at corpus scale), one rounded-6
    * divide with the flat-signal NULL guard. */
  val q204KendallTau: String = {
    s"""WITH ${prioCteOver("documents", "pr", ", source")},
       |sig AS (SELECT doc_id, source, priority AS x, n_tokens AS y FROM pr),
       |grid AS (SELECT source, x, y, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM sig GROUP BY 1, 2, 3),
       |cd AS (SELECT a.source,
       |    CAST(SUM(CASE WHEN b.y > a.y THEN a.c * b.c ELSE 0 END)
       |      AS DECIMAL(38,0)) AS cc,
       |    CAST(SUM(CASE WHEN b.y < a.y THEN a.c * b.c ELSE 0 END)
       |      AS DECIMAL(38,0)) AS dd
       |  FROM grid a JOIN grid b ON a.source = b.source AND a.x < b.x
       |  GROUP BY a.source),
       |base AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
       |    MIN(x) = MAX(x) AS flat_x, MIN(y) = MAX(y) AS flat_y
       |  FROM grid GROUP BY source),
       |tx AS (SELECT source,
       |    CAST(SUM(CAST(t * (t - 1) / 2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS n1
       |  FROM (SELECT source, x, CAST(SUM(c) AS BIGINT) AS t
       |        FROM grid GROUP BY 1, 2) GROUP BY source),
       |ty AS (SELECT source,
       |    CAST(SUM(CAST(t * (t - 1) / 2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS n2
       |  FROM (SELECT source, y, CAST(SUM(c) AS BIGINT) AS t
       |        FROM grid GROUP BY 1, 2) GROUP BY source)
       |SELECT base.source, base.n AS n_docs,
       |  round(CASE WHEN NOT flat_x AND NOT flat_y THEN
       |    (CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE)) /
       |    sqrt((CAST(base.n AS DOUBLE) * (CAST(base.n AS DOUBLE) - 1.0) / 2.0
       |        - CAST(n1 AS DOUBLE))
       |      * (CAST(base.n AS DOUBLE) * (CAST(base.n AS DOUBLE) - 1.0) / 2.0
       |        - CAST(n2 AS DOUBLE))) END, 6) AS tau_b
       |FROM base LEFT JOIN cd USING (source)
       |JOIN tx USING (source) JOIN ty USING (source)
       |ORDER BY base.source""".stripMargin
  }

  /** Mirrors q205 (`ops.KnnGraph.q205MutualKnnCells`): the 100 TB
    * mutual-kNN dataflow replayed END TO END from the persisted
    * grid-snapped centroid table — integer-argmin cell assignment (the
    * q81 recipe), candidate pairs restricted to cell co-residents,
    * within-cell exact decimal cosines (the q177 recipe), per-src rank
    * ≤ 5, mutual join. The oracle carries the same cross-cell misses
    * the engine's approximation accepts — that's the point: the
    * approximate SEMANTICS are what's being hash-proven. */
  val q205MutualKnnCells: String =
    s"""WITH ${kmeansAssignCtes(graft.ops.KnnGraph.CellCentroidsPath)},
       |asg AS (SELECT e.vec_id, CAST(COALESCE(r.cluster, 0) AS INT) AS cell
       |  FROM e LEFT JOIN r ON e.vec_id = r.vec_id AND r.rn = 1),
       |norms AS (SELECT vec_id,
       |    SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
       |      AS DECIMAL(28,18))) AS n2
       |  FROM x GROUP BY vec_id),
       |pairs AS (SELECT a.vec_id AS src, b.vec_id AS dst,
       |    a.embedding AS ea, b.embedding AS eb
       |  FROM e a JOIN e b ON a.vec_id <> b.vec_id
       |  JOIN asg ca ON ca.vec_id = a.vec_id
       |  JOIN asg cb ON cb.vec_id = b.vec_id AND ca.cell = cb.cell),
       |pe AS (SELECT src, dst, ea, eb,
       |    unnest(generate_series(1, len(ea))) AS i FROM pairs),
       |dots AS (SELECT src, dst,
       |    SUM(CAST(CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)
       |      AS DECIMAL(28,18))) AS dot
       |  FROM pe GROUP BY 1, 2),
       |scored AS (SELECT d.src, d.dst,
       |    round(CAST(d.dot AS DOUBLE) /
       |      (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 12) AS cos
       |  FROM dots d
       |  JOIN norms na ON d.src = na.vec_id
       |  JOIN norms nb ON d.dst = nb.vec_id),
       |ranked AS (SELECT src, dst, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY src
       |      ORDER BY cos DESC, dst) AS BIGINT) AS rank
       |  FROM scored WHERE NOT isnan(cos)),
       |top AS (SELECT * FROM ranked WHERE rank <= 5)
       |SELECT f.src AS v1, f.dst AS v2, f.cos AS cos,
       |  f.rank AS rank_fwd, g.rank AS rank_rev
       |FROM top f JOIN top g ON f.src = g.dst AND f.dst = g.src AND f.src < f.dst
       |ORDER BY v1, v2""".stripMargin

  /** Mirrors q206 (`ops.Quantize.q206SemanticDedupCells`): SemDeDup-in-
    * cells replayed end to end — grid-argmin cell assignment from the
    * persisted centroid sidecar, q47's int8 quantization, candidate
    * pairs restricted to cell co-residents, the integer-exact
    * cross-multiplied cosine ≥ 0.45 test, keeper aggregation. */
  val q206SemanticDedupCells: String =
    s"""WITH ${kmeansAssignCtes(graft.ops.Quantize.SemDedupCellCentroidsPath)},
       |asg AS (SELECT e.vec_id, CAST(COALESCE(r.cluster, 0) AS INT) AS cell
       |  FROM e LEFT JOIN r ON e.vec_id = r.vec_id AND r.rn = 1),
       |m AS (SELECT vec_id, MAX(abs(CAST(embedding[i] AS DOUBLE))) AS maxabs
       |      FROM x GROUP BY vec_id),
       |qx AS (SELECT x.vec_id, x.i,
       |         CASE WHEN m.maxabs > 0
       |              THEN CAST(floor(CAST(x.embedding[x.i] AS DOUBLE) /
       |                     (m.maxabs / CAST(127 AS DOUBLE)) + 0.5) AS BIGINT)
       |              ELSE 0 END AS qi
       |       FROM x JOIN m ON x.vec_id = m.vec_id),
       |n AS (SELECT vec_id, CAST(SUM(qi * qi) AS BIGINT) AS n2 FROM qx GROUP BY vec_id),
       |dots AS (SELECT a.vec_id AS v1, b.vec_id AS v2,
       |           CAST(SUM(a.qi * b.qi) AS BIGINT) AS dot
       |         FROM qx a JOIN qx b ON a.i = b.i AND a.vec_id < b.vec_id
       |         JOIN asg ca ON ca.vec_id = a.vec_id
       |         JOIN asg cb ON cb.vec_id = b.vec_id AND ca.cell = cb.cell
       |         GROUP BY 1, 2),
       |sim AS (SELECT v1, v2 FROM dots
       |        JOIN n na ON v1 = na.vec_id
       |        JOIN n nb ON v2 = nb.vec_id
       |        WHERE dot > 0 AND 400 * dot * dot >= 81 * na.n2 * nb.n2)
       |SELECT v2 AS vec_id, MIN(v1) AS keeper_id, COUNT(*) AS n_better
       |FROM sim
       |GROUP BY v2
       |ORDER BY vec_id""".stripMargin

  /** Mirrors q207 (`ops.ExactSubstring.q207ExactSubstring`): the
    * DEFINITION, not the algorithm — every length-50 character window
    * whose exact string occurs ≥ 2 times in the corpus, merged into
    * maximal per-doc spans (gap ≤ 50 between duplicated starts). The
    * engine's rolling-hash prefilter + exact verify must land on the
    * same set or the hash breaks — a hash-collision false positive
    * would surface here, not hide. */
  val q207ExactSubstring: String =
    """WITH d AS (SELECT doc_id, text FROM documents),
      |w AS (SELECT doc_id, unnest(generate_series(1, len(text) - 49)) AS pos, text
      |  FROM d),
      |s AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |    substr(text, CAST(pos AS INT), 50) AS win FROM w),
      |dup AS (SELECT win FROM s GROUP BY win HAVING COUNT(*) >= 2),
      |hits AS (SELECT doc_id, pos FROM s JOIN dup USING (win)),
      |isl AS (SELECT doc_id, pos,
      |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 50
      |      THEN 0 ELSE 1 END AS brk
      |  FROM hits),
      |g AS (SELECT doc_id, pos,
      |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM isl)
      |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
      |  CAST(MAX(pos) + 50 - MIN(pos) AS BIGINT) AS span_len,
      |  CAST(COUNT(*) AS BIGINT) AS n_windows
      |FROM g GROUP BY doc_id, grp
      |ORDER BY doc_id, span_start""".stripMargin

  /** Mirrors q208 (`ops.Clustering.q208ClusteringAgreement`): the q81
    * assignment replay from q208's persisted centroids, the (cluster ×
    * label) contingency grid, then ARI/NMI — C(x,2) as halve-the-even-
    * factor integer products widened to DECIMAL(38,0), log terms
    * rounded 12 and decimal-summed (the q182 recipe), final divisions
    * rounded 6 with the degenerate-partition NULL guards. */
  val q208ClusteringAgreement: String =
    s"""WITH ${kmeansAssignCtes(graft.ops.Clustering.AgreementCentroidsPath)},
       |asg AS (SELECT e.vec_id, CAST(COALESCE(r.cluster, 0) AS INT) AS cluster
       |  FROM e LEFT JOIN r ON e.vec_id = r.vec_id AND r.rn = 1),
       |grid AS (SELECT asg.cluster, emb.label, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM asg JOIN embeddings emb ON asg.vec_id = emb.vec_id
       |  GROUP BY 1, 2),
       |a AS (SELECT cluster, CAST(SUM(c) AS BIGINT) AS ai FROM grid GROUP BY 1),
       |b AS (SELECT label, CAST(SUM(c) AS BIGINT) AS bj FROM grid GROUP BY 1),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN c % 2 = 0
       |      THEN CAST(c // 2 AS DECIMAL(19,0)) * CAST(c - 1 AS DECIMAL(19,0))
       |      ELSE CAST(c AS DECIMAL(19,0)) * CAST((c - 1) // 2 AS DECIMAL(19,0))
       |      END) AS DECIMAL(38,0)) AS sum_nij2
       |  FROM grid),
       |sa AS (SELECT CAST(SUM(CASE WHEN ai % 2 = 0
       |      THEN CAST(ai // 2 AS DECIMAL(19,0)) * CAST(ai - 1 AS DECIMAL(19,0))
       |      ELSE CAST(ai AS DECIMAL(19,0)) * CAST((ai - 1) // 2 AS DECIMAL(19,0))
       |      END) AS DECIMAL(38,0)) AS sum_a2,
       |    CAST(COUNT(*) AS BIGINT) AS n_clusters FROM a),
       |sb AS (SELECT CAST(SUM(CASE WHEN bj % 2 = 0
       |      THEN CAST(bj // 2 AS DECIMAL(19,0)) * CAST(bj - 1 AS DECIMAL(19,0))
       |      ELSE CAST(bj AS DECIMAL(19,0)) * CAST((bj - 1) // 2 AS DECIMAL(19,0))
       |      END) AS DECIMAL(38,0)) AS sum_b2,
       |    CAST(COUNT(*) AS BIGINT) AS n_labels FROM b),
       |mi AS (SELECT CAST(SUM(CAST(round(
       |      (CAST(g.c AS DOUBLE) / CAST(tot.n AS DOUBLE)) *
       |      ln(CAST(tot.n AS DOUBLE) * CAST(g.c AS DOUBLE) /
       |        (CAST(a.ai AS DOUBLE) * CAST(b.bj AS DOUBLE))), 12)
       |      AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS i_uv
       |  FROM grid g JOIN a USING (cluster) JOIN b USING (label) CROSS JOIN tot),
       |hu AS (SELECT CAST(SUM(CAST(round(
       |      -(CAST(ai AS DOUBLE) / CAST(tot.n AS DOUBLE)) *
       |      ln(CAST(ai AS DOUBLE) / CAST(tot.n AS DOUBLE)), 12)
       |      AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS h_ai
       |  FROM a CROSS JOIN tot),
       |hv AS (SELECT CAST(SUM(CAST(round(
       |      -(CAST(bj AS DOUBLE) / CAST(tot.n AS DOUBLE)) *
       |      ln(CAST(bj AS DOUBLE) / CAST(tot.n AS DOUBLE)), 12)
       |      AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS h_bj
       |  FROM b CROSS JOIN tot),
       |fin AS (SELECT tot.n, sa.n_clusters, sb.n_labels, tot.sum_nij2,
       |    sa.sum_a2, sb.sum_b2, mi.i_uv, hu.h_ai, hv.h_bj,
       |    round(CAST(sa.sum_a2 AS DOUBLE) * CAST(sb.sum_b2 AS DOUBLE) /
       |      CAST(CASE WHEN tot.n % 2 = 0
       |        THEN CAST(tot.n // 2 AS DECIMAL(19,0)) * CAST(tot.n - 1 AS DECIMAL(19,0))
       |        ELSE CAST(tot.n AS DECIMAL(19,0)) * CAST((tot.n - 1) // 2 AS DECIMAL(19,0))
       |        END AS DOUBLE), 12) AS exp_idx,
       |    (CAST(sa.sum_a2 AS DOUBLE) + CAST(sb.sum_b2 AS DOUBLE)) / 2.0 AS max_idx
       |  FROM tot CROSS JOIN sa CROSS JOIN sb CROSS JOIN mi
       |  CROSS JOIN hu CROSS JOIN hv)
       |SELECT CAST(n AS BIGINT) AS n_vectors, n_clusters, n_labels,
       |  CASE WHEN max_idx <> exp_idx THEN
       |    round((CAST(sum_nij2 AS DOUBLE) - exp_idx) / (max_idx - exp_idx), 6)
       |  END AS ari,
       |  CASE WHEN CAST(h_ai AS DOUBLE) * CAST(h_bj AS DOUBLE) > 0.0 THEN
       |    round(CAST(i_uv AS DOUBLE) /
       |      sqrt(CAST(h_ai AS DOUBLE) * CAST(h_bj AS DOUBLE)), 6)
       |  END AS nmi
       |FROM fin""".stripMargin

  /** Mirrors q209 (`ops.Mixing.q209RakingMix`): all 10 IPF iterations
    * unrolled as MATERIALIZED CTEs (the q203 lesson — inlining
    * explodes), each a row-rescale then a column-rescale: marginal =
    * decimal sum of round-12 w·c terms, scale = round12((n/T)/m),
    * update = round12(w·scale) — the exact double-op order the engine's
    * driver loop executes. */
  val q209RakingMix: String = {
    val iterations = (1 to 10).map { t =>
      s"""rm$t AS MATERIALIZED (SELECT source,
         |    SUM(CAST(round(w * c, 12) AS DECIMAL(28,12))) AS m
         |  FROM w${t - 1} GROUP BY source),
         |wr$t AS MATERIALIZED (SELECT g.source, g.lang, g.c,
         |    round(g.w * round((CAST(tot.n AS DOUBLE) / CAST(tot.r AS DOUBLE))
         |      / CAST(rm$t.m AS DOUBLE), 12), 12) AS w
         |  FROM w${t - 1} g JOIN rm$t USING (source) CROSS JOIN tot),
         |cm$t AS MATERIALIZED (SELECT lang,
         |    SUM(CAST(round(w * c, 12) AS DECIMAL(28,12))) AS m
         |  FROM wr$t GROUP BY lang),
         |w$t AS MATERIALIZED (SELECT g.source, g.lang, g.c,
         |    round(g.w * round((CAST(tot.n AS DOUBLE) / CAST(tot.l AS DOUBLE))
         |      / CAST(cm$t.m AS DOUBLE), 12), 12) AS w
         |  FROM wr$t g JOIN cm$t USING (lang) CROSS JOIN tot)""".stripMargin
    }.mkString(",\n")
    s"""WITH grid AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM documents GROUP BY 1, 2),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
       |    CAST(COUNT(DISTINCT source) AS BIGINT) AS r,
       |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS l FROM grid),
       |w0 AS (SELECT source, lang, c, CAST(1.0 AS DOUBLE) AS w FROM grid),
       |$iterations
       |SELECT g.source, g.lang, g.c AS n_docs,
       |  round(g.w, 6) AS weight,
       |  round(g.w * g.c / CAST(tot.n AS DOUBLE), 6) AS eff_share
       |FROM w10 g CROSS JOIN tot
       |ORDER BY g.source, g.lang""".stripMargin
  }

  /** Mirrors q210 (`ops.ChangePoint.q210BurstDetection`): the forward
    * burst DP replayed as a recursive CTE over the per-type day index —
    * rounded-12 emissions/γ held as exact DECIMAL(28,12), adds and
    * LEAST re-cast to the same type each step so the recursion's cost
    * columns stay bit-identical to the engine's BigDecimal loop. */
  val q210BurstDetection: String =
    """WITH RECURSIVE ev AS (SELECT event_type,
      |    epoch_ns(ts) // 86400000000000 AS day FROM events),
      |cnt AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM ev GROUP BY 1, 2),
      |days AS (SELECT DISTINCT day FROM cnt),
      |types AS (SELECT DISTINCT event_type FROM cnt),
      |grid AS (SELECT t.event_type, d.day, COALESCE(c.x, 0) AS x
      |  FROM types t CROSS JOIN days d
      |  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.day = d.day),
      |idx AS (SELECT event_type, day, x,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
      |      AS BIGINT) AS i
      |  FROM grid),
      |par AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
      |    round(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 12) AS lam0
      |  FROM idx GROUP BY 1),
      |par2 AS (SELECT event_type, nd, lam0,
      |    round(2.0 * lam0, 12) AS lam1,
      |    CAST(round(ln(CAST(nd AS DOUBLE)), 12) AS DECIMAL(28,12)) AS gam
      |  FROM par WHERE lam0 > 0),
      |em AS (SELECT i.event_type, i.i, i.day, i.x,
      |    CAST(round(p.lam0 - CAST(i.x AS DOUBLE) * ln(p.lam0), 12)
      |      AS DECIMAL(28,12)) AS e0,
      |    CAST(round(p.lam1 - CAST(i.x AS DOUBLE) * ln(p.lam1), 12)
      |      AS DECIMAL(28,12)) AS e1,
      |    p.gam
      |  FROM idx i JOIN par2 p USING (event_type)),
      |dp AS (
      |  SELECT event_type, i, day, x,
      |    CAST(e0 AS DECIMAL(28,12)) AS c0,
      |    CAST(gam + e1 AS DECIMAL(28,12)) AS c1
      |  FROM em WHERE i = 1
      |  UNION ALL
      |  SELECT em.event_type, em.i, em.day, em.x,
      |    CAST(LEAST(dp.c0, dp.c1) + em.e0 AS DECIMAL(28,12)) AS c0,
      |    CAST(LEAST(dp.c0 + em.gam, dp.c1) + em.e1 AS DECIMAL(28,12)) AS c1
      |  FROM dp JOIN em ON em.event_type = dp.event_type AND em.i = dp.i + 1
      |)
      |SELECT event_type, day, x,
      |  round(CAST(c0 AS DOUBLE), 6) AS cost_base,
      |  round(CAST(c1 AS DOUBLE), 6) AS cost_burst,
      |  c1 < c0 AS burst_now
      |FROM dp
      |ORDER BY event_type, day""".stripMargin

  /** Mirrors q211 (`ops.Dedup.q211DedupGrowth`): md5 fingerprint →
    * first-occurrence doc_id, seen-before = later copy, per-batch and
    * cumulative rates (the cumulative window runs over the ≤|batches|
    * frame). */
  val q211DedupGrowth: String =
    """WITH d AS (SELECT doc_id, doc_id // 50 AS batch, md5(text) AS m
      |  FROM documents),
      |f AS (SELECT m, MIN(doc_id) AS first_id FROM d GROUP BY m),
      |fl AS (SELECT d.batch,
      |    CASE WHEN d.doc_id > f.first_id THEN 1 ELSE 0 END AS dup
      |  FROM d JOIN f USING (m)),
      |per AS (SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(dup) AS BIGINT) AS n_dup
      |  FROM fl GROUP BY batch),
      |c AS (SELECT batch, n_docs, n_dup,
      |    CAST(SUM(n_docs) OVER (ORDER BY batch) AS BIGINT) AS cd,
      |    CAST(SUM(n_dup) OVER (ORDER BY batch) AS BIGINT) AS cdup
      |  FROM per)
      |SELECT batch, n_docs, n_dup,
      |  round(CAST(n_dup AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS dup_rate,
      |  round(CAST(cdup AS DOUBLE) / CAST(cd AS DOUBLE), 6) AS cum_dup_rate
      |FROM c ORDER BY batch""".stripMargin

  /** Mirrors q214 (`ops.RobustStats.q214RobustMeans`): exact order
    * statistics from the aggregated (source, token-count) histogram —
    * per-value retained-copy overlap arithmetic for the trimmed sum,
    * rank-(k+1)/(n−k) clamps for the winsorized one. */
  val q214RobustMeans: String =
    """WITH h AS (SELECT source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS v
      |  FROM documents),
      |g AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c FROM h GROUP BY 1, 2),
      |t AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(SUM(CAST(v AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
      |      AS DECIMAL(38,0)) AS sv
      |  FROM g GROUP BY 1),
      |cu AS (SELECT g.source, g.v, g.c, t.n,
      |    CAST(SUM(g.c) OVER (PARTITION BY g.source ORDER BY g.v) AS BIGINT) AS cum,
      |    (t.n * 1) // 10 AS k
      |  FROM g JOIN t USING (source)),
      |cl AS (SELECT source, MIN(CASE WHEN cum >= k + 1 THEN v END) AS v_lo,
      |    MIN(CASE WHEN cum >= n - k THEN v END) AS v_hi
      |  FROM cu GROUP BY source),
      |r AS (SELECT source, CAST(SUM(
      |    CAST(GREATEST(LEAST(cum, n - k) - GREATEST(cum - c + 1, k + 1) + 1, 0)
      |      AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sr,
      |    MIN(k) AS k
      |  FROM cu GROUP BY source)
      |SELECT t.source, t.n AS n_docs,
      |  round(CAST(t.sv AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS mean,
      |  round(CAST(r.sr AS DOUBLE) / CAST(t.n - 2 * r.k AS DOUBLE), 6)
      |    AS trimmed_mean,
      |  round((CAST(r.sr AS DOUBLE) + CAST(r.k AS DOUBLE) * CAST(cl.v_lo AS DOUBLE)
      |      + CAST(r.k AS DOUBLE) * CAST(cl.v_hi AS DOUBLE))
      |    / CAST(t.n AS DOUBLE), 6) AS winsorized_mean
      |FROM t JOIN cl USING (source) JOIN r USING (source)
      |ORDER BY t.source""".stripMargin

  /** Mirrors q215 (`ops.ChangePoint.q215MannKendall`): the pair-sign
    * sum over the zero-filled day grid, tie-corrected variance from
    * value multiplicities, continuity-corrected z. */
  val q215MannKendall: String =
    """WITH ev AS (SELECT event_type,
      |    epoch_ns(ts) // 86400000000000 AS day FROM events),
      |cnt AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM ev GROUP BY 1, 2),
      |days AS (SELECT DISTINCT day FROM cnt),
      |types AS (SELECT DISTINCT event_type FROM cnt),
      |grid AS (SELECT t.event_type, d.day, COALESCE(c.x, 0) AS x
      |  FROM types t CROSS JOIN days d
      |  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.day = d.day),
      |s AS (SELECT a.event_type, CAST(SUM(CASE WHEN b.x > a.x THEN 1
      |      WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      |  FROM grid a JOIN grid b
      |    ON a.event_type = b.event_type AND a.day < b.day
      |  GROUP BY 1),
      |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM grid GROUP BY 1),
      |ti AS (SELECT event_type, CAST(SUM(CAST(t AS DECIMAL(12,0)) *
      |      CAST(t - 1 AS DECIMAL(12,0)) * CAST(2 * t + 5 AS DECIMAL(13,0)))
      |      AS DECIMAL(38,0)) AS tie_term
      |  FROM (SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS t
      |        FROM grid GROUP BY 1, 2) GROUP BY 1),
      |f AS (SELECT n.event_type, n.n, s.s_stat,
      |    CAST(CAST(n.n AS DECIMAL(12,0)) * CAST(n.n - 1 AS DECIMAL(12,0)) *
      |      CAST(2 * n.n + 5 AS DECIMAL(13,0)) AS DECIMAL(38,0))
      |      - ti.tie_term AS var_num
      |  FROM n JOIN s USING (event_type) JOIN ti USING (event_type)),
      |f2 AS (SELECT *, round(CAST(var_num AS DOUBLE) / 18.0, 12) AS var_s FROM f)
      |SELECT event_type, n AS n_days, s_stat,
      |  round(var_s, 6) AS var_s,
      |  CASE WHEN var_s <= 0.0 THEN NULL ELSE round(
      |    (CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
      |          WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
      |          ELSE 0.0 END) / sqrt(var_s), 6) END AS z,
      |  CASE WHEN (CASE WHEN var_s <= 0.0 THEN NULL ELSE round(
      |      (CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
      |            WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
      |            ELSE 0.0 END) / sqrt(var_s), 6) END) > 1.96 THEN 'up'
      |    WHEN (CASE WHEN var_s <= 0.0 THEN NULL ELSE round(
      |      (CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
      |            WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
      |            ELSE 0.0 END) / sqrt(var_s), 6) END) < -1.96 THEN 'down'
      |    ELSE 'none' END AS trend
      |FROM f2
      |ORDER BY event_type""".stripMargin

  /** Mirrors q212 (`ops.PowerIteration.q212LeadingPc`): all 10 power
    * iterations unrolled — per-vector dot, per-dim accumulation, mean
    * correction, normalization — every sum a decimal sum of rounded-12
    * terms and every derived scalar rounded 12 before reuse, exactly
    * the engine's driver-loop arithmetic. The eigenvector lives as a
    * 64-row (d, v) CTE instead of the engine's literal array — same
    * numbers. */
  val q212LeadingPc: String = {
    val iterations = (1 to 10).map { t =>
      s"""si$t AS MATERIALIZED (SELECT x.vec_id,
         |    CAST(SUM(CAST(round(CAST(x.embedding[x.i] AS DOUBLE) * vv.v, 12)
         |      AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS si
         |  FROM x JOIN v${t - 1} vv ON vv.d = x.i GROUP BY x.vec_id),
         |z$t AS MATERIALIZED (SELECT CAST(x.i AS BIGINT) AS d,
         |    CAST(SUM(CAST(round(CAST(x.embedding[x.i] AS DOUBLE) *
         |      CAST(s.si AS DOUBLE), 12) AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS z
         |  FROM x JOIN si$t s USING (vec_id) GROUP BY x.i),
         |mv$t AS MATERIALIZED (SELECT CAST(SUM(CAST(round(m.mean * vv.v, 12)
         |      AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS mv
         |  FROM mdim m JOIN v${t - 1} vv USING (d)),
         |raw$t AS MATERIALIZED (SELECT z.d,
         |    round(round(CAST(z.z AS DOUBLE) / tot.n, 12)
         |      - round(m.mean * CAST(mv.mv AS DOUBLE), 12), 12) AS raw
         |  FROM z$t z JOIN mdim m USING (d) CROSS JOIN mv$t mv CROSS JOIN tot),
         |nr$t AS MATERIALIZED (SELECT sqrt(CAST(SUM(CAST(round(raw * raw, 12)
         |      AS DECIMAL(28,12))) AS DOUBLE)) AS nrm FROM raw$t),
         |v$t AS MATERIALIZED (SELECT d, round(raw / nr.nrm, 12) AS v
         |  FROM raw$t CROSS JOIN nr$t nr)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) > 0),
       |x AS (SELECT vec_id, embedding,
       |    unnest(generate_series(1, len(embedding))) AS i FROM e),
       |tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    CAST(MAX(len(embedding)) AS BIGINT) AS dims FROM e),
       |mdim AS (SELECT CAST(x.i AS BIGINT) AS d,
       |    round(CAST(SUM(CAST(round(CAST(x.embedding[x.i] AS DOUBLE), 12)
       |      AS DECIMAL(28,12))) AS DOUBLE) / ANY_VALUE(tot.n), 12) AS mean,
       |    CAST(SUM(CAST(round(CAST(x.embedding[x.i] AS DOUBLE) *
       |      CAST(x.embedding[x.i] AS DOUBLE), 12) AS DECIMAL(28,12)))
       |      AS DECIMAL(28,12)) AS sxx
       |  FROM x CROSS JOIN tot GROUP BY x.i),
       |vard AS (SELECT d,
       |    round(round(CAST(sxx AS DOUBLE) / tot.n, 12)
       |      - round(mean * mean, 12), 12) AS var_d
       |  FROM mdim CROSS JOIN tot),
       |tr AS (SELECT CAST(SUM(CAST(round(var_d, 12) AS DECIMAL(28,12)))
       |      AS DOUBLE) AS trace FROM vard),
       |v0 AS (SELECT CAST(unnest(generate_series(1, dims)) AS BIGINT) AS d,
       |    round(1.0 / sqrt(CAST(dims AS DOUBLE)), 12) AS v FROM tot),
       |$iterations,
       |lam AS (SELECT round(nrm, 12) AS lambda FROM nr10)
       |SELECT v.d AS dim, round(m.mean, 6) AS mean, round(v.v, 6) AS loading,
       |  round(lam.lambda, 6) AS eigenvalue,
       |  round(round(lam.lambda / tr.trace, 12), 6) AS explained_frac
       |FROM v10 v JOIN mdim m USING (d) CROSS JOIN lam CROSS JOIN tr
       |ORDER BY dim""".stripMargin
  }

  /** Mirrors q213 (`ops.Estimation.q213HtEstimate`): the md5-mod
    * stratified design replayed (small strata whole, big 1-in-4), HT
    * totals as exact integer Σ y·rate, relative error round 6. */
  val q213HtEstimate: String =
    """WITH d AS (SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS y
      |  FROM documents),
      |t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_true,
      |    CAST(SUM(y) AS BIGINT) AS tokens_true
      |  FROM d GROUP BY 1),
      |wr AS (SELECT d.doc_id, d.source, d.y, t.n_true, t.tokens_true,
      |    CASE WHEN t.n_true <= 20 THEN 1 ELSE 4 END AS rate
      |  FROM d JOIN t USING (source)),
      |sm AS (SELECT * FROM wr
      |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
      |    % rate = 0)
      |SELECT source, MAX(n_true) AS n_true, MAX(tokens_true) AS tokens_true,
      |  CAST(COUNT(*) AS BIGINT) AS n_sampled,
      |  CAST(MAX(rate) AS BIGINT) AS rate,
      |  CAST(COUNT(*) * MAX(rate) AS BIGINT) AS ht_docs,
      |  CAST(SUM(y * rate) AS BIGINT) AS ht_tokens,
      |  round(CAST(abs(SUM(y * rate) - MAX(tokens_true)) AS DOUBLE)
      |    / CAST(MAX(tokens_true) AS DOUBLE), 6) AS rel_err_tokens
      |FROM sm GROUP BY source ORDER BY source""".stripMargin

  /** Mirrors q216 (`ops.Profile.q216TableProfile`): melt the six
    * exact-typed lineitem columns to (col_name, value-string) rows,
    * aggregate once, derive counts/distincts/mode (ties to the smaller
    * string) from the grid. */
  val q216TableProfile: String = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_returnflag", "l_linestatus")
    val melt = cols.map(c =>
      s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS v FROM lineitem")
      .mkString("\n  UNION ALL ")
    s"""WITH m AS ($melt),
       |grid AS (SELECT col_name, v, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM m GROUP BY 1, 2)
       |SELECT col_name,
       |  CAST(SUM(c) AS BIGINT) AS n_rows,
       |  CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN c END), 0) AS BIGINT)
       |    AS n_null,
       |  CAST(COUNT(CASE WHEN v IS NOT NULL THEN 1 END) AS BIGINT)
       |    AS n_distinct,
       |  MIN(CASE WHEN v IS NOT NULL THEN {'negc': -c, 'tv': v} END)['tv']
       |    AS top_value,
       |  -MIN(CASE WHEN v IS NOT NULL THEN {'negc': -c, 'tv': v} END)['negc']
       |    AS top_count
       |FROM grid GROUP BY col_name
       |ORDER BY col_name""".stripMargin
  }

  /** Mirrors q217 (`ops.Vocabulary.q217VocabRichness`): term counts →
    * frequency-of-frequencies → Good–Turing P₀ and Chao1, N₂ = 0 →
    * NULL. */
  val q217VocabRichness: String =
    """WITH tf AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS r
      |  FROM (SELECT source,
      |      unnest(regexp_extract_all(lower(text), '\S+')) AS w
      |    FROM documents) GROUP BY 1, 2),
      |fof AS (SELECT source, r, CAST(COUNT(*) AS BIGINT) AS nr
      |  FROM tf GROUP BY 1, 2)
      |SELECT source, CAST(SUM(nr) AS BIGINT) AS v_observed,
      |  CAST(CAST(SUM(CAST(r AS DECIMAL(19,0)) * CAST(nr AS DECIMAL(19,0)))
      |    AS DECIMAL(38,0)) AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(SUM(CASE WHEN r = 1 THEN nr END), 0) AS BIGINT) AS n_hapax,
      |  CAST(COALESCE(SUM(CASE WHEN r = 2 THEN nr END), 0) AS BIGINT) AS n_dis,
      |  round(CAST(COALESCE(SUM(CASE WHEN r = 1 THEN nr END), 0) AS DOUBLE)
      |    / CAST(SUM(CAST(r AS DECIMAL(19,0)) * CAST(nr AS DECIMAL(19,0)))
      |        AS DOUBLE), 6) AS p0_unseen,
      |  CASE WHEN COALESCE(SUM(CASE WHEN r = 2 THEN nr END), 0) > 0 THEN
      |    round(CAST(SUM(nr) AS DOUBLE)
      |      + CAST(COALESCE(SUM(CASE WHEN r = 1 THEN nr END), 0) AS DOUBLE)
      |        * CAST(COALESCE(SUM(CASE WHEN r = 1 THEN nr END), 0) AS DOUBLE)
      |        / (2.0 * CAST(COALESCE(SUM(CASE WHEN r = 2 THEN nr END), 0)
      |            AS DOUBLE)), 6)
      |  END AS chao1
      |FROM fof GROUP BY source
      |ORDER BY source""".stripMargin

  /** Mirrors q218 (`ops.Agreement.q218LabelerKappa`): the two verdict
    * trees (token count ≥ 30; nChr/max(nTok,1) ≤ 6), the per-source
    * 2×2 grid, κ with decimal-widened marginal products and the
    * pe = 1 NULL guard. */
  val q218LabelerKappa: String =
    """WITH v AS (SELECT source,
      |    CASE WHEN CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) >= 30
      |      THEN 1 ELSE 0 END AS a,
      |    CASE WHEN CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
      |        / GREATEST(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE),
      |          1.0) <= 6.0
      |      THEN 1 ELSE 0 END AS b
      |  FROM documents),
      |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(a) AS BIGINT) AS a1, CAST(SUM(b) AS BIGINT) AS b1,
      |    CAST(SUM(a * b) AS BIGINT) AS n11
      |  FROM v GROUP BY 1),
      |k AS (SELECT source, n, a1, b1, n11,
      |    round(CAST(n11 * 2 + n - a1 - b1 AS DOUBLE) / CAST(n AS DOUBLE), 12)
      |      AS po,
      |    round(CAST(CAST(a1 AS DECIMAL(19,0)) * CAST(b1 AS DECIMAL(19,0))
      |        + CAST(n - a1 AS DECIMAL(19,0)) * CAST(n - b1 AS DECIMAL(19,0))
      |        AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 12) AS pe
      |  FROM g)
      |SELECT source, n AS n_docs, round(po, 6) AS p_o, round(pe, 6) AS p_e,
      |  CASE WHEN pe <> 1.0 THEN round((po - pe) / (1.0 - pe), 6) END AS kappa
      |FROM k ORDER BY source""".stripMargin

  /** Mirrors q219 (`ops.ChangePoint.q219TheilSen`): pairwise slopes
    * rounded 12, aggregated by value, lower median at rank
    * (n+1) DIV 2 from the cumulative distinct-slope frame. */
  val q219TheilSen: String =
    """WITH ev AS (SELECT event_type,
      |    epoch_ns(ts) // 86400000000000 AS day FROM events),
      |cnt AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM ev GROUP BY 1, 2),
      |days AS (SELECT DISTINCT day FROM cnt),
      |types AS (SELECT DISTINCT event_type FROM cnt),
      |grid AS (SELECT t.event_type, d.day, COALESCE(c.x, 0) AS x
      |  FROM types t CROSS JOIN days d
      |  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.day = d.day),
      |sl AS (SELECT a.event_type,
      |    round(CAST(b.x - a.x AS DOUBLE) / CAST(b.day - a.day AS DOUBLE), 12)
      |      AS sl, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM grid a JOIN grid b
      |    ON a.event_type = b.event_type AND a.day < b.day
      |  GROUP BY 1, 2),
      |cu AS (SELECT event_type, sl, c,
      |    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY sl) AS BIGINT)
      |      AS cum,
      |    CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS np
      |  FROM sl)
      |SELECT event_type, MIN(np) AS n_pairs,
      |  round(MIN(CASE WHEN cum >= (np + 1) // 2 THEN sl END), 6)
      |    AS median_slope
      |FROM cu GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Mirrors q220 (`ops.TimeSeries.q220StationaryDist`): the q115
    * transition counts, the damped S×S matrix (dangling rows uniform),
    * and all 20 power-iteration updates unrolled as MATERIALIZED CTEs
    * — decimal sums of rounded-12 π·p terms, update rounded 12. */
  val q220StationaryDist: String = {
    val iterations = (1 to 20).map { t =>
      s"""ti$t AS MATERIALIZED (SELECT pm.j AS state,
         |    CAST(SUM(CAST(round(pi.pi * pm.p, 12) AS DECIMAL(28,12)))
         |      AS DECIMAL(28,12)) AS t
         |  FROM pm JOIN pi${t - 1} pi ON pi.state = pm.i GROUP BY pm.j),
         |pi$t AS MATERIALIZED (SELECT state,
         |    round(0.15 / CAST(tot.s AS DOUBLE) + 0.85 * CAST(t AS DOUBLE), 12)
         |      AS pi
         |  FROM ti$t CROSS JOIN tot)""".stripMargin
    }.mkString(",\n")
    s"""WITH o AS (SELECT event_type AS cur,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS nxt
       |  FROM events),
       |c AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
       |      FROM o WHERE nxt IS NOT NULL GROUP BY cur, nxt),
       |emp AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1),
       |st AS (SELECT event_type AS state FROM emp),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS s,
       |    CAST(SUM(n) AS DOUBLE) AS n_total FROM emp),
       |rs AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS rowsum FROM c GROUP BY cur),
       |pm AS (SELECT a.state AS i, b.state AS j,
       |    CASE WHEN COALESCE(rs.rowsum, 0) > 0
       |      THEN round(CAST(COALESCE(c.n, 0) AS DOUBLE)
       |        / CAST(rs.rowsum AS DOUBLE), 12)
       |      ELSE round(1.0 / CAST(tot.s AS DOUBLE), 12) END AS p
       |  FROM st a CROSS JOIN st b CROSS JOIN tot
       |  LEFT JOIN rs ON rs.cur = a.state
       |  LEFT JOIN c ON c.cur = a.state AND c.nxt = b.state),
       |pi0 AS (SELECT state, round(1.0 / CAST(tot.s AS DOUBLE), 12) AS pi
       |  FROM st CROSS JOIN tot),
       |$iterations
       |SELECT emp.event_type, emp.n AS n_events,
       |  round(round(CAST(emp.n AS DOUBLE) / tot.n_total, 12), 6) AS p_empirical,
       |  round(pi.pi, 6) AS p_stationary,
       |  round(round(pi.pi / round(CAST(emp.n AS DOUBLE) / tot.n_total, 12), 12),
       |    6) AS lift
       |FROM emp JOIN pi20 pi ON pi.state = emp.event_type CROSS JOIN tot
       |ORDER BY emp.event_type""".stripMargin
  }

  /** Mirrors q221 (`ops.Correlation.q221SimpsonAudit`): per-source and
    * pooled covariance-numerator signs from decimal sums of rounded-12
    * terms, D rounded 12 before the sign. */
  val q221SimpsonAudit: String =
    """WITH d AS (SELECT source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS x,
      |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
      |      / GREATEST(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE),
      |        1.0) AS y
      |  FROM documents),
      |per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(CAST(round(y, 12) AS DECIMAL(28,12))) AS DECIMAL(28,12))
      |      AS sy,
      |    CAST(SUM(CAST(round(CAST(x AS DOUBLE) * y, 12) AS DECIMAL(28,12)))
      |      AS DECIMAL(28,12)) AS sxy
      |  FROM d GROUP BY 1),
      |pool AS (SELECT CAST(sign(round(
      |    CAST(SUM(n) AS DOUBLE) * CAST(SUM(sxy) AS DOUBLE)
      |      - CAST(SUM(sx) AS DOUBLE) * CAST(SUM(sy) AS DOUBLE), 12))
      |    AS BIGINT) AS pooled_sign FROM per)
      |SELECT per.source, per.n AS n_docs,
      |  CAST(sign(round(CAST(per.n AS DOUBLE) * CAST(per.sxy AS DOUBLE)
      |    - CAST(per.sx AS DOUBLE) * CAST(per.sy AS DOUBLE), 12)) AS BIGINT)
      |    AS cov_sign,
      |  pool.pooled_sign,
      |  CAST(sign(round(CAST(per.n AS DOUBLE) * CAST(per.sxy AS DOUBLE)
      |    - CAST(per.sx AS DOUBLE) * CAST(per.sy AS DOUBLE), 12)) AS BIGINT)
      |    <> 0
      |  AND pool.pooled_sign <> 0
      |  AND CAST(sign(round(CAST(per.n AS DOUBLE) * CAST(per.sxy AS DOUBLE)
      |    - CAST(per.sx AS DOUBLE) * CAST(per.sy AS DOUBLE), 12)) AS BIGINT)
      |    <> pool.pooled_sign AS simpson_flip
      |FROM per CROSS JOIN pool
      |ORDER BY per.source""".stripMargin

  /** Mirrors q222 (`ops.RobustStats.q222WeightedQuantiles`): cumulative
    * TOKEN mass over the histogram, lower-quantile cuts by integer
    * cross-multiplication. */
  val q222WeightedQuantiles: String =
    """WITH h AS (SELECT source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS v
      |  FROM documents),
      |g AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c FROM h GROUP BY 1, 2),
      |t AS (SELECT source, CAST(SUM(CAST(v AS DECIMAL(19,0))
      |    * CAST(c AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS m
      |  FROM g GROUP BY 1),
      |cu AS (SELECT g.source, g.v, g.c, t.m,
      |    CAST(SUM(CAST(g.v AS DECIMAL(19,0)) * CAST(g.c AS DECIMAL(19,0)))
      |      OVER (PARTITION BY g.source ORDER BY g.v) AS DECIMAL(38,0)) AS cm
      |  FROM g JOIN t USING (source))
      |SELECT source, CAST(m AS BIGINT) AS n_tokens,
      |  MIN(CASE WHEN cm * 2 >= m THEN v END) AS w_p50,
      |  MIN(CASE WHEN cm * 10 >= m * 9 THEN v END) AS w_p90,
      |  MIN(CASE WHEN cm * 100 >= m * 99 THEN v END) AS w_p99
      |FROM cu GROUP BY source, m
      |ORDER BY source""".stripMargin

  /** Mirrors q223 (`ops.RobustStats.q223TokenConcentration`): the
    * descending cumulative grid, cut-row partial-value arithmetic, the
    * min-past-the-cut selection (strictly increasing — see the engine
    * scaladoc's proof sketch). */
  val q223TokenConcentration: String =
    """WITH h AS (SELECT source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS v
      |  FROM documents),
      |g AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c FROM h GROUP BY 1, 2),
      |t AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(SUM(CAST(v AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
      |      AS DECIMAL(38,0)) AS m
      |  FROM g GROUP BY 1),
      |cu AS (SELECT g.source, g.v, g.c, t.n, t.m,
      |    CAST(SUM(g.c) OVER (PARTITION BY g.source ORDER BY g.v DESC)
      |      AS BIGINT) AS cr,
      |    CAST(SUM(CAST(g.v AS DECIMAL(19,0)) * CAST(g.c AS DECIMAL(19,0)))
      |      OVER (PARTITION BY g.source ORDER BY g.v DESC) AS DECIMAL(38,0)) AS cm
      |  FROM g JOIN t USING (source)),
      |x AS (SELECT source, n, m, v, c, cr, cm,
      |    (n * 1 + 99) // 100 AS k1, (n * 1 + 9) // 10 AS k10,
      |    cr - c AS cr_prev,
      |    CAST(cm - CAST(CAST(v AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))
      |      AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS cm_prev
      |  FROM cu)
      |SELECT source, MAX(n) AS n_docs, CAST(MAX(m) AS BIGINT) AS n_tokens,
      |  round(CAST(MIN(CASE WHEN cr >= k1 THEN
      |      CAST(cm_prev + CAST(CAST(v AS DECIMAL(19,0))
      |        * CAST(k1 - cr_prev AS DECIMAL(19,0)) AS DECIMAL(38,0))
      |        AS DECIMAL(38,0)) END) AS DOUBLE)
      |    / CAST(MAX(m) AS DOUBLE), 6) AS top1pct_share,
      |  round(CAST(MIN(CASE WHEN cr >= k10 THEN
      |      CAST(cm_prev + CAST(CAST(v AS DECIMAL(19,0))
      |        * CAST(k10 - cr_prev AS DECIMAL(19,0)) AS DECIMAL(38,0))
      |        AS DECIMAL(38,0)) END) AS DOUBLE)
      |    / CAST(MAX(m) AS DOUBLE), 6) AS top10pct_share
      |FROM x GROUP BY source
      |ORDER BY source""".stripMargin

  /** Mirrors q224 (`ops.Multimodal.q224ImageNearDup`): the DEFINITIONAL
    * all-pairs Hamming filter over the persisted aHash sidecar (pixel
    * decode is not SQL — the hash table is the oracle input, the q205
    * persisted-model-is-data rule). Because the engine answers with the
    * pigeonhole-banded collapsed join, a banding bug that DROPPED any
    * distance ≤ 3 pair (or a collapse bug that dropped a member of an
    * identical-hash group) breaks the hash here — the recall guarantee
    * is gated, not asserted. */
  val q224ImageNearDup: String =
    s"""WITH h AS (SELECT doc_id, ahash
       |  FROM read_parquet('${graft.ops.Multimodal.ImageHashPath}/*.parquet')),
       |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
       |    CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS dist
       |  FROM h a JOIN h b ON a.doc_id < b.doc_id)
       |SELECT d1, d2, dist FROM p WHERE dist <= 3
       |ORDER BY d1, d2""".stripMargin

  /** Mirrors q225 (`ops.Multimodal.q225FrameSample`): re-window the
    * video payload bytes in SQL — every 2nd 256-byte window, md5 per
    * window. `documents.text` is ASCII in this corpus (asserted by the
    * q30 oracle's octet_length identity), so VARCHAR substring ≡ byte
    * slicing and md5(VARCHAR) ≡ md5 of the payload bytes. */
  val q225FrameSample: String =
    """WITH v AS (SELECT doc_id, text, octet_length(encode(text)) AS n
      |  FROM documents WHERE doc_id % 3 = 2),
      |f AS (SELECT doc_id, text, n,
      |    unnest(range(0, CAST(ceil(n / 256.0) AS BIGINT))) AS j FROM v)
      |SELECT doc_id, CAST(j // 2 AS BIGINT) AS frame_idx,
      |  CAST(least(256, n - j * 256) AS BIGINT) AS n_bytes,
      |  md5(substring(text, CAST(j * 256 + 1 AS INT), 256)) AS frame_md5
      |FROM f WHERE j % 2 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Mirrors q226 (`ops.Quantize.q226SemanticDedupTuned`): the tuner's
    * candidate grid is read from its sidecar (the knob DECISION INPUT —
    * the sampled k-means simulation is driver math over a seeded
    * bounded sample, persisted-model-is-data), the pick rule is
    * replayed INDEPENDENTLY in SQL (recall ≥ 0.7 → min by (pair frac,
    * −recall, nlist); else max by (recall, −frac, nlist) — Scala
    * minBy/maxBy keep the FIRST extremum, hence the nlist ASC
    * tiebreak), and `n_removed` replays the full q206 dataflow at the
    * chosen knob from the tuned centroid sidecar. */
  val q226SemanticDedupTuned: String =
    s"""WITH grid AS (SELECT * FROM
       |    read_parquet('${graft.ops.Quantize.TunedGridPath}/*.parquet')),
       |pick1 AS (SELECT nlist FROM grid WHERE est_recall >= 0.7
       |  ORDER BY est_pair_frac ASC, est_recall DESC, nlist ASC LIMIT 1),
       |pick2 AS (SELECT nlist FROM grid
       |  ORDER BY est_recall DESC, est_pair_frac ASC, nlist ASC LIMIT 1),
       |chosen AS (SELECT COALESCE((SELECT nlist FROM pick1),
       |    (SELECT nlist FROM pick2)) AS cn),
       |${kmeansAssignCtes(graft.ops.Quantize.TunedCellCentroidsPath)},
       |asg AS (SELECT e.vec_id, CAST(COALESCE(r.cluster, 0) AS INT) AS cell
       |  FROM e LEFT JOIN r ON e.vec_id = r.vec_id AND r.rn = 1),
       |m AS (SELECT vec_id, MAX(abs(CAST(embedding[i] AS DOUBLE))) AS maxabs
       |      FROM x GROUP BY vec_id),
       |qx AS MATERIALIZED (SELECT x.vec_id, x.i,
       |         CASE WHEN m.maxabs > 0
       |              THEN CAST(floor(CAST(x.embedding[x.i] AS DOUBLE) /
       |                     (m.maxabs / CAST(127 AS DOUBLE)) + 0.5) AS BIGINT)
       |              ELSE 0 END AS qi
       |       FROM x JOIN m ON x.vec_id = m.vec_id),
       |n AS (SELECT vec_id, CAST(SUM(qi * qi) AS BIGINT) AS n2 FROM qx GROUP BY vec_id),
       |dots AS (SELECT a.vec_id AS v1, b.vec_id AS v2,
       |           CAST(SUM(a.qi * b.qi) AS BIGINT) AS dot
       |         FROM qx a JOIN qx b ON a.i = b.i AND a.vec_id < b.vec_id
       |         JOIN asg ca ON ca.vec_id = a.vec_id
       |         JOIN asg cb ON cb.vec_id = b.vec_id AND ca.cell = cb.cell
       |         GROUP BY 1, 2),
       |sim AS (SELECT v1, v2 FROM dots
       |        JOIN n na ON v1 = na.vec_id
       |        JOIN n nb ON v2 = nb.vec_id
       |        WHERE dot > 0 AND 400 * dot * dot >= 81 * na.n2 * nb.n2),
       |removed AS (SELECT CAST(COUNT(DISTINCT v2) AS BIGINT) AS n_removed FROM sim)
       |SELECT g.nlist, round(g.est_recall, 6) AS est_recall,
       |  round(g.est_pair_frac, 6) AS est_pair_frac,
       |  g.nlist = c.cn AS chosen,
       |  CASE WHEN g.nlist = c.cn THEN r.n_removed ELSE CAST(0 AS BIGINT) END
       |    AS n_removed
       |FROM grid g, chosen c, removed r
       |ORDER BY nlist""".stripMargin

  /** Mirrors q232 (`ops.Clustering.q232CentroidDendrogram`): pairwise
    * integer centroid distances from the persisted sidecar, then the
    * k−1 single-linkage merges UNROLLED as MATERIALIZED CTE steps —
    * each step's argmin over member pairs ordered (dist, least rep,
    * greatest rep) with the membership table rewritten per step. A
    * linkage bug (wrong tie-break, wrong membership update) lands on a
    * different merge sequence and breaks the hash. */
  val q232CentroidDendrogram: String = {
    val k = 8
    val steps = (1 to (k - 1)).map { i =>
      val prev = s"m${i - 1}"
      s"""p$i AS (SELECT least(ma.rep, mb.rep) AS ra,
         |    greatest(ma.rep, mb.rep) AS rb, pd.d
         |  FROM pd JOIN $prev ma ON ma.cid = pd.i JOIN $prev mb ON mb.cid = pd.j
         |  WHERE ma.rep <> mb.rep),
         |w$i AS MATERIALIZED (SELECT ra, rb, d FROM p$i ORDER BY d, ra, rb LIMIT 1),
         |m$i AS MATERIALIZED (SELECT m.cid,
         |    CASE WHEN m.rep = w.rb THEN w.ra ELSE m.rep END AS rep
         |  FROM $prev m, w$i w)""".stripMargin
    }.mkString(",\n")
    val rows = (1 to (k - 1)).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS step, CAST(ra AS BIGINT) AS rep_a,
         |  CAST(rb AS BIGINT) AS rep_b, CAST(d AS BIGINT) AS dist,
         |  CAST($k - $i AS BIGINT) AS n_clusters FROM w$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH c AS (SELECT cluster, qc
       |  FROM read_parquet('${graft.ops.Clustering.DendroCentroidsPath}/*.parquet')),
       |xi AS (SELECT cluster, k, qc[CAST(k AS INT)] AS v
       |  FROM (SELECT cluster, qc, unnest(generate_series(1, len(qc))) AS k FROM c)),
       |pd AS MATERIALIZED (SELECT a.cluster AS i, b.cluster AS j,
       |    CAST(SUM((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS d
       |  FROM xi a JOIN xi b ON a.k = b.k AND a.cluster < b.cluster
       |  GROUP BY 1, 2),
       |m0 AS (SELECT cluster AS cid, cluster AS rep FROM c),
       |$steps
       |$rows
       |ORDER BY step""".stripMargin
  }

  /** Mirrors q233 (`queries.Relational.q233LangPivot`): the pivot as
    * conditional sums over the pinned language axis; totals from the
    * five coalesced columns on both sides. */
  val q233LangPivot: String = {
    val langs = graft.queries.Relational.PivotLangs
    val cols = langs.map(l =>
      s"  CAST(COALESCE(SUM(CASE WHEN lang = '$l' THEN nt END), 0) AS BIGINT) AS tok_$l")
      .mkString(",\n")
    val total = langs.map(l => s"tok_$l").mkString(" + ")
    s"""WITH d AS (SELECT source, lang,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS nt
       |  FROM documents),
       |w AS (SELECT source,
       |$cols
       |  FROM d GROUP BY source)
       |SELECT source, ${langs.map(l => s"tok_$l").mkString(", ")},
       |  $total AS tok_total
       |FROM w ORDER BY source""".stripMargin
  }

  /** Mirrors q237 (`ops.TimeSeries.q237TimeWeightedAvg`): the
    * step-hold integral — lead(ts) per (type, day) ordered (ts,
    * event_id), rounded-12 v·dt terms decimal-summed, one rounded-6
    * divide by the span. */
  val q237TimeWeightedAvg: String =
    """WITH ev AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
      |    epoch_ns(ts) AS tns, event_id, value FROM events),
      |d AS (SELECT event_type, day, tns, value,
      |    LEAD(tns) OVER (PARTITION BY event_type, day
      |      ORDER BY tns, event_id) - tns AS dt
      |  FROM ev),
      |t AS (SELECT event_type, day, tns,
      |    CASE WHEN dt IS NOT NULL
      |      THEN CAST(round(value * CAST(dt AS DOUBLE), 12) AS DECIMAL(28,12))
      |    END AS term
      |  FROM d)
      |SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CASE WHEN MAX(tns) - MIN(tns) > 0
      |    THEN round(CAST(SUM(term) AS DOUBLE) /
      |      CAST(MAX(tns) - MIN(tns) AS DOUBLE), 6) END AS twa
      |FROM t GROUP BY 1, 2
      |ORDER BY event_type, day""".stripMargin

  /** Mirrors q238 (`ops.PrefixCache.q238PrefixCache`): per rung, group
    * docs by the first-L characters (docs ≥ L only), count ≥2-member
    * groups and the (cnt−1)·L saved chars, one rounded-6 fraction. */
  val q238PrefixCache: String = {
    val rungs = graft.ops.PrefixCache.Ladder.map { l =>
      s"""SELECT CAST($l AS BIGINT) AS prefix_len,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
         |    WHERE len(text) >= $l) AS n_docs,
         |  CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS shared_docs,
         |  CAST(COUNT(*) AS BIGINT) AS n_groups,
         |  CAST(COALESCE(SUM((cnt - 1) * $l), 0) AS BIGINT) AS saved_chars,
         |  CASE WHEN (SELECT SUM(len(text)) FROM documents
         |      WHERE len(text) >= $l) > 0
         |    THEN round(CAST(COALESCE(SUM((cnt - 1) * $l), 0) AS DOUBLE) /
         |      CAST((SELECT SUM(len(text)) FROM documents
         |        WHERE len(text) >= $l) AS DOUBLE), 6) END AS saved_frac
         |FROM (SELECT substr(text, 1, $l) AS p, CAST(COUNT(*) AS BIGINT) AS cnt
         |      FROM documents WHERE len(text) >= $l GROUP BY 1)
         |WHERE cnt >= 2""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (\n$rungs\n) ORDER BY prefix_len""".stripMargin
  }

  /** Mirrors q239 (`queries.Relational.q239MetricsUnpivot`): the melt
    * as a UNION ALL long form. */
  val q239MetricsUnpivot: String =
    """WITH m AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
      |  FROM documents)
      |SELECT doc_id, 'n_chars' AS metric, n_chars AS value FROM m
      |UNION ALL
      |SELECT doc_id, 'n_tokens' AS metric, n_tokens AS value FROM m
      |ORDER BY doc_id, metric""".stripMargin

  /** Mirrors q246 (`ops.TimeSeries.q246DowSeasonality`): the
    * zero-filled grid bucketed by day mod 7, rate and rounded-12 χ²
    * terms over exact longs. */
  val q246DowSeasonality: String =
    """WITH ev AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day
      |  FROM events),
      |cnt AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM ev GROUP BY 1, 2),
      |days AS (SELECT DISTINCT day FROM cnt),
      |grid AS (SELECT t.event_type, d.day, COALESCE(c.x, 0) AS x,
      |    ((d.day % 7) + 7) % 7 AS dow
      |  FROM (SELECT DISTINCT event_type FROM cnt) t
      |  CROSS JOIN days d
      |  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.day = d.day),
      |bd AS (SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS days_dow,
      |    CAST(SUM(x) AS BIGINT) AS n FROM grid GROUP BY 1, 2),
      |bt AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
      |    CAST(SUM(days_dow) AS BIGINT) AS total_days FROM bd GROUP BY 1),
      |terms AS (SELECT bd.event_type, bd.dow, bd.days_dow, bd.n,
      |    CAST(bt.total AS DOUBLE) * CAST(bd.days_dow AS DOUBLE) /
      |      CAST(bt.total_days AS DOUBLE) AS exp
      |  FROM bd JOIN bt USING (event_type)),
      |tt AS (SELECT *, CAST(CASE WHEN exp > 0 THEN
      |    round((CAST(n AS DOUBLE) - exp) * (CAST(n AS DOUBLE) - exp) / exp, 12)
      |    ELSE 0.0 END AS DECIMAL(28,12)) AS chi_term FROM terms),
      |chi AS (SELECT event_type,
      |    round(CAST(SUM(chi_term) AS DOUBLE), 6) AS chi2 FROM tt GROUP BY 1)
      |SELECT t.event_type, t.dow, t.days_dow, t.n,
      |  round(CAST(t.n AS DOUBLE) / CAST(t.days_dow AS DOUBLE), 6) AS rate,
      |  c.chi2
      |FROM tt t JOIN chi c USING (event_type)
      |ORDER BY t.event_type, t.dow""".stripMargin

  /** Mirrors q247 (`ops.TimeSeries.q247InterArrival`): day-keyed lag
    * gaps bucketed to ms, the q88 histogram order statistics. */
  val q247InterArrival: String =
    """WITH ev AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
      |    epoch_ns(ts) AS tns, event_id FROM events),
      |g AS (SELECT event_type,
      |    (tns - LAG(tns) OVER (PARTITION BY event_type, day
      |      ORDER BY tns, event_id)) // 1000000 AS v
      |  FROM ev),
      |h AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM g WHERE v IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1),
      |cu AS (SELECT h.event_type, h.v, t.n,
      |    CAST(SUM(h.c) OVER (PARTITION BY h.event_type ORDER BY h.v)
      |      AS BIGINT) AS cum
      |  FROM h JOIN t USING (event_type))
      |SELECT event_type, MAX(n) AS n_gaps,
      |  CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS BIGINT) AS p50_ms,
      |  CAST(MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN v END) AS BIGINT) AS p90_ms,
      |  CAST(MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN v END) AS BIGINT) AS p99_ms,
      |  CAST(MAX(v) AS BIGINT) AS max_ms
      |FROM cu GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Mirrors q244 (`ops.Correlation.q244LaggedXcorr`): integer moment
    * sums over the lag-shifted grid join, the one-expression Pearson,
    * the (−|r| rounded 12, lag) argmax. */
  val q244LaggedXcorr: String =
    """WITH ev AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day
      |  FROM events),
      |cnt AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM ev GROUP BY 1, 2),
      |days AS (SELECT DISTINCT day FROM cnt),
      |grid AS (SELECT t.event_type, d.day, COALESCE(c.x, 0) AS x
      |  FROM (SELECT DISTINCT event_type FROM cnt) t
      |  CROSS JOIN days d
      |  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.day = d.day),
      |lags AS (SELECT unnest(generate_series(-3, 3)) AS lag),
      |m AS (SELECT a.event_type AS ta, b.event_type AS tb, l.lag,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(a.x) AS BIGINT) AS sx, CAST(SUM(b.x) AS BIGINT) AS sy,
      |    CAST(SUM(CAST(a.x AS DECIMAL(19,0)) * CAST(b.x AS DECIMAL(19,0)))
      |      AS DECIMAL(38,0)) AS sxy,
      |    CAST(SUM(CAST(a.x AS DECIMAL(19,0)) * CAST(a.x AS DECIMAL(19,0)))
      |      AS DECIMAL(38,0)) AS sxx,
      |    CAST(SUM(CAST(b.x AS DECIMAL(19,0)) * CAST(b.x AS DECIMAL(19,0)))
      |      AS DECIMAL(38,0)) AS syy
      |  FROM grid a CROSS JOIN lags l
      |  JOIN grid b ON b.day = a.day + l.lag AND a.event_type < b.event_type
      |  GROUP BY 1, 2, 3),
      |rr AS (SELECT ta, tb, lag,
      |    CASE WHEN sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |      sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
      |    THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |      (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |       sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) END AS r
      |  FROM m),
      |best AS (SELECT ta, tb, lag, r,
      |    row_number() OVER (PARTITION BY ta, tb
      |      ORDER BY -round(abs(r), 12), lag) AS rn
      |  FROM rr WHERE r IS NOT NULL)
      |SELECT r0.ta, r0.tb, r0.r AS r0, b.lag AS best_lag, b.r AS best_r
      |FROM (SELECT ta, tb, r FROM rr WHERE lag = 0) r0
      |LEFT JOIN best b ON b.ta = r0.ta AND b.tb = r0.tb AND b.rn = 1
      |ORDER BY r0.ta, r0.tb""".stripMargin

  /** Mirrors q245 (`ops.Clustering.q245Silhouette`): own/other
    * distances from the assignment CTE's distance table, libm sqrts of
    * the same exact integers, rounded-12 s terms decimal-summed. */
  val q245Silhouette: String =
    s"""WITH ${kmeansAssignCtes(graft.ops.Clustering.SilhouetteCentroidsPath)},
       |own AS (SELECT vec_id, cluster AS cell, d AS d_own FROM r WHERE rn = 1),
       |oth AS (SELECT d.vec_id, MIN(d.d) AS d_other
       |  FROM d JOIN own ON own.vec_id = d.vec_id AND d.cluster <> own.cell
       |  GROUP BY 1),
       |sil AS (SELECT o.vec_id, o.cell,
       |    CASE WHEN greatest(sqrt(CAST(o.d_own AS DOUBLE)),
       |        sqrt(CAST(t.d_other AS DOUBLE))) > 0
       |      THEN round((sqrt(CAST(t.d_other AS DOUBLE)) -
       |          sqrt(CAST(o.d_own AS DOUBLE))) /
       |        greatest(sqrt(CAST(o.d_own AS DOUBLE)),
       |          sqrt(CAST(t.d_other AS DOUBLE))), 12)
       |      ELSE 0.0 END AS s
       |  FROM own o JOIN oth t USING (vec_id))
       |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n,
       |  round(CAST(SUM(CAST(s AS DECIMAL(28,12))) AS DOUBLE) /
       |    CAST(COUNT(*) AS DOUBLE), 6) AS mean_silhouette
       |FROM sil GROUP BY cell
       |ORDER BY cell""".stripMargin

  /** Mirrors q240 (`ops.Privacy.q240LDiversity`): the (qid × sensitive)
    * cell counts, rounded-12 p·ln p terms decimal-summed, e^H rounded
    * 6, the l < 3 flag. */
  val q240LDiversity: String =
    """WITH d AS (SELECT source, lang,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) // 20 AS sens
      |  FROM documents),
      |cells AS (SELECT source, lang, sens, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM d GROUP BY 1, 2, 3),
      |grp AS (SELECT source, lang, CAST(SUM(c) AS BIGINT) AS k,
      |    CAST(COUNT(*) AS BIGINT) AS l_distinct FROM cells GROUP BY 1, 2),
      |t AS (SELECT cells.source, cells.lang, grp.k, grp.l_distinct,
      |    CAST(round((CAST(cells.c AS DOUBLE) / CAST(grp.k AS DOUBLE)) *
      |      ln(CAST(cells.c AS DOUBLE) / CAST(grp.k AS DOUBLE)), 12)
      |      AS DECIMAL(28,12)) AS term
      |  FROM cells JOIN grp USING (source, lang))
      |SELECT source, lang, k, l_distinct,
      |  round(exp(-CAST(SUM(term) AS DOUBLE)), 6) AS entropy_l,
      |  l_distinct < 3 AS homogeneity_risk
      |FROM t GROUP BY 1, 2, 3, 4
      |ORDER BY source, lang""".stripMargin

  /** Mirrors q241 (`ops.Drift.q241RunsTest`): lower median, ties
    * dropped, sign-change runs over the per-source doc_id order, the
    * closed-form moments in fixed-shape double arithmetic. */
  val q241RunsTest: String =
    """WITH v AS (SELECT source, doc_id,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS v
      |  FROM documents),
      |h AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
      |t AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n0 FROM h GROUP BY 1),
      |cu AS (SELECT h.source, h.v, t.n0,
      |    CAST(SUM(h.c) OVER (PARTITION BY h.source ORDER BY h.v) AS BIGINT) AS cum
      |  FROM h JOIN t USING (source)),
      |med AS (SELECT source,
      |    CAST(MIN(CASE WHEN cum >= (n0 + 1) // 2 THEN v END) AS BIGINT) AS med
      |  FROM cu GROUP BY source),
      |sg AS (SELECT v.source, v.doc_id,
      |    CASE WHEN v.v > m.med THEN 1 ELSE 0 END AS sgn
      |  FROM v JOIN med m USING (source) WHERE v.v <> m.med),
      |b AS (SELECT source, sgn,
      |    CASE WHEN LAG(sgn) OVER w IS NULL OR LAG(sgn) OVER w <> sgn
      |      THEN 1 ELSE 0 END AS brk
      |  FROM sg WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
      |agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_used,
      |    CAST(SUM(sgn) AS BIGINT) AS n_plus,
      |    CAST(COUNT(*) - SUM(sgn) AS BIGINT) AS n_minus,
      |    CAST(SUM(brk) AS BIGINT) AS runs
      |  FROM b GROUP BY 1),
      |x AS (SELECT *, 2.0 * CAST(n_plus AS DOUBLE) * CAST(n_minus AS DOUBLE) AS a
      |  FROM agg)
      |SELECT source, n_used, n_plus, n_minus, runs,
      |  CASE WHEN n_plus > 0 AND n_minus > 0 AND n_used > 2 THEN
      |    round((CAST(runs AS DOUBLE) - (1.0 + a / CAST(n_used AS DOUBLE))) /
      |      sqrt(a * (a - CAST(n_used AS DOUBLE)) /
      |        (CAST(n_used AS DOUBLE) * CAST(n_used AS DOUBLE) *
      |          (CAST(n_used AS DOUBLE) - 1.0))), 6)
      |  END AS z
      |FROM x ORDER BY source""".stripMargin

  /** Mirrors q242 (`ops.SnapshotDiff.q242Scd2History`): the last-event
    * daily snapshot (row_number over (ts, event_id) DESC ≡ the engine's
    * struct max — event_id is unique), the islands lag (type change OR
    * day gap breaks), interval aggregation. */
  val q242Scd2History: String =
    """WITH ev AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
      |    epoch_ns(ts) AS tns, event_id, event_type FROM events),
      |r AS (SELECT user_id, day, event_type,
      |    row_number() OVER (PARTITION BY user_id, day
      |      ORDER BY tns DESC, event_id DESC) AS rn FROM ev),
      |snap AS (SELECT user_id, day, event_type AS etype FROM r WHERE rn = 1),
      |isl AS (SELECT user_id, day, etype,
      |    CASE WHEN LAG(etype) OVER w IS NULL OR LAG(etype) OVER w <> etype
      |      OR LAG(day) OVER w <> day - 1 THEN 1 ELSE 0 END AS brk
      |  FROM snap WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      |g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY day) AS vid
      |  FROM isl)
      |SELECT user_id, CAST(vid AS BIGINT) AS version, etype AS event_type,
      |  MIN(day) AS valid_from, MAX(day) AS valid_to,
      |  CAST(COUNT(*) AS BIGINT) AS n_days
      |FROM g GROUP BY 1, 2, 3
      |ORDER BY user_id, version""".stripMargin

  /** Mirrors q243 (`ops.Selection.q243CoverageSelect`): the greedy
    * UNROLLED — per step, per-doc uncovered-token gains (picked docs
    * excluded), argmax with the (gain DESC, doc_id) tiebreak and the
    * gain > 0 early stop, covered set folded forward. */
  val q243CoverageSelect: String = {
    val k = 10
    val steps = (1 to k).map { i =>
      val prevCov = s"cov${i - 1}"
      val pickedFilter =
        if (i == 1) ""
        else "  AND t.doc_id NOT IN (" +
          (1 until i).map(j => s"SELECT doc_id FROM w$j").mkString(" UNION ALL ") + ")\n"
      s"""g$i AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS gain
         |  FROM tokd t LEFT JOIN $prevCov c ON t.w = c.w
         |  WHERE c.w IS NULL
         |$pickedFilter  GROUP BY 1),
         |w$i AS MATERIALIZED (SELECT doc_id, gain FROM g$i WHERE gain > 0
         |  ORDER BY gain DESC, doc_id LIMIT 1),
         |cov$i AS MATERIALIZED (SELECT w FROM $prevCov UNION
         |  SELECT t.w FROM tokd t JOIN w$i USING (doc_id))""".stripMargin
    }.mkString(",\n")
    val rows = (1 to k).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS step, doc_id, gain,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cov$i) AS covered_total
         |FROM w$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $shingleCtes,
       |tokd AS MATERIALIZED (SELECT doc_id, g AS w FROM sh),
       |cov0 AS (SELECT CAST(NULL AS VARCHAR) AS w WHERE 1 = 0),
       |$steps
       |$rows
       |ORDER BY step""".stripMargin
  }

  /** Mirrors q234 (`ops.ChangePoint.q234SprtMonitor`): the zero-filled
    * day grid, per-type mean, rounded-12 Poisson LLR terms decimal-
    * summed, the shared ln 19 boundary, crossing day + the decision
    * read from the sign AT the crossing. */
  val q234SprtMonitor: String =
    """WITH ev AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day
      |  FROM events),
      |cnt AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM ev GROUP BY 1, 2),
      |days AS (SELECT DISTINCT day FROM cnt),
      |grid AS (SELECT t.event_type, d.day, COALESCE(c.x, 0) AS x
      |  FROM (SELECT DISTINCT event_type FROM cnt) t
      |  CROSS JOIN days d
      |  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.day = d.day),
      |base AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
      |    round(CAST(SUM(x) AS DOUBLE) / COUNT(*), 12) AS mu
      |  FROM grid GROUP BY 1),
      |sc AS (SELECT g.event_type, g.day, b.nd, b.mu,
      |    CAST(round(g.x * round(ln(2), 12) - 1.0 * b.mu, 12)
      |      AS DECIMAL(28,12)) AS llr
      |  FROM grid g JOIN base b USING (event_type)),
      |cum AS (SELECT event_type, day, nd, mu, llr,
      |    SUM(llr) OVER (PARTITION BY event_type ORDER BY day) AS cum FROM sc),
      |agg AS (SELECT event_type, MAX(nd) AS n_days, round(MAX(mu), 6) AS mu,
      |    round(CAST(MAX(cum) AS DOUBLE), 6) AS max_cum,
      |    round(CAST(SUM(llr) AS DOUBLE), 6) AS final_cum,
      |    MIN(CASE WHEN abs(cum) >= CAST(round(ln(19), 12) AS DECIMAL(28,12))
      |      THEN day END) AS cross_day
      |  FROM cum GROUP BY 1)
      |SELECT a.event_type, a.n_days, a.mu, a.max_cum, a.final_cum, a.cross_day,
      |  CASE WHEN a.cross_day IS NOT NULL
      |    THEN (CASE WHEN c.cum > 0 THEN 'h1' ELSE 'h0' END) END AS decision
      |FROM agg a LEFT JOIN cum c
      |  ON c.event_type = a.event_type AND c.day = a.cross_day
      |ORDER BY a.event_type""".stripMargin

  /** Mirrors q235 (`ops.TimeSeries.q235SlidingActive`): distinct
    * (user, day) once, the ≤ 7 offset projection restricted to
    * observed days, re-distinct, one rounded-6 ratio. */
  val q235SlidingActive: String =
    """WITH ud AS (SELECT DISTINCT user_id,
      |    epoch_ns(ts) // 86400000000000 AS day FROM events),
      |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
      |days AS (SELECT DISTINCT day FROM ud),
      |proj AS (SELECT DISTINCT ud.user_id, ud.day + o.off AS day
      |  FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS off) o),
      |wau AS (SELECT p.day, CAST(COUNT(*) AS BIGINT) AS wau
      |  FROM proj p JOIN days USING (day) GROUP BY 1)
      |SELECT day, dau, wau,
      |  round(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6) AS stickiness
      |FROM dau JOIN wau USING (day)
      |ORDER BY day""".stripMargin

  /** Mirrors q236 (`ops.Selection.q236ParetoFrontier`): the DEFINITION
    * — a doc survives iff NO other doc weakly dominates it with one
    * strict coordinate (equal points co-survive). The engine's
    * aggregate-domain window skyline must land on the same set. */
  val q236ParetoFrontier: String =
    s"""WITH $tokCte,
       |m AS (SELECT d.doc_id,
       |    CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT) AS x,
       |    CAST(len(list_distinct(t.l)) AS BIGINT) AS y
       |  FROM documents d JOIN tok t ON d.doc_id = t.doc_id)
       |SELECT a.doc_id, a.x, a.y FROM m a
       |WHERE NOT EXISTS (SELECT 1 FROM m b
       |  WHERE b.x >= a.x AND b.y >= a.y AND (b.x > a.x OR b.y > a.y))
       |ORDER BY a.doc_id""".stripMargin

  /** Mirrors q231 (`ops.Multimodal.q231AudioNearDup`): the q224 rule
    * for audio — PCM decode is not SQL, so the persisted fingerprint
    * table is the oracle input and the DEFINITIONAL all-pairs Hamming
    * filter is the replay (gating the banded join's exact-recall claim
    * on a second, independent fingerprint family). */
  val q231AudioNearDup: String =
    s"""WITH h AS (SELECT doc_id, ahash
       |  FROM read_parquet('${graft.ops.Multimodal.AudioFpPath}/*.parquet')),
       |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
       |    CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS dist
       |  FROM h a JOIN h b ON a.doc_id < b.doc_id)
       |SELECT d1, d2, dist FROM p WHERE dist <= 3
       |ORDER BY d1, d2""".stripMargin

  /** Mirrors q227 (`ops.Blocklist.q227BlocklistScan`): the DEFINITION
    * of overlapping literal occurrence — every position where the
    * substring equals the pattern — replayed position-by-position in
    * SQL, so an automaton failure-link bug breaks the hash. ASCII
    * corpus ⇒ char positions ≡ byte positions (the q30/q225 identity). */
  val q227BlocklistScan: String = {
    val pats = graft.ops.Blocklist.Patterns.zipWithIndex
      .map { case (p, i) => s"($i, '${p.replace("'", "''")}')" }.mkString(", ")
    s"""WITH pats(pid, p) AS (SELECT * FROM (VALUES $pats)),
       |d AS (SELECT doc_id, text FROM documents),
       |pos0 AS (SELECT d.doc_id, pats.pid, pats.p, d.text,
       |    len(d.text) - len(pats.p) + 1 AS m
       |  FROM d CROSS JOIN pats WHERE len(d.text) >= len(pats.p)),
       |pos AS (SELECT doc_id, pid, p, text,
       |    unnest(generate_series(1, m)) AS i FROM pos0),
       |hit AS (SELECT doc_id, pid, p, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM pos WHERE substr(text, CAST(i AS INT), len(p)) = p
       |  GROUP BY 1, 2, 3)
       |SELECT doc_id, CAST(pid AS BIGINT) AS pattern_id, p AS pattern, cnt
       |FROM hit ORDER BY doc_id, pattern_id""".stripMargin
  }

  /** Mirrors q228 (`ops.RobustStats.q228MadOutliers`): both lower-
    * medians via the cumulative window over value-aggregated
    * histograms, the integer cross-multiplied 3.5 modified-z cut
    * (1349·d > 7000·MAD), and the max-z diagnostic. */
  val q228MadOutliers: String =
    """WITH h AS (SELECT source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS v,
      |    CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
      |t AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1),
      |cu AS (SELECT h.source, h.v, h.c, t.n,
      |    CAST(SUM(h.c) OVER (PARTITION BY h.source ORDER BY h.v) AS BIGINT) AS cum
      |  FROM h JOIN t USING (source)),
      |med AS (SELECT source, MAX(n) AS n,
      |    CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS BIGINT) AS med
      |  FROM cu GROUP BY source),
      |dev AS (SELECT h.source, abs(h.v - med.med) AS d, h.c
      |  FROM h JOIN med USING (source)),
      |dh AS (SELECT source, d, CAST(SUM(c) AS BIGINT) AS c FROM dev GROUP BY 1, 2),
      |dcu AS (SELECT dh.source, dh.d, dh.c, med.n,
      |    CAST(SUM(dh.c) OVER (PARTITION BY dh.source ORDER BY dh.d) AS BIGINT) AS cum
      |  FROM dh JOIN med USING (source)),
      |mad AS (SELECT source, CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN d END)
      |    AS BIGINT) AS mad
      |  FROM dcu GROUP BY source),
      |sel AS (SELECT dev.source, med.n, med.med, mad.mad,
      |    CAST(SUM(CASE WHEN dev.d * 1349 > mad.mad * 7000 THEN dev.c ELSE 0 END)
      |      AS BIGINT) AS n_outliers,
      |    CAST(MAX(dev.d) AS BIGINT) AS max_d
      |  FROM dev JOIN med USING (source) JOIN mad USING (source)
      |  GROUP BY 1, 2, 3, 4)
      |SELECT source, n AS n_docs, med, mad, n_outliers,
      |  round(CAST(n_outliers AS DOUBLE) / CAST(n AS DOUBLE), 6) AS outlier_frac,
      |  CASE WHEN mad > 0
      |    THEN round(0.6745 * CAST(max_d AS DOUBLE) / CAST(mad AS DOUBLE), 6)
      |  END AS max_mz
      |FROM sel ORDER BY source""".stripMargin

  /** Mirrors q229 (`ops.Vocabulary.q229VocabGrowth`): id-threshold
    * prefixes, one MIN(doc_id) per token type collapsed to a
    * first-occurrence histogram, and the 10-point Heaps OLS on
    * rounded-12 logs with exact decimal sums (β and ln K in
    * fixed-shape double arithmetic, round 6). */
  val q229VocabGrowth: String =
    s"""WITH $tokCte,
       |mx AS (SELECT MAX(doc_id) AS mx FROM documents),
       |thr AS (SELECT CAST(t.j AS BIGINT) AS j, (mx.mx * t.j) // 10 AS d
       |  FROM mx, unnest(generate_series(1, 10)) AS t(j)),
       |pd AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS nt FROM tok),
       |ds AS (SELECT thr.j, thr.d, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(pd.nt) AS BIGINT) AS n_tokens
       |  FROM pd JOIN thr ON pd.doc_id <= thr.d GROUP BY 1, 2),
       |fo AS (SELECT w, MIN(doc_id) AS f
       |  FROM (SELECT doc_id, unnest(l) AS w FROM tok) GROUP BY w),
       |fh AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS c FROM fo GROUP BY f),
       |va AS (SELECT thr.j, CAST(SUM(fh.c) AS BIGINT) AS vocab
       |  FROM fh JOIN thr ON fh.f <= thr.d GROUP BY 1),
       |pts AS (SELECT ds.j, ds.d, ds.n_docs, ds.n_tokens,
       |    COALESCE(va.vocab, 0) AS vocab FROM ds LEFT JOIN va USING (j)),
       |fit0 AS (SELECT round(ln(CAST(n_tokens AS DOUBLE)), 12) AS x,
       |    round(ln(CAST(vocab AS DOUBLE)), 12) AS y
       |  FROM pts WHERE n_tokens > 0 AND vocab > 0),
       |fit1 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m,
       |    CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(round(x * x, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(round(x * y, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sxy
       |  FROM fit0),
       |fit AS (SELECT m * sxy - sx * sy AS num, m * sxx - sx * sx AS den,
       |    m, sx, sy FROM fit1)
       |SELECT p.j, p.d AS id_threshold, p.n_docs, p.n_tokens, p.vocab,
       |  CASE WHEN f.den <> 0 THEN round(f.num / f.den, 6) END AS heaps_beta,
       |  CASE WHEN f.den <> 0
       |    THEN round((f.sy - (f.num / f.den) * f.sx) / f.m, 6) END AS heaps_lnk
       |FROM pts p, fit f ORDER BY j""".stripMargin

  /** Mirrors q230 (`ops.Drift.q230WassersteinDrift`): the q186 grid
    * with the gap-weighted integral — cross-multiplied ECDF
    * differences widened via (19,0)×(12,0) factors, the gap product
    * via (25,0)×(12,0), one rounded-6 divide at the end. */
  val q230WassersteinDrift: String =
    """WITH h AS (SELECT source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS v,
      |    CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
      |ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM h GROUP BY 1),
      |gv AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cg FROM h GROUP BY 1),
      |gc AS (SELECT v, CAST(SUM(cg) OVER (ORDER BY v) AS BIGINT) AS cum_g FROM gv),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_all FROM h),
      |grid AS (SELECT ns.source, ns.n_s, g.v
      |  FROM ns CROSS JOIN (SELECT v FROM gv) g),
      |cums AS (SELECT grid.source, grid.n_s, grid.v,
      |    CAST(COALESCE(SUM(h.c) OVER (PARTITION BY grid.source ORDER BY grid.v),
      |      0) AS BIGINT) AS cum_s
      |  FROM grid LEFT JOIN h ON h.source = grid.source AND h.v = grid.v),
      |f AS (SELECT c.source, c.n_s, c.v, c.cum_s, gc.cum_g, t.n_all,
      |    COALESCE(LEAD(c.v) OVER (PARTITION BY c.source ORDER BY c.v) - c.v, 0)
      |      AS gap
      |  FROM cums c JOIN gc USING (v) CROSS JOIN tot t),
      |terms AS (SELECT source, n_s, n_all,
      |    CAST(abs(CAST(cum_s AS DECIMAL(19,0)) * CAST(n_all - n_s AS DECIMAL(19,0))
      |        - CAST(cum_g - cum_s AS DECIMAL(19,0)) * CAST(n_s AS DECIMAL(19,0)))
      |      AS DECIMAL(25,0)) * CAST(gap AS DECIMAL(12,0)) AS term
      |  FROM f)
      |SELECT source, MAX(n_s) AS n_source, MAX(n_all - n_s) AS n_rest,
      |  round(CAST(SUM(term) AS DOUBLE) /
      |    (CAST(MAX(n_s) AS DOUBLE) * CAST(MAX(n_all - n_s) AS DOUBLE)), 6) AS w1
      |FROM terms GROUP BY source ORDER BY source""".stripMargin

  /** Mirrors q248 (`ops.ExactSubstring.q248StreamedExactSubstringIndex`):
    * the DEFINITION — because the indexed slices plus the streamed
    * appends plus the probe batch cover the whole corpus, the streamed
    * lifecycle must answer exactly the q207 full-corpus dup scan
    * restricted to probe-doc (%5=0) spans. A stale append (a batch's
    * hashes missing from the store) surfaces as a missing span. */
  val q248StreamedExactSubstring: String =
    """WITH d AS (SELECT doc_id, text FROM documents),
      |w AS (SELECT doc_id, unnest(generate_series(1, len(text) - 49)) AS pos, text
      |  FROM d),
      |s AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |    substr(text, CAST(pos AS INT), 50) AS win FROM w),
      |dup AS (SELECT win FROM s GROUP BY win HAVING COUNT(*) >= 2),
      |hits AS (SELECT doc_id, pos FROM s JOIN dup USING (win)
      |  WHERE doc_id % 5 = 0),
      |isl AS (SELECT doc_id, pos,
      |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 50
      |      THEN 0 ELSE 1 END AS brk
      |  FROM hits),
      |g AS (SELECT doc_id, pos,
      |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM isl)
      |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
      |  CAST(MAX(pos) + 50 - MIN(pos) AS BIGINT) AS span_len,
      |  CAST(COUNT(*) AS BIGINT) AS n_windows
      |FROM g GROUP BY doc_id, grp
      |ORDER BY doc_id, span_start""".stripMargin

  /** Mirrors q249 (`ops.Multimodal.q249CrossModalDedup`): text LSH
    * pairs replayed by the q26 chain; the content→image-seed rule
    * (top-5 tokens by count desc / token asc, sorted, space-joined,
    * first 52 md5 bits) recomputed in SQL and JOINED against the
    * persisted sidecar on (doc_id, seed) — a seed drift drops rows and
    * breaks the hash; only pixels→aHash is trusted input (the q224
    * boundary). Decision = bit_count(xor) ≤ 3 per candidate pair. */
  val q249CrossModalDedup: String =
    s"""WITH $shingleCtes,
       |$lshCtes
       |, txt AS (SELECT d1, d2,
       |    CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) AS jaccard
       |  FROM common
       |  JOIN szc s1 ON d1 = s1.doc_id
       |  JOIN szc s2 ON d2 = s2.doc_id
       |  WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.5),
       |t2x AS (SELECT doc_id, unnest(l) AS tok2 FROM tok),
       |cntx AS (SELECT doc_id, tok2, COUNT(*) AS n FROM t2x GROUP BY 1, 2),
       |rkx AS (SELECT doc_id, tok2,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, tok2) AS rn
       |  FROM cntx),
       |fpx AS (SELECT doc_id,
       |    CAST(('0x' || substr(md5(string_agg(tok2, ' ' ORDER BY tok2)), 1, 13))
       |      AS BIGINT) AS seed
       |  FROM rkx WHERE rn <= 5 GROUP BY doc_id),
       |imgh AS (SELECT i.doc_id, i.ahash
       |  FROM read_parquet('${graft.ops.Multimodal.CrossModalHashPath}/*.parquet') i
       |  JOIN fpx ON i.doc_id = fpx.doc_id AND i.seed = fpx.seed)
       |SELECT t.d1, t.d2, t.jaccard,
       |  CAST(bit_count(xor(h1.ahash, h2.ahash)) AS BIGINT) AS img_hamming,
       |  (bit_count(xor(h1.ahash, h2.ahash)) <= 3) AS joint_dup
       |FROM txt t
       |JOIN imgh h1 ON t.d1 = h1.doc_id
       |JOIN imgh h2 ON t.d2 = h2.doc_id
       |ORDER BY t.d1, t.d2""".stripMargin

  /** Shared CTEs for the q250/q253 eval pair: the q22 scoring
    * expressions + argmax prediction, verbatim. */
  private val langPredCtes =
    """lp AS (SELECT doc_id, lang AS lang_label,
      |  CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|of|to|and|in|is|it|for)\b')) AS BIGINT) AS n_en,
      |  CAST(len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|von|mit|ein|zu)\b')) AS BIGINT) AS n_de,
      |  CAST(len(regexp_extract_all(lower(text), '\b(el|la|los|las|que|y|en|un|una|por)\b')) AS BIGINT) AS n_es,
      |  CAST(len(regexp_extract_all(lower(text), '\b(le|les|et|un|une|pour|dans|sur|avec)\b')) AS BIGINT) AS n_fr
      |  FROM documents),
      |pred AS (SELECT *,
      |  CASE WHEN n_en >= greatest(n_de, n_es, n_fr) THEN 'en'
      |       WHEN n_de >= greatest(n_es, n_fr) THEN 'de'
      |       WHEN n_es >= n_fr THEN 'es'
      |       ELSE 'fr' END AS lang_pred FROM lp)""".stripMargin

  /** Mirrors q250 (`ops.Evaluation.q250LangIdEval`): confusion counts,
    * per-class P/R/F1 with the NULL-guard rules, macro row averaging
    * rounded values through DECIMAL(28,12) with undefined-as-0. */
  val q250LangIdEval: String =
    s"""WITH $langPredCtes,
       |cells AS (SELECT lang_label, lang_pred, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM pred GROUP BY 1, 2),
       |bt AS (SELECT lang_label AS lang, CAST(SUM(c) AS BIGINT) AS n_true,
       |    CAST(SUM(CASE WHEN lang_pred = lang_label THEN c ELSE 0 END) AS BIGINT) AS tp
       |  FROM cells GROUP BY 1),
       |bp AS (SELECT lang_pred AS lang, CAST(SUM(c) AS BIGINT) AS n_pred
       |  FROM cells GROUP BY 1),
       |pc AS (SELECT bt.lang, n_true, CAST(COALESCE(n_pred, 0) AS BIGINT) AS n_pred, tp,
       |    CASE WHEN COALESCE(n_pred, 0) > 0
       |      THEN round(CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE), 12) END AS prec_v,
       |    CASE WHEN n_true > 0
       |      THEN round(CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE), 12) END AS rec_v
       |  FROM bt LEFT JOIN bp ON bt.lang = bp.lang),
       |pc2 AS (SELECT *,
       |    CASE WHEN prec_v IS NOT NULL AND rec_v IS NOT NULL AND prec_v + rec_v > 0.0
       |      THEN round(2.0 * prec_v * rec_v / (prec_v + rec_v), 12) END AS f1_v
       |  FROM pc),
       |mac AS (SELECT '__macro' AS lang, CAST(SUM(n_true) AS BIGINT) AS n_true,
       |    CAST(SUM(n_pred) AS BIGINT) AS n_pred, CAST(SUM(tp) AS BIGINT) AS tp,
       |    round(CAST(SUM(CAST(COALESCE(prec_v, 0.0) AS DECIMAL(28,12))) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 12) AS prec_v,
       |    round(CAST(SUM(CAST(COALESCE(rec_v, 0.0) AS DECIMAL(28,12))) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 12) AS rec_v,
       |    round(CAST(SUM(CAST(COALESCE(f1_v, 0.0) AS DECIMAL(28,12))) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 12) AS f1_v
       |  FROM pc2)
       |SELECT lang, n_true, n_pred, tp, prec_v AS precision, rec_v AS recall,
       |  f1_v AS f1 FROM pc2
       |UNION ALL
       |SELECT lang, n_true, n_pred, tp, prec_v, rec_v, f1_v FROM mac
       |ORDER BY lang""".stripMargin

  /** Mirrors q251 (`ops.Mixing.q251SourceJsd`): the source-term-only
    * JSD with the absent-term closed form ln2·(1 − Q_s); per-term
    * contributions rounded 12 and decimal-summed, ln2 literal. */
  val q251SourceJsd: String =
    s"""WITH $tokCte,
       |t2 AS (SELECT doc_id, unnest(l) AS w FROM tok),
       |st AS (SELECT d.source, t2.w, CAST(COUNT(*) AS BIGINT) AS k
       |  FROM t2 JOIN documents d USING (doc_id) GROUP BY 1, 2),
       |corpus AS (SELECT w, CAST(SUM(k) AS BIGINT) AS ck FROM st GROUP BY 1),
       |gt AS (SELECT source, CAST(SUM(k) AS BIGINT) AS ns FROM st GROUP BY 1),
       |ct AS (SELECT CAST(SUM(ck) AS BIGINT) AS nc FROM corpus),
       |contrib AS (SELECT st.source,
       |    CAST(round((CAST(k AS DOUBLE) / CAST(ns AS DOUBLE)) *
       |      ln((CAST(k AS DOUBLE) / CAST(ns AS DOUBLE)) /
       |        (((CAST(k AS DOUBLE) / CAST(ns AS DOUBLE)) +
       |          (CAST(ck - k AS DOUBLE) / CAST(nc - ns AS DOUBLE))) / 2.0)), 12)
       |      AS DECIMAL(28,12)) AS aterm,
       |    CAST(CASE WHEN ck > k THEN
       |      round((CAST(ck - k AS DOUBLE) / CAST(nc - ns AS DOUBLE)) *
       |        ln((CAST(ck - k AS DOUBLE) / CAST(nc - ns AS DOUBLE)) /
       |          (((CAST(k AS DOUBLE) / CAST(ns AS DOUBLE)) +
       |            (CAST(ck - k AS DOUBLE) / CAST(nc - ns AS DOUBLE))) / 2.0)), 12)
       |      ELSE 0.0 END AS DECIMAL(28,12)) AS bterm,
       |    CAST(round(CAST(ck - k AS DOUBLE) / CAST(nc - ns AS DOUBLE), 12)
       |      AS DECIMAL(28,12)) AS qr
       |  FROM st JOIN corpus USING (w) JOIN gt USING (source) CROSS JOIN ct
       |  WHERE nc - ns > 0),
       |present AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
       |    (SELECT ns FROM gt g WHERE g.source = contrib.source) AS n_tokens,
       |    SUM(aterm) AS asum, SUM(bterm) AS bsum, SUM(qr) AS qsum
       |  FROM contrib GROUP BY source),
       |fin AS (SELECT source, n_terms, n_tokens,
       |    round(round(0.5 * (CAST(asum AS DOUBLE) + CAST(bsum AS DOUBLE) +
       |      round(0.6931471805599453 * (1.0 - CAST(qsum AS DOUBLE)), 12)), 12)
       |      / 0.6931471805599453, 12) AS jsd_bits
       |  FROM present)
       |SELECT gt.source, fin.n_terms, fin.n_tokens, fin.jsd_bits
       |FROM gt LEFT JOIN fin USING (source)
       |ORDER BY source""".stripMargin

  /** Mirrors q252 (`ops.Stump.q252DecisionStump`): the exact info-gain
    * stump over the (char-length → quality-band) histogram — entropies
    * in nats with per-side 0·ln0 guards, weighted sides rounded 12,
    * gain in bits rounded 6, top-5 by (gain desc, threshold asc). */
  val q252DecisionStump: String =
    """WITH d AS (SELECT CAST(length(text) AS BIGINT) AS v,
      |    CAST(CASE WHEN CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
      |      BETWEEN 20 AND 200 THEN 1 ELSE 0 END AS BIGINT) AS y
      |  FROM documents),
      |hist AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c, CAST(SUM(y) AS BIGINT) AS pos
      |  FROM d GROUP BY v),
      |cum AS (SELECT v,
      |    CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS n_left,
      |    CAST(SUM(pos) OVER (ORDER BY v) AS BIGINT) AS pos_left
      |  FROM hist),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS p,
      |    MAX(v) AS vmax FROM hist),
      |sides AS (SELECT v, n_left, pos_left,
      |    CAST(n - n_left AS BIGINT) AS n_right,
      |    CAST(p - pos_left AS BIGINT) AS pos_right, n, p
      |  FROM cum CROSS JOIN tot WHERE v < vmax),
      |g AS (SELECT v, n_left, pos_left, n_right, pos_right,
      |    round(round(CASE WHEN p > 0 AND p < n THEN
      |        -((CAST(p AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(p AS DOUBLE) / CAST(n AS DOUBLE)))
      |        - ((CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE)))
      |      ELSE 0.0 END, 12)
      |      - round((CAST(n_left AS DOUBLE) / CAST(n AS DOUBLE)) *
      |          round(CASE WHEN pos_left > 0 AND pos_left < n_left THEN
      |            -((CAST(pos_left AS DOUBLE) / CAST(n_left AS DOUBLE)) * ln(CAST(pos_left AS DOUBLE) / CAST(n_left AS DOUBLE)))
      |            - ((CAST(n_left - pos_left AS DOUBLE) / CAST(n_left AS DOUBLE)) * ln(CAST(n_left - pos_left AS DOUBLE) / CAST(n_left AS DOUBLE)))
      |          ELSE 0.0 END, 12), 12)
      |      - round((CAST(n_right AS DOUBLE) / CAST(n AS DOUBLE)) *
      |          round(CASE WHEN pos_right > 0 AND pos_right < n_right THEN
      |            -((CAST(pos_right AS DOUBLE) / CAST(n_right AS DOUBLE)) * ln(CAST(pos_right AS DOUBLE) / CAST(n_right AS DOUBLE)))
      |            - ((CAST(n_right - pos_right AS DOUBLE) / CAST(n_right AS DOUBLE)) * ln(CAST(n_right - pos_right AS DOUBLE) / CAST(n_right AS DOUBLE)))
      |          ELSE 0.0 END, 12), 12), 12) AS gain_nats
      |  FROM sides)
      |SELECT v AS threshold, n_left, pos_left, n_right, pos_right,
      |  round(gain_nats / 0.6931471805599453, 6) AS gain_bits
      |FROM g
      |ORDER BY gain_bits DESC, threshold
      |LIMIT 5""".stripMargin

  /** Mirrors q253 (`ops.Evaluation.q253EceReliability`): conf rounded
    * 12, equal-width bins clamped at b9, per-bin rounded means through
    * DECIMAL(28,12), ECE from rounded n·gap products, round 6. */
  val q253EceReliability: String =
    s"""WITH $langPredCtes,
       |scored AS (SELECT *,
       |    CASE WHEN n_en + n_de + n_es + n_fr > 0
       |      THEN round(CAST(n_en AS DOUBLE) / CAST(n_en + n_de + n_es + n_fr AS DOUBLE), 12)
       |      ELSE 0.0 END AS conf,
       |    CAST(CASE WHEN lang_label = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
       |  FROM pred),
       |binned AS (SELECT least(9, CAST(floor(conf * 10.0) AS BIGINT)) AS bin,
       |    conf, y FROM scored),
       |bins AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
       |    round(CAST(SUM(CAST(conf AS DECIMAL(28,12))) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 12) AS avg_conf
       |  FROM binned GROUP BY bin),
       |bins2 AS (SELECT bin, n, n_pos, avg_conf,
       |    round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 12) AS acc
       |  FROM bins),
       |bins3 AS (SELECT *, round(abs(acc - avg_conf), 12) AS gap FROM bins2),
       |tot AS (SELECT '__total' AS bin_label, CAST(SUM(n) AS BIGINT) AS n,
       |    CAST(SUM(n_pos) AS BIGINT) AS n_pos,
       |    CAST(NULL AS DOUBLE) AS avg_conf, CAST(NULL AS DOUBLE) AS acc,
       |    round(CAST(SUM(CAST(round(n * gap, 12) AS DECIMAL(28,12))) AS DOUBLE)
       |      / CAST(SUM(n) AS DOUBLE), 6) AS gap
       |  FROM bins3)
       |SELECT 'b' || CAST(bin AS VARCHAR) AS bin_label, n, n_pos, avg_conf, acc, gap
       |FROM bins3
       |UNION ALL
       |SELECT * FROM tot
       |ORDER BY bin_label""".stripMargin

  /** Mirrors q254 (`ops.Vocabulary.q254OovDrift`): snapshot vocab from
    * the %3=0 slice, occurrence and type OOV per (slice, source). */
  val q254OovDrift: String =
    s"""WITH $tokCte,
       |t2 AS (SELECT doc_id, unnest(l) AS w FROM tok),
       |base AS (SELECT d.doc_id % 3 AS slice, d.source, t2.w,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM t2 JOIN documents d USING (doc_id) GROUP BY 1, 2, 3),
       |vocab AS (SELECT DISTINCT w FROM base WHERE slice = 0)
       |SELECT base.slice, base.source,
       |  CAST(SUM(c) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN vocab.w IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_oov,
       |  CAST(SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new_types,
       |  round(CAST(SUM(CASE WHEN vocab.w IS NULL THEN c ELSE 0 END) AS DOUBLE)
       |    / CAST(SUM(c) AS DOUBLE), 6) AS oov_rate
       |FROM base LEFT JOIN vocab ON base.w = vocab.w
       |WHERE base.slice <> 0
       |GROUP BY 1, 2
       |ORDER BY slice, source""".stripMargin

  /** Mirrors q255 (`ops.HeavyHitters.q255HeavyHitterChurn`): exact
    * top-20 per doc_id half (midpoint split), entered/left/stayed. */
  val q255HeavyHitterChurn: String =
    s"""WITH $tokCte,
       |sp AS (SELECT (MIN(doc_id) + MAX(doc_id) + 1) // 2 AS split FROM documents),
       |t2 AS (SELECT doc_id, unnest(l) AS w FROM tok),
       |cnt AS (SELECT CASE WHEN t2.doc_id < sp.split THEN 'a' ELSE 'b' END AS half,
       |    t2.w, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM t2 CROSS JOIN sp GROUP BY 1, 2),
       |ta AS (SELECT w, c, CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS rank
       |  FROM cnt WHERE half = 'a' ORDER BY c DESC, w LIMIT 20),
       |tb AS (SELECT w, c, CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS rank
       |  FROM cnt WHERE half = 'b' ORDER BY c DESC, w LIMIT 20)
       |SELECT COALESCE(ta.w, tb.w) AS token,
       |  ta.rank AS rank_a, ta.c AS cnt_a, tb.rank AS rank_b, tb.c AS cnt_b,
       |  CASE WHEN ta.w IS NOT NULL AND tb.w IS NOT NULL THEN 'stayed'
       |       WHEN ta.w IS NOT NULL THEN 'left' ELSE 'entered' END AS status
       |FROM ta FULL OUTER JOIN tb ON ta.w = tb.w
       |ORDER BY token""".stripMargin

  /** Mirrors q257 (`ops.RobustStats.q257MahalanobisOutliers`): exact
    * decimal moments, rounded-12 means/covariances (means nested
    * rounded exactly as the engine's reused column), closed-form 2×2
    * inverse through the determinant, d² rounded 6, top-20. */
  val q257MahalanobisOutliers: String =
    """WITH tok2 AS (SELECT doc_id,
      |    regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS l
      |  FROM documents),
      |d AS (SELECT doc_id,
      |    CAST(len(l) AS BIGINT) AS x,
      |    CAST(len(list_distinct(l)) AS BIGINT) AS y
      |  FROM tok2),
      |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(x AS DECIMAL(38,0))) AS sx, SUM(CAST(y AS DECIMAL(38,0))) AS sy,
      |    SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
      |    SUM(CAST(y * y AS DECIMAL(38,0))) AS syy,
      |    SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy
      |  FROM d),
      |st1 AS (SELECT n, sxx, syy, sxy,
      |    round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 12) AS mx,
      |    round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 12) AS my
      |  FROM mom),
      |st2 AS (SELECT mx, my,
      |    round(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - mx * mx, 12) AS cxx,
      |    round(CAST(syy AS DOUBLE) / CAST(n AS DOUBLE) - my * my, 12) AS cyy,
      |    round(CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) - mx * my, 12) AS cxy
      |  FROM st1),
      |st AS (SELECT *, round(cxx * cyy - cxy * cxy, 12) AS det FROM st2)
      |SELECT doc_id, x AS n_tokens, y AS n_types,
      |  CASE WHEN det > 0.0 THEN
      |    round((cyy * (CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx)
      |      - 2.0 * cxy * (CAST(x AS DOUBLE) - mx) * (CAST(y AS DOUBLE) - my)
      |      + cxx * (CAST(y AS DOUBLE) - my) * (CAST(y AS DOUBLE) - my)) / det, 6)
      |  END AS d2
      |FROM d CROSS JOIN st
      |ORDER BY d2 DESC NULLS LAST, doc_id
      |LIMIT 20""".stripMargin

  /** Mirrors q258 (`ops.ExactSubstring.q258ExactSubstringCutPlan`):
    * q207's definitional dup scan, minus each window string's corpus-
    * first occurrence (min doc_id, min pos), merged to cut spans and
    * rolled up per doc. */
  val q258ExactSubstringCutPlan: String =
    """WITH d AS (SELECT doc_id, text FROM documents),
      |w AS (SELECT doc_id, unnest(generate_series(1, len(text) - 49)) AS pos, text
      |  FROM d),
      |s AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |    substr(text, CAST(pos AS INT), 50) AS win FROM w),
      |dup AS (SELECT win FROM s GROUP BY win HAVING COUNT(*) >= 2),
      |occ AS (SELECT s.doc_id, s.pos, s.win FROM s JOIN dup USING (win)),
      |rk AS (SELECT doc_id, pos,
      |    row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
      |  FROM occ),
      |cuts AS (SELECT DISTINCT doc_id, pos FROM rk WHERE rn > 1),
      |isl AS (SELECT doc_id, pos,
      |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 50
      |      THEN 0 ELSE 1 END AS brk
      |  FROM cuts),
      |g AS (SELECT doc_id, pos,
      |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM isl),
      |spans AS (SELECT doc_id,
      |    CAST(MAX(pos) + 50 - MIN(pos) AS BIGINT) AS span_len,
      |    CAST(COUNT(*) AS BIGINT) AS nw
      |  FROM g GROUP BY doc_id, grp),
      |per AS (SELECT doc_id, CAST(SUM(nw) AS BIGINT) AS n_cut_windows,
      |    CAST(COUNT(*) AS BIGINT) AS n_cut_spans,
      |    CAST(SUM(span_len) AS BIGINT) AS chars_cut
      |  FROM spans GROUP BY doc_id)
      |SELECT per.doc_id, n_cut_windows, n_cut_spans, chars_cut,
      |  CAST(length(d.text) AS BIGINT) AS orig_len,
      |  CAST(length(d.text) AS BIGINT) - chars_cut AS cleaned_len
      |FROM per JOIN d USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Mirrors q259 (`ops.Mixing.q259RepresentationAudit`): independence
    * expecteds and Pearson residuals over the source × lang grid. */
  val q259RepresentationAudit: String =
    """WITH grid AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS obs
      |  FROM documents GROUP BY 1, 2),
      |rt AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS row_n FROM grid GROUP BY 1),
      |ct AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS col_n FROM grid GROUP BY 1),
      |tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM grid),
      |e AS (SELECT grid.source, grid.lang, obs,
      |    round(CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE), 6)
      |      AS expected
      |  FROM grid JOIN rt USING (source) JOIN ct USING (lang) CROSS JOIN tot),
      |r AS (SELECT *,
      |    round((CAST(obs AS DOUBLE) - expected) / sqrt(expected), 6) AS residual
      |  FROM e)
      |SELECT source, lang, obs, expected, residual,
      |  CASE WHEN residual > 2.0 THEN 'over'
      |       WHEN residual < -2.0 THEN 'under' ELSE 'ok' END AS verdict
      |FROM r
      |ORDER BY source, lang""".stripMargin

  /** Mirrors q256 (`ops.StreamingGates.q256LateDataAudit`): replays
    * the slice assignment (time-thirds + %37 two-slice displacement),
    * Spark's watermark sequence (max event-time MILLISECONDS over
    * earlier batches − 2 h, scaled to µs) and the EMPIRICALLY PINNED
    * drop rule (ProbeLate): a row is dropped iff its hourly WINDOW
    * END ≤ the PREVIOUS batch's watermark — the watermark whose
    * commit already evicted the window; one-batch lateness is
    * lossless. Reconciled per window against batch truth.
    * Hour-aligned window ends make the ≤-vs-< and ms-vs-µs boundary
    * variants indistinguishable by construction (a tie would need the
    * data max ms to land exactly on an hour boundary), so the pinned
    * rule is robust to fixture regeneration. */
  val q256LateDataAudit: String =
    """WITH ev AS (SELECT event_id, epoch_ns(ts) AS tsn FROM events),
      |b AS (SELECT MIN(tsn) AS lo, MAX(tsn) AS hi FROM ev),
      |sl AS (SELECT event_id, tsn, tsn // 1000 AS tsu,
      |    least(2, CAST(floor(CAST(tsn - lo AS DOUBLE) * 3.0 /
      |      (CAST(hi - lo AS DOUBLE) + 1.0)) AS BIGINT)
      |      + CASE WHEN event_id % 37 = 0 THEN 2 ELSE 0 END) AS slice
      |  FROM ev CROSS JOIN b),
      |mx AS (SELECT slice, MAX(tsu) AS mx_us FROM sl GROUP BY slice),
      |wm AS (SELECT s.slice,
      |    (MAX(m.mx_us // 1000) - 7200000) * 1000 AS wm_prev_us
      |  FROM (SELECT DISTINCT slice FROM sl) s
      |  LEFT JOIN mx m ON m.slice < s.slice - 1
      |  GROUP BY s.slice),
      |surv AS (SELECT sl.tsu - sl.tsu % 3600000000 AS window_start_us
      |  FROM sl JOIN wm USING (slice)
      |  WHERE wm.wm_prev_us IS NULL
      |     OR (sl.tsu - sl.tsu % 3600000000) + 3600000000 > wm.wm_prev_us),
      |ns AS (SELECT window_start_us, CAST(COUNT(*) AS BIGINT) AS n_stream
      |  FROM surv GROUP BY 1),
      |nb AS (SELECT tsu - tsu % 3600000000 AS window_start_us,
      |    CAST(COUNT(*) AS BIGINT) AS n_batch
      |  FROM sl GROUP BY 1)
      |SELECT nb.window_start_us,
      |  CAST(COALESCE(ns.n_stream, 0) AS BIGINT) AS n_stream, nb.n_batch,
      |  nb.n_batch - CAST(COALESCE(ns.n_stream, 0) AS BIGINT) AS n_dropped_late
      |FROM nb LEFT JOIN ns USING (window_start_us)
      |ORDER BY window_start_us""".stripMargin

  /** Mirrors q260 (`ops.KnnGraph.q260LabelNoise`): the exact decimal
    * top-5 neighborhood (knnTopCtes), label agreement per vector, the
    * integer k·n_agree ≤ n fence. */
  val q260LabelNoise: String =
    s"""WITH ${knnTopCtes(5)},
       |lbl AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
       |agree AS (SELECT t.src AS vec_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_neighbors,
       |    CAST(SUM(CASE WHEN ls.label = ld.label THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_agree
       |  FROM top t
       |  JOIN lbl ls ON t.src = ls.vec_id
       |  JOIN lbl ld ON t.dst = ld.vec_id
       |  GROUP BY t.src)
       |SELECT l.vec_id, l.label,
       |  CAST(COALESCE(a.n_neighbors, 0) AS BIGINT) AS n_neighbors,
       |  CAST(COALESCE(a.n_agree, 0) AS BIGINT) AS n_agree,
       |  CASE WHEN COALESCE(a.n_neighbors, 0) > 0
       |    THEN round(CAST(COALESCE(a.n_agree, 0) AS DOUBLE) /
       |      CAST(a.n_neighbors AS DOUBLE), 12) END AS agree_frac,
       |  (COALESCE(a.n_neighbors, 0) > 0 AND
       |    5 * COALESCE(a.n_agree, 0) <= COALESCE(a.n_neighbors, 0)) AS suspect
       |FROM lbl l LEFT JOIN agree a USING (vec_id)
       |ORDER BY l.vec_id""".stripMargin

  /** Mirrors q261 (`ops.Clustering.q261FisherSeparability`): per
    * (label, dim) decimal moments, pairwise Fisher ratios, per-pair
    * argmax with (fisher DESC NULLS LAST, dim) tie-break. */
  val q261FisherSeparability: String =
    """WITH e2 AS (SELECT CAST(label AS BIGINT) AS label, embedding FROM embeddings),
      |x2 AS (SELECT label, embedding,
      |    unnest(generate_series(1, len(embedding))) AS i FROM e2),
      |xv AS (SELECT label, CAST(i AS BIGINT) AS i,
      |    CAST(embedding[i] AS DOUBLE) AS x FROM x2),
      |mom AS (SELECT label, i, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(x AS DECIMAL(28,18))) AS sx,
      |    SUM(CAST(x * x AS DECIMAL(28,18))) AS sxx
      |  FROM xv GROUP BY 1, 2),
      |st AS (SELECT label, i, n,
      |    round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 12) AS m
      |  FROM mom),
      |stv AS (SELECT st.label, st.i, st.n, st.m,
      |    round(CAST(mom.sxx AS DOUBLE) / CAST(mom.n AS DOUBLE) - st.m * st.m, 12) AS v
      |  FROM st JOIN mom ON st.label = mom.label AND st.i = mom.i),
      |pairs AS (SELECT a.label AS l1, b.label AS l2, a.n AS n1, b.n AS n2,
      |    a.i AS dim,
      |    CASE WHEN a.v + b.v > 0.0
      |      THEN round((a.m - b.m) * (a.m - b.m) / (a.v + b.v), 6) END AS fisher
      |  FROM stv a JOIN stv b ON a.i = b.i AND a.label < b.label),
      |rk2 AS (SELECT *, row_number() OVER (PARTITION BY l1, l2
      |    ORDER BY fisher DESC NULLS LAST, dim) AS rn FROM pairs)
      |SELECT l1, l2, n1, n2, dim AS best_dim, fisher
      |FROM rk2 WHERE rn = 1
      |ORDER BY l1, l2""".stripMargin

  /** Mirrors q262 (`ops.Sharding.q262RendezvousRebalance`): both
    * argmax-of-md5 shard assignments replayed over unnested shard
    * series (own CTE level — the r13 unnest/WHERE bind lesson), the
    * cell grid, the moved flag. */
  val q262RendezvousRebalance: String =
    """WITH d AS (SELECT doc_id FROM documents),
      |sn AS (SELECT doc_id, unnest(generate_series(0, 16)) AS sh FROM d),
      |w AS (SELECT doc_id, CAST(sh AS BIGINT) AS sh,
      |    substr(md5('rv' || CAST(sh AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 13) AS wt
      |  FROM sn),
      |old_r AS (SELECT doc_id, sh,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, sh DESC) AS rn
      |  FROM w WHERE sh < 16),
      |new_r AS (SELECT doc_id, sh,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, sh DESC) AS rn
      |  FROM w),
      |asg AS (SELECT o.doc_id, o.sh AS old_shard, n.sh AS new_shard
      |  FROM old_r o JOIN new_r n ON o.doc_id = n.doc_id
      |  WHERE o.rn = 1 AND n.rn = 1)
      |SELECT old_shard, new_shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  (old_shard <> new_shard) AS moved
      |FROM asg GROUP BY 1, 2
      |ORDER BY old_shard, new_shard""".stripMargin
}
