"""DuckDB SQL mirror of the golden extraction formulas.

The corpus is a pure function of the ``documents`` table
(``corpus/generator.py``), so a correct extractor's output is TOO —
which lets plain ANSI SQL over the ``documents`` view serve as an
independent oracle for the driver's correctness gate. Each fragment
here must stay in lockstep with the matching Python golden function;
``tests/test_sqlmirror.py`` pins SQL == Python == engine on real data.

All fragments assume a view/table named ``documents`` with columns
(doc_id, text, lang, source).
"""

from __future__ import annotations

# Shared scaffolding: paragraph count + body reconstruction implementing
# paragraphs_of() (chunks of 40 words, tail < 10 words merged back).
GOLDEN_CTE = r"""
WITH base AS (
  SELECT doc_id, text, lang, source,
         string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS nw,
         (doc_id % 5 = 2) AS is_pdf,
         (doc_id % 97 = 13) AS is_corrupt
  FROM documents
), paras AS (
  SELECT *,
    CASE WHEN nw <= 40 THEN 1
         WHEN (nw % 40) > 0 AND (nw % 40) < 10
              THEN CAST(ceil(nw / 40.0) AS BIGINT) - 1
         ELSE CAST(ceil(nw / 40.0) AS BIGINT)
    END AS nparas
  FROM base
), gold AS (
  SELECT doc_id, text, lang, source, nw, nparas, is_pdf, is_corrupt,
    'https://' || source || '.example.com/' || lang || '/' ||
        lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
    'Document ' || doc_id || ' (' || lang || '/' || source || ')' AS title,
    array_to_string(
      list_transform(range(0, nparas),
        i -> array_to_string(
               list_slice(words, i * 40 + 1,
                          CASE WHEN i = nparas - 1 THEN nw ELSE (i + 1) * 40 END),
               ' ')),
      chr(10) || chr(10)) AS body_text,
    'user' || doc_id || '@' || source || '.example.com' AS ent_email,
    '+1-555-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') AS ent_phone,
    '2024-' || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || '-' ||
        lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') AS ent_date,
    'DOC-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS ent_id,
    'https://archive.example.org/item/' || doc_id AS ent_url,
    CASE WHEN is_corrupt THEN 1
         WHEN is_pdf THEN CAST(ceil((2 + nparas) / 4.0) AS BIGINT)
         ELSE 1 END AS page_count
  FROM paras
), gold2 AS (
  SELECT *,
    'Contact ' || ent_email || ' or call ' || ent_phone ||
    '. Published on ' || ent_date || '. Reference ID ' || ent_id ||
    '. Details at ' || ent_url || '.' AS entity_para
  FROM gold
), golden AS (
  SELECT *,
    CASE WHEN is_corrupt THEN ''
         ELSE title || chr(10) || chr(10) || body_text || chr(10) || chr(10) || entity_para
    END AS extracted_text,
    CASE WHEN is_corrupt THEN 0 ELSE 2 + nparas END AS n_blocks_kept,
    CASE WHEN is_corrupt THEN 'failed' ELSE 'ok' END AS parse_status
  FROM gold2
)
"""

EXTRACT_TEXT_SQL = GOLDEN_CTE + r"""
SELECT url,
       lang,
       extracted_text,
       sha256(extracted_text) AS text_sha256,
       n_blocks_kept,
       parse_status,
       page_count
FROM golden
"""

EXTRACT_HEADERS_SQL = GOLDEN_CTE + r"""
SELECT url,
       CAST(1 AS BIGINT) AS level,
       title,
       CAST(1 AS BIGINT) AS page
FROM golden
WHERE NOT is_corrupt
"""

# One row per (doc, entity kind); deterministic resolve/verify yields
# unanimous votes → resolution 2, verified, confidence '3/3'.
_REGISTRY_TAIL = r"""
SELECT url, page_count AS page_num, '{kind}' AS kind, ent_{kind} AS value,
       CAST(2 AS BIGINT) AS resolution, TRUE AS verified,
       '3/3' AS confidence, 'ok' AS status
FROM golden WHERE NOT is_corrupt
"""

REGISTRY_SQL = GOLDEN_CTE + " UNION ALL ".join(
    _REGISTRY_TAIL.format(kind=k) for k in ("email", "phone", "date", "id", "url")
)

PAGE_STATES_SQL = GOLDEN_CTE + r"""
SELECT url,
       CAST(unnest(range(1, CASE WHEN is_corrupt THEN 1 ELSE page_count END + 1))
            AS BIGINT) AS page_num,
       CASE WHEN is_corrupt THEN 'none' ELSE 'verified' END AS status
FROM golden
"""

SPAN_STATS_SQL = GOLDEN_CTE + r"""
SELECT url,
       n_blocks_kept AS n_spans,
       CASE WHEN is_corrupt THEN 0
            ELSE len(extracted_text) - 2 * (n_blocks_kept - 1) END AS span_chars,
       CASE WHEN is_corrupt THEN 0 ELSE len(extracted_text) END AS last_span_end
FROM golden
"""

_VG_TAIL = r"""
SELECT url, '{kind}' AS kind, ent_{kind} AS value,
       '3/3' AS confidence, TRUE AS verified, CAST(2 AS BIGINT) AS resolution
FROM golden WHERE NOT is_corrupt
"""

VERIFY_GROUPED_SQL = GOLDEN_CTE + " UNION ALL ".join(
    _VG_TAIL.format(kind=k) for k in ("email", "phone", "date", "id", "url")
)

UPSERT_SQL = GOLDEN_CTE + " UNION ALL ".join(
    r"""
SELECT url, '{kind}' AS kind, ent_{kind} AS value, CAST(2 AS BIGINT) AS resolution
FROM golden WHERE NOT is_corrupt
""".format(kind=k)
    for k in ("email", "phone", "date", "id", "url")
)

PHONE_DIGITS_SQL = GOLDEN_CTE + r"""
SELECT url, ent_phone AS value,
       regexp_replace(ent_phone, '[^0-9]', '', 'g') AS digits
FROM golden WHERE NOT is_corrupt
"""

# --------------------------------------------------------------------------
# training-data ops over the raw `documents` / `embeddings` / TPC-H tables
# --------------------------------------------------------------------------

# must stay in lockstep with stages/text_analysis.py (markers, stopwords,
# regexes, fingerprint definition)
_MARK = {
    "de": "['der','die','und','nicht','das']",
    "en": "['the','and','of','a','to']",
    "es": "['el','los','y','que','de']",
    "fr": "['le','la','et','les','des']",
    "zh": "['de5','shi4','le5','zai4','he2']",
}
_STOP_SQL = (
    "['the','a','an','and','or','of','to','in','on','for','with','at','by',"
    "'from','is','are','was','were','be','been']"
)

TEXT_ANALYSIS_SQL = rf"""
WITH t AS (
  SELECT doc_id, text,
         string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS nw
  FROM documents
), scored AS (
  SELECT *,
    len(list_filter(words, w -> list_contains({_MARK['de']}, w))) AS s_de,
    len(list_filter(words, w -> list_contains({_MARK['en']}, w))) AS s_en,
    len(list_filter(words, w -> list_contains({_MARK['es']}, w))) AS s_es,
    len(list_filter(words, w -> list_contains({_MARK['fr']}, w))) AS s_fr,
    len(list_filter(words, w -> list_contains({_MARK['zh']}, w))) AS s_zh,
    greatest(
      len(list_filter(words, w -> list_contains({_MARK['de']}, w))),
      len(list_filter(words, w -> list_contains({_MARK['en']}, w))),
      len(list_filter(words, w -> list_contains({_MARK['es']}, w))),
      len(list_filter(words, w -> list_contains({_MARK['fr']}, w))),
      len(list_filter(words, w -> list_contains({_MARK['zh']}, w)))
    ) AS s_max
  FROM t
)
SELECT doc_id,
  CASE WHEN s_max = 0 THEN 'und'
       WHEN s_de = s_max THEN 'de'
       WHEN s_en = s_max THEN 'en'
       WHEN s_es = s_max THEN 'es'
       WHEN s_fr = s_max THEN 'fr'
       ELSE 'zh' END AS lang_pred,
  nw AS n_words,
  len(text) AS n_chars_measured,
  CAST(len(list_filter(words, w -> list_contains({_STOP_SQL}, w))) AS DOUBLE) / nw
      AS stopword_ratio,
  CAST(len(regexp_extract_all(text, '[^0-9A-Za-z_ \t\n\r\f\v]')) AS BIGINT) AS n_punct,
  nw AS ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\v]')) AS BIGINT)
      AS bpe_tokens,
  list_min(list_transform(
    CASE WHEN nw < 3 THEN [text]
         ELSE list_transform(range(0, nw - 2),
                             i -> array_to_string(list_slice(words, i + 1, i + 3), ' '))
    END,
    g -> substr(sha256(g), 1, 16))) AS fingerprint
FROM scored
"""


# Gopher-style quality gate over the text-analysis features; the
# thresholds and the float formulas mirror stages/text_analysis.py::
# quality_filter bit-for-bit (single IEEE ops over identical ints).
QUALITY_FILTER_SQL = "WITH ta AS (" + TEXT_ANALYSIS_SQL + """)
SELECT doc_id, n_words,
       CAST(n_chars_measured - (n_words - 1) AS DOUBLE) / n_words AS mean_word_len,
       CAST(n_punct AS DOUBLE) / greatest(n_chars_measured, 1) AS symbol_ratio,
       stopword_ratio,
       (n_words >= 20 AND n_words <= 100000
        AND CAST(n_chars_measured - (n_words - 1) AS DOUBLE) / n_words >= 3.0
        AND CAST(n_chars_measured - (n_words - 1) AS DOUBLE) / n_words <= 10.0
        AND CAST(n_punct AS DOUBLE) / greatest(n_chars_measured, 1) <= 0.1
        AND stopword_ratio >= 0.01) AS quality_pass
FROM ta
"""

DEDUP_EXACT_SQL = r"""
SELECT doc_id, text, lang, source, n_chars, sha256(text) AS text_hash
FROM documents
QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
"""

# Canonical mixture weights — the ONE place they live. The engine
# (__ray_entry__.MIX_WEIGHTS, bench q9) and every SQL mirror below
# derive from this dict, so a weight change cannot silently diverge.
MIX_WEIGHTS = {"en": 0.5, "zh": 2.5, "fr": 1.25, "es": 2.0}


def mix_weights_case_sql(weights: dict = MIX_WEIGHTS) -> str:
    """``CAST(CASE lang ... END AS DOUBLE)`` for a weights dict."""
    cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(weights.items())
    )
    return f"CAST(CASE lang {cases} ELSE 1.0 END AS DOUBLE)"


# End-to-end curation mirror: the quality gate, min-id exact dedup,
# md5-threshold mixture rebalance and seq_len=512 packing CTEs chained
# exactly as pipelines/curation.py composes the operators (weights
# substitute from MIX_WEIGHTS immediately below the definition).
CURATE_SQL = (
    "WITH qf AS (" + QUALITY_FILTER_SQL + """),
keep AS (
  SELECT d.doc_id, d.text, d.lang
  FROM documents d JOIN qf ON d.doc_id = qf.doc_id
  WHERE qf.quality_pass
),
ded AS (
  SELECT doc_id, text, lang FROM keep
  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
),
w AS (
  SELECT doc_id, text,
         __MIX_CASE__ AS w
  FROM ded
),
r AS (
  SELECT doc_id, text,
         CAST(floor(w) AS BIGINT)
         + CASE WHEN CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                     % 1000000
                     < CAST(floor((w - floor(w)) * 1000000 + 0.5) AS BIGINT)
                THEN 1 ELSE 0 END AS reps
  FROM w
),
reb AS (
  SELECT CAST(doc_id AS VARCHAR) || '#' || CAST(rep AS VARCHAR) AS key,
         len(string_split(text, ' ')) AS nw
  FROM (SELECT doc_id, text, unnest(generate_series(0, reps - 1)) AS rep
        FROM r WHERE reps > 0)
),
o AS (
  SELECT key, nw,
         CAST(COALESCE(SUM(nw) OVER (
             ORDER BY md5('pack:' || key), key
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS s
  FROM reb
),
e AS (
  SELECT key, nw, s,
         unnest(generate_series(s // 512, (s + nw - 1) // 512)) AS seq_id
  FROM o WHERE nw > 0
)
SELECT key, seq_id,
       greatest(s, seq_id * 512) - seq_id * 512 AS off_in_seq,
       greatest(s, seq_id * 512) - s AS off_in_doc,
       least(s + nw, (seq_id + 1) * 512) - greatest(s, seq_id * 512) AS n_tokens
FROM e
"""
)
CURATE_SQL = CURATE_SQL.replace("__MIX_CASE__", mix_weights_case_sql())

SIMILARITY_TOPK_SQL = r"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 10
), e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee FROM embeddings
)
SELECT query_id,
       CAST(row_number() OVER (
         PARTITION BY query_id
         ORDER BY list_cosine_similarity(qe, ee) DESC, vec_id
       ) AS BIGINT) AS rank,
       vec_id
FROM q, e
QUALIFY rank <= 5
"""

# --------------------------------------------------------------------------
# dedup / similarity oracles
# --------------------------------------------------------------------------

# Exact shingle-explode Jaccard over the reps=2 corpus (rep 1 rotates
# the word list by one — generator._rotate), parametrized by
# threshold. Two engine queries gate against it:
# - minhash_near_dups at 0.8: candidate recall at the threshold is
#   1-1e-14 (bands=32) and verification is exact Jaccard with
#   bit-identical threshold decisions (same IEEE division).
# - jaccard_near_dups at 0.7: prefix filtering has recall EXACTLY 1,
#   so the engine output must equal this oracle unconditionally.
_JACCARD_PAIRS_TEMPLATE = r"""
WITH corpus AS (
  SELECT 'https://' || source || '.example.com/' || lang || '/' ||
         lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         text
  FROM documents
  UNION ALL
  SELECT 'https://' || source || '.example.com/' || lang || '/r1/' ||
         lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         CASE WHEN len(string_split(text, ' ')) > 1
              THEN array_to_string(
                     list_slice(string_split(text, ' '), 2,
                                len(string_split(text, ' ')))
                     || [string_split(text, ' ')[1]], ' ')
              ELSE text END AS text
  FROM documents
), w AS (
  SELECT url, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS nw
  FROM corpus
), sh0 AS (
  SELECT url,
         unnest(CASE WHEN nw < 3 THEN [array_to_string(ws, ' ')]
                ELSE list_transform(range(0, nw - 2),
                     i -> array_to_string(list_slice(ws, i + 1, i + 3), ' '))
                END) AS shingle
  FROM w
), sh AS (
  SELECT DISTINCT url, shingle FROM sh0
), cnt AS (
  SELECT url, count(*) AS ns FROM sh GROUP BY url
), pair_inter AS (
  SELECT a.url AS id_a, b.url AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.url < b.url
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(i AS DOUBLE) / (ca.ns + cb.ns - i) AS jaccard
FROM pair_inter
JOIN cnt ca ON id_a = ca.url
JOIN cnt cb ON id_b = cb.url
WHERE CAST(i AS DOUBLE) / (ca.ns + cb.ns - i) >= __THR__
"""

MINHASH_PAIRS_SQL = _JACCARD_PAIRS_TEMPLATE.replace("__THR__", "0.8")
JACCARD_PAIRS_SQL = _JACCARD_PAIRS_TEMPLATE.replace("__THR__", "0.7")

# All-pairs 64-bit simhash Hamming<=3. The word hash is md5-based
# (stages/dedup.py::md5_u64 == ('0x'||substr(md5(w),1,16))::UBIGINT)
# and the 4x16-bit banding has recall EXACTLY 1 by pigeonhole, so the
# engine's banded output must equal this oracle bit-for-bit.
_SIMHASH_CTE = r"""
WITH RECURSIVE words0 AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), words AS (
  SELECT DISTINCT doc_id, w FROM words0
), h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS hv
  FROM words
), bits AS (
  SELECT doc_id, CAST(b AS INTEGER) AS bit,
         sum(CASE WHEN (hv >> CAST(b AS INTEGER)) & 1 = 1
                  THEN 1 ELSE -1 END) AS acc
  FROM h, (SELECT unnest(range(0, 64)) AS b) bs
  GROUP BY 1, 2
), sim AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN acc > 0
                       THEN CAST(1 AS UBIGINT) << bit
                       ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS fp
  FROM bits GROUP BY doc_id
), simpairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
  FROM sim a JOIN sim b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.fp, b.fp)) <= 3
)"""

SIMHASH_PAIRS_SQL = _SIMHASH_CTE + r"""
SELECT id_a, id_b, hamming FROM simpairs
"""

# Connected components of the simhash near-dup graph: cluster = min id
# reachable from each node. The recursive closure is exact at any
# component diameter; components here are tiny, so the closure stays
# small even though worst-case closure is O(n^2) per component.
DEDUP_CLUSTERS_SQL = _SIMHASH_CTE + r""",
edges AS (
  SELECT id_a AS u, id_b AS v FROM simpairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM simpairs
), reach AS (
  SELECT u AS a, u AS b FROM edges
  UNION
  SELECT r.a, e.v AS b FROM reach r JOIN edges e ON e.u = r.b
)
SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster
FROM reach GROUP BY a
"""

# End-to-end fuzzy dedup: keep = "is the cluster's min id" for
# clustered docs, TRUE for everything else; reuses the recursive
# closure above as a derived table.
KEEP_CANONICAL_SQL = (
    "SELECT d.doc_id, coalesce(c.cluster = d.doc_id, TRUE) AS keep\n"
    "FROM documents d\n"
    "LEFT JOIN (" + DEDUP_CLUSTERS_SQL + ") c ON c.doc_id = d.doc_id\n"
)

# Planted-twin predicate for embedding near-dup recovery: the exact
# >=0.95 answer over the planted set IS exactly the twin pairs
# (measured margin at sf0.1: twins >=0.99995, max non-twin 0.60), and
# banded sign-LSH misses a twin with p~2e-6 per pair.
EMBEDDING_NEAR_DUPS_SQL = r"""
SELECT vec_id AS id_a, vec_id + 1000000 AS id_b FROM embeddings
"""


def similarity_lsh_sql(dim: int = 64, bits: int = 4, k: int = 5,
                       n_queries: int = 10) -> str:
    """Bucketed-ANN oracle: the engine's sign-LSH hyperplanes are
    deterministic, so they are interpolated as double literals and the
    bucket is recomputed IN SQL. Both sides sign the SAME expression —
    the RAW dot product (the engine buckets on the raw matmul too, so
    no normalization rounding layer sits between them).

    Residual float-boundary risk, documented: numpy's matmul and
    DuckDB's list_dot_product may accumulate in different orders, so a
    dot product within ~1 ulp of 0 (or two corpus vectors whose
    cosines to a query tie within ~1 ulp under the rank's
    list_cosine_similarity vs the engine's float64 matmul) could still
    diverge. The corpus generator's embeddings are nowhere near these
    boundaries (min |dot| and min rank-gap are far above 1e-12); a
    future corpus change that lands on a boundary would surface as a
    single-row hash mismatch here, not silent corruption."""
    from vlm_ocr_doc_reader_ray.stages.similarity import _hyperplanes

    planes = _hyperplanes(dim, bits)
    terms = []
    for b in range(bits):
        lit = "[" + ", ".join(repr(float(x)) for x in planes[b]) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {lit}) > 0 "
            f"THEN {1 << b} ELSE 0 END)"
        )
    bucket_expr = " + ".join(terms)
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee,
         {bucket_expr} AS bucket
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, ee AS qe, bucket AS qbucket
  FROM e WHERE vec_id < {n_queries}
)
SELECT query_id,
       CAST(row_number() OVER (
         PARTITION BY query_id
         ORDER BY list_cosine_similarity(qe, ee) DESC, vec_id
       ) AS BIGINT) AS rank,
       vec_id
FROM q JOIN e ON e.bucket = q.qbucket
QUALIFY rank <= {k}
"""


def similarity_ivf_sql(dim: int = 64, n_cells: int = 16, k: int = 5,
                       nprobe: int = 4, n_queries: int = 10) -> str:
    """IVF-ANN oracle: the fixed deterministic codebook is
    interpolated as normalized-centroid literals; cell assignment is
    argmax of the raw dot (same argmax as the normalized cosine since
    the vector norm is a common positive factor), probes are the
    query's nprobe best cells (dot desc, cell asc), ranking mirrors
    SIMILARITY_TOPK_SQL restricted to probed cells."""
    from vlm_ocr_doc_reader_ray.stages.similarity import fixed_codebook

    cents = fixed_codebook(dim, n_cells)
    dots = ", ".join(
        "list_dot_product(CAST(embedding AS DOUBLE[]), ["
        + ", ".join(repr(float(x)) for x in row) + "])"
        for row in cents
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee,
         [{dots}] AS cd
  FROM embeddings
), cell AS (
  SELECT vec_id, ee, list_position(cd, list_max(cd)) AS cell FROM e
), q AS (
  SELECT vec_id AS query_id, ee AS qe, cd AS qcd
  FROM e WHERE vec_id < {n_queries}
), probes0 AS (
  SELECT query_id, generate_subscripts(qcd, 1) AS cid, unnest(qcd) AS d
  FROM q
), probes AS (
  SELECT query_id, cid FROM (
    SELECT query_id, cid,
           row_number() OVER (PARTITION BY query_id ORDER BY d DESC, cid) AS rn
    FROM probes0
  ) WHERE rn <= {nprobe}
)
SELECT query_id, rank, vec_id FROM (
  SELECT q.query_id,
         CAST(row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(q.qe, c.ee) DESC, c.vec_id
         ) AS BIGINT) AS rank,
         c.vec_id
  FROM q
  JOIN probes p ON p.query_id = q.query_id
  JOIN cell c ON c.cell = p.cid
) WHERE rank <= {k}
"""


MEDIA_DECODE_SQL = r"""
SELECT doc_id,
       640 + (doc_id % 5) * 160 AS width,
       360 + (doc_id % 7) * 120 AS height,
       len(text) AS payload_bytes,
       'ok' AS decode_status
FROM documents
"""

# Frame sampling over the synthetic FVID1 container: the engine
# byte-slices every 2nd fixed-size frame out of the binary payload;
# each frame's bytes are md5(doc_id:k), so SQL recomputes the sampled
# set and checksums with no codec.
MEDIA_FRAMES_SQL = r"""
WITH f AS (
  SELECT doc_id,
         CAST(unnest(range(0, 8 + doc_id % 5, 2)) AS BIGINT) AS frame_idx
  FROM documents
)
SELECT doc_id, frame_idx,
       md5(CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR))
           AS frame_md5
FROM f
"""


# Deterministic hash sampling: membership is a pure function of the
# key (md5 threshold) — identical at any parallelism, mirrored here.
HASH_SAMPLE_SQL = r"""
SELECT doc_id, lang, source
FROM documents
WHERE CAST(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
      % 1000000 < 100000
"""

# Exact discrete quantiles of per-doc word counts; engine rule
# (1-based index max(ceil(q*n),1) over the counting histogram) is
# pinned equal to quantile_disc by test.
WORD_COUNT_QUANTILES_SQL = r"""
WITH t AS (
  SELECT len(string_split(text, ' ')) AS nw FROM documents
)
SELECT unnest([0.25, 0.5, 0.9, 0.99]) AS q,
       unnest(quantile_disc(nw, [0.25, 0.5, 0.9, 0.99])) AS value
FROM t
"""

# Deterministic global shuffle rank: md5-of-key total order, seed
# 'shuffle' (ties impossible short of an md5 collision; doc_id breaks
# them anyway, matching the engine's (rk, key) sort).
DETERMINISTIC_SHUFFLE_SQL = r"""
SELECT doc_id, lang,
       row_number() OVER (
           ORDER BY md5('shuffle:' || CAST(doc_id AS VARCHAR)), doc_id
       ) - 1 AS rank
FROM documents
"""

# Histogram-sketch quantiles over n_chars, 1024 bins: deterministic,
# so the mirror recomputes the identical double arithmetic
# ((x-lo)/(hi-lo)*bins truncated, value = lo + bin*width). CAST of
# DOUBLE to BIGINT rounds in DuckDB — floor() first, which equals the
# engine's trunc since x >= lo.
CHARS_QUANTILES_APPROX_SQL = r"""
WITH v AS (
  SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
), m AS (
  SELECT min(x) AS lo, max(x) AS hi FROM v
), b AS (
  SELECT least(greatest(CAST(floor((x - lo) / (hi - lo) * 1024) AS BIGINT),
               0), 1023) AS bin
  FROM v, m
), h AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY bin
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM h
), cum AS (
  SELECT bin, sum(c) OVER (ORDER BY bin) AS cs FROM h
), qs AS (
  SELECT unnest([0.25, 0.5, 0.9, 0.99]::DOUBLE[]) AS q
), sel AS (
  SELECT q, min(bin) AS bin
  FROM qs JOIN cum ON cum.cs >= greatest(ceil(q * (SELECT n FROM tot)), 1)
  GROUP BY q
)
SELECT q, lo + bin * ((hi - lo) / 1024) AS value,
       (hi - lo) / 1024 AS err
FROM sel, m
"""

# Inverted index: distinct (term, doc) postings + exact per-term
# document frequency, min_df = 3. Same split(' ') tokenization as
# every mirrored text op.
TERM_POSTINGS_SQL = r"""
WITH e AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS term, doc_id
  FROM documents
), d AS (
  SELECT term, doc_id,
         CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df
  FROM e
)
SELECT term, doc_id, df FROM d WHERE df >= 3
"""

# Per-label mean embedding, exact: components quantized to int64
# (floor(v*1e6 + 0.5) — the engine's float convention) and summed as
# integers, mean divided back out with the same two-step expression
# the engine evaluates (s / 1e6 / n in DOUBLE).
LABEL_CENTROIDS_SQL = r"""
WITH e AS (
  SELECT label,
         unnest(list_transform(range(1, len(embedding) + 1),
                i -> struct_pack(idx := i,
                                 q := CAST(floor(CAST(embedding[i] AS DOUBLE)
                                                 * 1000000 + 0.5) AS BIGINT)))) AS u
  FROM embeddings
)
SELECT label, CAST(u.idx AS BIGINT) AS idx,
       CAST(sum(u.q) AS DOUBLE) / 1000000 / count(*) AS mean
FROM e GROUP BY label, u.idx
"""

# Per-doc overlap with corpus-frequent bigrams (count >= 40); docs
# with fewer than 2 words score 0/0. Same bigram explode as
# HEAVY_HITTERS_SQL.
BOILERPLATE_OVERLAP_SQL = r"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS nw
  FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_transform(range(0, nw - 1),
                i -> array_to_string(list_slice(ws, i + 1, i + 2), ' '))) AS ngram
  FROM t WHERE nw >= 2
), hh AS (
  SELECT ngram FROM g GROUP BY ngram HAVING count(*) >= 40
), per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS ngrams,
         CAST(sum(CASE WHEN ngram IN (SELECT ngram FROM hh)
                       THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM g GROUP BY doc_id
)
SELECT t.doc_id, COALESCE(per.ngrams, 0) AS ngrams,
       COALESCE(per.hits, 0) AS hits
FROM t LEFT JOIN per ON t.doc_id = per.doc_id
"""

# Deterministic mixture rebalancing: floor(w) copies per row plus one
# iff md5('mix:'||key) mod 1e6 < round(frac(w)*1e6) — same membership
# rule as HASH_SAMPLE_SQL. Weights are dyadic floats so DOUBLE
# arithmetic is exact on both sides.
LANG_REBALANCE_SQL = r"""
WITH w AS (
  SELECT doc_id, lang,
         __MIX_CASE__ AS w
  FROM documents
), r AS (
  SELECT doc_id, lang,
         CAST(floor(w) AS BIGINT)
         + CASE WHEN CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                     % 1000000
                     < CAST(floor((w - floor(w)) * 1000000 + 0.5) AS BIGINT)
                THEN 1 ELSE 0 END AS reps
  FROM w
)
SELECT doc_id, lang, unnest(generate_series(0, reps - 1)) AS rep
FROM r WHERE reps > 0
"""
LANG_REBALANCE_SQL = LANG_REBALANCE_SQL.replace(
    "__MIX_CASE__", mix_weights_case_sql()
)

# First 15k tokens of the md5-shuffled corpus; straddling doc
# truncated. Same total order + prefix-sum arithmetic as the engine's
# token_budget_head (seed 'shuffle').
TOKEN_BUDGET_HEAD_SQL = r"""
WITH t AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS nw,
         md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS rk
  FROM documents
), o AS (
  SELECT doc_id, lang, nw,
         CAST(COALESCE(SUM(nw) OVER (
             ORDER BY rk, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS s
  FROM t
)
SELECT doc_id, lang, nw,
       least(nw, 15000 - s) AS n_tokens,
       least(nw, 15000 - s) < nw AS truncated
FROM o WHERE s < 15000 AND nw > 0
"""

# Per-language exact discrete quantiles of per-doc word counts;
# engine twin reads them off grouped counting histograms with the
# same quantile_disc index rule.
LANG_WORD_COUNT_QUANTILES_SQL = r"""
WITH t AS (
  SELECT lang, len(string_split(text, ' ')) AS nw FROM documents
)
SELECT lang,
       unnest([0.5, 0.9]) AS q,
       unnest(quantile_disc(nw, [0.5, 0.9])) AS value
FROM t GROUP BY lang
"""

# Concat-and-chunk sequence packing at seq_len=512: docs laid
# end-to-end in md5('pack:'||key) order, exact global token offsets
# via a window sum, one row per doc×sequence overlap segment. Engine
# twin: stages/text_analysis.py::pack_sequences (256-bucket prefix
# sum — same total order, same arithmetic).
PACK_SEQUENCES_SQL = r"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS nw,
         md5('pack:' || CAST(doc_id AS VARCHAR)) AS rk
  FROM documents
), o AS (
  SELECT doc_id, nw,
         CAST(COALESCE(SUM(nw) OVER (
             ORDER BY rk, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS s
  FROM t
), e AS (
  SELECT doc_id, nw, s,
         unnest(generate_series(s // 512, (s + nw - 1) // 512)) AS seq_id
  FROM o WHERE nw > 0
)
SELECT doc_id, seq_id,
       greatest(s, seq_id * 512) - seq_id * 512 AS off_in_seq,
       greatest(s, seq_id * 512) - s AS off_in_doc,
       least(s + nw, (seq_id + 1) * 512) - greatest(s, seq_id * 512) AS n_tokens
FROM e
"""

# Fixed-budget stratified sample: exactly k=20 rows per language by
# md5 hex order of the key (ties -> key order), seed 'stratak'.
STRATIFIED_TOP_K_SQL = r"""
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
             PARTITION BY lang
             ORDER BY md5('stratak:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 20
"""

# Per-doc salient term: argmax by (tf desc, df asc, word asc) — the
# tf-idf ranking with a pure-integer total order, so it hash-compares
# exactly (empty-text docs still emit one empty-string "word", same
# as split(' ') on '' both engines).
SALIENT_TERMS_SQL = r"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
  FROM w GROUP BY 1, 2
), df AS (
  SELECT word, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, word FROM w) GROUP BY 1
)
SELECT doc_id, word AS term, tf, df FROM (
  SELECT tf.doc_id, tf.word, tf.tf, df.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.word ASC) AS rn
  FROM tf JOIN df USING (word)
) WHERE rn = 1
"""

# Stratified deterministic sampling: per-language keep rates, same
# md5-threshold membership rule as HASH_SAMPLE_SQL (seed 'strata').
STRATIFIED_SAMPLE_SQL = r"""
SELECT doc_id, lang, source
FROM documents
WHERE CAST(('0x' || substr(md5('strata:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
      % 1000000
      < CASE lang WHEN 'en' THEN 300000 WHEN 'zh' THEN 100000 ELSE 20000 END
"""

PRICING_SUMMARY_SQL = r"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
           AS BIGINT) AS revenue_cents,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY 1, 2
"""

# ROLLUP mirror of aggregates.rollup_sums: subtotal rows carry the
# 'ALL' sentinel (keys are non-null in this corpus, so coalesce is
# unambiguous). Engine must reproduce all three levels exactly.
PRICING_ROLLUP_SQL = r"""
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
           AS BIGINT) AS revenue_cents,
       count(*) AS n_items
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""

# Group-pairwise vocabulary Jaccard mirror: integer intersection /
# vocab counts, one shared IEEE division — exact in both engines.
SOURCE_VOCAB_OVERLAP_SQL = r"""
WITH w0 AS (
  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
), w AS (
  SELECT DISTINCT source, word FROM w0
), cnt AS (
  SELECT source, count(*) AS n FROM w GROUP BY 1
), p AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
  FROM w a JOIN w b ON a.word = b.word AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_shared,
       ca.n AS n_a, cb.n AS n_b,
       CAST(n_shared AS DOUBLE) / (ca.n + cb.n - n_shared) AS jaccard
FROM p
JOIN cnt ca ON source_a = ca.source
JOIN cnt cb ON source_b = cb.source
"""

# Winsorize mirror: quantile_disc matches the engine's
# max(ceil(q*n),1) index rule (pinned elsewhere); clip is
# least/greatest over integer word counts — exact.
WINSORIZE_WORD_COUNTS_SQL = r"""
WITH w AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
  FROM documents
), q AS (
  SELECT lang,
         quantile_disc(n_words, 0.05) AS lo,
         quantile_disc(n_words, 0.95) AS hi
  FROM w GROUP BY lang
)
SELECT doc_id, w.lang, n_words,
       CAST(least(greatest(n_words, lo), hi) AS BIGINT) AS n_words_winsorized
FROM w JOIN q USING (lang)
"""

# CUBE mirror of aggregates.cube_sums (same sentinel contract as
# PRICING_ROLLUP_SQL).
ORDERS_CUBE_SQL = r"""
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""

# Pivot mirror of aggregates.pivot_counts: one FILTER aggregate per
# declared pivot value.
SOURCE_LANG_PIVOT_SQL = r"""
SELECT source,
       count(*) FILTER (WHERE lang = 'de') AS n_de,
       count(*) FILTER (WHERE lang = 'en') AS n_en,
       count(*) FILTER (WHERE lang = 'es') AS n_es,
       count(*) FILTER (WHERE lang = 'fr') AS n_fr,
       count(*) FILTER (WHERE lang = 'zh') AS n_zh
FROM documents
GROUP BY source
"""

MKTSEGMENT_REVENUE_SQL = r"""
SELECT c_mktsegment AS mktsegment,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""

JOIN_PRIORITY_SQL = r"""
SELECT o_orderpriority,
       count(*) AS n_items,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
           AS BIGINT) AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# Range (band) join oracle: the same half-open price bands as an
# inequality join against a VALUES table.
ORDERS_PRICE_BANDS_SQL = r"""
WITH bands(band, lo, hi) AS (
  VALUES ('p0_100k', 0.0, 100000.0),
         ('p100k_200k', 100000.0, 200000.0),
         ('p200k_300k', 200000.0, 300000.0),
         ('p300k_up', 300000.0, NULL)
)
SELECT band,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders JOIN bands
  ON o_totalprice >= lo AND (hi IS NULL OR o_totalprice < hi)
GROUP BY 1
"""

TOP_ORDERS_SQL = r"""
SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents
FROM orders
ORDER BY totalprice_cents DESC, o_orderkey
LIMIT 10
"""


# As-of join: each event matched to the user's most recent order at
# event time (right side pre-reduced to one row per (custkey, date) so
# tie-break is deterministic in both engines). DuckDB's native ASOF
# JOIN is the oracle.
EVENTS_LAST_ORDER_SQL = r"""
WITH r AS (
  SELECT o_custkey, o_orderdate, CAST(max(o_orderkey) AS BIGINT) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.user_id,
       CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_s,
       r.o_orderkey,
       CAST(floor(epoch(r.o_orderdate)) AS BIGINT) AS order_ts_s
FROM events e ASOF JOIN r
  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
"""

# Non-equi range self-join: prior-event count in the trailing 10
# minutes across ALL users. The engine's bucket-replicate plan
# (relational.time_range_prior_count) must equal this inequality join
# exactly — integer counts, half-open window on both sides.
EVENTS_RANGE_JOIN_SQL = r"""
SELECT e.event_id,
       count(f.event_id) AS n_prior
FROM events e
LEFT JOIN events f
  ON f.ts >= e.ts - INTERVAL 10 MINUTE AND f.ts < e.ts
GROUP BY e.event_id
"""

# Strict forward as-of self-join (next-event attribution). (user_id,
# ts) is unique in this corpus — checked — so the minimal
# strictly-later match is deterministic in both engines.
EVENTS_NEXT_SQL = r"""
SELECT e.event_id,
       n.event_id AS next_event_id,
       epoch_us(n.ts) - epoch_us(e.ts) AS gap_us
FROM events e
ASOF JOIN events n
  ON e.user_id = n.user_id AND e.ts < n.ts
"""

EVENTS_WINDOW_SQL = r"""
SELECT user_id,
       CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS window_start_s,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
       count(*) AS n_events
FROM events
GROUP BY 1, 2
"""

EVENT_TYPE_COUNTS_SQL = r"""
SELECT event_type, count(*) AS n FROM events GROUP BY 1
"""

EVENTS_SLIDING_WINDOW_SQL = r"""
WITH e AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS base_s,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
), fanout AS (
  SELECT user_id, base_s AS window_start_s, v FROM e
  UNION ALL
  SELECT user_id, base_s - 3600 AS window_start_s, v FROM e
)
SELECT user_id, window_start_s,
       CAST(sum(v) AS BIGINT) AS value_cents,
       count(*) AS n_events
FROM fanout
GROUP BY 1, 2
"""

EVENTS_SESSION_WINDOW_SQL = r"""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
), flagged AS (
  SELECT user_id, t,
         CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800
              OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM e
), numbered AS (
  SELECT user_id, t,
         sum(brk) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       min(t) AS session_start_s,
       count(*) AS n_events,
       max(t) - min(t) AS duration_s
FROM numbered
GROUP BY user_id, sid
"""

TOP_ORDERS_PER_CUSTOMER_SQL = r"""
SELECT o_custkey,
       o_orderkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents
FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
) <= 2
"""

CUSTOMERS_WITHOUT_BIG_ORDERS_SQL = r"""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
"""

PAGE_RESOLUTION_SQL = GOLDEN_CTE + r"""
SELECT url, page_count AS page_num, 'verified' AS status
FROM golden WHERE NOT is_corrupt
"""

EXTRACT_FROM_PAGES_SQL = GOLDEN_CTE + r"""
SELECT url, extracted_text, sha256(extracted_text) AS text_sha256
FROM golden WHERE NOT is_corrupt
"""

HOST_MEDIAN_SQL = GOLDEN_CTE + r"""
SELECT source || '.example.com' AS host,
       CAST(median(len(extracted_text)) AS DOUBLE) AS median_chars
FROM golden
GROUP BY 1
"""

HOST_STATS_SQL = GOLDEN_CTE + r"""
SELECT source || '.example.com' AS host,
       count(*) AS n_docs,
       CAST(sum(len(extracted_text)) AS BIGINT) AS total_chars,
       CAST(sum(n_blocks_kept) AS BIGINT) AS total_blocks_kept,
       CAST(sum(CASE WHEN parse_status = 'failed' THEN 1 ELSE 0 END) AS BIGINT)
           AS parse_failures
FROM golden
GROUP BY 1
"""


# ---------------------------------------------------------------- scrub

# PII scrub runs over the documents corpus with deterministically
# injected emails/IPv4s (the synthetic webtext has none) — the SAME
# injection expression in Ray (stages/scrub.py consumers) and SQL, so
# the masking itself is what the hash compares. Patterns restricted to
# the Python-re ∩ RE2 shared syntax; masking order (emails, then IPs
# over the masked text) is part of the contract.
PII_INJECT_CTE = r"""
WITH docs AS (
  SELECT doc_id,
    text ||
    CASE WHEN doc_id % 7 = 0
         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail'
              || CAST(doc_id % 5 AS VARCHAR) || '.example.com now'
         ELSE '' END ||
    CASE WHEN doc_id % 11 = 0
         THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
              || CAST(doc_id % 254 + 1 AS VARCHAR)
         ELSE '' END AS text
  FROM documents
)
"""

PII_SCRUB_SQL = PII_INJECT_CTE + r""", m AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
         regexp_replace(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
              '<EMAIL>', 'g') AS masked
  FROM docs
)
SELECT doc_id, n_emails,
       CAST(len(regexp_extract_all(masked,
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
       regexp_replace(masked,
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS scrubbed
FROM m
"""

# Gopher dup-3-gram repetition: same 3-gram construction as the
# text_analysis fingerprint (lockstep with word_shingles); dup_ppm is
# round-half-up fixed point so both engines compare integers.
REPETITION_STATS_SQL = r"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS nw
  FROM documents
), g AS (
  SELECT doc_id,
    CASE WHEN nw < 3 THEN [text]
         ELSE list_transform(range(0, nw - 2),
                             i -> array_to_string(list_slice(ws, i + 1, i + 3), ' '))
    END AS grams
  FROM t
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_ngrams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       CAST(((len(grams) - len(list_distinct(grams))) * 2000000 + len(grams))
            // (2 * len(grams)) AS BIGINT) AS dup_ppm,
       ((len(grams) - len(list_distinct(grams))) * 2000000 + len(grams))
            // (2 * len(grams)) <= 10000 AS repetition_pass
FROM g
"""

# Full Gopher §A1.1 repetition-signal vector — LOCKSTEP with
# stages.scrub.gopher_signals: 8-word deterministic lines (the
# line_dedup definition), dup-instance char accounting ((c-1)·len per
# distinct line), most-frequent-2-gram coverage (ties → smallest
# gram), duplicated-5-gram per-occurrence coverage, half-up integer
# ppm throughout. Thresholds are the published Gopher defaults
# 0.30 / 0.20 / 0.20 / 0.15.
GOPHER_SIGNALS_SQL = r"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS nw, length(text) AS nc
  FROM documents
), ln AS (
  SELECT doc_id, unnest(list_transform(range(0, (nw + 7) // 8),
         i -> array_to_string(list_slice(ws, i * 8 + 1, i * 8 + 8), ' '))) AS line
  FROM t
), lc AS (
  SELECT doc_id, line, count(*) AS c, length(line) AS l
  FROM ln GROUP BY doc_id, line
), lagg AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_lines,
         CAST(sum(c) - count(*) AS BIGINT) AS n_dup_lines,
         CAST(sum(c * l) AS BIGINT) AS line_chars,
         CAST(sum(CASE WHEN c >= 2 THEN (c - 1) * l ELSE 0 END) AS BIGINT)
             AS dup_line_chars
  FROM lc GROUP BY doc_id
), g2 AS (
  SELECT doc_id, unnest(list_transform(range(0, nw - 1),
         i -> array_to_string(list_slice(ws, i + 1, i + 2), ' '))) AS g
  FROM t WHERE nw >= 2
), g2c AS (
  SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g
), g2top AS (
  SELECT doc_id, CAST(c * length(g) AS BIGINT) AS top2_chars
  FROM g2c
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) = 1
), g5 AS (
  SELECT doc_id, unnest(list_transform(range(0, nw - 4),
         i -> array_to_string(list_slice(ws, i + 1, i + 5), ' '))) AS g
  FROM t WHERE nw >= 5
), g5c AS (
  SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY doc_id, g
), g5agg AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END) AS BIGINT)
             AS dup5_chars
  FROM g5c GROUP BY doc_id
), s AS (
  SELECT t.doc_id,
         l.n_lines,
         (l.n_dup_lines * 2000000 + l.n_lines) // (2 * l.n_lines)
             AS dup_line_ppm,
         CASE WHEN l.line_chars = 0 THEN 0
              ELSE (l.dup_line_chars * 2000000 + l.line_chars)
                   // (2 * l.line_chars) END AS dup_line_char_ppm,
         CASE WHEN t.nc = 0 THEN 0
              ELSE (coalesce(g2top.top2_chars, 0) * 2000000 + t.nc)
                   // (2 * t.nc) END AS top_2gram_char_ppm,
         CASE WHEN t.nc = 0 THEN 0
              ELSE (coalesce(g5agg.dup5_chars, 0) * 2000000 + t.nc)
                   // (2 * t.nc) END AS dup_5gram_char_ppm
  FROM t
  JOIN lagg l USING (doc_id)
  LEFT JOIN g2top USING (doc_id)
  LEFT JOIN g5agg USING (doc_id)
)
SELECT doc_id, n_lines,
       CAST(dup_line_ppm AS BIGINT) AS dup_line_ppm,
       CAST(dup_line_char_ppm AS BIGINT) AS dup_line_char_ppm,
       CAST(top_2gram_char_ppm AS BIGINT) AS top_2gram_char_ppm,
       CAST(dup_5gram_char_ppm AS BIGINT) AS dup_5gram_char_ppm,
       (dup_line_ppm <= 300000 AND dup_line_char_ppm <= 200000
        AND top_2gram_char_ppm <= 200000 AND dup_5gram_char_ppm <= 150000)
           AS gopher_pass
FROM s
"""

# Global top-20 bigram census; total order (n desc, ngram asc) makes
# the boundary deterministic.
NGRAM_COUNTS_SQL = r"""
WITH t AS (
  SELECT string_split(text, ' ') AS ws, len(string_split(text, ' ')) AS nw
  FROM documents
), g AS (
  SELECT unnest(list_transform(range(0, nw - 1),
                i -> array_to_string(list_slice(ws, i + 1, i + 2), ' '))) AS ngram
  FROM t WHERE nw >= 2
)
SELECT ngram, CAST(count(*) AS BIGINT) AS n
FROM g GROUP BY ngram ORDER BY n DESC, ngram ASC LIMIT 20
"""

# Heavy hitters: the CMS two-pass filter's output is EXACT (a
# count-min estimate is always >= the true count, so no true heavy
# hitter is pruned; the final exact recount removes false positives),
# so the oracle is a plain GROUP BY ... HAVING.
HEAVY_HITTERS_SQL = r"""
WITH t AS (
  SELECT string_split(text, ' ') AS ws, len(string_split(text, ' ')) AS nw
  FROM documents
), g AS (
  SELECT unnest(list_transform(range(0, nw - 1),
                i -> array_to_string(list_slice(ws, i + 1, i + 2), ' '))) AS ngram
  FROM t WHERE nw >= 2
)
SELECT ngram, CAST(count(*) AS BIGINT) AS n
FROM g GROUP BY ngram HAVING count(*) >= 40
"""

# C4-style line dedup over deterministic 8-word "lines": a line
# survives only at its min (doc_id, line_idx) occurrence; docs rebuild
# from surviving lines in order (docs losing every line disappear —
# both engines agree on that contract).
LINE_DEDUP_SQL = r"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS nw
  FROM documents
), e AS (
  SELECT doc_id,
         unnest(list_transform(range(0, (nw + 7) // 8),
                i -> struct_pack(line_idx := i,
                                 line := array_to_string(
                                     list_slice(ws, i * 8 + 1, i * 8 + 8), ' ')))) AS s
  FROM t
), x AS (
  SELECT doc_id, CAST(s.line_idx AS BIGINT) AS line_idx, s.line AS line FROM e
), w AS (
  SELECT doc_id, line_idx, line FROM x
  QUALIFY row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx) = 1
)
SELECT doc_id, string_agg(line, ' ' ORDER BY line_idx) AS text,
       CAST(count(*) AS BIGINT) AS n_lines_kept
FROM w GROUP BY doc_id
"""


# Cross-document duplicated-5-gram share: per doc, how many of its
# DISTINCT word 5-grams appear in >= 2 documents; integer half-up ppm
# (same convention as repetition dup_ppm). sum() returns HUGEINT in
# DuckDB — cast back to BIGINT.
CROSS_DOC_NGRAM_SHARE_SQL = r"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS nw
  FROM documents
), g0 AS (
  SELECT doc_id, unnest(list_transform(range(0, nw - 4),
                i -> array_to_string(list_slice(ws, i + 1, i + 5), ' '))) AS ng
  FROM t WHERE nw >= 5
), g AS (
  SELECT DISTINCT doc_id, ng FROM g0
), f AS (
  SELECT ng, count(*) AS nd FROM g GROUP BY ng
), s AS (
  SELECT g.doc_id,
         count(*) AS n,
         sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS n_sh
  FROM g JOIN f USING (ng) GROUP BY g.doc_id
)
SELECT t.doc_id,
       CAST(coalesce(s.n, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(s.n_sh, 0) AS BIGINT) AS n_shared,
       CAST(CASE WHEN coalesce(s.n, 0) = 0 THEN 0
            ELSE (s.n_sh * 2000000 + s.n) // (2 * s.n) END AS BIGINT)
           AS shared_ppm
FROM t LEFT JOIN s USING (doc_id)
"""


# Benchmark decontamination: eval set = original texts of docs with
# doc_id % 101 = 0; docs with doc_id % 13 = 5 get the first 13 words
# of eval doc rank (doc_id % n_eval) appended (LOCKSTEP with
# __ray_entry__._docs_with_eval_leak); a doc is contaminated iff any
# of its 13-grams appears among the eval set's 13-grams.
CONTAMINATION_SQL = r"""
WITH ev0 AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 101 = 0
), exc AS (
  SELECT row_number() OVER (ORDER BY doc_id) - 1 AS rn,
         array_to_string(list_slice(string_split(text, ' '), 1, 13), ' ') AS excerpt
  FROM ev0
), inj AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 13 = 5 THEN d.text || ' ' || e.excerpt
              ELSE d.text END AS text
  FROM documents d
  LEFT JOIN exc e ON e.rn = d.doc_id % (SELECT count(*) FROM exc)
), evg AS (
  SELECT DISTINCT
         unnest(list_transform(range(0, len(string_split(text, ' ')) - 12),
                i -> array_to_string(
                    list_slice(string_split(text, ' '), i + 1, i + 13), ' '))) AS ng
  FROM ev0 WHERE len(string_split(text, ' ')) >= 13
), t AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS nw
  FROM inj
), g AS (
  SELECT doc_id, unnest(list_transform(range(0, nw - 12),
                i -> array_to_string(list_slice(ws, i + 1, i + 13), ' '))) AS ng
  FROM t WHERE nw >= 13
), hits AS (
  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_eval_hits
  FROM g JOIN evg USING (ng) GROUP BY g.doc_id
)
SELECT doc_id,
       CAST(CASE WHEN t.nw >= 13 THEN t.nw - 12 ELSE 0 END AS BIGINT) AS n_ngrams,
       CAST(coalesce(h.n_eval_hits, 0) AS BIGINT) AS n_eval_hits,
       coalesce(h.n_eval_hits, 0) > 0 AS contaminated
FROM t LEFT JOIN hits h USING (doc_id)
"""


# media_resize: the PNG payload is generated from the symbolic image
# pixel(y,x) = (3x+7y+doc_id) mod 256 (stages/multimodal.py::
# png_pixels), so the oracle recomputes input dims + exact pixel sum
# without a codec — a green hash proves the pure-stdlib PNG
# encode→decode roundtrip recovered every pixel. The resized pixel
# sum is bilinear-specific (pytest-pinned, not SQL-expressible).
MEDIA_RESIZE_SQL = r"""
WITH dims AS (
  SELECT doc_id,
         16 + (doc_id % 5) * 8 AS in_w,
         16 + (doc_id % 7) * 4 AS in_h,
         doc_id % 97 = 13 AS corrupt
  FROM documents
)
SELECT doc_id,
  CASE WHEN corrupt THEN 0 ELSE in_w END AS in_w,
  CASE WHEN corrupt THEN 0 ELSE in_h END AS in_h,
  CASE WHEN corrupt THEN 0
       ELSE CAST(list_sum(flatten(list_transform(range(0, in_h),
            y -> list_transform(range(0, in_w),
                 x -> (3 * x + 7 * y + doc_id) % 256)))) AS BIGINT)
  END AS in_sum,
  CASE WHEN corrupt THEN 0 ELSE 32 END AS out_w,
  CASE WHEN corrupt THEN 0 ELSE 32 END AS out_h,
  CASE WHEN corrupt THEN 'failed' ELSE 'ok' END AS resize_status
FROM dims
"""

# Perceptual dHash dedup. Engine twin: multimodal.phash_dedup — the
# engine decodes REAL PNG bytes and hashes pixels; this mirror replays
# the hash symbolically from pixel(y,x) = (3x + 7y + doc_id) % 256 at
# the nearest-neighbor grid x_j=(j*w)//9, y_i=(i*h)//8, so a green
# hash pins decode + downsample + bit packing end-to-end. The 64 bits
# split into two int64 halves (bits 0..31 -> phash_lo, 32..63 ->
# phash_hi) exactly as the engine packs them — no sign-bit hazard.
# Audio features. Engine twin: multimodal.audio_features — the engine
# decodes REAL RIFF/PCM WAV bytes (extract/wavcodec.py); this mirror
# replays every feature symbolically from the signal formula
# s[k] = ((31·doc_id + 17k) mod 4001) - 2000, all integer arithmetic
# (duration is floor-division ms; energy is Σ|s| — RMS would be
# float), so a green hash pins decode + every feature end-to-end.
AUDIO_FEATURES_SQL = r"""
WITH dims AS (
  SELECT doc_id,
         800 + (doc_id % 7) * 160 AS n,
         8000 + (doc_id % 3) * 4000 AS rate,
         doc_id % 97 = 13 AS corrupt
  FROM documents
), sig AS (
  SELECT doc_id, corrupt, n, rate,
    list_transform(range(0, n),
      k -> (31 * doc_id + 17 * k) % 4001 - 2000) AS v
  FROM dims
)
SELECT doc_id,
  CAST(CASE WHEN corrupt THEN 0 ELSE rate END AS BIGINT) AS sample_rate,
  CAST(CASE WHEN corrupt THEN 0 ELSE n END AS BIGINT) AS n_samples,
  CAST(CASE WHEN corrupt THEN 0
       ELSE (n * 1000) // rate END AS BIGINT) AS duration_ms,
  CAST(CASE WHEN corrupt THEN 0
       ELSE list_max(list_transform(v, x -> abs(x))) END AS BIGINT)
    AS peak_abs,
  CAST(CASE WHEN corrupt THEN 0
       ELSE list_sum(list_transform(v, x -> abs(x))) END AS BIGINT)
    AS sum_abs,
  CAST(CASE WHEN corrupt THEN 0
       ELSE list_sum(list_transform(range(1, n), k ->
            CASE WHEN (v[k] < 0) != (v[k + 1] < 0) THEN 1 ELSE 0 END))
       END AS BIGINT) AS n_zero_cross,
  CASE WHEN corrupt THEN 'failed' ELSE 'ok' END AS audio_status
FROM sig
"""

# Fixed-window audio segmentation. Engine twin: multimodal.audio_chunks
# (np.add/maximum.reduceat over the decoded signal); corrupt docs
# contribute no rows. Window features replayed symbolically per chunk.
AUDIO_CHUNKS_SQL = r"""
WITH dims AS (
  SELECT doc_id,
         800 + (doc_id % 7) * 160 AS n,
         doc_id % 97 = 13 AS corrupt
  FROM documents
), sig AS (
  SELECT doc_id, n,
    list_transform(range(0, n),
      k -> (31 * doc_id + 17 * k) % 4001 - 2000) AS v
  FROM dims WHERE NOT corrupt
), ch AS (
  SELECT doc_id, n, v, unnest(range(0, n, 256)) AS s
  FROM sig
)
SELECT doc_id,
  CAST(s // 256 AS BIGINT) AS chunk_idx,
  CAST(s AS BIGINT) AS start,
  CAST(least(s + 256, n) - s AS BIGINT) AS n_samples,
  CAST(list_sum(list_transform(range(s, least(s + 256, n)),
       k -> abs(v[k + 1]))) AS BIGINT) AS sum_abs,
  CAST(list_max(list_transform(range(s, least(s + 256, n)),
       k -> abs(v[k + 1]))) AS BIGINT) AS peak_abs
FROM ch
"""

# Composed multimodal pipeline (hash → keep-one → refetch → resize).
# Engine twin: __ray_entry__._q_image_dedup_resize. Reuses the
# IMAGE_PHASH_SQL hash expressions and MEDIA_RESIZE_SQL's symbolic
# pixel sum; winner = min doc_id per (phash_hi, phash_lo) among
# non-corrupt docs; n_same = perceptual class size.
IMAGE_DEDUP_RESIZE_SQL = r"""
WITH dims AS (
  SELECT doc_id,
         16 + (doc_id % 5) * 8 AS w,
         16 + (doc_id % 7) * 4 AS h,
         doc_id % 97 = 13 AS corrupt
  FROM documents
), bits AS (
  SELECT doc_id, corrupt,
    flatten(list_transform(range(0, 8), i ->
      list_transform(range(0, 8), j ->
        CASE WHEN (3 * (((j + 1) * w) // 9) + 7 * ((i * h) // 8) + doc_id) % 256
                > (3 * ((j * w) // 9) + 7 * ((i * h) // 8) + doc_id) % 256
             THEN 1 ELSE 0 END))) AS b
  FROM dims WHERE NOT corrupt
), ph AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(range(0, 32),
         k -> b[k + 33] * (CAST(1 AS BIGINT) << k))) AS BIGINT) AS phash_hi,
    CAST(list_sum(list_transform(range(0, 32),
         k -> b[k + 1] * (CAST(1 AS BIGINT) << k))) AS BIGINT) AS phash_lo
  FROM bits
), win AS (
  SELECT phash_hi, phash_lo,
         CAST(min(doc_id) AS BIGINT) AS doc_id,
         CAST(count(*) AS BIGINT) AS n_same
  FROM ph GROUP BY phash_hi, phash_lo
)
SELECT wn.doc_id, wn.phash_hi, wn.phash_lo, wn.n_same,
  CAST(d.w AS BIGINT) AS in_w,
  CAST(d.h AS BIGINT) AS in_h,
  CAST(list_sum(flatten(list_transform(range(0, d.h),
       y -> list_transform(range(0, d.w),
            x -> (3 * x + 7 * y + d.doc_id) % 256)))) AS BIGINT) AS in_sum,
  CAST(32 AS BIGINT) AS out_w,
  CAST(32 AS BIGINT) AS out_h
FROM win wn JOIN dims d ON d.doc_id = wn.doc_id
"""

IMAGE_PHASH_SQL = r"""
WITH dims AS (
  SELECT doc_id,
         16 + (doc_id % 5) * 8 AS w,
         16 + (doc_id % 7) * 4 AS h,
         doc_id % 97 = 13 AS corrupt
  FROM documents
), bits AS (
  SELECT doc_id, corrupt,
    flatten(list_transform(range(0, 8), i ->
      list_transform(range(0, 8), j ->
        CASE WHEN (3 * (((j + 1) * w) // 9) + 7 * ((i * h) // 8) + doc_id) % 256
                > (3 * ((j * w) // 9) + 7 * ((i * h) // 8) + doc_id) % 256
             THEN 1 ELSE 0 END))) AS b
  FROM dims
), ph AS (
  SELECT doc_id, corrupt,
    CASE WHEN corrupt THEN CAST(-1 AS BIGINT) ELSE
      CAST(list_sum(list_transform(range(0, 32),
           k -> b[k + 33] * (CAST(1 AS BIGINT) << k))) AS BIGINT)
    END AS phash_hi,
    CASE WHEN corrupt THEN CAST(-1 AS BIGINT) ELSE
      CAST(list_sum(list_transform(range(0, 32),
           k -> b[k + 1] * (CAST(1 AS BIGINT) << k))) AS BIGINT)
    END AS phash_lo
  FROM bits
)
SELECT doc_id, phash_hi, phash_lo,
  CASE WHEN corrupt THEN 'failed' ELSE 'ok' END AS phash_status,
  CASE WHEN corrupt THEN CAST(0 AS BIGINT) ELSE
    count(*) OVER (PARTITION BY corrupt, phash_hi, phash_lo)
  END AS n_same
FROM ph
"""


# ---------------------------------------------------- analytic windows

CUSTOMER_ORDER_RANKS_SQL = r"""
SELECT o_orderkey, o_custkey,
       CAST(row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
FROM orders
"""

# gap in integer microseconds (epoch_us is BIGINT on both sides; the
# first event of a user gets the -1 sentinel, not NULL, so the column
# stays int64 through the hash compare)
USER_EVENT_GAPS_SQL = r"""
SELECT event_id, user_id,
       coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us
FROM events
"""

# running total in integer cents: prefix sums over BIGINT are
# order-exact, so Ray cumsum and the SQL window agree bit-for-bit
CUSTOMER_RUNNING_TOTAL_SQL = r"""
SELECT o_orderkey, o_custkey,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER
            (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM orders
"""


# HLL register table over documents.text: same md5_u64 hash as the
# dedup family; rho via bin() bit-length (integer/string ops only —
# no float boundary risk). The float estimate is pytest-bounded, not
# SQL-hashed; a green register hash pins the entire sketch state.
HLL_REGISTERS_SQL = r"""
WITH h AS (
  SELECT ('0x' || substr(md5(text), 1, 16))::UBIGINT AS h FROM documents
), b AS (
  SELECT CAST(h >> 55 AS BIGINT) AS bucket,
         h & ((1::UBIGINT << 55) - 1) AS r
  FROM h
)
SELECT bucket,
       CAST(max(CASE WHEN r = 0 THEN 56 ELSE 55 - len(bin(r)) + 1 END)
            AS BIGINT) AS rho_max
FROM b GROUP BY bucket
"""


# url_parse: crawl URL canonicalization over deterministically
# injected URL shapes (ports, default ports, fragments, uppercase
# hosts, root paths, garbage) — the SAME regex string runs in
# Python-re (engine) and RE2 (this mirror); shared syntax only.
# Known representational gap, irrelevant to the injected set: a bare
# trailing '?' (empty query) is indistinguishable from no query in
# RE2's regexp_extract ('' for both), while Python re distinguishes
# None from ''.
URL_PARSE_SQL = r"""
WITH u AS (
  SELECT doc_id,
    CASE doc_id % 5
      WHEN 0 THEN 'https://WWW.Example.COM:443/A/b/c?q=' || CAST(doc_id AS VARCHAR) || '#frag'
      WHEN 1 THEN 'http://site' || CAST(doc_id % 10 AS VARCHAR) || '.org:8080/path/'
      WHEN 2 THEN 'https://example.net'
      WHEN 3 THEN 'not a url ' || CAST(doc_id AS VARCHAR)
      ELSE 'https://' || source || '.example.com/' || lang || '/' || lpad(CAST(doc_id AS VARCHAR), 8, '0')
    END AS url
  FROM documents
), g AS (
  SELECT doc_id, url,
    regexp_matches(url, '^(https?)://([^/:?#]+)(?::(\d+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$') AS ok,
    lower(regexp_extract(url, '^(https?)://([^/:?#]+)(?::(\d+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 1)) AS scheme,
    lower(regexp_extract(url, '^(https?)://([^/:?#]+)(?::(\d+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 2)) AS host,
    regexp_extract(url, '^(https?)://([^/:?#]+)(?::(\d+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 3) AS port_s,
    regexp_extract(url, '^(https?)://([^/:?#]+)(?::(\d+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 4) AS path0,
    regexp_extract(url, '^(https?)://([^/:?#]+)(?::(\d+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 5) AS query
  FROM u
), n AS (
  SELECT doc_id, ok, scheme, host,
    CASE WHEN port_s = '' THEN -1
         WHEN scheme = 'http'  AND port_s = '80'  THEN -1
         WHEN scheme = 'https' AND port_s = '443' THEN -1
         ELSE CAST(port_s AS BIGINT) END AS port,
    CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
    query
  FROM g
)
SELECT doc_id,
  CASE WHEN ok THEN scheme ELSE '' END AS scheme,
  CASE WHEN ok THEN host ELSE '' END AS host,
  CASE WHEN ok THEN port ELSE -1 END AS port,
  CASE WHEN ok THEN path ELSE '' END AS path,
  CASE WHEN ok AND trim(path, '/') <> ''
       THEN CAST(len(string_split(trim(path, '/'), '/')) AS BIGINT)
       ELSE 0 END AS depth,
  ok AND scheme = 'https' AS is_https,
  CASE WHEN ok THEN scheme || '://' || host ||
            (CASE WHEN port = -1 THEN '' ELSE ':' || CAST(port AS VARCHAR) END) ||
            path ||
            (CASE WHEN query = '' THEN '' ELSE '?' || query END)
       ELSE '' END AS url_norm
FROM n
"""


# row-based moving sum in integer cents (frame: 2 PRECEDING..CURRENT)
CUSTOMER_MOVING_SUM_SQL = r"""
SELECT o_orderkey, o_custkey,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER
            (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS moving_cents
FROM orders
"""

# Versioned-corpus diff: v2 drops doc_id%11==5 and appends ' v2' to
# doc_id%7==3 texts; FULL OUTER JOIN of the (id, sha256) residues
# classifies every key. Engine twin: relational.py::corpus_diff.
CORPUS_DIFF_SQL = r"""
WITH old AS (
  SELECT doc_id, sha256(text) AS h FROM documents
), new AS (
  SELECT doc_id,
         sha256(CASE WHEN doc_id % 7 = 3 THEN text || ' ' || 'v2'
                     ELSE text END) AS h
  FROM documents WHERE doc_id % 11 <> 5
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.h <> n.h THEN 'changed'
            ELSE 'unchanged' END AS status,
       o.h AS old_hash, n.h AS new_hash
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
"""

# Per-doc mean corpus word frequency (CCNet-style fluency proxy):
# integer count sums per doc, one final DOUBLE division — both sides
# evaluate CAST(freq_sum AS DOUBLE) / nw. Empty-string tokens from
# split(' ') count like any token on BOTH sides.
WORD_FREQ_SCORE_SQL = r"""
WITH c AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY w
), t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS nw,
         unnest(string_split(text, ' ')) AS w
  FROM documents
), per AS (
  SELECT doc_id, any_value(nw) AS nw,
         CAST(sum(c.n) AS BIGINT) AS freq_sum
  FROM t JOIN c USING (w)
  GROUP BY doc_id
)
SELECT doc_id, nw, freq_sum,
       CAST(freq_sum AS DOUBLE) / nw AS mean_freq
FROM per
"""

# Banned-source gate (set membership, broadcast on the engine side).
SOURCE_BLOCKLIST_SQL = r"""
SELECT doc_id, source, lang FROM documents
WHERE source NOT IN ('src3', 'src7', 'src13')
"""

# Canonical normalization: NFC, ASCII-whitespace runs -> one space,
# edges trimmed; sha256 of the result gates the whole transformation.
NORMALIZE_TEXT_SQL = r"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(nfc_normalize(text),
              '[ ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || ']+',
              ' ', 'g')) AS t
  FROM documents
)
SELECT doc_id, len(t) AS norm_len, sha256(t) AS norm_hash FROM n
"""


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bpe_token_lengths_sql() -> str:
    """Exact mirror of ``bpe_encode(docs, fixed_merges())``.

    The merge table is the FIXED tokenizer artifact
    (``stages.bpe.fixed_merges`` — both sides read the same Python
    constant, lockstep by construction). Encode semantics mirror
    ``bpe_segment`` exactly: symbols = chars + '</w>', then repeatedly
    merge the single LOWEST-RANK adjacent pair, leftmost occurrence
    first (a recursive CTE splicing one occurrence per step — NOT the
    Sennrich all-occurrences replace, which can diverge from greedy
    lowest-rank on adversarial merge lists). Distinct words encode
    once; per-doc lengths re-expand by word multiplicity."""
    from vlm_ocr_doc_reader_ray.stages.bpe import fixed_merges

    vals = ", ".join(
        f"({_sql_quote(f' {l} {r} ')}, {_sql_quote(f' {l}{r} ')}, {i})"
        for i, (l, r) in enumerate(fixed_merges())
    )
    return f"""
WITH RECURSIVE
bpe_merges(pat, rep, rank) AS (VALUES {vals}),
doc_words AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
),
words AS (SELECT DISTINCT w FROM doc_words),
init AS (
  SELECT w,
         ' ' || array_to_string(
             list_append(regexp_split_to_array(w, ''), '</w>'), ' ')
             || ' ' AS s
  FROM words
),
enc(w, s, i) AS (
  SELECT w, s, 0 FROM init
  UNION ALL
  SELECT t.w,
         substr(t.s, 1, strpos(t.s, m2.pat) - 1) || m2.rep
           || substr(t.s, strpos(t.s, m2.pat) + length(m2.pat)),
         t.i + 1
  FROM (SELECT e.w, e.s, e.i,
          (SELECT m.rank FROM bpe_merges m
           WHERE strpos(e.s, m.pat) > 0
           ORDER BY m.rank LIMIT 1) AS br
        FROM enc e) t
  JOIN bpe_merges m2 ON m2.rank = t.br
),
word_len AS (
  SELECT w,
         length(trim(arg_max(s, i)))
           - length(replace(trim(arg_max(s, i)), ' ', '')) + 1 AS n_tok
  FROM enc GROUP BY w
)
SELECT d.doc_id,
       COALESCE(CAST(sum(wl.n_tok) AS BIGINT), 0) AS bpe_len
FROM documents d
LEFT JOIN doc_words dw ON dw.doc_id = d.doc_id
LEFT JOIN word_len wl ON wl.w = dw.w
GROUP BY d.doc_id
"""


BPE_TOKEN_LENGTHS_SQL = bpe_token_lengths_sql()

# Tokenizer-fertility report per source — LOCKSTEP with
# stages.bpe.bpe_fertility_by_group: per-doc BPE lengths (the exact
# recursive-CTE encode mirror above, as a subquery) joined to the
# source column, per-source sums, half-up integer ppm of
# tokens-per-word (words = len(string_split(text, ' ')), the
# engine-wide convention).
BPE_FERTILITY_SQL = f"""
WITH b AS (
  SELECT * FROM ({BPE_TOKEN_LENGTHS_SQL}) t
), s AS (
  SELECT d.source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS n_words,
         CAST(sum(b.bpe_len) AS BIGINT) AS n_tokens
  FROM documents d JOIN b ON b.doc_id = d.doc_id
  GROUP BY d.source
)
SELECT source, n_docs, n_words, n_tokens,
       CAST(CASE WHEN n_words = 0 THEN 0
            ELSE (n_tokens * 2000000 + n_words) // (2 * n_words) END
            AS BIGINT) AS fertility_ppm
FROM s
"""


# Resume gate (ADR-001 contract): tamper 3 of 5 kinds to pending
# (resolution 0, value lost), leave the other 2 verified but marked
# with a '#STALE' sentinel. resolve_pending must re-resolve ONLY the
# pending rows (level-1 window re-extraction recovers the golden
# value) and must NOT touch the verified rows — the sentinel
# surviving in the output is the proof, hash-gated.
_RESUME_PENDING_KINDS = ("email", "date", "url")
_RESUME_KEPT_KINDS = ("phone", "id")

_RESUME_PENDING_TAIL = r"""
SELECT url, '{kind}' AS kind, ent_{kind} AS value,
       CAST(1 AS BIGINT) AS resolution, FALSE AS verified,
       '0/3' AS confidence, 'ok' AS status
FROM golden WHERE NOT is_corrupt
"""

_RESUME_KEPT_TAIL = r"""
SELECT url, '{kind}' AS kind, ent_{kind} || '#STALE' AS value,
       CAST(2 AS BIGINT) AS resolution, TRUE AS verified,
       '3/3' AS confidence, 'ok' AS status
FROM golden WHERE NOT is_corrupt
"""

REGISTRY_RESUME_SQL = GOLDEN_CTE + " UNION ALL ".join(
    [_RESUME_PENDING_TAIL.format(kind=k) for k in _RESUME_PENDING_KINDS]
    + [_RESUME_KEPT_TAIL.format(kind=k) for k in _RESUME_KEPT_KINDS]
)


def warc_curate_shards_sql(seq_len: int = 512, docs_per_shard: int = 100) -> str:
    """End-to-end composition mirror: WARC source → golden extraction
    → canonical normalization → curate (gate → dedup → rebalance →
    pack) → balanced-shard layout, as ONE chained query.

    The engine half runs the REAL pipeline (read_warc → extract →
    normalize_text → curate → write_training_shards) and returns the
    per-shard row counts; this mirror recomputes the same counts from
    the documents table via the golden extracted_text expression. The
    quality/pack CTEs are the same formulas as QUALITY_FILTER_SQL /
    CURATE_SQL rebased onto the normalized extracted text; the shard
    rank mirrors global_sorted_rank's md5('{seed}:'||key) order."""
    ws = "' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || '"
    return GOLDEN_CTE + f"""
, src AS (
  SELECT doc_id, lang,
         trim(regexp_replace(nfc_normalize(extracted_text),
              '[ {ws}]+', ' ', 'g')) AS text
  FROM golden
), q AS (
  SELECT doc_id, lang, text,
         string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS nw,
         len(text) AS nc
  FROM src
), keep AS (
  SELECT doc_id, text, lang FROM q
  WHERE nw >= 20 AND nw <= 100000
    AND CAST(nc - (nw - 1) AS DOUBLE) / nw >= 3.0
    AND CAST(nc - (nw - 1) AS DOUBLE) / nw <= 10.0
    AND CAST(len(regexp_extract_all(text, '[^0-9A-Za-z_ {ws}]')) AS DOUBLE)
        / greatest(nc, 1) <= 0.1
    AND CAST(len(list_filter(words, w -> list_contains({_STOP_SQL}, w)))
             AS DOUBLE) / nw >= 0.01
), ded AS (
  SELECT doc_id, text, lang FROM keep
  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
), wt AS (
  SELECT doc_id, text, __MIX_CASE__ AS w FROM ded
), r AS (
  SELECT doc_id, text,
         CAST(floor(w) AS BIGINT)
         + CASE WHEN CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                     % 1000000
                     < CAST(floor((w - floor(w)) * 1000000 + 0.5) AS BIGINT)
                THEN 1 ELSE 0 END AS reps
  FROM wt
), reb AS (
  SELECT CAST(doc_id AS VARCHAR) || '#' || CAST(rep AS VARCHAR) AS key,
         len(string_split(text, ' ')) AS nw
  FROM (SELECT doc_id, text, unnest(generate_series(0, reps - 1)) AS rep
        FROM r WHERE reps > 0)
), o AS (
  SELECT key, nw,
         CAST(COALESCE(SUM(nw) OVER (
             ORDER BY md5('pack:' || key), key
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS s
  FROM reb
), e AS (
  SELECT key, nw, s,
         unnest(generate_series(s // {seq_len}, (s + nw - 1) // {seq_len})) AS seq_id
  FROM o WHERE nw > 0
), seg AS (
  SELECT key || '@' || CAST(seq_id AS VARCHAR) AS skey FROM e
), ranked AS (
  SELECT skey,
         row_number() OVER (ORDER BY md5('shuffle:' || skey), skey) - 1 AS rnk
  FROM seg
)
SELECT rnk // {docs_per_shard} AS shard,
       CAST(count(*) AS BIGINT) AS n_rows
FROM ranked GROUP BY 1
""".replace("__MIX_CASE__", mix_weights_case_sql())


WARC_CURATE_SHARDS_SQL = warc_curate_shards_sql()


def _kmeans_cte_chain(dim: int, k: int, iters: int, scale: int,
                      seed: str) -> str:
    """Shared unrolled-Lloyd CTE prefix for the kmeans oracles. The
    deterministic init centroids (similarity.fixed_codebook) are
    interpolated as DOUBLE[] literals; each engine iteration
    (assign → integer-quantized mean) is one CTE pair. Both sides
    quantize components identically (floor(v*scale+0.5) as BIGINT —
    the engine's exact-float convention), so sums and therefore
    centroids are BIT-IDENTICAL; the only float-order freedom left is
    the 64-term assignment dot product (~1e-15 relative), 8+ orders
    below the measured min assignment margin (pinned by
    test_kmeans_margin_guards_float_boundary)."""
    from vlm_ocr_doc_reader_ray.stages.similarity import fixed_codebook

    cents = fixed_codebook(dim, k, seed=seed)
    vals = ",\n         ".join(
        "(" + str(i) + ", ["
        + ", ".join(repr(float(x)) for x in cents[i]) + "]::DOUBLE[])"
        for i in range(k)
    )
    parts = [f"""WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee,
         list_transform(CAST(embedding AS DOUBLE[]),
                        v -> CAST(floor(v * {scale}.0 + 0.5) AS BIGINT)) AS qe
  FROM embeddings
), m0(c, ce) AS (
  VALUES {vals}
)"""]
    for t in range(iters):
        parts.append(f""", a{t} AS (
  SELECT vec_id, qe, c FROM (
    SELECT e.vec_id, e.qe, m.c,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY 2 * list_dot_product(e.ee, m.ce)
                      - list_dot_product(m.ce, m.ce) DESC, m.c ASC
           ) AS rn
    FROM e, m{t} m) WHERE rn = 1
), m{t + 1} AS (
  SELECT c, list(sv ORDER BY i) AS ce FROM (
    SELECT c, i,
           CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / {scale}.0
             / CAST(count(*) AS DOUBLE) AS sv
    FROM (SELECT c, unnest(qe) AS v,
                 unnest(range(len(qe))) AS i FROM a{t})
    GROUP BY c, i) GROUP BY c
)""")
    return "".join(parts)


def embedding_kmeans_sql(dim: int = 64, k: int = 10, iters: int = 3,
                         scale: int = 1_000_000,
                         seed: str = "kmeans-init") -> str:
    """Final cluster assignment after the unrolled Lloyd chain
    (see :func:`_kmeans_cte_chain` for the float-exactness argument)."""
    chain = _kmeans_cte_chain(dim, k, iters, scale, seed)
    return chain + f"""
SELECT vec_id, CAST(c AS BIGINT) AS cluster FROM (
  SELECT e.vec_id, m.c,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY 2 * list_dot_product(e.ee, m.ce)
                    - list_dot_product(m.ce, m.ce) DESC, m.c ASC
         ) AS rn
  FROM e, m{iters} m) WHERE rn = 1"""


def kmeans_medoids_sql(dim: int = 64, k: int = 10, iters: int = 3,
                       scale: int = 1_000_000,
                       seed: str = "kmeans-init") -> str:
    """Per-cluster medoid (closest member to the final centroid, ties
    → smallest vec_id) + exact cluster size, over the same unrolled
    Lloyd chain. The medoid rank reuses the assignment score; the
    engine's measured best-vs-second medoid gap is ~1e-4 (pinned by
    test) vs ~1e-15 cross-engine dot noise."""
    chain = _kmeans_cte_chain(dim, k, iters, scale, seed)
    return chain + f""", af AS (
  SELECT vec_id, c, score FROM (
    SELECT e.vec_id, m.c,
           2 * list_dot_product(e.ee, m.ce)
             - list_dot_product(m.ce, m.ce) AS score,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY 2 * list_dot_product(e.ee, m.ce)
                      - list_dot_product(m.ce, m.ce) DESC, m.c ASC
           ) AS rn
    FROM e, m{iters} m) WHERE rn = 1
)
SELECT CAST(c AS BIGINT) AS cluster,
       CAST(vec_id AS BIGINT) AS medoid_id,
       CAST(size AS BIGINT) AS size
FROM (
  SELECT c, vec_id,
         row_number() OVER (
           PARTITION BY c ORDER BY score DESC, vec_id ASC) AS rn2,
         count(*) OVER (PARTITION BY c) AS size
  FROM af) WHERE rn2 = 1"""


# Adaptive per-group gate: rows at/above their own group's exact
# median (quantile_disc — the engine's grouped_exact_quantiles index
# rule). Engine twin: aggregates.grouped_quantile_gate (threshold
# residues broadcast once, one vectorized comparison per batch).
LANG_MEDIAN_GATE_SQL = r"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
  FROM documents
), q AS (
  SELECT lang, quantile_disc(nw, 0.5) AS thr FROM t GROUP BY lang
)
SELECT t.doc_id, t.lang, t.nw
FROM t JOIN q USING (lang) WHERE t.nw >= q.thr
"""


# Exact within-group percentile rank (cume_dist) — engine twin:
# aggregates.grouped_percentile_rank (cumulative histogram residues,
# broadcast once, searchsorted per batch; integer until one division).
LANG_LENGTH_PERCENTILE_SQL = r"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
  FROM documents
)
SELECT doc_id, lang, nw,
       cume_dist() OVER (PARTITION BY lang ORDER BY nw) AS pct
FROM t
"""


# Grouped HLL register table (p=9): same md5_u64 register recompute as
# HLL_REGISTERS_SQL, per language. Engine twin:
# sketch.grouped_hll_registers (per-batch residues, pre-aggregated max).
LANG_HLL_REGISTERS_SQL = r"""
WITH h AS (
  SELECT lang, ('0x' || substr(md5(text), 1, 16))::UBIGINT AS h
  FROM documents
), b AS (
  SELECT lang, CAST(h >> 55 AS BIGINT) AS bucket,
         h & ((1::UBIGINT << 55) - 1) AS r
  FROM h
)
SELECT lang, bucket,
       CAST(max(CASE WHEN r = 0 THEN 56 ELSE 55 - len(bin(r)) + 1 END)
            AS BIGINT) AS rho_max
FROM b GROUP BY lang, bucket
"""


# DSIR-flavored importance features: per-doc sums of hashed-unigram
# target (lang='en') / source corpus counts + their one-division
# ratio — integer-exact, so hash-gated. The smoothed log-likelihood
# ratio itself is pytest-verified (libm/accumulation ulps are not
# cross-engine reproducible). Engine twin:
# text_analysis.importance_count_tables/importance_scores.
IMPORTANCE_WEIGHTS_SQL = r"""
WITH w AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
), hh AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(w), 1, 16))::UBIGINT % 65536 AS BIGINT) AS h
  FROM w
), t AS (
  SELECT h, count(*) AS tc FROM hh WHERE lang = 'en' GROUP BY h
), s AS (
  SELECT h, count(*) AS sc FROM hh GROUP BY h
)
SELECT doc_id,
       CAST(sum(COALESCE(tc, 0)) AS BIGINT) AS t_sum,
       CAST(sum(sc) AS BIGINT) AS s_sum,
       CAST(CAST(sum(COALESCE(tc, 0)) AS BIGINT) AS DOUBLE)
         / CAST(CAST(sum(sc) AS BIGINT) AS DOUBLE) AS ratio
FROM hh LEFT JOIN t USING (h) JOIN s USING (h)
GROUP BY doc_id
"""


def semantic_dedup_pairs_sql(dim: int = 64, k: int = 10, iters: int = 3,
                             threshold: float = 0.99,
                             scale: int = 1_000_000,
                             seed: str = "kmeans-init") -> str:
    """SemDeDup mirror: final assignment from the unrolled-Lloyd chain,
    then cosine only WITHIN a cluster (same recall trade as the
    engine). Threshold margins are corpus-level (twins ≥0.99995,
    non-twins ≤0.60), so the float boundary is never approached."""
    chain = _kmeans_cte_chain(dim, k, iters, scale, seed)
    return chain + f""", af AS (
  SELECT vec_id, c FROM (
    SELECT e.vec_id, m.c,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY 2 * list_dot_product(e.ee, m.ce)
                      - list_dot_product(m.ce, m.ce) DESC, m.c ASC
           ) AS rn
    FROM e, m{iters} m) WHERE rn = 1
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM af a
JOIN af b ON a.c = b.c AND a.vec_id < b.vec_id
JOIN e ea ON ea.vec_id = a.vec_id
JOIN e eb ON eb.vec_id = b.vec_id
WHERE list_cosine_similarity(ea.ee, eb.ee) >= {threshold}"""


# Per-language z-score of word counts — moments from INTEGER sums and
# one fixed float expression on both sides (never var_pop, whose
# streaming accumulator can differ in the last ulp). Engine twin:
# aggregates.grouped_zscore.
LANG_ZSCORE_SQL = r"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
  FROM documents
), m AS (
  SELECT lang,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(CAST(sum(nw) AS BIGINT) AS DOUBLE) AS s,
         CAST(CAST(sum(nw * nw) AS BIGINT) AS DOUBLE) AS s2
  FROM t GROUP BY lang
)
SELECT t.doc_id, t.lang, t.nw,
       CASE WHEN (s2 - s * s / n) / n > 0
            THEN (CAST(t.nw AS DOUBLE) - s / n) / sqrt((s2 - s * s / n) / n)
            ELSE NULL END AS z
FROM t JOIN m USING (lang)
"""


# Ordered funnel (signup -> purchase -> error) with the
# earliest-qualifying-event rule: step-k time is the min event time of
# the step strictly after the user's step-(k-1) time. Engine twin:
# relational.funnel_counts (one user-hash shuffle, vectorized merges,
# (step, users) residues).
EVENT_FUNNEL_SQL = r"""
WITH t1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t1.t
  GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'error' AND e.ts > t2.t
  GROUP BY e.user_id
)
SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type,
       CAST(count(*) AS BIGINT) AS users FROM t1
UNION ALL
SELECT 2, 'purchase', count(*) FROM t2
UNION ALL
SELECT 3, 'error', count(*) FROM t3
"""


# Weekly cohort retention: cohort = each user's first active week,
# users counted per (cohort, week offset). Integer bucket arithmetic
# (floor(epoch/604800)) on both sides. Engine twin:
# relational.cohort_retention (distinct residues -> grouped min ->
# partitioned hash join -> pre-aggregated count).
COHORT_RETENTION_SQL = r"""
WITH p AS (
  SELECT DISTINCT user_id,
         CAST(floor(floor(epoch(ts)) / 604800.0) AS BIGINT) AS bucket
  FROM events
), f AS (
  SELECT user_id, min(bucket) AS cohort FROM p GROUP BY user_id
)
SELECT cohort AS cohort_bucket,
       CAST(p.bucket - cohort AS BIGINT) AS "offset",
       CAST(count(*) AS BIGINT) AS users
FROM p JOIN f USING (user_id)
GROUP BY 1, 2
"""


# Markov transition counts between consecutive events per user, total
# order (ts, event_id). Engine twin: relational.event_transition_counts
# (one user-hash shuffle, vectorized sort+shift, residue sums).
EVENT_TRANSITIONS_SQL = r"""
WITH s AS (
  SELECT user_id, event_type AS src,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
)
SELECT src, dst, CAST(count(*) AS BIGINT) AS transitions
FROM s WHERE dst IS NOT NULL
GROUP BY src, dst
"""


# Streaming COUNT(DISTINCT user) per tumbling hour. Engine twin:
# relational.windowed_distinct_users (distinct residues + count).
EVENTS_WINDOW_DISTINCT_SQL = r"""
SELECT CAST(floor(floor(epoch(ts)) / 3600.0) AS BIGINT) * 3600
         AS window_start_s,
       CAST(count(DISTINCT user_id) AS BIGINT) AS users
FROM events GROUP BY 1
"""


# Top-10 terms per language, pure-integer order (count desc, word
# asc). Engine twin: text_analysis.top_terms_per_group.
LANG_TOP_TERMS_SQL = r"""
WITH w AS (
  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
), c AS (
  SELECT lang, word, CAST(count(*) AS BIGINT) AS cnt
  FROM w GROUP BY lang, word
)
SELECT lang,
       CAST(row_number() OVER (
         PARTITION BY lang ORDER BY cnt DESC, word ASC) AS BIGINT) AS rank,
       word, cnt
FROM c QUALIFY rank <= 10
"""


# Incremental ingestion: docs whose sha256 is absent from the
# persisted index built over the even half of the corpus. Engine twin:
# dedup.build_hash_index + dedup_against_index (hash residues through
# one co-partitioning anti-join; no broadcast, no materialize).
INCREMENTAL_DEDUP_SQL = r"""
WITH idx AS (
  SELECT DISTINCT sha256(text) AS h FROM documents WHERE doc_id % 2 = 0
)
SELECT doc_id, lang
FROM documents
WHERE sha256(text) NOT IN (SELECT h FROM idx)
"""


def cluster_lang_profile_sql(dim: int = 64, k: int = 10, iters: int = 3,
                             scale: int = 1_000_000,
                             seed: str = "kmeans-init") -> str:
    """Cross-table composition: k-means assignment (embeddings) joined
    to documents on doc_id = vec_id, counted per (cluster, lang)."""
    chain = _kmeans_cte_chain(dim, k, iters, scale, seed)
    return chain + f""", af AS (
  SELECT vec_id, c FROM (
    SELECT e.vec_id, m.c,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY 2 * list_dot_product(e.ee, m.ce)
                      - list_dot_product(m.ce, m.ce) DESC, m.c ASC
           ) AS rn
    FROM e, m{iters} m) WHERE rn = 1
)
SELECT CAST(af.c AS BIGINT) AS cluster, d.lang,
       CAST(count(*) AS BIGINT) AS docs
FROM af JOIN documents d ON d.doc_id = af.vec_id
GROUP BY af.c, d.lang"""


# ---------------------------------------------------------------------------
# link graph (corpus/generator.py::build_html anchors, in document order)
# ---------------------------------------------------------------------------

# One row per <a href> of every HTML page: nav (chrome), sidebar
# (chrome), the one in-content archive link, footer terms/privacy
# (chrome). pos is document order. PDF/corrupt docs have no links.
_LINKS_CTE = r"""
, html_docs AS (
  SELECT doc_id, source, url, ent_url,
         'https://' || source || '.example.com' AS base,
         4 + doc_id % 5 AS nav_n,
         3 + doc_id % 4 AS side_n
  FROM golden WHERE NOT is_corrupt AND NOT is_pdf
), links AS (
  SELECT url, CAST(k AS BIGINT) AS pos,
         base || '/section/' || k AS href,
         'section ' || k || ' news' AS anchor_text,
         TRUE AS chrome, source
  FROM (SELECT *, unnest(range(0, nav_n)) AS k FROM html_docs)
  UNION ALL
  SELECT url, CAST(nav_n + k AS BIGINT) AS pos,
         base || '/story/' || doc_id || '-' || k AS href,
         'related story number ' || k AS anchor_text,
         TRUE AS chrome, source
  FROM (SELECT *, unnest(range(0, side_n)) AS k FROM html_docs)
  UNION ALL
  SELECT url, CAST(nav_n + side_n AS BIGINT) AS pos,
         ent_url AS href, ent_url AS anchor_text, FALSE AS chrome, source
  FROM html_docs
  UNION ALL
  SELECT url, CAST(nav_n + side_n + 1 AS BIGINT) AS pos,
         base || '/terms' AS href, 'Terms' AS anchor_text,
         TRUE AS chrome, source
  FROM html_docs
  UNION ALL
  SELECT url, CAST(nav_n + side_n + 2 AS BIGINT) AS pos,
         base || '/privacy' AS href, 'Privacy' AS anchor_text,
         TRUE AS chrome, source
  FROM html_docs
)
"""

LINK_GRAPH_SQL = GOLDEN_CTE + _LINKS_CTE + r"""
SELECT url, pos, href, anchor_text, chrome FROM links
"""

HOST_LINK_DEGREE_SQL = GOLDEN_CTE + _LINKS_CTE + r"""
SELECT source || '.example.com' AS host,
       CAST(count(*) AS BIGINT) AS n_links,
       CAST(sum(CASE WHEN chrome THEN 1 ELSE 0 END) AS BIGINT) AS n_chrome,
       CAST(sum(CASE WHEN href NOT LIKE 'https://' || source || '.example.com/%'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_external,
       CAST(count(DISTINCT href) AS BIGINT) AS n_distinct_targets
FROM links GROUP BY source
"""

# Host-of-URL, the engine's exact rule (stages/linkgraph._host_expr):
# lowercased authority between scheme:// and the first /?#.
_HOST_EXPR = (
    "lower(regexp_extract({c}, "
    "'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1))"
)

ANCHOR_TOP_TERMS_SQL = GOLDEN_CTE + _LINKS_CTE + rf"""
, tw AS (
  SELECT {_HOST_EXPR.format(c='href')} AS target_host,
         unnest(string_split(anchor_text, ' ')) AS word
  FROM links
), tc AS (
  SELECT target_host, word, CAST(count(*) AS BIGINT) AS cnt
  FROM tw GROUP BY target_host, word
)
SELECT target_host,
       CAST(row_number() OVER (
         PARTITION BY target_host ORDER BY cnt DESC, word ASC) AS BIGINT)
         AS rank,
       word, cnt
FROM tc QUALIFY rank <= 5
"""

FRONTIER_URLS_SQL = GOLDEN_CTE + _LINKS_CTE + r"""
SELECT href, CAST(count(DISTINCT url) AS BIGINT) AS n_ref_pages
FROM links
WHERE href NOT IN (SELECT url FROM golden)
GROUP BY href
"""

HOST_INLINK_DEGREE_SQL = GOLDEN_CTE + _LINKS_CTE + rf"""
SELECT {_HOST_EXPR.format(c='href')} AS host,
       CAST(count(*) AS BIGINT) AS n_inlinks,
       CAST(count(DISTINCT {_HOST_EXPR.format(c='url')}) AS BIGINT)
         AS n_src_hosts,
       CAST(count(DISTINCT url) AS BIGINT) AS n_ref_pages
FROM links GROUP BY 1
"""

# One integer power-iteration of link authority: authority(v) =
# Σ_{edges u→v} inlinks(u), over the weighted host-edge residue.
# Sources with zero inlinks contribute zero (cnt * NULL under the
# left join sums away); hosts with only-zero contributions keep a row.
_AUTH_CTE = rf"""
, he AS (
  SELECT {_HOST_EXPR.format(c='url')} AS src,
         {_HOST_EXPR.format(c='href')} AS dst,
         CAST(count(*) AS BIGINT) AS cnt
  FROM links GROUP BY 1, 2
), indeg AS (
  SELECT dst AS host, CAST(sum(cnt) AS BIGINT) AS n_inlinks
  FROM he GROUP BY dst
), auth AS (
  SELECT i.host, i.n_inlinks,
         CAST(coalesce(sum(e.cnt * s.n_inlinks), 0) AS BIGINT) AS authority
  FROM indeg i
  LEFT JOIN he e ON e.dst = i.host
  LEFT JOIN indeg s ON s.host = e.src
  GROUP BY i.host, i.n_inlinks
)
"""

HOST_AUTHORITY_SQL = GOLDEN_CTE + _LINKS_CTE + _AUTH_CTE + r"""
SELECT host, n_inlinks, authority FROM auth
"""


def host_authority_sql(iters: int) -> str:
    """k power-iterations of integer link authority, unrolled as a CTE
    chain (the same device as the k-means oracle): ``a0 = indeg``,
    ``a{i}(v) = Σ_{u→v} cnt·a{i-1}(u)`` with zero-padded hosts kept.
    Mirrors ``stages/linkgraph.host_authority(iters=k)`` exactly —
    all integer, no floats anywhere."""
    chain = GOLDEN_CTE + _LINKS_CTE + rf"""
, he AS (
  SELECT {_HOST_EXPR.format(c='url')} AS src,
         {_HOST_EXPR.format(c='href')} AS dst,
         CAST(count(*) AS BIGINT) AS cnt
  FROM links GROUP BY 1, 2
), indeg AS (
  SELECT dst AS host, CAST(sum(cnt) AS BIGINT) AS n_inlinks
  FROM he GROUP BY dst
), a0 AS (
  SELECT host, n_inlinks AS score FROM indeg
)"""
    for i in range(1, iters + 1):
        chain += f""", a{i} AS (
  SELECT i.host,
         CAST(coalesce(sum(e.cnt * s.score), 0) AS BIGINT) AS score
  FROM indeg i
  LEFT JOIN he e ON e.dst = i.host
  LEFT JOIN a{i - 1} s ON s.host = e.src
  GROUP BY i.host
)"""
    return chain + f"""
SELECT i.host, i.n_inlinks, a.score AS authority
FROM indeg i JOIN a{iters} a ON a.host = i.host
"""

# Cross-layer composition: the text-extraction host stats joined to
# the link-graph authority step — proves the graph layer composes
# with the extraction layer on one key.
HOST_PROFILE_SQL = GOLDEN_CTE + _LINKS_CTE + _AUTH_CTE + r"""
, hs AS (
  SELECT source || '.example.com' AS host,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(extracted_text)) AS BIGINT) AS total_chars,
         CAST(sum(CASE WHEN parse_status = 'failed' THEN 1 ELSE 0 END)
              AS BIGINT) AS parse_failures
  FROM golden GROUP BY 1
)
SELECT hs.host, hs.n_docs, hs.total_chars, hs.parse_failures,
       a.n_inlinks, a.authority
FROM hs JOIN auth a ON a.host = hs.host
"""

# RefinedWeb-style per-source token cap: whole docs kept in md5 order
# while the inclusive running token total stays <= 1200; the first
# crossing doc and everything after it drop. Mirrors
# stages/text_analysis.grouped_token_cap (seed 'hostcap').
SOURCE_TOKEN_CAP_SQL = r"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5('hostcap:' || CAST(doc_id AS VARCHAR)) AS rk
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY rk, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT doc_id, source, n_tokens FROM c WHERE cum <= 1200
"""


# Politeness-aware crawl scheduling: within each target host the
# frontier is ranked (referrers desc, href asc — a total integer
# order) and sliced into fetch rounds of 25.
FRONTIER_SCHEDULE_SQL = GOLDEN_CTE + _LINKS_CTE + rf"""
, fr AS (
  SELECT href, CAST(count(DISTINCT url) AS BIGINT) AS n_ref_pages
  FROM links
  WHERE href NOT IN (SELECT url FROM golden)
  GROUP BY href
)
SELECT href, {_HOST_EXPR.format(c='href')} AS host, n_ref_pages,
       CAST((row_number() OVER (
           PARTITION BY {_HOST_EXPR.format(c='href')}
           ORDER BY n_ref_pages DESC, href ASC) - 1) // 25 AS BIGINT)
         AS fetch_round
FROM fr
"""


# Out-degree histogram over ALL pages (zero-link PDF/corrupt pages
# included via the left join).
PAGE_OUTDEGREE_HIST_SQL = GOLDEN_CTE + _LINKS_CTE + r"""
, od AS (
  SELECT g.url, CAST(count(l.href) AS BIGINT) AS outdeg
  FROM golden g LEFT JOIN links l ON l.url = g.url
  GROUP BY g.url
)
SELECT outdeg, CAST(count(*) AS BIGINT) AS n_pages
FROM od GROUP BY outdeg
"""


# ---------------------------------------------------------------------------
# collocations: PMI > log(theta) as an exact integer cross-multiply
# (stages/scrub.py::collocations — theta 5/4, min_count 2)
# ---------------------------------------------------------------------------

COLLOCATIONS_SQL = r"""
WITH t AS (
  SELECT string_split(text, ' ') AS ws, len(string_split(text, ' ')) AS nw
  FROM documents
), uc AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(ws) AS w FROM t) GROUP BY w
), big AS (
  SELECT ws[i + 1] AS w1, ws[i + 2] AS w2
  FROM (SELECT ws, unnest(range(0, nw - 1)) AS i FROM t WHERE nw >= 2)
), bc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cxy FROM big GROUP BY 1, 2
), nt AS (
  SELECT CAST(sum(cxy) AS BIGINT) AS n FROM bc
)
SELECT w1, w2, cxy, u1.c AS cx, u2.c AS cy
FROM bc JOIN uc u1 ON u1.w = bc.w1 JOIN uc u2 ON u2.w = bc.w2, nt
WHERE cxy >= 2 AND 4 * cxy * nt.n > 5 * u1.c * u2.c
"""


# ---------------------------------------------------------------------------
# sliding-window chunking (stages/text_analysis.py::chunk_windows,
# window 24 / stride 16; integer chunk-count formula, no floats)
# ---------------------------------------------------------------------------

CHUNK_WINDOWS_SQL = r"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS nw
  FROM documents
), c AS (
  SELECT doc_id, ws, nw,
         CASE WHEN nw <= 24 THEN 1 ELSE 1 + (nw - 24 + 15) // 16 END AS nch
  FROM base
), e AS (
  SELECT doc_id, ws, nw, unnest(range(0, nch)) AS i FROM c
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       array_to_string(list_slice(ws, i * 16 + 1, LEAST(i * 16 + 24, nw)),
                       ' ') AS chunk_text,
       CAST(LEAST(i * 16 + 24, nw) - i * 16 AS BIGINT) AS n_words
FROM e
"""


# ---------------------------------------------------------------------------
# duplicated-span removal (stages/scrub.py::span_dedup, n=8,
# min_count=2): a word is dropped iff its position is covered by any
# corpus-duplicated 8-gram; window-max over duplicate-start flags ==
# the engine's diff/cumsum interval marking
# ---------------------------------------------------------------------------

SPAN_DEDUP_SQL = r"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS nw
  FROM documents
), wu AS (
  SELECT doc_id,
         unnest(list_transform(range(1, nw + 1),
                i -> struct_pack(p := i, w := ws[i]))) AS u
  FROM t
), words AS (
  SELECT doc_id, CAST(u.p AS BIGINT) - 1 AS pos, u.w AS word FROM wu
), gu AS (
  SELECT doc_id,
         unnest(list_transform(range(1, nw - 8 + 2),
                i -> struct_pack(s := i,
                                 g := array_to_string(ws[i:i+7], ' ')))) AS u
  FROM t WHERE nw >= 8
), grams AS (
  SELECT doc_id, CAST(u.s AS BIGINT) - 1 AS s, u.g AS gram FROM gu
), dupg AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
), dstart AS (
  SELECT doc_id, s FROM grams WHERE gram IN (SELECT gram FROM dupg)
), flag AS (
  SELECT w.doc_id, w.pos, w.word,
         CASE WHEN d.s IS NULL THEN 0 ELSE 1 END AS dup_start
  FROM words w LEFT JOIN dstart d
    ON d.doc_id = w.doc_id AND d.s = w.pos
), cov AS (
  SELECT doc_id, pos, word,
         max(dup_start) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS covered
  FROM flag
)
SELECT doc_id,
       coalesce(string_agg(word, ' ' ORDER BY pos)
                FILTER (WHERE covered = 0), '') AS text,
       CAST(count(*) FILTER (WHERE covered = 0) AS BIGINT) AS n_kept,
       CAST(count(*) FILTER (WHERE covered = 1) AS BIGINT) AS n_dropped
FROM cov GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# literal-keyword retrieval (stages/text_analysis.py::keyword_search,
# k=10): integer occurrence score, ties by doc_id — the fixed query
# set is the same literal table the engine broadcasts
# ---------------------------------------------------------------------------

KEYWORD_SEARCH_SQL = r"""
WITH q(query_id, term) AS (
  VALUES (1, 'sort'), (1, 'merge'),
         (2, 'spark'), (2, 'stream'),
         (3, 'customer'), (3, 'filter'), (3, 'query'),
         (4, 'window')
), w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), s AS (
  SELECT q.query_id, w.doc_id, CAST(count(*) AS BIGINT) AS score
  FROM w JOIN q ON q.term = w.term
  GROUP BY q.query_id, w.doc_id
), r AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS BIGINT) AS "rank"
  FROM s
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score, "rank"
FROM r WHERE "rank" <= 10
"""


# ---------------------------------------------------------------------------
# canonical-URL dedup (stages/urltools.py::url_dedup): GROUP BY over
# the URL_PARSE_SQL canonicalization, keep min doc_id + dupe count
# ---------------------------------------------------------------------------

URL_DEDUP_SQL = (
    "WITH base AS (\n" + URL_PARSE_SQL + "\n)\n"
    "SELECT url_norm, CAST(min(doc_id) AS BIGINT) AS doc_id,\n"
    "       CAST(count(*) AS BIGINT) AS n_dupes\n"
    "FROM base WHERE url_norm <> '' GROUP BY url_norm\n"
)


# ---------------------------------------------------------------------------
# host connected components (stages/linkgraph.py::host_components):
# recursive min-STRING-label closure over the distinct undirected
# cross-host edge set — the engine's internal 60-bit ids never appear
# ---------------------------------------------------------------------------

HOST_COMPONENTS_SQL = (
    GOLDEN_CTE.replace("WITH base AS", "WITH RECURSIVE base AS", 1)
    + _LINKS_CTE
    + f"""
, hp AS (
  SELECT DISTINCT {_HOST_EXPR.format(c='url')} AS src,
                  {_HOST_EXPR.format(c='href')} AS dst
  FROM links
), hpf AS (
  SELECT src, dst FROM hp WHERE src <> '' AND dst <> '' AND src <> dst
), ed AS (
  SELECT src AS u, dst AS v FROM hpf UNION SELECT dst, src FROM hpf
), reach AS (
  SELECT u AS a, u AS b FROM ed
  UNION
  SELECT r.a, e.v AS b FROM reach r JOIN ed e ON e.u = r.b
), comp AS (
  SELECT a AS host, min(b) AS comp_host FROM reach GROUP BY a
), sizes AS (
  SELECT comp_host, CAST(count(*) AS BIGINT) AS comp_size
  FROM comp GROUP BY comp_host
)
SELECT c.host, c.comp_host, s.comp_size
FROM comp c JOIN sizes s ON s.comp_host = c.comp_host
"""
)


# ---------------------------------------------------------------------------
# robots-style frontier gating (stages/linkgraph.py::robots_gate):
# longest matching path prefix decides, allow wins length ties,
# unmatched defaults to allowed
# ---------------------------------------------------------------------------

_PATH_EXPR = (
    "regexp_extract({c}, "
    "'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1)"
)

ROBOTS_GATE_SQL = GOLDEN_CTE + _LINKS_CTE + f"""
, fr AS (
  SELECT href, CAST(count(DISTINCT url) AS BIGINT) AS n_ref_pages
  FROM links WHERE href NOT IN (SELECT url FROM golden)
  GROUP BY href
), rules(prefix, allow) AS (
  VALUES ('/terms', FALSE), ('/privacy', FALSE),
         ('/story/', FALSE), ('/story/1', TRUE)
), p AS (
  SELECT href, n_ref_pages,
         CASE WHEN {_PATH_EXPR.format(c='href')} = '' THEN '/'
              ELSE {_PATH_EXPR.format(c='href')} END AS path
  FROM fr
), m AS (
  SELECT p.href, r.allow, len(r.prefix) AS plen
  FROM p JOIN rules r ON p.path LIKE r.prefix || '%'
), best AS (
  SELECT href, max(plen) AS plen FROM m GROUP BY href
), dec AS (
  SELECT m.href, bool_or(m.allow) AS allow
  FROM m JOIN best b ON b.href = m.href AND b.plen = m.plen
  GROUP BY m.href
)
SELECT p.href, p.n_ref_pages, coalesce(d.allow, TRUE) AS allowed
FROM p LEFT JOIN dec d ON d.href = p.href
"""


# ---------------------------------------------------------------------------
# exact-phrase retrieval (stages/text_analysis.py::phrase_search,
# k=10): per-length gram explodes UNION'd, integer scores, ties by
# doc_id
# ---------------------------------------------------------------------------

PHRASE_SEARCH_SQL = r"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS nw
  FROM documents
), g2 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, nw),
                i -> array_to_string(ws[i:i+1], ' '))) AS gram
  FROM t WHERE nw >= 2
), g3 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, nw - 1),
                i -> array_to_string(ws[i:i+2], ' '))) AS gram
  FROM t WHERE nw >= 3
), q2(query_id, phrase) AS (
  VALUES (2, 'batch batch'), (3, 'sort merge')
), q3(query_id, phrase) AS (
  VALUES (1, 'batch batch batch')
), s AS (
  SELECT q.query_id, g.doc_id, CAST(count(*) AS BIGINT) AS score
  FROM g2 g JOIN q2 q ON g.gram = q.phrase GROUP BY 1, 2
  UNION ALL
  SELECT q.query_id, g.doc_id, CAST(count(*) AS BIGINT) AS score
  FROM g3 g JOIN q3 q ON g.gram = q.phrase GROUP BY 1, 2
), r AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS BIGINT) AS "rank"
  FROM s
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score, "rank"
FROM r WHERE "rank" <= 10
"""


# ---------------------------------------------------------------------------
# per-source duplication profile (stages/scrub.py::source_dup_profile):
# SPAN_DEDUP_SQL as a derived table joined back to the group column
# ---------------------------------------------------------------------------

SOURCE_DUP_PROFILE_SQL = (
    "WITH sd AS (\n" + SPAN_DEDUP_SQL + "\n)\n"
    "SELECT d.source,\n"
    "       CAST(sum(sd.n_kept) AS BIGINT) AS tok_kept,\n"
    "       CAST(sum(sd.n_dropped) AS BIGINT) AS tok_dropped,\n"
    "       CAST(count(*) AS BIGINT) AS n_docs\n"
    "FROM sd JOIN documents d ON d.doc_id = sd.doc_id\n"
    "GROUP BY d.source\n"
)


# ---------------------------------------------------------------------------
# per-component crawl profile (stages/linkgraph.py::component_profile):
# the components closure and the degree profile as derived tables,
# inner-joined on host
# ---------------------------------------------------------------------------

COMPONENT_PROFILE_SQL = (
    "WITH comp AS (\n" + HOST_COMPONENTS_SQL + "\n), deg AS (\n"
    + HOST_LINK_DEGREE_SQL + "\n)\n"
    "SELECT c.comp_host,\n"
    "       CAST(min(c.comp_size) AS BIGINT) AS n_hosts,\n"
    "       CAST(count(*) AS BIGINT) AS n_crawled_hosts,\n"
    "       CAST(sum(d.n_links) AS BIGINT) AS links_total,\n"
    "       CAST(sum(d.n_external) AS BIGINT) AS external_total\n"
    "FROM comp c JOIN deg d ON d.host = c.host\n"
    "GROUP BY c.comp_host\n"
)


# ---------------------------------------------------------------------------
# recrawl collapse: latest snapshot per URL. Engine twin:
# relational.latest_by_key over the synthesized snapshot table
# (snapshot s = text minus its first s words, ts strictly increasing
# per snapshot). n_words/md5 recompute the engine's post-collapse
# projection on the winning snapshot's text.
# ---------------------------------------------------------------------------

RECRAWL_LATEST_SQL = r"""
WITH s AS (
  SELECT doc_id, lang, source, text,
         unnest(range(0, 1 + doc_id % 3)) AS snap
  FROM documents
), t AS (
  SELECT 'https://' || source || '.example.com/' || lang || '/' ||
             lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         CAST(snap AS BIGINT) AS snap,
         CAST(1735689600000000 + doc_id * 1000000
              + snap * 86400000000 AS BIGINT) AS ts_us,
         array_to_string(
           list_slice(string_split(text, ' '), snap + 1,
                      len(string_split(text, ' '))), ' ') AS snap_text
  FROM s
), r AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY ts_us DESC) AS rn
  FROM t
)
SELECT url, snap, ts_us,
       CAST(len(string_split(snap_text, ' ')) AS BIGINT) AS n_words,
       md5(snap_text) AS text_md5
FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# host-granular holdout split. Engine twin: host_stats.host_holdout —
# same md5_u64 membership contract as HASH_SAMPLE_SQL, applied to the
# host so the train/valid boundary can never split a site.
# ---------------------------------------------------------------------------

HOST_HOLDOUT_SQL = r"""
WITH d AS (
  SELECT lower(source || '.example.com') AS host,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
  FROM documents
), g AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nw) AS BIGINT) AS total_words
  FROM d GROUP BY host
)
SELECT host,
       CASE WHEN CAST(('0x' || substr(md5('holdout:' || host), 1, 16))
                      AS UBIGINT) % 10 = 0
            THEN 'valid' ELSE 'train' END AS split,
       n_docs, total_words
FROM g
"""


# ---------------------------------------------------------------------------
# BM25 retrieval. Engine twin: text_analysis.bm25_search — the ONE
# fixed float expression per (doc, term), quantized to integer
# millionths with floor(x*1e6 + 0.5) BEFORE the per-query sum, so the
# BIGINT score is associativity-proof and libm-identical on both
# sides. Keep the expression text in lockstep with the numpy twin.
# ---------------------------------------------------------------------------

BM25_SEARCH_SQL = r"""
WITH q(query_id, term) AS (
  VALUES (1, 'sort'), (1, 'stream'),
         (2, 'customer'), (2, 'window'),
         (3, 'merge'), (3, 'filter'), (3, 'query')
), w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) AS sumdl
  FROM dl
), df AS (
  SELECT w.term, CAST(count(DISTINCT w.doc_id) AS DOUBLE) AS df
  FROM w JOIN (SELECT DISTINCT term FROM q) qt ON qt.term = w.term
  GROUP BY w.term
), tf AS (
  SELECT q.query_id, w.doc_id, w.term, CAST(count(*) AS DOUBLE) AS tf
  FROM w JOIN q ON q.term = w.term
  GROUP BY q.query_id, w.doc_id, w.term
), c AS (
  SELECT tf.query_id, tf.doc_id,
         CAST(floor(
           ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                                            / (s.sumdl / s.n))))
           * 1000000.0 + 0.5) AS BIGINT) AS contrib
  FROM tf
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
), sc AS (
  SELECT query_id, doc_id, CAST(sum(contrib) AS BIGINT) AS score
  FROM c GROUP BY query_id, doc_id
), r AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS BIGINT) AS "rank"
  FROM sc
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score, "rank"
FROM r WHERE "rank" <= 10
"""


# ---------------------------------------------------------------------------
# damped PageRank in exact integer arithmetic. Engine twin:
# linkgraph.host_pagerank — s0 = scale, s_{k+1} = (15*scale)//100 +
# (85 * sum cnt*(s_k(src) // outdeg(src))) // 100, floor at every
# division, unrolled as a CTE chain like host_authority_sql.
# ---------------------------------------------------------------------------

def host_pagerank_sql(iters: int = 2, scale: int = 1_000_000) -> str:
    base = (15 * scale) // 100
    chain = GOLDEN_CTE + _LINKS_CTE + rf"""
, he AS (
  SELECT {_HOST_EXPR.format(c='url')} AS src,
         {_HOST_EXPR.format(c='href')} AS dst,
         CAST(count(*) AS BIGINT) AS cnt
  FROM links GROUP BY 1, 2
), outd AS (
  SELECT src AS host, CAST(sum(cnt) AS BIGINT) AS outdeg
  FROM he GROUP BY src
), hosts AS (
  SELECT DISTINCT host FROM (
    SELECT src AS host FROM he UNION ALL SELECT dst FROM he
  )
), p0 AS (
  SELECT host, CAST({scale} AS BIGINT) AS score FROM hosts
)"""
    for i in range(1, iters + 1):
        chain += f""", p{i} AS (
  SELECT h.host,
         CAST({base} + (85 * coalesce(sum(e.cnt * (s.score // o.outdeg)), 0))
              // 100 AS BIGINT) AS score
  FROM hosts h
  LEFT JOIN he e ON e.dst = h.host
  LEFT JOIN p{i - 1} s ON s.host = e.src
  LEFT JOIN outd o ON o.host = e.src
  GROUP BY h.host
)"""
    return chain + f"""
SELECT host, score AS pagerank FROM p{iters}
"""


HOST_PAGERANK_SQL = host_pagerank_sql()


def host_pagerank_converged_sql(
    max_iters: int = 16, tol: int | None = None, scale: int = 1_000_000
) -> str:
    """Mirror of linkgraph.host_pagerank_converged: unroll max_iters
    integer supersteps, compute every consecutive per-host max |Δ|,
    and select the FIRST step k with Δ <= tol (else max_iters) — the
    convergence decision is replayed in SQL, not trusted from the
    engine.

    Every superstep CTE (and ``he``, which closes over the expensive
    golden→links chain) is ``AS MATERIALIZED``: DuckDB inlines plain
    CTEs, so with p_i referenced by p_{{i+1}}, d AND allp, the links
    extraction would otherwise be re-evaluated O(max_iters²) times —
    measured >9 min at sf0.001 vs ~seconds materialized."""
    if tol is None:
        tol = scale // 50
    base = (15 * scale) // 100
    chain = GOLDEN_CTE + _LINKS_CTE + rf"""
, he AS MATERIALIZED (
  SELECT {_HOST_EXPR.format(c='url')} AS src,
         {_HOST_EXPR.format(c='href')} AS dst,
         CAST(count(*) AS BIGINT) AS cnt
  FROM links GROUP BY 1, 2
), outd AS (
  SELECT src AS host, CAST(sum(cnt) AS BIGINT) AS outdeg
  FROM he GROUP BY src
), hosts AS (
  SELECT DISTINCT host FROM (
    SELECT src AS host FROM he UNION ALL SELECT dst FROM he
  )
), p0 AS (
  SELECT host, CAST({scale} AS BIGINT) AS score FROM hosts
)"""
    for i in range(1, max_iters + 1):
        chain += f""", p{i} AS MATERIALIZED (
  SELECT h.host,
         CAST({base} + (85 * coalesce(sum(e.cnt * (s.score // o.outdeg)), 0))
              // 100 AS BIGINT) AS score
  FROM hosts h
  LEFT JOIN he e ON e.dst = h.host
  LEFT JOIN p{i - 1} s ON s.host = e.src
  LEFT JOIN outd o ON o.host = e.src
  GROUP BY h.host
)"""
    deltas = "\n  UNION ALL ".join(
        f"SELECT {i} AS k, max(abs(a.score - b.score)) AS delta "
        f"FROM p{i} a JOIN p{i - 1} b ON a.host = b.host"
        for i in range(1, max_iters + 1)
    )
    allp = "\n  UNION ALL ".join(
        f"SELECT {i} AS k, host, score FROM p{i}"
        for i in range(1, max_iters + 1)
    )
    return chain + f""", d AS (
  {deltas}
), kstar AS (
  SELECT CAST(coalesce(min(k), {max_iters}) AS BIGINT) AS k
  FROM d WHERE delta <= {tol}
), allp AS (
  {allp}
)
SELECT a.host, a.score AS pagerank, ks.k AS n_iters
FROM allp a CROSS JOIN kstar ks
WHERE a.k = ks.k
"""


HOST_PAGERANK_CONVERGED_SQL = host_pagerank_converged_sql()


# ---------------------------------------------------------------------------
# unigram-LM NLL scoring (CCNet-style quality triage). Engine twin:
# text_analysis.unigram_nll_scores — per-bucket logprob quantized to
# integer millionths (the bm25 device), per-doc score = BIGINT sum.
# Same md5_u64 % 65536 hash contract as IMPORTANCE_WEIGHTS_SQL.
# ---------------------------------------------------------------------------

UNIGRAM_NLL_SQL = r"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), hh AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(w), 1, 16))::UBIGINT % 65536 AS BIGINT) AS h
  FROM w
), c AS (
  SELECT h, CAST(count(*) AS BIGINT) AS c FROM hh GROUP BY h
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS t FROM hh
), q AS (
  SELECT h,
         CAST(floor(-ln((CAST(c AS DOUBLE) + 1.0)
                        / (CAST(t.t AS DOUBLE) + 65536.0))
                    * 1000000.0 + 0.5) AS BIGINT) AS nll_u
  FROM c CROSS JOIN tot t
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(nll_u) AS BIGINT) AS nll_micro,
       CAST(CAST(sum(nll_u) AS BIGINT) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS mean_nll
FROM hh JOIN q USING (h)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Naive-Bayes quality classifier (the fasttext-style "looks like the
# reference corpus" filter). Engine twin:
# text_analysis.nb_classifier_scores with positive seed lang = 'en' —
# per-bucket log-likelihood RATIO quantized to integer millionths
# (two libm ln calls then one subtraction, floor once), per-doc score
# = BIGINT sum. Same md5_u64 % 65536 hash contract as UNIGRAM_NLL_SQL.
# ---------------------------------------------------------------------------

QUALITY_CLASSIFIER_SQL = r"""
WITH w AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
), hh AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(w), 1, 16))::UBIGINT % 65536 AS BIGINT) AS h
  FROM w
), c AS (
  SELECT h,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pc,
         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS nc
  FROM hh GROUP BY h
), tot AS (
  SELECT CAST(sum(pc) AS BIGINT) AS tp, CAST(sum(nc) AS BIGINT) AS tn FROM c
), q AS (
  SELECT h,
         CAST(floor((ln((CAST(pc AS DOUBLE) + 1.0)
                         / (CAST(t.tp AS DOUBLE) + 65536.0))
                     - ln((CAST(nc AS DOUBLE) + 1.0)
                         / (CAST(t.tn AS DOUBLE) + 65536.0)))
                    * 1000000.0 + 0.5) AS BIGINT) AS llr_u
  FROM c CROSS JOIN tot t
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(llr_u) AS BIGINT) AS llr_micro,
       CAST(CAST(sum(llr_u) AS BIGINT) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS mean_llr
FROM hh JOIN q USING (h)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# directional n-gram containment (quote/syndication detection).
# Engine twin: dedup.containment_pairs — asymmetric prefix filter with
# exact recall, rational gate 5*shared >= 4*n_inner (no float decides
# membership). The corpus is documents + synthesized quote docs
# (first 24 words + unique noise token) + decoy docs (8 words + 16
# noise tokens, below the gate); the oracle is brute force.
# ---------------------------------------------------------------------------

CONTAINMENT_PAIRS_SQL = r"""
WITH q AS (
  SELECT doc_id + 1000000 AS qid,
         array_to_string(
           list_slice(string_split(text, ' '), 1,
                      least(24, len(string_split(text, ' ')))), ' ')
           || ' qnoise' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id % 7 = 1
), z AS (
  SELECT doc_id + 2000000 AS zid,
         array_to_string(
           list_slice(string_split(text, ' '), 1,
                      least(8, len(string_split(text, ' ')))), ' ')
           || ' ' || array_to_string(
                list_transform(range(0, 16),
                  k -> 'znoise' || CAST(doc_id AS VARCHAR) || '_'
                       || CAST(k AS VARCHAR)), ' ') AS text
  FROM documents WHERE doc_id % 11 = 3
), corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT qid AS doc_id, text FROM q
  UNION ALL SELECT zid AS doc_id, text FROM z
), w AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS nw
  FROM corpus
), sh0 AS (
  SELECT doc_id,
         unnest(CASE WHEN nw < 3 THEN [array_to_string(ws, ' ')]
                ELSE list_transform(range(0, nw - 2),
                     i -> array_to_string(list_slice(ws, i + 1, i + 3), ' '))
                END) AS shingle
  FROM w
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM sh0
), cnt AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS ns FROM sh GROUP BY doc_id
), pair_inter AS (
  SELECT a.doc_id AS inner_id, b.doc_id AS outer_id,
         CAST(count(*) AS BIGINT) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
  GROUP BY 1, 2
)
SELECT inner_id, outer_id, ca.ns AS n_inner, i AS n_shared,
       CAST(i AS DOUBLE) / CAST(ca.ns AS DOUBLE) AS containment
FROM pair_inter JOIN cnt ca ON inner_id = ca.doc_id
WHERE 5 * i >= 4 * ca.ns
"""


# ---------------------------------------------------------------------------
# reciprocal-link detection. Engine twin: linkgraph.reciprocal_hosts
# over links_table(corpus + synthesized backlink pages). The mirror
# re-derives the backlink edges from the generator formula and the
# content edges from _LINKS_CTE, then does the same canonical-pair
# direction-split aggregation.
# ---------------------------------------------------------------------------

RECIPROCAL_HOSTS_SQL = GOLDEN_CTE + _LINKS_CTE + rf"""
, back AS (
  SELECT 'https://archive.example.org/back/' || doc_id AS url,
         'https://' || source || '.example.com/ref/' || doc_id AS href
  FROM documents WHERE doc_id % 13 = 2
), all_edges AS (
  SELECT {_HOST_EXPR.format(c='url')} AS src,
         {_HOST_EXPR.format(c='href')} AS dst
  FROM links
  UNION ALL
  SELECT {_HOST_EXPR.format(c='url')} AS src,
         {_HOST_EXPR.format(c='href')} AS dst
  FROM back
), he AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt
  FROM all_edges
  WHERE src != dst AND src != '' AND dst != ''
  GROUP BY 1, 2
), p AS (
  SELECT least(src, dst) AS host_a, greatest(src, dst) AS host_b,
         CAST(sum(CASE WHEN src < dst THEN cnt ELSE 0 END) AS BIGINT)
             AS cnt_ab,
         CAST(sum(CASE WHEN src > dst THEN cnt ELSE 0 END) AS BIGINT)
             AS cnt_ba
  FROM he GROUP BY 1, 2
)
SELECT host_a, host_b, cnt_ab, cnt_ba
FROM p WHERE cnt_ab > 0 AND cnt_ba > 0
"""


# ---------------------------------------------------------------------------
# per-source LM quality profile. Engine twin: unigram_nll_scores
# (keep_cols=['source']) + grouped integer sums; mean is the single
# division on top of exact BIGINT sums.
# ---------------------------------------------------------------------------

SOURCE_QUALITY_PROFILE_SQL = r"""
WITH w AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
  FROM documents
), hh AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(w), 1, 16))::UBIGINT % 65536 AS BIGINT) AS h
  FROM w
), c AS (
  SELECT h, CAST(count(*) AS BIGINT) AS c FROM hh GROUP BY h
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS t FROM hh
), q AS (
  SELECT h,
         CAST(floor(-ln((CAST(c AS DOUBLE) + 1.0)
                        / (CAST(t.t AS DOUBLE) + 65536.0))
                    * 1000000.0 + 0.5) AS BIGINT) AS nll_u
  FROM c CROSS JOIN tot t
), per_doc AS (
  SELECT doc_id, any_value(source) AS source,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(nll_u) AS BIGINT) AS nll_micro
  FROM hh JOIN q USING (h)
  GROUP BY doc_id
)
SELECT source,
       CAST(sum(nll_micro) AS BIGINT) AS nll_micro,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(CAST(sum(nll_micro) AS BIGINT) AS DOUBLE)
         / CAST(CAST(sum(n_words) AS BIGINT) AS DOUBLE)
           AS mean_nll_per_word
FROM per_doc
GROUP BY source
"""


# ---------------------------------------------------------------------------
# recrawl → holdout → mixture composition. Engine twin:
# latest_by_key over the snapshot fixture, the host_holdout md5 rule
# (train side), then a per-language sum — chained as window + hash
# gate + GROUP BY here.
# ---------------------------------------------------------------------------

RECRAWL_TRAIN_MIXTURE_SQL = r"""
WITH s AS (
  SELECT doc_id, lang, source, text,
         unnest(range(0, 1 + doc_id % 3)) AS snap
  FROM documents
), t AS (
  SELECT lang,
         lower(source || '.example.com') AS host,
         'https://' || source || '.example.com/' || lang || '/' ||
             lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         CAST(1735689600000000 + doc_id * 1000000
              + snap * 86400000000 AS BIGINT) AS ts_us,
         array_to_string(
           list_slice(string_split(text, ' '), snap + 1,
                      len(string_split(text, ' '))), ' ') AS snap_text
  FROM s
), r AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY ts_us DESC) AS rn
  FROM t
), train AS (
  SELECT lang, snap_text FROM r
  WHERE rn = 1
    AND CAST(('0x' || substr(md5('holdout:' || host), 1, 16))
             AS UBIGINT) % 10 != 0
)
SELECT lang,
       CAST(sum(len(string_split(snap_text, ' '))) AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_docs
FROM train GROUP BY lang
"""


# ---------------------------------------------------------------------------
# CCNet-style perplexity triage. Engine twin:
# text_analysis.perplexity_buckets over unigram_nll_scores — tertile
# thresholds from the deterministic 1024-bin histogram (the
# CHARS_QUANTILES_APPROX device), bucket decided by integer bin
# comparison; the only floats are the shared bin/ceil expressions.
# ---------------------------------------------------------------------------

PERPLEXITY_BUCKETS_SQL = r"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), hh AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(w), 1, 16))::UBIGINT % 65536 AS BIGINT) AS h
  FROM w
), c AS (
  SELECT h, CAST(count(*) AS BIGINT) AS c FROM hh GROUP BY h
), tot0 AS (
  SELECT CAST(count(*) AS BIGINT) AS t FROM hh
), q AS (
  SELECT h,
         CAST(floor(-ln((CAST(c AS DOUBLE) + 1.0)
                        / (CAST(t.t AS DOUBLE) + 65536.0))
                    * 1000000.0 + 0.5) AS BIGINT) AS nll_u
  FROM c CROSS JOIN tot0 t
), per_doc AS (
  SELECT doc_id,
         CAST(CAST(sum(nll_u) AS BIGINT) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS mean_nll
  FROM hh JOIN q USING (h)
  GROUP BY doc_id
), m AS (
  SELECT min(mean_nll) AS lo, max(mean_nll) AS hi FROM per_doc
), b AS (
  SELECT doc_id, mean_nll,
         least(greatest(CAST(floor((mean_nll - lo) / (hi - lo) * 1024)
                             AS BIGINT), 0), 1023) AS bin
  FROM per_doc, m
), h2 AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY bin
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM h2
), cum AS (
  SELECT bin, sum(c) OVER (ORDER BY bin) AS cs FROM h2
), t1 AS (
  SELECT min(bin) AS b1 FROM cum
  WHERE cs >= greatest(ceil((1.0 / 3) * (SELECT n FROM tot)), 1)
), t2 AS (
  SELECT min(bin) AS b2 FROM cum
  WHERE cs >= greatest(ceil((2.0 / 3) * (SELECT n FROM tot)), 1)
)
SELECT doc_id, mean_nll,
       CASE WHEN bin <= b1 THEN 'head'
            WHEN bin <= b2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM b, t1, t2
"""


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer et al., SIGMOD 2003). Engine twin:
# text_analysis.winnow_fingerprints — per window of w=4 consecutive
# 3-shingle hashes, the RIGHTMOST minimal hash is selected; output is
# the distinct (doc, pos, hash) set. The mirror computes the window
# min with a ROWS frame, then joins back to find the max pos
# attaining it — the same rightmost-min rule.
# ---------------------------------------------------------------------------

WINNOW_FINGERPRINTS_SQL = r"""
WITH wt AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS nw
  FROM documents
), sh0 AS (
  SELECT doc_id,
         unnest(CASE WHEN nw < 3 THEN [array_to_string(ws, ' ')]
                ELSE list_transform(range(0, nw - 2),
                     i -> array_to_string(list_slice(ws, i + 1, i + 3), ' '))
                END) AS shingle,
         unnest(CASE WHEN nw < 3 THEN [0]
                ELSE range(0, nw - 2) END) AS pos
  FROM wt
), sh AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         ('0x' || substr(md5(shingle), 1, 16))::UBIGINT AS gram_hash
  FROM sh0
), win AS (
  SELECT doc_id, pos,
         min(gram_hash) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
         ) AS wmin
  FROM sh
), sel AS (
  SELECT w.doc_id, max(b.pos) AS pos, w.wmin AS gram_hash
  FROM win w
  JOIN sh b ON b.doc_id = w.doc_id
           AND b.pos BETWEEN w.pos - 3 AND w.pos
           AND b.gram_hash = w.wmin
  WHERE w.pos >= 3
  GROUP BY w.doc_id, w.pos, w.wmin
)
SELECT DISTINCT doc_id, pos, gram_hash FROM sel
"""


# ---------------------------------------------------------------------------
# character-entropy quality signal. Engine twin:
# text_analysis.char_entropy_scores — one quantized BIGINT term per
# distinct character (floor(cnt*ln(cnt)*1e6 + 0.5)), entropy is the
# single shared float expression on top of exact integer sums.
# ---------------------------------------------------------------------------

CHAR_ENTROPY_SQL = r"""
WITH ch AS (
  -- text <> '' guard: string_split_regex('', '') yields [''] (one
  -- empty-string "character"), which would give an empty doc
  -- n_chars=1; the engine's char_entropy_scores returns (0, 0, 0.0)
  -- for empty text, and the UNION ALL branch below mirrors that edge
  SELECT doc_id, unnest(string_split_regex(text, '')) AS c
  FROM documents WHERE text <> ''
), cnt AS (
  SELECT doc_id, c, CAST(count(*) AS BIGINT) AS k FROM ch GROUP BY doc_id, c
), terms AS (
  SELECT doc_id, k,
         CAST(floor(CAST(k AS DOUBLE) * ln(CAST(k AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS t
  FROM cnt
)
SELECT doc_id,
       CAST(sum(k) AS BIGINT) AS n_chars,
       CAST(sum(t) AS BIGINT) AS ent_sum_micro,
       (ln(CAST(CAST(sum(k) AS BIGINT) AS DOUBLE))
        - (CAST(CAST(sum(t) AS BIGINT) AS DOUBLE) / 1000000.0)
          / CAST(CAST(sum(k) AS BIGINT) AS DOUBLE)) / ln(2.0) AS entropy
FROM terms GROUP BY doc_id
UNION ALL
SELECT doc_id, CAST(0 AS BIGINT) AS n_chars,
       CAST(0 AS BIGINT) AS ent_sum_micro, 0.0 AS entropy
FROM documents WHERE text = ''
"""


# ---------------------------------------------------------------------------
# incremental NEAR-dup ingestion (minhash-band index). Engine twin:
# dedup.build_minhash_index (day 0 = even doc_ids) +
# near_dups_against_index (day N = odd docs + rotate-by-1 copies of
# the even docs at id+3000000). The oracle is the brute-force
# cross-corpus shingle Jaccard at 0.8; banded recall over this pair
# population is already proven exhaustive by the in-corpus
# MINHASH_PAIRS gate (same texts, same fixed permutations).
# ---------------------------------------------------------------------------

INCREMENTAL_NEAR_DUPS_SQL = r"""
WITH a AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
), b AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id,
         CASE WHEN len(string_split(text, ' ')) > 1
              THEN array_to_string(
                     list_slice(string_split(text, ' '), 2,
                                len(string_split(text, ' ')))
                     || [string_split(text, ' ')[1]], ' ')
              ELSE text END AS text
  FROM documents WHERE doc_id % 2 = 0
), wa AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS nw FROM a
), wb AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS nw FROM b
), sha AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN nw < 3 THEN [array_to_string(ws, ' ')]
                ELSE list_transform(range(0, nw - 2),
                     i -> array_to_string(list_slice(ws, i + 1, i + 3), ' '))
                END) AS shingle
  FROM wa
), shb AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN nw < 3 THEN [array_to_string(ws, ' ')]
                ELSE list_transform(range(0, nw - 2),
                     i -> array_to_string(list_slice(ws, i + 1, i + 3), ' '))
                END) AS shingle
  FROM wb
), ca AS (
  SELECT doc_id, count(*) AS ns FROM sha GROUP BY doc_id
), cb AS (
  SELECT doc_id, count(*) AS ns FROM shb GROUP BY doc_id
), pair_inter AS (
  SELECT sa.doc_id AS id_a, sb.doc_id AS id_b, count(*) AS i
  FROM sha sa JOIN shb sb ON sa.shingle = sb.shingle
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(i AS DOUBLE) / (ca.ns + cb.ns - i) AS jaccard
FROM pair_inter
JOIN ca ON id_a = ca.doc_id
JOIN cb ON id_b = cb.doc_id
WHERE CAST(i AS DOUBLE) / (ca.ns + cb.ns - i) >= 0.8
"""


# Tier extraction — LOCKSTEP with pipelines.curation.doc_tiers: the
# four verified signal mirrors composed as subqueries (quality bands,
# Gopher repetition vector, char-entropy gate at 4.0 bits, CCNet
# tertile), reason = first failing gate, tier = drop / high / mid /
# low. Entropy compares the SAME float expression both sides compute
# from exact integers (the char_entropy hash gate pins that), so the
# >= 4.0 comparison cannot diverge.
DOC_TIERS_SQL = f"""
WITH qf AS (SELECT doc_id, n_words, quality_pass FROM ({QUALITY_FILTER_SQL}) x),
gs AS (SELECT doc_id, gopher_pass FROM ({GOPHER_SIGNALS_SQL}) x),
ce AS (SELECT doc_id, entropy FROM ({CHAR_ENTROPY_SQL}) x),
pb AS (SELECT doc_id, bucket FROM ({PERPLEXITY_BUCKETS_SQL}) x),
j AS (
  SELECT qf.doc_id, qf.n_words, qf.quality_pass, gs.gopher_pass,
         ce.entropy >= 4.0 AS entropy_pass, pb.bucket,
         CASE WHEN NOT qf.quality_pass THEN 'quality'
              WHEN NOT gs.gopher_pass THEN 'repetition'
              WHEN NOT (ce.entropy >= 4.0) THEN 'entropy'
              ELSE 'ok' END AS reason
  FROM qf
  JOIN gs USING (doc_id)
  JOIN ce USING (doc_id)
  JOIN pb USING (doc_id)
)
SELECT doc_id, n_words, quality_pass, gopher_pass, entropy_pass, bucket,
       CASE WHEN reason <> 'ok' THEN 'drop'
            WHEN bucket = 'head' THEN 'high'
            WHEN bucket = 'middle' THEN 'mid'
            ELSE 'low' END AS tier,
       reason
FROM j
"""

# Per-tier mixture summary over the tier extraction: documents, word
# mass and half-up ppm share of total words per tier — the report a
# tiered training mixture is provisioned from. LOCKSTEP with
# pipelines.curation.tier_report.
TIER_REPORT_SQL = f"""
WITH dt AS (SELECT * FROM ({DOC_TIERS_SQL}) x),
s AS (
  SELECT tier, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_words) AS BIGINT) AS n_words
  FROM dt GROUP BY tier
), t AS (SELECT CAST(sum(n_words) AS BIGINT) AS tot FROM s)
SELECT tier, n_docs, n_words,
       CAST((n_words * 2000000 + t.tot) // (2 * t.tot) AS BIGINT)
           AS word_share_ppm
FROM s, t
"""


def tfidf_search_sql(
    queries: "dict[int, list[str]]", k: int = 10, n_buckets: int = 4096
) -> str:
    """Exact mirror of ``text_analysis.tfidf_search``: md5_u64 bucket
    hashing, milli-quantized idf (``floor(ln((N+1)/(df+1))·1e3+0.5)``,
    df=0 buckets included via LEFT JOIN for query terms absent from
    the corpus), exact BIGINT tf·idf weights / dots / squared norms,
    and the ONE shared float expression
    ``dot / (sqrt(ssd) · sqrt(ssq))`` — IEEE sqrt is correctly
    rounded, so numpy and DuckDB produce the identical double.
    Zero-dot pairs excluded on both sides; ties → doc_id."""
    B = int(n_buckets)
    qvals = ", ".join(
        f"({int(qid)}, {_sql_quote(w)})"
        for qid, terms in queries.items()
        for w in terms
    )
    return f"""
WITH w0 AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), hh AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(w), 1, 16))::UBIGINT % {B} AS BIGINT) AS h
  FROM w0
), nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
dfc AS (
  SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM hh GROUP BY h
),
tf AS (
  SELECT doc_id, h, CAST(count(*) AS BIGINT) AS tf FROM hh GROUP BY doc_id, h
),
idf AS (
  SELECT dfc.h,
         CAST(floor(ln((CAST(nd.n_docs AS DOUBLE) + 1.0)
                       / (CAST(dfc.df AS DOUBLE) + 1.0)) * 1000.0 + 0.5)
              AS BIGINT) AS idf_m
  FROM dfc CROSS JOIN nd
),
dw AS (
  SELECT tf.doc_id, tf.h, tf.tf * idf.idf_m AS w
  FROM tf JOIN idf USING (h)
),
ssd AS (
  SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS ssd FROM dw GROUP BY doc_id
),
q(query_id, w) AS (VALUES {qvals}),
qh AS (
  SELECT query_id,
         CAST(('0x' || substr(md5(w), 1, 16))::UBIGINT % {B} AS BIGINT) AS h
  FROM q
),
qtf AS (
  SELECT query_id, h, CAST(count(*) AS BIGINT) AS tf
  FROM qh GROUP BY query_id, h
),
qw AS (
  SELECT qtf.query_id, qtf.h,
         qtf.tf * CAST(floor(ln((CAST(nd.n_docs AS DOUBLE) + 1.0)
                                / (CAST(coalesce(dfc.df, 0) AS DOUBLE) + 1.0))
                            * 1000.0 + 0.5) AS BIGINT) AS w
  FROM qtf
  LEFT JOIN dfc USING (h)
  CROSS JOIN nd
),
ssq AS (
  SELECT query_id, CAST(sum(w * w) AS BIGINT) AS ssq
  FROM qw GROUP BY query_id
),
dots AS (
  SELECT qw.query_id, dw.doc_id, CAST(sum(dw.w * qw.w) AS BIGINT) AS dot
  FROM dw JOIN qw USING (h) GROUP BY qw.query_id, dw.doc_id
),
scored AS (
  SELECT d.query_id, d.doc_id, d.dot,
         CAST(d.dot AS DOUBLE)
           / (sqrt(CAST(s.ssd AS DOUBLE)) * sqrt(CAST(ss.ssq AS DOUBLE)))
             AS cosine
  FROM dots d
  JOIN ssd s USING (doc_id)
  JOIN ssq ss USING (query_id)
  WHERE d.dot > 0
)
SELECT query_id, doc_id, dot, cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, doc_id ASC)
            AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {int(k)}
"""


# Tier-budgeted provisioning — LOCKSTEP with
# pipelines.curation.tiered_token_budget(budgets={'high':6000,
# 'mid':3000,'low':1000}, seed='tiercap'): doc_tiers labels,
# 'drop' discarded, each tier keeps whole docs in md5 order while
# its inclusive running word total stays <= its OWN budget.
TIERED_TOKEN_BUDGET_SQL = f"""
WITH dt AS (SELECT * FROM ({DOC_TIERS_SQL}) x),
e AS (
  SELECT doc_id, n_words, tier,
         md5('tiercap:' || CAST(doc_id AS VARCHAR)) AS rk,
         CASE tier WHEN 'high' THEN 6000 WHEN 'mid' THEN 3000
                   WHEN 'low' THEN 1000 END AS b
  FROM dt WHERE tier IN ('high', 'mid', 'low')
), c AS (
  SELECT doc_id, n_words, tier, b,
         sum(n_words) OVER (PARTITION BY tier ORDER BY rk, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM e
)
SELECT doc_id, n_words, tier FROM c WHERE cum <= b
"""


def similarity_recall_sql(k: int = 5) -> str:
    """Recall@k of the IVF path vs brute force — the two existing
    oracles composed: per query, the count of IVF results that are in
    the exact top-k, half-up integer ppm over k."""
    return f"""
WITH b AS ({SIMILARITY_TOPK_SQL}),
a AS ({similarity_ivf_sql()}),
h AS (
  SELECT b.query_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM b JOIN a ON a.query_id = b.query_id AND a.vec_id = b.vec_id
  GROUP BY b.query_id
), qs AS (SELECT DISTINCT query_id FROM b)
SELECT qs.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST((coalesce(h.n_hits, 0) * 2000000 + {int(k)}) // (2 * {int(k)})
            AS BIGINT) AS recall_ppm
FROM qs LEFT JOIN h USING (query_id)
"""


# Per-source tier mix — LOCKSTEP with
# pipelines.curation.source_tier_profile: doc_tiers labels joined to
# the source column, per-source tier counts, kept word mass and the
# half-up ppm survival share.
SOURCE_TIER_PROFILE_SQL = f"""
WITH dt AS (SELECT * FROM ({DOC_TIERS_SQL}) x),
j AS (
  SELECT d.source, dt.tier, dt.n_words
  FROM dt JOIN documents d ON d.doc_id = dt.doc_id
), s AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN tier = 'high' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_high,
         CAST(sum(CASE WHEN tier = 'mid' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mid,
         CAST(sum(CASE WHEN tier = 'low' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low,
         CAST(sum(CASE WHEN tier = 'drop' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_drop,
         CAST(sum(CASE WHEN tier <> 'drop' THEN n_words ELSE 0 END)
              AS BIGINT) AS kept_words
  FROM j GROUP BY source
)
SELECT source, n_docs, n_high, n_mid, n_low, n_drop, kept_words,
       CAST(((n_docs - n_drop) * 2000000 + n_docs) // (2 * n_docs)
            AS BIGINT) AS keep_ppm
FROM s
"""
