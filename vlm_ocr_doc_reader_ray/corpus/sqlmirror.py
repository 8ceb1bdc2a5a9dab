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
