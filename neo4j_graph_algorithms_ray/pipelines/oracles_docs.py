"""DuckDB oracle SQL for the documents/embeddings pipeline queries.

Generated from the same constants as the engine stages
(functions/text.py STOPWORDS etc.) so the two sides cannot drift.
"""

from __future__ import annotations

from neo4j_graph_algorithms_ray.functions.text import PUNCT, STOPWORDS


def _inlist(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


TOKS_CTE = r"""toks AS MATERIALIZED (
  SELECT doc_id, text, length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\s+') END AS tk
  FROM documents)"""

EXACT_DEDUP_SQL = """SELECT min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents GROUP BY text ORDER BY doc_id"""

TOKEN_COUNT_SQL = f"""WITH {TOKS_CTE}
SELECT doc_id, len(tk) AS n_tokens FROM toks ORDER BY doc_id"""

QUALITY_SQL = f"""WITH {TOKS_CTE}
SELECT doc_id, n_chars, len(tk) AS n_tokens,
  round(CASE WHEN len(tk) > 0
        THEN CAST(list_aggregate(list_transform(tk, x -> length(x)), 'sum') AS DOUBLE) / len(tk)
        ELSE 0 END, 6) AS mean_token_len,
  round(CASE WHEN len(tk) > 0
        THEN CAST(len(list_filter(list_transform(tk, x -> lower(x)),
                                  x -> x IN ({_inlist(STOPWORDS['en'])}))) AS DOUBLE) / len(tk)
        ELSE 0 END, 6) AS stopword_ratio,
  round(CASE WHEN n_chars > 0
        THEN CAST(n_chars - length(regexp_replace(text, '[{PUNCT}]', '', 'g')) AS DOUBLE) / n_chars
        ELSE 0 END, 6) AS punct_ratio
FROM toks ORDER BY doc_id"""


def langid_sql() -> str:
    langs = sorted(STOPWORDS)
    hits = ",\n  ".join(
        f"len(list_filter(lt, x -> x IN ({_inlist(STOPWORDS[lang])}))) AS h_{lang}"
        for lang in langs)
    g = "greatest(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    case = "\n    ".join(f"WHEN h_{lang} = {g} THEN '{lang}'" for lang in langs)
    return f"""WITH {TOKS_CTE},
hits AS (
  SELECT doc_id, {hits}
  FROM (SELECT doc_id, list_transform(tk, x -> lower(x)) AS lt FROM toks) t)
SELECT doc_id,
  CASE WHEN {g} = 0 THEN 'und'
    {case}
  END AS pred_lang
FROM hits ORDER BY doc_id"""


FINGERPRINT_SQL = r"""SELECT doc_id,
  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents ORDER BY doc_id"""

NGRAM_JACCARD_SQL = r"""WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id,
    unnest(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
      i -> CASE WHEN len(tk) < 3 THEN array_to_string(tk, ' ')
                ELSE tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] END)) AS s
  FROM toks),
counts AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT a, b, round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) AS jaccard
FROM inter JOIN counts ca ON ca.doc_id = a JOIN counts cb ON cb.doc_id = b
WHERE round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) >= 0.5
ORDER BY a, b"""

EMB_NEARDUP_SQL = """WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings)
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.95
ORDER BY a, b"""

ANN_TOPK_SQL = """WITH q AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  ORDER BY vec_id LIMIT 5),
e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT query_id, vec_id, round(c, 6) AS cosine FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         list_cosine_similarity(q.v, e.v) AS c,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(q.v, e.v) DESC,
                                     e.vec_id ASC) AS rn
  FROM q CROSS JOIN e WHERE e.vec_id <> q.vec_id) t
WHERE rn <= 10 ORDER BY query_id, vec_id"""

# first_byte: utf-8 first byte == first codepoint for the ASCII synthetic
# corpus; documented divergence for non-ASCII leading characters.
MEDIA_SQL = """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
  CASE WHEN length(text) > 0 THEN unicode(text) ELSE -1 END AS first_byte
FROM documents ORDER BY doc_id"""
