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
SELECT doc_id, len(tk) AS n_tokens,
  CAST(len(regexp_extract_all(coalesce(text, ''),
       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_pieces
FROM toks ORDER BY doc_id"""

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


def gopher_quality_sql(*, min_words: int = 50, max_words: int = 100_000,
                       min_mwl: float = 3.0, max_mwl: float = 10.0,
                       max_symbol_ratio: float = 0.1, min_alpha: float = 0.8,
                       min_stop_hits: int = 2, max_bullet: float = 0.9,
                       max_ellipsis: float = 0.3) -> str:
    """DuckDB mirror of GopherQuality (functions/text.py): same
    tokenization CTE, non-overlapping substring counts via
    length-of-replace, lines via string_split on chr(10) (every doc has
    ≥1 line), thresholds compared on unrounded doubles."""
    from neo4j_graph_algorithms_ray.functions.text import GOPHER_STOPWORDS
    stops = _inlist(GOPHER_STOPWORDS)
    return f"""WITH {TOKS_CTE},
feat AS (
  SELECT doc_id, len(tk) AS n_words,
    CASE WHEN len(tk) > 0
      THEN CAST(list_aggregate(list_transform(tk, x -> length(x)), 'sum') AS DOUBLE) / len(tk)
      ELSE 0 END AS mwl,
    CASE WHEN len(tk) > 0
      THEN CAST(length(text) - length(replace(text, '#', ''))
           + (length(text) - length(replace(text, '...', ''))) / 3
           + (length(text) - length(replace(text, '…', ''))) AS DOUBLE) / len(tk)
      ELSE 0 END AS sym_ratio,
    CASE WHEN len(tk) > 0
      THEN CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(tk)
      ELSE 0 END AS alpha_frac,
    len(list_filter([{stops}],
        w -> list_contains(list_transform(tk, x -> lower(x)), w))) AS stop_hits,
    CAST(len(list_filter(string_split(text, chr(10)),
        l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE)
      / len(string_split(text, chr(10))) AS bullet_frac,
    CAST(len(list_filter(string_split(text, chr(10)),
        l -> regexp_matches(l, '(\\.\\.\\.|…)$'))) AS DOUBLE)
      / len(string_split(text, chr(10))) AS ellip_frac
  FROM toks)
SELECT doc_id, n_words,
  round(mwl, 6) AS mean_word_len,
  round(sym_ratio, 6) AS symbol_ratio,
  round(alpha_frac, 6) AS alpha_word_frac,
  stop_hits,
  round(bullet_frac, 6) AS bullet_line_frac,
  round(ellip_frac, 6) AS ellipsis_line_frac,
  (n_words >= {min_words} AND n_words <= {max_words}
   AND mwl >= {min_mwl} AND mwl <= {max_mwl}
   AND sym_ratio <= {max_symbol_ratio} AND alpha_frac >= {min_alpha}
   AND stop_hits >= {min_stop_hits} AND bullet_frac <= {max_bullet}
   AND ellip_frac <= {max_ellipsis}) AS passes
FROM feat ORDER BY doc_id"""


def _langid_fragments() -> tuple[str, str]:
    """(per-lang hit-count select list over column ``lt``, pred_lang
    CASE over the h_* columns) — the alphabetical first-max tie-break
    is the WHEN order (langs sorted). Shared by langid_sql and
    corpus_clean_sql so the two cannot drift."""
    langs = sorted(STOPWORDS)
    hits = ",\n  ".join(
        f"len(list_filter(lt, x -> x IN ({_inlist(STOPWORDS[lang])}))) AS h_{lang}"
        for lang in langs)
    g = "greatest(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    case = "\n    ".join(f"WHEN h_{lang} = {g} THEN '{lang}'" for lang in langs)
    return hits, f"""CASE WHEN {g} = 0 THEN 'und'
    {case}
  END"""


def langid_sql() -> str:
    hits, case = _langid_fragments()
    return f"""WITH {TOKS_CTE},
hits AS (
  SELECT doc_id, {hits}
  FROM (SELECT doc_id, list_transform(tk, x -> lower(x)) AS lt FROM toks) t)
SELECT doc_id,
  {case} AS pred_lang
FROM hits ORDER BY doc_id"""


def langid_confusion_sql() -> str:
    """Mirror of functions/text.langid_confusion: labeled lang vs the
    LangId prediction, counted."""
    return f"""WITH pred AS ({langid_sql()})
SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
FROM documents d JOIN pred p ON p.doc_id = d.doc_id
GROUP BY 1, 2 ORDER BY lang, pred_lang"""


def quality_by_source_sql() -> str:
    """Mirror of functions/text.quality_by_source: per-source means of
    the round6-ed per-doc QualityScore ratios."""
    return f"""WITH q AS ({QUALITY_SQL})
SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(q.n_tokens) AS BIGINT) AS n_tokens,
       round(sum(q.n_tokens) / CAST(count(*) AS DOUBLE), 6) AS mean_tokens,
       round(sum(q.stopword_ratio) / count(*), 6) AS mean_stopword_ratio,
       round(sum(q.punct_ratio) / count(*), 6) AS mean_punct_ratio
FROM q JOIN documents d ON d.doc_id = q.doc_id
GROUP BY d.source ORDER BY d.source"""


FINGERPRINT_SQL = r"""SELECT doc_id,
  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents ORDER BY doc_id"""

# Mirrors _q_incremental_dedup: the corpus splits into snapshots by
# doc_id%3 (old: !=0, new: ==0); planted cross-snapshot duplicates
# share 'DUP CONTENT <doc_id%50>' texts; semantics = plain anti-join of
# new fingerprints against old (the Bloom prefilter in the Ray path is
# exact-verified, so its FP rate never changes the output).
INCREMENTAL_DEDUP_SQL = r"""WITH docs2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 15 = 0 THEN 'DUP CONTENT ' || (doc_id % 50)
              WHEN doc_id % 3 <> 0 AND doc_id % 5 = 0
                   THEN 'DUP CONTENT ' || (doc_id % 50)
              ELSE coalesce(text, '') END AS text
  FROM documents),
fp AS (SELECT doc_id,
              md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
       FROM docs2),
oldf AS (SELECT DISTINCT f FROM fp WHERE doc_id % 3 <> 0)
SELECT fp.doc_id FROM fp
WHERE fp.doc_id % 3 = 0
  AND NOT EXISTS (SELECT 1 FROM oldf WHERE oldf.f = fp.f)
ORDER BY fp.doc_id"""


SHINGLE_CTES = r"""toks3 AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id,
    unnest(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
      i -> CASE WHEN len(tk) < 3 THEN array_to_string(tk, ' ')
                ELSE tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] END)) AS s
  FROM toks3),
counts AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)"""


def ngram_jaccard_sql(df_cap: int = 10_000, threshold: float = 0.5) -> str:
    """Full mirror of functions/dedup.ngram_jaccard_pairs' distinct-text
    semantics: exact duplicates collapse to a min-id representative
    BEFORE shingling, the df hub-guard counts distinct texts (the rep
    corpus's raw df), rep-level pairs expand across duplicate groups,
    and exact duplicates of non-empty texts always pair at jaccard 1.0
    (exact copies are maximal near-dups by definition, hub-guard or
    not)."""
    within = (f"""
UNION ALL
SELECT m1.doc_id AS a, m2.doc_id AS b, CAST(1.0 AS DOUBLE) AS jaccard
FROM mem m1 JOIN mem m2 ON m1.rep = m2.rep AND m1.doc_id < m2.doc_id
JOIN reps rt ON rt.doc_id = m1.rep
WHERE trim(rt.text) <> ''""" if threshold <= 1.0 else "")
    return rf"""WITH mem AS MATERIALIZED (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep
  FROM documents),
reps AS MATERIALIZED (
  SELECT d.doc_id, d.text FROM documents d
  JOIN (SELECT DISTINCT rep FROM mem) r ON d.doc_id = r.rep),
toks3 AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
  FROM reps WHERE trim(text) <> ''),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id,
    unnest(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
      i -> CASE WHEN len(tk) < 3 THEN array_to_string(tk, ' ')
                ELSE tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] END)) AS s
  FROM toks3),
counts AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
shc AS MATERIALIZED (
  SELECT sh.doc_id, sh.s FROM sh
  JOIN (SELECT s FROM sh GROUP BY s HAVING count(*) <= {df_cap}) hot USING (s)),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
  FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
rp AS (
  SELECT a, b, round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) AS jaccard
  FROM inter JOIN counts ca ON ca.doc_id = a JOIN counts cb ON cb.doc_id = b
  WHERE round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) >= {threshold})
SELECT least(ma.doc_id, mb.doc_id) AS a,
       greatest(ma.doc_id, mb.doc_id) AS b, jaccard
FROM rp JOIN mem ma ON ma.rep = rp.a JOIN mem mb ON mb.rep = rp.b{within}
ORDER BY a, b"""


NGRAM_JACCARD_SQL = ngram_jaccard_sql()


def minhash_sql(num_perm: int = 8, bands: int = 4, threshold: float = 0.5) -> str:
    """Bit-exact mirror of functions/dedup.minhash_lsh_pairs: base hash
    = first 15 md5 hex digits of each distinct shingle; permutation j =
    ((2j+1)·h mod p + C_j) mod p with p = 2^61-1 and C_j =
    md5('minhash:j')[:15]; band key = ':'-joined signature rows;
    candidates share a (band, key); verified by exact shingle Jaccard."""
    return (f"WITH {_minhash_pair_ctes(num_perm, bands, threshold)}\n"
            "SELECT a, b, jaccard FROM mh_pairs ORDER BY a, b")


def _minhash_band_ctes(num_perm: int, bands: int) -> str:
    """CTE chain ending in ``bk(doc_id, band, bkey)`` — the banded LSH
    bucket keys, shared by _minhash_pair_ctes and the band-load
    diagnostic."""
    from neo4j_graph_algorithms_ray.functions.dedup import (
        MINHASH_MOD, minhash_params)
    a_arr, c_arr = minhash_params(num_perm)
    r = num_perm // bands
    sig_cols = ",\n    ".join(
        f"min(CAST(((CAST({int(a_arr[j])} AS HUGEINT) * h) % {MINHASH_MOD}"
        f" + {int(c_arr[j])}) % {MINHASH_MOD} AS BIGINT)) AS s{j}"
        for j in range(num_perm))
    band_keys = " ".join(
        "WHEN {b} THEN {expr}".format(
            b=b,
            expr=" || ':' || ".join(f"CAST(s{b * r + i} AS VARCHAR)"
                                    for i in range(r)))
        for b in range(bands))
    return f"""{SHINGLE_CTES},
hb AS MATERIALIZED (
  SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM sh),
sig AS MATERIALIZED (
  SELECT doc_id,
    {sig_cols}
  FROM hb GROUP BY doc_id),
bk AS MATERIALIZED (
  SELECT doc_id, band,
    CASE band {band_keys} END AS bkey
  FROM sig CROSS JOIN (SELECT unnest(range({bands})) AS band) bands_)"""


def _minhash_pair_ctes(num_perm: int, bands: int, threshold: float) -> str:
    """CTE chain ending in ``mh_pairs(a, b, jaccard)`` — the verified
    near-dup pair set, shared by minhash_sql and neardup_clusters_sql."""
    return f"""{_minhash_band_ctes(num_perm, bands)},
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bk x JOIN bk y ON x.band = y.band AND x.bkey = y.bkey
                     AND x.doc_id < y.doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c JOIN sh x ON x.doc_id = c.a
              JOIN sh y ON y.doc_id = c.b AND y.s = x.s
  GROUP BY c.a, c.b),
mh_pairs AS MATERIALIZED (
  SELECT c.a AS a, c.b AS b,
    round(CAST(coalesce(i.i, 0) AS DOUBLE) / (ca.n + cb.n - coalesce(i.i, 0)), 6) AS jaccard
  FROM cand c
  JOIN counts ca ON ca.doc_id = c.a JOIN counts cb ON cb.doc_id = c.b
  LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
  WHERE round(CAST(coalesce(i.i, 0) AS DOUBLE) / (ca.n + cb.n - coalesce(i.i, 0)), 6) >= {threshold})"""


def minhash_eval_sql(num_perm: int = 8, bands: int = 4,
                     threshold: float = 0.5,
                     df_cap: int = 10_000) -> str:
    """Mirror of functions/dedup.minhash_eval: full-outer-join the
    exact pair set against the verified LSH pair set, count overlap,
    recall and precision (round6, zero-guarded)."""
    return f"""WITH exact_p AS ({ngram_jaccard_sql(df_cap, threshold)}),
lsh_p AS ({minhash_sql(num_perm, bands, threshold)}),
m AS (SELECT CAST(e.a IS NOT NULL AS INT) AS in_e,
             CAST(l.a IS NOT NULL AS INT) AS in_l
      FROM exact_p e FULL OUTER JOIN lsh_p l
        ON e.a = l.a AND e.b = l.b)
SELECT CAST(coalesce(sum(in_e), 0) AS BIGINT) AS n_exact,
       CAST(coalesce(sum(in_l), 0) AS BIGINT) AS n_lsh,
       CAST(coalesce(sum(in_e * in_l), 0) AS BIGINT) AS n_both,
       round(CASE WHEN coalesce(sum(in_e), 0) = 0 THEN 0
                  ELSE sum(in_e * in_l) / CAST(sum(in_e) AS DOUBLE) END, 6)
         AS recall,
       round(CASE WHEN coalesce(sum(in_l), 0) = 0 THEN 0
                  ELSE sum(in_e * in_l) / CAST(sum(in_l) AS DOUBLE) END, 6)
         AS precision
FROM m"""


def dedup_sensitivity_sql(thresholds=(0.3, 0.5, 0.8), iters: int = 25,
                          num_perm: int = 8, bands: int = 4) -> str:
    """Mirror of functions/dedup.dedup_sensitivity: one nested
    cluster-closure chain per threshold, aggregated to the sweep
    report."""
    parts = []
    for i, thr in enumerate(sorted(thresholds)):
        parts.append(f"""t{i} AS (
  WITH cl AS ({neardup_clusters_sql(iters, num_perm, bands, thr)}),
       pr AS ({minhash_sql(num_perm, bands, thr)}),
       sz AS (SELECT rep_id, count(*) AS sz FROM cl GROUP BY rep_id)
  SELECT CAST({thr} AS DOUBLE) AS threshold,
         CAST((SELECT count(*) FROM pr) AS BIGINT) AS n_pairs,
         CAST(count(*) FILTER (WHERE sz > 1) AS BIGINT) AS n_dup_clusters,
         CAST(coalesce(sum(sz) FILTER (WHERE sz > 1), 0) AS BIGINT)
           AS n_docs_in_dups,
         CAST(coalesce(sum(sz) FILTER (WHERE sz > 1), 0)
              - count(*) FILTER (WHERE sz > 1) AS BIGINT) AS n_removed
  FROM sz)""")
    sel = " UNION ALL ".join(f"SELECT * FROM t{i}"
                             for i in range(len(parts)))
    return ("WITH " + ",\n".join(parts) + f"\n{sel} ORDER BY threshold")


def simhash_eval_sql(max_hamming: int = 8, threshold: float = 0.5,
                     df_cap: int = 10_000) -> str:
    """Mirror of functions/dedup.simhash_eval: exact pairs vs the
    hamming-verified SimHash pair set, same report shape as
    minhash_eval_sql."""
    return f"""WITH exact_p AS ({ngram_jaccard_sql(df_cap, threshold)}),
lsh_p AS ({simhash_sql(max_hamming)}),
m AS (SELECT CAST(e.a IS NOT NULL AS INT) AS in_e,
             CAST(l.a IS NOT NULL AS INT) AS in_l
      FROM exact_p e FULL OUTER JOIN lsh_p l
        ON e.a = l.a AND e.b = l.b)
SELECT CAST(coalesce(sum(in_e), 0) AS BIGINT) AS n_exact,
       CAST(coalesce(sum(in_l), 0) AS BIGINT) AS n_lsh,
       CAST(coalesce(sum(in_e * in_l), 0) AS BIGINT) AS n_both,
       round(CASE WHEN coalesce(sum(in_e), 0) = 0 THEN 0
                  ELSE sum(in_e * in_l) / CAST(sum(in_e) AS DOUBLE) END, 6)
         AS recall,
       round(CASE WHEN coalesce(sum(in_l), 0) = 0 THEN 0
                  ELSE sum(in_e * in_l) / CAST(sum(in_l) AS DOUBLE) END, 6)
         AS precision
FROM m"""


def neardup_clusters_sql(iters: int = 25, num_perm: int = 8, bands: int = 4,
                         threshold: float = 0.5) -> str:
    """Mirror of functions/dedup.neardup_clusters: transitive closure of
    the verified MinHash pair set by unrolled min-label propagation
    (same trick as oracles.wcc_sql); docs outside any pair keep their
    own id. ``iters`` must exceed the pair-graph diameter — near-dup
    components are near-cliques, so 25 is generous at oracle scale."""
    ctes = [_minhash_pair_ctes(num_perm, bands, threshold),
            "symp AS MATERIALIZED (SELECT a, b FROM mh_pairs "
            "UNION ALL SELECT b AS a, a AS b FROM mh_pairs)",
            "dn AS (SELECT doc_id AS node FROM documents)",
            "r0 AS (SELECT node, node AS c FROM dn)"]
    for it in range(1, iters + 1):
        ctes.append(f"""r{it} AS MATERIALIZED (
  SELECT n.node, least(p.c, coalesce(min(q.c), p.c)) AS c
  FROM dn n
  JOIN r{it-1} p ON p.node = n.node
  LEFT JOIN symp e ON e.a = n.node
  LEFT JOIN r{it-1} q ON q.node = e.b
  GROUP BY n.node, p.c)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS doc_id, c AS rep_id FROM r{iters} ORDER BY doc_id")


def _simhash_sig_ctes() -> str:
    """CTE chain ending in ``allsh(doc_id, simhash)`` — the 64-bit
    signatures, shared by the pair chain and the bit-balance
    diagnostic."""
    return f"""toksm AS MATERIALIZED (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents WHERE trim(text) <> ''),
th AS MATERIALIZED (
  SELECT doc_id,
    CAST(CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT) AS HUGEINT) AS h
  FROM toksm),
bits AS MATERIALIZED (
  SELECT doc_id, b.b AS b,
         sum(CASE WHEN (h >> CAST(b.b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th CROSS JOIN (SELECT unnest(range(64)) AS b) b GROUP BY doc_id, b.b),
sim0 AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN acc > 0
             THEN (CAST(1 AS HUGEINT) << CAST(b AS INTEGER)) ELSE 0 END) AS UBIGINT) AS simhash
  FROM bits GROUP BY doc_id),
allsh AS MATERIALIZED (
  SELECT d.doc_id, coalesce(s.simhash, CAST(0 AS UBIGINT)) AS simhash
  FROM documents d LEFT JOIN sim0 s USING (doc_id))"""


def _simhash_pair_ctes(max_hamming: int = 8) -> str:
    """CTE chain ending in ``sh_pairs(a, b, hamming)`` — shared by
    simhash_sql and simhash_clusters_sql."""
    return f"""{_simhash_sig_ctes()},
bk AS (
  SELECT doc_id, band,
    CAST((CAST(simhash AS HUGEINT) >> CAST(16 * band AS INTEGER)) & 65535 AS BIGINT) AS bkey
  FROM allsh CROSS JOIN (SELECT unnest(range(4)) AS band) b),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bk x JOIN bk y ON x.band = y.band AND x.bkey = y.bkey
                     AND x.doc_id < y.doc_id),
sh_pairs AS MATERIALIZED (
  SELECT c.a AS a, c.b AS b,
         CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
  FROM cand c JOIN allsh sa ON sa.doc_id = c.a
  JOIN allsh sb ON sb.doc_id = c.b
  WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {max_hamming})"""


def simhash_sql(max_hamming: int = 8) -> str:
    """Bit-exact mirror of functions/dedup.simhash_pairs: token hash =
    first 16 md5 hex digits (uint64); simhash bit b set iff the ±1
    majority over all token occurrences of bit b is positive; 4×16-bit
    band keys; pairs verified by bit_count(xor) ≤ max_hamming."""
    return ("WITH " + _simhash_pair_ctes(max_hamming)
            + "\nSELECT a, b, hamming FROM sh_pairs ORDER BY a, b")


def simhash_clusters_sql(iters: int = 25, max_hamming: int = 8) -> str:
    """Mirror of neardup_clusters over the SimHash pair set: unrolled
    min-label propagation (same closure as neardup_clusters_sql)."""
    ctes = [_simhash_pair_ctes(max_hamming),
            "symp AS MATERIALIZED (SELECT a, b FROM sh_pairs "
            "UNION ALL SELECT b AS a, a AS b FROM sh_pairs)",
            "dn AS (SELECT doc_id AS node FROM documents)",
            "r0 AS (SELECT node, node AS c FROM dn)"]
    for it in range(1, iters + 1):
        ctes.append(f"""r{it} AS MATERIALIZED (
  SELECT n.node, least(p.c, coalesce(min(q.c), p.c)) AS c
  FROM dn n
  JOIN r{it-1} p ON p.node = n.node
  LEFT JOIN symp e ON e.a = n.node
  LEFT JOIN r{it-1} q ON q.node = e.b
  GROUP BY n.node, p.c)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS doc_id, c AS rep_id FROM r{iters} "
              "ORDER BY doc_id")

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

# Replicates functions/ann.py lsh_topk exactly: ±1 planes pinned to
# md5("plane:b:j") first hex digit, code bit = dot > 0, multi-probe =
# union over all queries of {code} ∪ {code ^ 1<<b}, exact cosine
# re-rank among candidates. k=10, nbits=12, queries = 5 lowest vec_ids.
ANN_LSH_TOPK_SQL = """WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ev AS MATERIALIZED (
  SELECT vec_id, unnest(v) AS x, unnest(range(len(v))) AS j FROM e),
planes AS MATERIALIZED (
  SELECT f.b, jj.j,
         CASE WHEN CAST(('0x'||substr(md5('plane:'||f.b||':'||jj.j),1,1)) AS INT) % 2 = 1
              THEN 1.0 ELSE -1.0 END AS s
  FROM (SELECT unnest(range(12)) AS b) f
  CROSS JOIN (SELECT DISTINCT j FROM ev) jj),
dots AS (
  SELECT ev.vec_id, p.b, sum(ev.x * p.s) AS dot
  FROM ev JOIN planes p ON p.j = ev.j GROUP BY ev.vec_id, p.b),
codes AS MATERIALIZED (
  SELECT vec_id,
         CAST(sum(CASE WHEN dot > 0 THEN CAST(1 AS HUGEINT) << b ELSE 0 END) AS UBIGINT) AS code
  FROM dots GROUP BY vec_id),
qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5),
q AS (SELECT vec_id AS query_id, code FROM codes WHERE vec_id IN (SELECT vec_id FROM qids)),
probes AS MATERIALIZED (
  SELECT DISTINCT pcode FROM (
    SELECT code AS pcode FROM q
    UNION ALL
    SELECT xor(code, CAST(CAST(1 AS HUGEINT) << f.b AS UBIGINT)) AS pcode
    FROM q CROSS JOIN (SELECT unnest(range(12)) AS b) f)),
cand AS (SELECT c.vec_id FROM codes c JOIN probes p ON c.code = p.pcode),
qv AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id IN (SELECT vec_id FROM qids))
SELECT query_id, vec_id, round(c, 6) AS cosine FROM (
  SELECT qv.query_id, e.vec_id,
         list_cosine_similarity(qv.v, e.v) AS c,
         row_number() OVER (PARTITION BY qv.query_id
                            ORDER BY list_cosine_similarity(qv.v, e.v) DESC,
                                     e.vec_id ASC) AS rn
  FROM qv CROSS JOIN e
  WHERE e.vec_id IN (SELECT vec_id FROM cand) AND e.vec_id <> qv.query_id) t
WHERE rn <= 10 ORDER BY query_id, vec_id"""

ANN_EVAL_SQL = f"""WITH bf AS ({ANN_TOPK_SQL}),
ap AS ({ANN_LSH_TOPK_SQL})
SELECT bf.query_id,
       CAST(count(ap.vec_id) AS BIGINT) AS n_hit,
       CAST(10 AS BIGINT) AS k,
       round(count(ap.vec_id) / 10.0, 6) AS recall
FROM bf LEFT JOIN ap ON ap.query_id = bf.query_id
                    AND ap.vec_id = bf.vec_id
GROUP BY bf.query_id ORDER BY bf.query_id"""


# first_byte: utf-8 first byte == first codepoint for the ASCII synthetic
# corpus; documented divergence for non-ASCII leading characters.
MEDIA_SQL = """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
  CASE WHEN length(text) > 0 THEN unicode(text) ELSE -1 END AS first_byte
FROM documents ORDER BY doc_id"""


def vocab_topk_sql(topk: int = 100) -> str:
    """Mirror of functions/text.vocab_topk: lowered whitespace tokens,
    occurrence + document frequency, ranked (n_occ DESC, token ASC)."""
    return f"""WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS (SELECT doc_id, unnest(tk) AS token FROM tl)
SELECT token, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
FROM occ GROUP BY token
ORDER BY n_occ DESC, token ASC LIMIT {topk}"""


DEDUP_RATE_BY_SOURCE_SQL = """SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT text) AS BIGINT) AS n_unique,
       round(1 - count(DISTINCT text) / CAST(count(*) AS DOUBLE), 6)
         AS dup_rate
FROM documents GROUP BY source ORDER BY source"""


def zipf_alpha_sql(fmin: int = 2) -> str:
    """Mirror of functions/text.zipf_alpha: token frequencies from the
    same lowered whitespace tokenization, CSN discrete MLE over
    frequencies ≥ fmin."""
    return f"""WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS (SELECT unnest(tk) AS token FROM tl),
freq AS (SELECT token, count(*) AS f FROM occ GROUP BY token),
t AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(ln(f / {fmin - 0.5})) AS s
      FROM freq WHERE f >= {fmin})
SELECT round(1 + n / s, 6) AS alpha, CAST(n AS BIGINT) AS n_tail FROM t"""


def vocab_coverage_sql(ks=(100, 1000, 10000)) -> str:
    """Mirror of functions/text.vocab_coverage: cumulative occurrence
    coverage of the top-k vocabulary ranked (f DESC, token ASC)."""
    klist = ", ".join(str(int(k)) for k in sorted(ks))
    return f"""WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS (SELECT unnest(tk) AS token FROM tl),
freq AS (SELECT token, count(*) AS f FROM occ GROUP BY token),
ranked AS (SELECT f, row_number() OVER (ORDER BY f DESC, token ASC) AS rn
           FROM freq),
tot AS (SELECT CAST(sum(f) AS BIGINT) AS total FROM freq),
ks AS (SELECT unnest([{klist}]) AS k)
SELECT CAST(ks.k AS BIGINT) AS k,
  CAST(coalesce(c.cov, 0) AS BIGINT) AS covered_occ,
  tot.total AS total_occ,
  round(coalesce(c.cov, 0) / CAST(tot.total AS DOUBLE), 6) AS coverage
FROM ks CROSS JOIN tot
LEFT JOIN LATERAL (SELECT sum(f) AS cov FROM ranked WHERE rn <= ks.k) c
  ON TRUE
ORDER BY k"""


LANG_VOCAB_OVERLAP_SQL = """WITH tl AS MATERIALIZED (
  SELECT lang, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS MATERIALIZED (
  SELECT DISTINCT lang, token
  FROM (SELECT lang, unnest(tk) AS token FROM tl)),
tot AS (SELECT lang, count(*) AS n FROM occ GROUP BY lang),
sh AS (SELECT o1.lang AS lang_a, o2.lang AS lang_b, count(*) AS n_shared
       FROM occ o1 JOIN occ o2 ON o2.token = o1.token AND o1.lang < o2.lang
       GROUP BY 1, 2)
SELECT s.lang_a, s.lang_b, CAST(s.n_shared AS BIGINT) AS n_shared,
       CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
       round(s.n_shared / CAST(ta.n + tb.n - s.n_shared AS DOUBLE), 6)
         AS jaccard
FROM sh s
JOIN tot ta ON ta.lang = s.lang_a
JOIN tot tb ON tb.lang = s.lang_b
ORDER BY lang_a, lang_b"""


VOCAB_NOVELTY_SQL = """WITH tl AS MATERIALIZED (
  SELECT source, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS (SELECT source, unnest(tk) AS token FROM tl),
fs AS (SELECT token, min(source) AS source FROM occ GROUP BY token),
per AS (SELECT source, count(*) AS n_new_tokens FROM fs GROUP BY source)
SELECT source, CAST(n_new_tokens AS BIGINT) AS n_new_tokens,
       CAST(sum(n_new_tokens) OVER (ORDER BY source) AS BIGINT)
         AS cum_vocab
FROM per ORDER BY source"""


def doc_sample_sql(pct: int = 20) -> str:
    """Mirror of functions/text.doc_sample: md5(doc_id-as-string) first
    15 hex digits mod 100 < pct."""
    return f"""SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < {pct}
ORDER BY doc_id"""


def repetition_ratio_sql(k: int = 3) -> str:
    """Mirror of functions/text.repetition_ratio for k=3 (shares the
    word-shingle rule with SHINGLE_CTES, duplicates INCLUDED for the
    total count)."""
    assert k == 3, "SQL mirror pinned at k=3 (matches SHINGLE_CTES)"
    return r"""WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
shd AS MATERIALIZED (
  SELECT doc_id,
    unnest(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
      i -> CASE WHEN len(tk) < 3 THEN array_to_string(tk, ' ')
                ELSE tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] END)) AS s
  FROM tl),
st AS (SELECT doc_id, count(*) AS total, count(DISTINCT s) AS dist
       FROM shd GROUP BY doc_id)
SELECT d.doc_id,
  round(coalesce(1.0 - CAST(st.dist AS DOUBLE) / st.total, 0), 6) AS rep_ratio
FROM documents d LEFT JOIN st ON st.doc_id = d.doc_id
ORDER BY d.doc_id"""


def tfidf_topk_sql(topk: int = 3) -> str:
    """Mirror of functions/text.tfidf_topk: tf = raw count, idf =
    ln(N/df), rank (round6(tfidf) DESC, token ASC) per doc."""
    return f"""WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS MATERIALIZED (SELECT doc_id, unnest(tk) AS token FROM tl),
tf AS (SELECT doc_id, token, count(*) AS tf FROM occ GROUP BY doc_id, token),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM occ GROUP BY token),
n AS (SELECT count(*) AS n FROM documents),
sc AS (SELECT doc_id, tf.token,
              round(tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 6) AS tfidf
       FROM tf JOIN dfreq ON dfreq.token = tf.token CROSS JOIN n),
rk AS (SELECT *, row_number() OVER
         (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rn
       FROM sc)
SELECT doc_id, token, tfidf FROM rk WHERE rn <= {topk}
ORDER BY doc_id, tfidf DESC, token"""


def tfidf_cosine_sql(threshold: float = 0.5, df_cap: int = 50) -> str:
    """Mirror of functions/text.tfidf_cosine_pairs: sparse TF-IDF dot
    through a token self-join over the df ≤ cap space, norms over the
    same space, cosine round6-ed before the threshold."""
    return f"""WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS MATERIALIZED (SELECT doc_id, unnest(tk) AS token FROM tl),
tf AS (SELECT doc_id, token, count(*) AS tf FROM occ GROUP BY doc_id, token),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM occ GROUP BY token),
n AS (SELECT count(*) AS n FROM documents),
w AS MATERIALIZED (
  SELECT tf.doc_id, tf.token,
         tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df) AS w
  FROM tf JOIN dfreq ON dfreq.token = tf.token CROSS JOIN n
  WHERE dfreq.df <= {df_cap}),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nn FROM w GROUP BY doc_id),
dot AS (SELECT w1.doc_id AS a, w2.doc_id AS b, sum(w1.w * w2.w) AS dp
        FROM w w1 JOIN w w2 ON w2.token = w1.token
                           AND w1.doc_id < w2.doc_id
        GROUP BY 1, 2)
SELECT a, b, round(dp / (na.nn * nb.nn), 6) AS cosine
FROM dot JOIN nrm na ON na.doc_id = dot.a JOIN nrm nb ON nb.doc_id = dot.b
WHERE round(dp / (na.nn * nb.nn), 6) >= {threshold}
ORDER BY a, b"""


def bm25_topk_sql(terms, topk: int = 25, k1: float = 1.2,
                  b: float = 0.75) -> str:
    """Mirror of functions/text.bm25_topk: Lucene-style idf
    ln(1+(N-df+0.5)/(df+0.5)), N = all docs, avgdl over non-empty
    docs, rank (round6(score) DESC, doc_id ASC)."""
    tlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS MATERIALIZED (SELECT doc_id, unnest(tk) AS token FROM tl),
dl AS (SELECT doc_id, count(*) AS dl FROM occ GROUP BY doc_id),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT avg(CAST(dl AS DOUBLE)) FROM dl) AS avgdl),
tf AS (SELECT doc_id, token, count(*) AS tf FROM occ
       WHERE token IN ({tlist}) GROUP BY doc_id, token),
dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM occ
        WHERE token IN ({tlist}) GROUP BY token),
sc AS (SELECT tf.doc_id,
         sum(ln(1.0 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5))
             * tf.tf * ({k1} + 1.0)
             / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / st.avgdl))) AS s
       FROM tf JOIN dfq ON dfq.token = tf.token
       JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st
       GROUP BY tf.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT {topk}"""


def bigram_xent_sql(min_count: int = 2) -> str:
    """Mirror of functions/text.bigram_xent: self-trained add-one
    bigram LM with <unk> folding (vocab floor min_count), per-doc
    xent = -(1/(T-1)) Σ log2((C(x,y)+1)/(C(x)+V)), 0 if < 2 tokens."""
    return f"""WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS MATERIALIZED (
  SELECT doc_id, unnest(tk) AS token,
         unnest(range(1, len(tk) + 1)) AS pos FROM tl),
uni0 AS (SELECT token, count(*) AS n FROM occ GROUP BY token),
voc AS (SELECT token FROM uni0 WHERE n >= {min_count}),
vv AS (SELECT count(*) + 1 AS vtot FROM voc),
m AS MATERIALIZED (
  SELECT o.doc_id, o.pos,
         CASE WHEN v.token IS NULL THEN chr(1) ELSE o.token END AS tok
  FROM occ o LEFT JOIN voc v ON v.token = o.token),
uni AS (SELECT tok, count(*) AS n FROM m GROUP BY tok),
big AS (SELECT a.tok AS x, b.tok AS y, count(*) AS n
        FROM m a JOIN m b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        GROUP BY a.tok, b.tok),
pairs AS (SELECT a.doc_id, a.tok AS x, b.tok AS y
          FROM m a JOIN m b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
sc AS (SELECT p.doc_id,
              -sum(log2((big.n + 1.0) / (uni.n + vv.vtot))) / count(*) AS xe
       FROM pairs p JOIN big ON big.x = p.x AND big.y = p.y
       JOIN uni ON uni.tok = p.x CROSS JOIN vv
       GROUP BY p.doc_id)
SELECT d.doc_id, round(coalesce(sc.xe, 0), 6) AS xent
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
ORDER BY d.doc_id"""


def trigram_xent_sql(min_count: int = 2, alpha: float = 0.4) -> str:
    """Mirror of functions/text.trigram_xent: self-trained trigram LM
    with stupid backoff (Brants et al. 2007) and <unk> folding —
    S(z|x,y) = C(xyz)/C(xy), else α·C(yz)/C(y), else α²·C(z)/N;
    per-doc xent = -(1/(T-2)) Σ log2 S, 0 if < 3 tokens."""
    return f"""WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS MATERIALIZED (
  SELECT doc_id, unnest(tk) AS token,
         unnest(range(1, len(tk) + 1)) AS pos FROM tl),
uni0 AS (SELECT token, count(*) AS n FROM occ GROUP BY token),
voc AS (SELECT token FROM uni0 WHERE n >= {min_count}),
m AS MATERIALIZED (
  SELECT o.doc_id, o.pos,
         CASE WHEN v.token IS NULL THEN chr(1) ELSE o.token END AS tok
  FROM occ o LEFT JOIN voc v ON v.token = o.token),
uni AS MATERIALIZED (SELECT tok, count(*) AS n FROM m GROUP BY tok),
nt AS (SELECT sum(n) * 1.0 AS n FROM uni),
big AS MATERIALIZED (
  SELECT a.tok AS x, b.tok AS y, count(*) AS n
  FROM m a JOIN m b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY a.tok, b.tok),
trig AS MATERIALIZED (
  SELECT a.tok AS x, b.tok AS y, c.tok AS z, count(*) AS n
  FROM m a JOIN m b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
            JOIN m c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  GROUP BY a.tok, b.tok, c.tok),
triples AS (
  SELECT a.doc_id, a.tok AS x, b.tok AS y, c.tok AS z
  FROM m a JOIN m b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
            JOIN m c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
sc AS (
  SELECT t.doc_id,
         -sum(log2(CASE
            WHEN tg.n IS NOT NULL THEN tg.n * 1.0 / bxy.n
            WHEN byz.n IS NOT NULL THEN {alpha} * byz.n / uy.n
            ELSE {alpha} * {alpha} * uz.n / nt.n END)) / count(*) AS xe
  FROM triples t
  LEFT JOIN trig tg ON tg.x = t.x AND tg.y = t.y AND tg.z = t.z
  LEFT JOIN big bxy ON bxy.x = t.x AND bxy.y = t.y
  LEFT JOIN big byz ON byz.x = t.y AND byz.y = t.z
  JOIN uni uy ON uy.tok = t.y
  JOIN uni uz ON uz.tok = t.z
  CROSS JOIN nt
  GROUP BY t.doc_id)
SELECT d.doc_id, round(coalesce(sc.xe, 0), 6) AS xent
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
ORDER BY d.doc_id"""


def span_dedup_sql(k: int = 5, min_count: int = 2) -> str:
    """Mirror of functions/text.span_dedup: case-sensitive whitespace
    tokens, k-gram windows occurring >= min_count corpus-wide mark
    their positions, marked tokens removed, survivors joined by ' '."""
    return f"""WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
win AS MATERIALIZED (
  SELECT doc_id,
         unnest(range(1, len(tk) - {k} + 2)) AS i,
         unnest(list_transform(range(1, len(tk) - {k} + 2),
                i -> array_to_string(tk[i:i+{k}-1], ' '))) AS s
  FROM tl WHERE len(tk) >= {k}),
dup AS (SELECT s FROM win GROUP BY s HAVING count(*) >= {min_count}),
cover AS (SELECT DISTINCT w.doc_id, w.i + j.j AS pos
          FROM win w JOIN dup USING (s)
          CROSS JOIN unnest(range(0, {k})) AS j(j)),
toks AS (SELECT doc_id, unnest(tk) AS tok,
                unnest(range(1, len(tk) + 1)) AS pos FROM tl),
kept AS (SELECT t.doc_id, t.tok, t.pos FROM toks t
         ANTI JOIN cover c ON c.doc_id = t.doc_id AND c.pos = t.pos),
reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
               count(*) AS n_kept FROM kept GROUP BY doc_id)
SELECT d.doc_id, coalesce(r.text, '') AS text,
       coalesce(tl.n, 0) - coalesce(r.n_kept, 0) AS n_dropped
FROM documents d
LEFT JOIN (SELECT doc_id, len(tk) AS n FROM tl) tl ON tl.doc_id = d.doc_id
LEFT JOIN reb r ON r.doc_id = d.doc_id
ORDER BY d.doc_id"""


def stratified_sample_sql(per_group: int = 50) -> str:
    """Mirror of functions/text.stratified_sample over lang groups."""
    return f"""WITH h AS (
  SELECT doc_id, lang,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hk
  FROM documents),
rk AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn
       FROM h)
SELECT doc_id, lang FROM rk WHERE rn <= {per_group} ORDER BY doc_id"""


def inverted_index_sql(min_df: int = 2) -> str:
    """Mirror of functions/text.inverted_index: distinct (doc, token),
    postings = comma-joined ascending doc ids, df >= min_df."""
    return rf"""WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS (SELECT DISTINCT doc_id, unnest(tk) AS token FROM tl)
SELECT token, count(*) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM occ GROUP BY token HAVING count(*) >= {min_df} ORDER BY token"""


def doc_length_histogram_sql(width: int = 100) -> str:
    """Mirror of functions/text.column_histogram on n_chars."""
    return f"""SELECT CAST(floor(n_chars / {width}.0) AS BIGINT) AS bucket,
       count(*) AS n
FROM documents GROUP BY bucket ORDER BY bucket"""


HLL_REGISTERS_SQL = """WITH tl AS (
  SELECT string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
td AS (SELECT DISTINCT unnest(tk) AS tok FROM tl),
h AS (SELECT CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS hv
      FROM td WHERE tok <> ''),
r AS (SELECT hv % 256 AS register,
             CASE WHEN hv // 256 = 0 THEN 53
                  ELSE 52 - CAST(floor(log2(hv // 256)) AS BIGINT) END AS rho
      FROM h)
SELECT register, max(rho) AS max_rho FROM r GROUP BY register
ORDER BY register"""


BIGRAM_TOPK_SQL = """WITH tl AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
sh AS (SELECT doc_id,
    unnest(list_transform(range(1, greatest(len(tk) - 1, 1) + 1),
      i -> CASE WHEN len(tk) < 2 THEN array_to_string(tk, ' ')
                ELSE tk[i] || ' ' || tk[i+1] END)) AS ngram
  FROM tl)
SELECT ngram, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
FROM sh GROUP BY ngram ORDER BY n_occ DESC, ngram LIMIT 100"""


LENGTH_PERCENTILES_SQL = """WITH h AS (
  SELECT n_chars AS v, count(*) AS n FROM documents GROUP BY n_chars),
c AS (SELECT v, sum(n) OVER (ORDER BY v) AS cum FROM h),
nn AS (SELECT count(*) AS N FROM documents),
ps AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct)
SELECT CAST(ps.pct AS BIGINT) AS pct, CAST(min(c.v) AS BIGINT) AS value
FROM ps JOIN c ON c.cum >= ceil((SELECT N FROM nn) * ps.pct / 100.0)
GROUP BY ps.pct ORDER BY pct"""


CMS_TABLE_SQL = """WITH tl AS (
  SELECT string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS (SELECT unnest(tk) AS tok FROM tl),
tc AS (SELECT tok, count(*) AS c FROM occ WHERE tok <> '' GROUP BY tok),
jj AS (SELECT unnest(range(4)) AS j),
cells AS (
  SELECT j AS row,
         CAST(('0x' || substr(md5(tok || '|cms:' || j), 1, 15)) AS BIGINT)
           % 1024 AS bucket,
         c
  FROM tc CROSS JOIN jj)
SELECT row, bucket, CAST(sum(c) AS BIGINT) AS n
FROM cells GROUP BY row, bucket ORDER BY row, bucket"""


def pmi_topk_sql(topk: int = 50, min_count: int = 5) -> str:
    """PMI collocation mirror (functions/text.pmi_topk): strict
    adjacent-token bigrams, pmi = ln(c_xy·Nt²/(Nb·c_x·c_y)) rounded 6,
    ranked (pmi DESC, bigram ASC)."""
    return f"""WITH tl AS MATERIALIZED (
  SELECT string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
uni AS MATERIALIZED (
  SELECT tok, count(*) AS c
  FROM (SELECT unnest(tk) AS tok FROM tl) GROUP BY tok),
nt AS (SELECT sum(c) AS v FROM uni),
big0 AS (SELECT unnest(list_transform(range(1, len(tk)),
           i -> {{'x': tk[i], 'y': tk[i+1]}})) AS s FROM tl),
big AS MATERIALIZED (
  SELECT s.x AS x, s.y AS y, count(*) AS cxy FROM big0 GROUP BY 1, 2),
nb AS (SELECT sum(cxy) AS v FROM big)
SELECT f.x || ' ' || f.y AS bigram, CAST(f.cxy AS BIGINT) AS n_xy,
       round(ln((f.cxy * (SELECT v FROM nt) * (SELECT v FROM nt))
                / ((SELECT v FROM nb) * ux.c * uy.c)), 6) AS pmi
FROM big f JOIN uni ux ON ux.tok = f.x JOIN uni uy ON uy.tok = f.y
WHERE f.cxy >= {min_count}
ORDER BY pmi DESC, bigram LIMIT {topk}"""


def hash_features_sql(dims: int = 256) -> str:
    """Hashing-trick featurizer mirror: md5-60bit(token) % dims,
    per-doc bucket counts."""
    return f"""WITH tl AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS (SELECT doc_id, unnest(tk) AS tok FROM tl)
SELECT doc_id,
       CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {dims} AS feature,
       count(*) AS n
FROM occ WHERE tok <> ''
GROUP BY doc_id, feature ORDER BY doc_id, feature"""


DECONTAMINATE_SQL = r"""WITH toks3 AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id,
    unnest(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
      i -> CASE WHEN len(tk) < 3 THEN array_to_string(tk, ' ')
                ELSE tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] END)) AS s
  FROM toks3),
ev AS MATERIALIZED (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS overlap
FROM sh JOIN ev USING (s)
GROUP BY sh.doc_id HAVING count(*) >= 1 ORDER BY doc_id"""


PII_COUNTS_SQL = r"""SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text, '\+?[0-9][0-9()\-\s]{7,}[0-9]')) AS BIGINT) AS n_phone,
  CAST(len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ipv4
FROM documents ORDER BY doc_id"""


# Mirrors _q_line_dedup exactly: the same deterministic multi-line doc
# construction (the sf documents are single-line), then CCNet line-dedup
# semantics — a line occurring >= 2 times corpus-wide is removed from
# every doc; docs with no surviving line drop out (GROUP BY).
# Mirrors _q_boilerplate_strip exactly: per-source nav/footer lines on
# a deterministic multi-line construction, then within-group
# boilerplate semantics — a line in >= max(2, ceil(0.2 * group docs))
# distinct docs OF ITS SOURCE is stripped from that source's docs only.
# The MIRROR SYNC LINE (doc_id%25==0) is corpus-common but rare within
# each source, so it SURVIVES — the semantic difference vs line_dedup.
BOILERPLATE_STRIP_SQL = r"""WITH docs2 AS (
  SELECT doc_id, source,
         'NAV ' || source || ' HOME ABOUT' || chr(10) || coalesce(text, '')
         || chr(10)
         || CASE WHEN doc_id % 4 = 0 THEN 'COPYRIGHT ' || source || ' FOOTER'
                 ELSE 'tail-' || doc_id END
         || CASE WHEN doc_id % 25 = 0 THEN chr(10) || 'MIRROR SYNC LINE'
                 ELSE '' END AS text
  FROM documents
), lines AS (
  SELECT doc_id, source,
         unnest(string_split(text, chr(10))) AS ln,
         unnest(range(len(string_split(text, chr(10))))) AS line_no
  FROM docs2
), sd AS (SELECT source, count(*) AS n_docs FROM docs2 GROUP BY source),
cnt AS (
  SELECT l.source, l.ln, count(DISTINCT l.doc_id) AS dc
  FROM lines l GROUP BY l.source, l.ln
), boiler AS (
  SELECT c.source, c.ln
  FROM cnt c JOIN sd ON sd.source = c.source
  WHERE c.dc >= greatest(2, CAST(ceil(0.2 * sd.n_docs) AS BIGINT))
)
SELECT l.doc_id, string_agg(l.ln, chr(10) ORDER BY l.line_no) AS text
FROM lines l
WHERE NOT EXISTS (SELECT 1 FROM boiler b
                  WHERE b.source = l.source AND b.ln = l.ln)
GROUP BY l.doc_id"""


LINE_DEDUP_SQL = r"""WITH docs2 AS (
  SELECT doc_id,
         'SHARED HEADER BOILERPLATE' || chr(10) || coalesce(text, '')
         || CASE WHEN doc_id % 5 = 0 THEN chr(10) ELSE '' END
         || chr(10)
         || CASE WHEN doc_id % 3 = 0 THEN 'PROMO OFFER CLICK HERE'
                 ELSE 'tail-' || doc_id END AS text
  FROM documents
), lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS ln,
         unnest(range(len(string_split(text, chr(10))))) AS line_no
  FROM docs2
), dup AS (
  SELECT ln FROM lines GROUP BY ln HAVING count(*) >= 2
)
SELECT l.doc_id, string_agg(l.ln, chr(10) ORDER BY l.line_no) AS text
FROM lines l
WHERE l.ln NOT IN (SELECT ln FROM dup)
GROUP BY l.doc_id"""


# Mirrors _q_corpus_clean's deterministic multi-line construction: the
# line_dedup construction plus doc_id%7 IN (1,2) "paired" docs whose
# cleaned text is identical within each pair (their content/tail lines
# occur exactly twice — below the query's line_min_count=3 — so they
# survive line dedup and the exact-collapse stage keeps the min id).
MULTILINE_PAIRED_CTE = r"""docs2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 IN (1, 2)
              THEN 'SHARED HEADER BOILERPLATE' || chr(10)
                   || 'THE PAIRED CONTENT BLOCK ' || (doc_id // 7) || chr(10)
                   || 'tail-pair-' || (doc_id // 7)
              ELSE 'SHARED HEADER BOILERPLATE' || chr(10) || coalesce(text, '')
                   || CASE WHEN doc_id % 5 = 0 THEN chr(10) ELSE '' END
                   || chr(10)
                   || CASE WHEN doc_id % 3 = 0 THEN 'PROMO OFFER CLICK HERE'
                           ELSE 'tail-' || doc_id END
         END AS text
  FROM documents)"""


def corpus_clean_sql(langs=("en",), min_tokens: int = 8,
                     min_stop: float = 0.0, line_min_count: int = 3) -> str:
    """Full mirror of functions/text.corpus_clean over the paired
    multi-line construction: language+quality gate → corpus line dedup
    → exact collapse to min-id representative."""
    hits, case = _langid_fragments()
    lang_in = ", ".join(f"'{lang}'" for lang in langs)
    return f"""WITH {MULTILINE_PAIRED_CTE},
toks AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\\s+') END AS tk
  FROM docs2),
hits AS (
  SELECT doc_id, text, lt, {hits}
  FROM (SELECT doc_id, text, list_transform(tk, x -> lower(x)) AS lt
        FROM toks) t),
feats AS (
  SELECT doc_id, text, len(lt) AS n_tok,
    round(CASE WHEN len(lt) > 0
          THEN CAST(len(list_filter(lt, x -> x IN ({_inlist(STOPWORDS['en'])}))) AS DOUBLE) / len(lt)
          ELSE 0 END, 6) AS stop_ratio,
    {case} AS pred_lang
  FROM hits),
kept AS (
  SELECT doc_id, text FROM feats
  WHERE n_tok >= {min_tokens} AND stop_ratio >= {min_stop}
    AND pred_lang IN ({lang_in})),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS ln,
         unnest(range(len(string_split(text, chr(10))))) AS line_no
  FROM kept),
dup AS (SELECT ln FROM lines GROUP BY ln HAVING count(*) >= {line_min_count}),
rebuilt AS (
  SELECT l.doc_id, string_agg(l.ln, chr(10) ORDER BY l.line_no) AS text
  FROM lines l WHERE l.ln NOT IN (SELECT ln FROM dup)
  GROUP BY l.doc_id)
SELECT min(doc_id) AS doc_id, text FROM rebuilt GROUP BY text"""


def nb_quality_sql(min_words: int = 40, min_stop_hits: int = 1) -> str:
    """Mirror of functions/text.nb_quality_score: rule labels
    (n_words / distinct-Gopher-stopword floor), multinomial NB token
    counts with Laplace smoothing over lowered whitespace tokens
    (multiplicity kept), smoothed prior log-odds, pred = log_odds > 0."""
    from neo4j_graph_algorithms_ray.functions.text import GOPHER_STOPWORDS
    stops = _inlist(GOPHER_STOPWORDS)
    return rf"""WITH lt AS MATERIALIZED (
  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
       ELSE string_split_regex(trim(lower(text)), '\s+') END AS tk
  FROM documents),
lab AS MATERIALIZED (
  SELECT doc_id, tk,
         (len(tk) >= {min_words} AND
          len(list_filter([{stops}], w -> list_contains(tk, w)))
            >= {min_stop_hits}) AS label
  FROM lt),
occ AS MATERIALIZED (SELECT doc_id, label, unnest(tk) AS token FROM lab),
cnt AS (SELECT token,
               sum(CASE WHEN label THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN label THEN 0 ELSE 1 END) AS c0
        FROM occ GROUP BY token),
tot AS (SELECT sum(c1) AS n1, sum(c0) AS n0, count(*) AS v FROM cnt),
pri AS (SELECT log2((sum(CASE WHEN label THEN 1 ELSE 0 END) + 1.0)
              / (sum(CASE WHEN label THEN 0 ELSE 1 END) + 1.0)) AS p
        FROM lab),
w AS (SELECT token, log2((c1 + 1.0) / (n1 + v))
                  - log2((c0 + 1.0) / (n0 + v)) AS w
      FROM cnt CROSS JOIN tot),
sc AS (SELECT o.doc_id, sum(w.w) AS s
       FROM occ o JOIN w USING (token) GROUP BY o.doc_id)
SELECT l.doc_id, l.label,
       round(pri.p + coalesce(sc.s, 0), 6) AS log_odds,
       (pri.p + coalesce(sc.s, 0)) > 0 AS pred
FROM lab l CROSS JOIN pri LEFT JOIN sc ON sc.doc_id = l.doc_id
ORDER BY l.doc_id"""


def knn_graph_sql(k: int = 5) -> str:
    """Mirror of functions/ann.knn_graph exact regime: per-vector
    cosine top-k over the corpus (self excluded), ties by dst asc."""
    return f"""WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT src, dst, round(c, 6) AS cosine FROM (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         list_cosine_similarity(a.v, b.v) AS c,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY list_cosine_similarity(a.v, b.v) DESC,
                                     b.vec_id ASC) AS rn
  FROM e a CROSS JOIN e b WHERE b.vec_id <> a.vec_id) t
WHERE rn <= {k} ORDER BY src, dst"""


def embedding_clusters_sql(k: int = 3, threshold: float = 0.2) -> str:
    """Mirror of the composed embedding_clusters query: undirected WCC
    over the thresholded exact knn graph — (vec_id, component) with
    component = min vec_id reachable."""
    return f"""WITH RECURSIVE e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
knn AS (
  SELECT src, dst FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst,
           list_cosine_similarity(a.v, b.v) AS c,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY list_cosine_similarity(a.v, b.v) DESC,
                                       b.vec_id ASC) AS rn
    FROM e a CROSS JOIN e b WHERE b.vec_id <> a.vec_id) t
  WHERE rn <= {k} AND c >= {threshold}),
und AS (SELECT src, dst FROM knn UNION SELECT dst, src FROM knn),
reach(id, r) AS (
  SELECT vec_id, vec_id FROM e
  UNION
  SELECT u.dst, reach.r FROM reach JOIN und u ON u.src = reach.id)
SELECT id AS vec_id, min(r) AS component FROM reach
GROUP BY id ORDER BY vec_id"""


def chunk_documents_sql(chunk_tokens: int = 128, overlap: int = 0) -> str:
    """Mirror of functions/text.chunk_documents: whitespace tokens of
    the trimmed text, windows at stride = chunk_tokens - overlap, tail
    kept, empty docs emit nothing."""
    stride = chunk_tokens - overlap
    return rf"""WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
ch AS (
  SELECT doc_id, tk,
         unnest(range(0, greatest(1,
           (len(tk) - {overlap} + {stride} - 1) // {stride}))) AS chunk_id
  FROM tl)
SELECT doc_id, chunk_id,
       array_to_string(tk[chunk_id * {stride} + 1
                          : chunk_id * {stride} + {chunk_tokens}],
                       ' ') AS text,
       least({chunk_tokens}, len(tk) - chunk_id * {stride}) AS n_tokens
FROM ch ORDER BY doc_id, chunk_id"""


def pack_sequences_sql(seq_tokens: int = 1024) -> str:
    """Mirror of functions/text.pack_sequences: global token prefix sum
    in ascending doc_id order, sequence ids by integer division."""
    return rf"""WITH tl AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
  FROM documents),
cum AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_start
  FROM tl)
SELECT doc_id, n_tokens, tok_start,
       CAST(tok_start // {seq_tokens} AS BIGINT) AS seq_first,
       CAST((tok_start + greatest(n_tokens - 1, 0)) // {seq_tokens}
            AS BIGINT) AS seq_last
FROM cum ORDER BY doc_id"""


GOPHER_REPETITION_SQL = r"""WITH ln AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line
  FROM documents),
g AS (SELECT doc_id, line, count(*) AS c, length(line) AS l
      FROM ln GROUP BY doc_id, line),
la AS (SELECT doc_id, sum(c) AS n_lines, sum(c) - count(*) AS n_dup,
              sum(l * c) AS tot, sum(l * (c - 1)) AS dup
       FROM g GROUP BY doc_id),
tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(
           trim(lower(text), ' ' || chr(9) || chr(10) || chr(13)
                || chr(11) || chr(12)), '\s+') AS tk
  FROM documents
  WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13)
             || chr(11) || chr(12)) <> ''),
tc AS (SELECT doc_id,
              list_aggregate(list_transform(tk, x -> length(x)), 'sum')
                AS tok_chars
       FROM tl),
pairs AS (SELECT doc_id, unnest(tk[1:len(tk)-1]) AS w1,
                 unnest(tk[2:len(tk)]) AS w2
          FROM tl WHERE len(tk) >= 2),
bg AS (SELECT doc_id, w1, w2, count(*) AS c FROM pairs GROUP BY ALL),
top AS (SELECT doc_id, w1, w2, c,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY c DESC, w1, w2) AS rn
        FROM bg),
tb AS (SELECT t.doc_id, w1 || ' ' || w2 AS top_bigram,
              CAST(c * (length(w1) + length(w2)) AS DOUBLE)
                / greatest(tc.tok_chars, 1) AS frac
       FROM top t JOIN tc ON tc.doc_id = t.doc_id WHERE rn = 1)
SELECT d.doc_id,
  round(CAST(la.n_dup AS DOUBLE) / greatest(la.n_lines, 1), 6)
    AS dup_line_frac,
  round(CASE WHEN la.tot > 0 THEN CAST(la.dup AS DOUBLE) / la.tot
             ELSE 0 END, 6) AS dup_line_char_frac,
  coalesce(tb.top_bigram, '') AS top_bigram,
  round(coalesce(tb.frac, 0), 6) AS top_bigram_char_frac
FROM documents d LEFT JOIN la ON la.doc_id = d.doc_id
LEFT JOIN tb ON tb.doc_id = d.doc_id
ORDER BY d.doc_id"""


def weighted_sample_sql(k: int = 100) -> str:
    """Mirror of functions/text.weighted_sample with weight = n_chars:
    priority = float64(md5-int of doc_id, 15 hex digits) / n_chars —
    one correctly-rounded division, so engine and SQL agree bit-for-bit."""
    return f"""WITH pri AS (
  SELECT doc_id, n_chars,
         round(CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS DOUBLE) / n_chars, 6) AS priority
  FROM documents WHERE n_chars > 0)
SELECT doc_id, n_chars, priority FROM pri
ORDER BY priority, doc_id LIMIT {k}"""


MIXTURE_WEIGHTS_SQL = """WITH c AS (
  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
t AS (SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS tot FROM c)
SELECT lang, n_docs,
       round(sqrt(CAST(n_docs AS DOUBLE)) / t.tot, 6) AS weight
FROM c CROSS JOIN t ORDER BY lang"""


def ngram_containment_sql(df_cap: int = 10_000, threshold: float = 0.8) -> str:
    """Mirror of functions/dedup.ngram_containment_pairs (raw-doc
    formulation): directional containment = |sh(src) ∩ sh(dst)| /
    |sh(src)| over distinct word-3-shingles, df-capped."""
    return f"""WITH {SHINGLE_CTES},
shc AS MATERIALIZED (
  SELECT sh.doc_id, sh.s FROM sh
  JOIN (SELECT s FROM sh GROUP BY s HAVING count(*) <= {df_cap}) h
  USING (s)),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
  FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
dirs AS (
  SELECT a AS src, b AS dst,
         round(CAST(i AS DOUBLE) / ca.n, 6) AS containment
  FROM inter JOIN counts ca ON ca.doc_id = a
  UNION ALL
  SELECT b AS src, a AS dst,
         round(CAST(i AS DOUBLE) / cb.n, 6) AS containment
  FROM inter JOIN counts cb ON cb.doc_id = b)
SELECT src, dst, containment FROM dirs
WHERE containment >= {threshold} ORDER BY src, dst"""


CHAR_ENTROPY_SQL = """WITH ch AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
cnt AS MATERIALIZED (
  SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS n
  FROM ch GROUP BY doc_id, c),
tot AS (SELECT doc_id, sum(n) AS t FROM cnt GROUP BY doc_id),
ent AS (
  SELECT cnt.doc_id,
         log2(any_value(tot.t)) - sum(cnt.n * log2(cnt.n)) / any_value(tot.t)
           AS h
  FROM cnt JOIN tot ON tot.doc_id = cnt.doc_id GROUP BY cnt.doc_id)
SELECT d.doc_id, round(coalesce(e.h, 0), 6) AS char_entropy,
       round(CASE WHEN length(d.text) = 0 OR d.text IS NULL THEN 0
             ELSE CAST(length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))
                  AS DOUBLE) / length(d.text) END, 6) AS alpha_ratio
FROM documents d LEFT JOIN ent e ON e.doc_id = d.doc_id
ORDER BY d.doc_id"""


def dsir_sql(buckets: int = 1024, target_mod: int = 10) -> str:
    """DSIR mirror (functions/text.dsir_weights): hashed unigram+bigram
    buckets (md5-60bit mod ``buckets``), add-one-smoothed target/raw
    categoricals, per-doc summed log2 ratio; target slice = doc_id %
    ``target_mod`` = 0."""
    h = f"CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % {buckets}"
    return rf"""WITH tl AS MATERIALIZED (
  SELECT doc_id,
         string_split_regex(trim(lower(coalesce(text, ''))), '\s+') AS tk
  FROM documents WHERE trim(coalesce(text, '')) <> ''),
grams AS MATERIALIZED (
  SELECT doc_id, g FROM (
    SELECT doc_id, unnest(tk) AS g FROM tl
    UNION ALL
    SELECT doc_id,
           unnest(list_transform(range(1, len(tk)),
                                 i -> tk[i] || ' ' || tk[i+1])) AS g
    FROM tl WHERE len(tk) >= 2) x),
gb AS MATERIALIZED (SELECT doc_id, {h} AS b FROM grams),
rc AS (SELECT b, count(*) AS n FROM gb GROUP BY b),
tc AS (SELECT b, count(*) AS n FROM gb
       WHERE doc_id % {target_mod} = 0 GROUP BY b),
tot AS (SELECT
  (SELECT CAST(count(*) AS DOUBLE) FROM gb) AS r,
  (SELECT CAST(count(*) AS DOUBLE) FROM gb
   WHERE doc_id % {target_mod} = 0) AS t),
lr AS MATERIALIZED (SELECT rc.b,
       log2((coalesce(tc.n, 0) + 1.0) / ((SELECT t FROM tot) + {buckets}))
     - log2((rc.n + 1.0) / ((SELECT r FROM tot) + {buckets})) AS w
  FROM rc LEFT JOIN tc ON tc.b = rc.b),
sc AS (SELECT gb.doc_id, sum(lr.w) AS lw
       FROM gb JOIN lr ON lr.b = gb.b GROUP BY gb.doc_id)
SELECT d.doc_id, round(coalesce(sc.lw, 0), 6) AS log_weight
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
ORDER BY d.doc_id"""


LEXICAL_DIVERSITY_SQL = """WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS (SELECT doc_id, unnest(tk) AS tok FROM tl),
grp AS (SELECT doc_id, tok, count(*) AS c FROM occ WHERE tok <> ''
        GROUP BY doc_id, tok),
agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS n_distinct,
               count(*) FILTER (c = 1) AS n_hapax
        FROM grp GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.n_tokens, 0) AS n_tokens,
       round(coalesce(a.n_distinct / CAST(a.n_tokens AS DOUBLE), 0), 6)
         AS ttr,
       round(coalesce(a.n_hapax / CAST(a.n_tokens AS DOUBLE), 0), 6)
         AS hapax_ratio
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id"""


SENTENCE_STATS_SQL = """WITH pieces AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '[.!?]+')) AS s
  FROM documents),
tr AS (SELECT doc_id,
              length(trim(s, ' ' || chr(9) || chr(10) || chr(13))) AS ln
       FROM pieces),
agg AS (SELECT doc_id, count(*) AS n_sentences,
               avg(CAST(ln AS DOUBLE)) AS mean_chars
        FROM tr WHERE ln > 0 GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.n_sentences, 0) AS n_sentences,
       round(coalesce(a.mean_chars, 0), 6) AS mean_sentence_chars
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id"""


SLICE_KL_SQL = """WITH tl AS MATERIALIZED (
  SELECT lang, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS (SELECT lang, unnest(tk) AS tok FROM tl),
lt AS (SELECT lang, tok, count(*) AS n FROM occ WHERE tok <> ''
       GROUP BY lang, tok),
l AS (SELECT lang, CAST(sum(n) AS DOUBLE) AS nl FROM lt GROUP BY lang),
t AS (SELECT tok, CAST(sum(n) AS DOUBLE) AS nt FROM lt GROUP BY tok),
nn AS (SELECT CAST(sum(n) AS DOUBLE) AS big_n FROM lt)
SELECT lt.lang,
       round(sum((lt.n / l.nl) * ln((lt.n / l.nl) / (t.nt / nn.big_n))), 6)
         AS kl_div,
       CAST(l.nl AS BIGINT) AS n_tokens
FROM lt JOIN l USING (lang) JOIN t ON t.tok = lt.tok, nn
GROUP BY lt.lang, l.nl ORDER BY lt.lang"""


def dup_ngram_frac_sql(k: int = 5, min_docs: int = 2) -> str:
    """Mirror of functions/text.dup_ngram_frac: case-sensitive
    whitespace k-grams, per-doc distinct, dup = in >= min_docs docs."""
    return f"""WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
g AS (SELECT doc_id,
         unnest(list_transform(range(1, len(tk) - {k} + 2),
                i -> array_to_string(tk[i:i+{k}-1], ' '))) AS gram
      FROM tl WHERE len(tk) >= {k}),
dg AS (SELECT DISTINCT doc_id, gram FROM g),
cnt AS (SELECT gram, count(*) AS nd FROM dg GROUP BY gram),
per AS (SELECT dg.doc_id, count(*) AS n_distinct,
               count(*) FILTER (cnt.nd >= {min_docs}) AS n_dup
        FROM dg JOIN cnt USING (gram) GROUP BY dg.doc_id)
SELECT d.doc_id, coalesce(per.n_distinct, 0) AS n_grams_distinct,
       round(coalesce(per.n_dup / CAST(per.n_distinct AS DOUBLE), 0), 6)
         AS dup_gram_frac
FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id"""


def winnow_sql(k: int = 8, w: int = 4) -> str:
    """Mirror of functions/text.winnow_fingerprints: base-256 k-byte
    gram hash, per-doc window-of-w minimum, rightmost tie-break,
    distinct selections."""
    terms = " + ".join(
        f"ascii(substr(text, i + {j + 1}, 1)) * CAST({256 ** j} AS BIGINT)"
        for j in range(k))
    return f"""WITH pos AS MATERIALIZED (
  SELECT doc_id, text, unnest(range(0, length(text) - {k} + 1)) AS i
  FROM documents WHERE length(text) >= {k}),
g AS MATERIALIZED (
  SELECT doc_id, i, {terms} AS h FROM pos),
wn AS (SELECT doc_id, i, h,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wmin,
         count(*) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wcnt
       FROM g),
sel AS (SELECT wn.doc_id, max(g2.i) AS pos, wn.wmin AS fp
        FROM wn JOIN g g2 ON g2.doc_id = wn.doc_id
                         AND g2.i BETWEEN wn.i AND wn.i + {w - 1}
                         AND g2.h = wn.wmin
        WHERE wn.wcnt = {w}
        GROUP BY wn.doc_id, wn.i, wn.wmin)
SELECT DISTINCT doc_id, pos, fp FROM sel ORDER BY doc_id, pos"""


TOKEN_BUDGET_SQL = """WITH tl AS (
  SELECT source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt
  FROM documents),
agg AS (SELECT source, count(*) AS n_docs,
               CAST(sum(nt) AS BIGINT) AS n_tokens FROM tl GROUP BY source),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS s FROM agg)
SELECT source, n_docs, n_tokens,
       round(n_tokens / greatest(tot.s, 1), 6) AS token_share
FROM agg, tot ORDER BY source"""


def lang_length_percentiles_sql(pcts=(25, 50, 75, 90, 99)) -> str:
    """Mirror of functions/text.grouped_percentiles on (lang, n_chars)."""
    plist = ", ".join(str(p) for p in pcts)
    return f"""WITH h AS (
  SELECT lang, n_chars AS v, count(*) AS n FROM documents
  GROUP BY lang, n_chars),
c AS (SELECT lang, v, sum(n) OVER (PARTITION BY lang ORDER BY v) AS cum,
             sum(n) OVER (PARTITION BY lang) AS total FROM h),
ps AS (SELECT unnest([{plist}]) AS pct)
SELECT c.lang, CAST(ps.pct AS BIGINT) AS pct,
       CAST(min(c.v) AS BIGINT) AS value
FROM ps JOIN c ON c.cum >= ceil(c.total * ps.pct / 100.0)
GROUP BY c.lang, ps.pct ORDER BY c.lang, pct"""


def filter_report_sql(min_tokens: int = 8, lang: str = "en",
                      min_stopword_ratio: float = 0.03,
                      max_rep_ratio: float = 0.3) -> str:
    """Mirror of functions/text.filter_report: same round6 values,
    same first-failing-rule priority."""
    hits, case = _langid_fragments()
    return f"""WITH {TOKS_CTE},
hits AS (
  SELECT doc_id, {hits}
  FROM (SELECT doc_id, list_transform(tk, x -> lower(x)) AS lt FROM toks) t),
pl AS (SELECT doc_id, {case} AS pred_lang FROM hits),
q AS (SELECT doc_id, len(tk) AS n_tokens,
        round(CASE WHEN len(tk) > 0
          THEN CAST(len(list_filter(list_transform(tk, x -> lower(x)),
                        x -> x IN ({_inlist(STOPWORDS['en'])}))) AS DOUBLE)
               / len(tk)
          ELSE 0 END, 6) AS stop_ratio
      FROM toks),
tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
shd AS MATERIALIZED (
  SELECT doc_id,
    unnest(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
      i -> CASE WHEN len(tk) < 3 THEN array_to_string(tk, ' ')
                ELSE tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] END)) AS s
  FROM tl),
st AS (SELECT doc_id, count(*) AS total, count(DISTINCT s) AS dist
       FROM shd GROUP BY doc_id),
rr AS (SELECT d.doc_id,
         round(coalesce(1.0 - CAST(st.dist AS DOUBLE) / st.total, 0), 6)
           AS rep_ratio
       FROM documents d LEFT JOIN st ON st.doc_id = d.doc_id),
dec AS (SELECT q.doc_id,
          CASE WHEN q.n_tokens < {min_tokens} THEN 'too_short'
               WHEN pl.pred_lang != '{lang}' THEN 'non_english'
               WHEN q.stop_ratio < {min_stopword_ratio} THEN 'low_stopword'
               WHEN rr.rep_ratio > {max_rep_ratio} THEN 'repetitive'
               ELSE 'keep' END AS reason
        FROM q JOIN pl USING (doc_id) JOIN rr ON rr.doc_id = q.doc_id)
SELECT doc_id, CAST(reason = 'keep' AS BIGINT) AS keep, reason
FROM dec ORDER BY doc_id"""


EMBEDDING_GRAM_SQL = """WITH dims AS (
  SELECT unnest(generate_series(1, len((SELECT embedding FROM embeddings
                                        LIMIT 1)))) AS i),
pr AS (SELECT a.i AS i, b.i AS j FROM dims a JOIN dims b ON b.i >= a.i)
SELECT p.i, p.j,
       round(sum(CAST(e.embedding[p.i] AS DOUBLE)
                 * CAST(e.embedding[p.j] AS DOUBLE)), 6) AS g
FROM embeddings e CROSS JOIN pr p
GROUP BY p.i, p.j ORDER BY i, j"""


EMBEDDING_QUANTIZE_SQL = """WITH dims AS (
  SELECT unnest(generate_series(1, len((SELECT embedding FROM embeddings
                                        LIMIT 1)))) AS dim),
v AS MATERIALIZED (
  SELECT d.dim, CAST(e.embedding[d.dim] AS DOUBLE) AS x
  FROM embeddings e, dims d),
sc AS (SELECT dim, max(abs(x)) AS s,
              CASE WHEN max(abs(x)) > 0 THEN max(abs(x)) ELSE 1 END AS sd
       FROM v GROUP BY dim),
err AS (SELECT v.dim, sc.s,
               abs(v.x - least(greatest(round(v.x / sc.sd * 127.0), -127),
                               127) * sc.sd / 127.0) AS ae
        FROM v JOIN sc ON sc.dim = v.dim)
SELECT dim, round(s, 6) AS scale, round(avg(ae), 6) AS mae
FROM err GROUP BY dim, s ORDER BY dim"""


EMBEDDING_DIM_STATS_SQL = """WITH dims AS (
  SELECT unnest(generate_series(1, len((SELECT embedding FROM embeddings
                                        LIMIT 1)))) AS dim),
v AS (SELECT d.dim, CAST(e.embedding[d.dim] AS DOUBLE) AS x
      FROM embeddings e, dims d)
SELECT dim,
       round(sum(x) / count(*), 6) AS mean,
       round(sqrt(greatest(sum(x * x) / count(*)
                           - pow(sum(x) / count(*), 2), 0)), 6) AS std
FROM v GROUP BY dim ORDER BY dim"""


# Mirrors functions/text.pii_redact: each pattern counts + rewrites the
# previous pattern's output, in PII_PATTERNS order (email, phone, ipv4).
PII_REDACT_SQL = r"""WITH t0 AS (SELECT doc_id, coalesce(text, '') AS s FROM documents),
t1 AS (SELECT doc_id,
  CAST(len(regexp_extract_all(s, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS BIGINT) AS c,
  regexp_replace(s, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS s
  FROM t0),
t2 AS (SELECT doc_id,
  c + CAST(len(regexp_extract_all(s, '\+?[0-9][0-9()\-\s]{7,}[0-9]')) AS BIGINT) AS c,
  regexp_replace(s, '\+?[0-9][0-9()\-\s]{7,}[0-9]', '<PHONE>', 'g') AS s
  FROM t1),
t3 AS (SELECT doc_id,
  c + CAST(len(regexp_extract_all(s, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS c,
  regexp_replace(s, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS s
  FROM t2)
SELECT doc_id, s AS text, c AS n_redactions FROM t3 ORDER BY doc_id"""


READABILITY_SQL = r"""SELECT doc_id,
  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS sentences,
  CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT)
    AS syllables,
  round(206.835
        - 1.015 * len(regexp_extract_all(text, '\S+'))
          / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        - 84.6 * len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
          / greatest(len(regexp_extract_all(text, '\S+')), 1), 6)
    AS flesch
FROM documents ORDER BY doc_id"""


FREQ_SPECTRUM_SQL = """WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS (SELECT unnest(tk) AS token FROM tl),
tc AS (SELECT token, count(*) AS f FROM occ GROUP BY token)
SELECT CAST(f AS BIGINT) AS freq, CAST(count(*) AS BIGINT) AS n_tokens
FROM tc GROUP BY f ORDER BY freq"""


def heaps_law_sql(quarters: int = 4) -> str:
    """Mirror of _q_heaps_law: vocabulary size after each doc_id-order
    quarter of the corpus, via each token's first-occurrence doc."""
    return f"""WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS (SELECT doc_id, unnest(tk) AS token FROM tl),
fo AS (SELECT token, min(doc_id) AS first_doc FROM occ GROUP BY token),
nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
bucketed AS (
  SELECT least(CAST(floor(first_doc * {quarters} / (SELECT n FROM nn))
               AS BIGINT), {quarters - 1}) AS q
  FROM fo)
SELECT CAST(q + 1 AS BIGINT) AS quarter,
       CAST(sum(count(*)) OVER (ORDER BY q) AS BIGINT) AS vocab_size
FROM bucketed GROUP BY q ORDER BY quarter"""


def minhash_band_load_sql(num_perm: int = 8, bands: int = 4) -> str:
    """Mirror of _q_minhash_band_load: per-band histogram of LSH bucket
    sizes — the index-health diagnostic (a fat bucket means a hot key
    that will dominate pair generation)."""
    return f"""WITH {_minhash_band_ctes(num_perm, bands)},
bs AS (SELECT band, bkey, count(*) AS sz FROM bk GROUP BY band, bkey)
SELECT CAST(band AS BIGINT) AS band, CAST(sz AS BIGINT) AS bucket_size,
       CAST(count(*) AS BIGINT) AS n_buckets
FROM bs GROUP BY band, sz ORDER BY band, bucket_size"""


SIMHASH_BIT_BALANCE_SQL = f"""WITH {_simhash_sig_ctes()},
bb AS (SELECT b.b AS bit,
              sum(CAST((simhash >> CAST(b.b AS INTEGER)) & 1 AS BIGINT))
                AS n_ones,
              count(*) AS n_docs
       FROM allsh CROSS JOIN (SELECT unnest(range(64)) AS b) b
       GROUP BY b.b)
SELECT CAST(bit AS BIGINT) AS bit, CAST(n_ones AS BIGINT) AS n_ones,
       round(CAST(n_ones AS DOUBLE) / n_docs, 6) AS frac_ones
FROM bb ORDER BY bit"""


TOKENIZER_FERTILITY_SQL = r"""SELECT lang,
  CAST(sum(length(text)) AS BIGINT) AS n_chars,
  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_tokens,
  round(CAST(sum(length(text)) AS DOUBLE)
        / greatest(sum(len(regexp_extract_all(text, '\S+'))), 1), 6)
    AS chars_per_token
FROM documents GROUP BY lang ORDER BY lang"""


def token_burstiness_sql(topk: int = 50) -> str:
    """Mirror of _q_token_burstiness: Fano factor (var/mean over ALL
    docs, zeros included) of per-doc counts for the top-k tokens."""
    return f"""WITH tl AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''),
occ AS (SELECT doc_id, unnest(tk) AS token FROM tl),
dc AS (SELECT token, doc_id, CAST(count(*) AS DOUBLE) AS c
       FROM occ GROUP BY token, doc_id),
tot AS (SELECT token, sum(c) AS s, sum(c * c) AS ss FROM dc GROUP BY token),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS d FROM documents),
top AS (SELECT token, s, ss FROM tot
        ORDER BY s DESC, token ASC LIMIT {topk}),
st AS (SELECT token, s / (SELECT d FROM nd) AS mean,
              (ss - s * s / (SELECT d FROM nd)) / (SELECT d FROM nd)
                AS variance
       FROM top)
SELECT token, round(mean, 6) AS mean_count,
       round(variance / mean, 6) AS fano
FROM st ORDER BY token"""
