"""Shared DuckDB-oracle SQL fragments.

Imported by every registry module (queries_text, queries_train,
queries_analytics) — deliberately dependency-free so registry modules
can import fragments without touching each other (a queries_train ->
queries_text import deadlocks when a caller imports queries_text first:
queries_text -> queries -> queries_train -> queries_text(partial)).
Kept in lockstep with functions/text.py — see queries_text's module
docstring for the lockstep rules.
"""

from __future__ import annotations

_TOKS_SQL = r"regexp_split_to_array(trim(text), '\s+')"
_HEX_HIGH_SQL = "('8','9','a','b','c','d','e','f')"
_BPE_SQL = r"regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')"
_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_SHINGLES_SQL = (
    "CASE WHEN len(t) >= 3 THEN list_distinct("
    "[t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)])"
    " ELSE [] END"
)

_NGRAM_VERIFY_SQL = """
    SELECT id_a, id_b,
           round(len(list_intersect(x.shingles, y.shingles)) * 1.0
                 / len(list_distinct(list_concat(x.shingles, y.shingles))), 6)
             AS jaccard
    FROM cand JOIN sh x ON cand.id_a = x.doc_id JOIN sh y ON cand.id_b = y.doc_id
"""


def _minhash_ctes(source: str, num_hashes: int, band_rows: int) -> str:
    """CTE chain computing MinHash-LSH candidate pairs over ``source``
    (a table or earlier CTE with (doc_id, text)) — composable into
    larger WITH chains (the curated-corpus oracle reuses it verbatim)."""
    sigs = ",\n             ".join(
        f"list_min(list_transform(shingles, s -> md5('{i}_' || s))) AS sig_{i}"
        for i in range(num_hashes)
    )
    bands = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5(sig_{b * band_rows} || '|' || sig_{b * band_rows + 1}) AS key FROM sig"
        for b in range(num_hashes // band_rows)
    )
    return f"""
    sh0 AS (
      SELECT doc_id, {_SHINGLES_SQL} AS shingles
      FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM {source})
    ),
    sh AS (SELECT * FROM sh0 WHERE len(shingles) > 0),
    sig AS (
      SELECT doc_id, shingles,
             {sigs}
      FROM sh
    ),
    bands AS (
      {bands}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    """


# --- quality/language fragments (moved from queries_text so that other
# registry modules — e.g. queries_train's cluster_canonicals oracle —
# can compose them without importing queries_text itself, which
# deadlocks when a caller imports queries_text first; see module
# docstring) -----------------------------------------------------------

from .functions.text import STOPWORDS  # noqa: E402  (pyspark-only, no cycle)


def _hits_sql(words: list[str]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(t, x -> x IN ({inlist})))"


def _lang_case_sql() -> str:
    hits = {lang: _hits_sql(ws) for lang, ws in STOPWORDS.items()}
    return f"""
      CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
           WHEN {hits['en']} >= {hits['es']} AND {hits['en']} >= {hits['fr']}
                AND {hits['en']} >= {hits['de']} AND {hits['en']} > 0 THEN 'en'
           WHEN {hits['es']} >= {hits['fr']} AND {hits['es']} >= {hits['de']}
                AND {hits['es']} > 0 THEN 'es'
           WHEN {hits['fr']} >= {hits['de']} AND {hits['fr']} > 0 THEN 'fr'
           WHEN {hits['de']} > 0 THEN 'de'
           ELSE 'und' END
    """


def _scored_passed_ctes() -> str:
    """Shared oracle CTEs: quality scoring + floor filter (the curation
    pipeline's first two stages), reused by curated_docs and
    curated_docs_v2."""
    hits_en = _hits_sql(STOPWORDS["en"])
    return f"""scored0 AS (
      SELECT doc_id, text,
             len(t) AS n_tokens,
             {hits_en} * 1.0 / len(t) AS stop_ratio,
             len(list_distinct(t)) * 1.0 / len(t) AS distinct_ratio,
             list_sum(list_transform(t, x -> length(x))) * 1.0 / len(t) AS avg_tok,
             {_lang_case_sql()} AS predicted_lang,
             md5({_NORM_SQL}) AS fingerprint
      FROM (SELECT doc_id, text, {_TOKS_SQL} AS t FROM documents)
    ),
    scored AS (
      SELECT doc_id, text, predicted_lang, fingerprint,
             round(
               (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN avg_tok >= 3 AND avg_tok <= 12 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN stop_ratio >= 0.03 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN distinct_ratio >= 0.3 THEN 0.25 ELSE 0.0 END), 2)
               AS quality_score
      FROM scored0
    ),
    passed AS (SELECT * FROM scored WHERE quality_score >= 0.5)"""
