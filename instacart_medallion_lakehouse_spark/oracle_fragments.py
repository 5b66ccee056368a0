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
