"""DuckDB oracle SQL for dedup + text-analysis showcase queries.

MinHash / SimHash / embedding-LSH queries are deliberately omitted
(xxhash64 / custom fingerprints are not SQL-expressible) — they get the
driver's rows-only check; their accuracy is pytest-verified against the
exact baselines.
"""

ORACLE: dict[str, str] = {
    "dd_exact_dedup": """
        SELECT
            MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS fp,
            MIN(doc_id) AS doc_id,
            COUNT(*) AS group_size
        FROM documents
        GROUP BY 1
    """,
    "dd_ngram_jaccard_pairs": """
        WITH toklists AS (
            SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+') AS l
            FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id,
                UNNEST(LIST_TRANSFORM(
                    RANGE(1, GREATEST(LEN(l), 2)),
                    i -> l[i] || ' ' || l[i + 1]
                )) AS gram
            FROM toklists
        ),
        sizes AS (
            SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id
        ),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
            FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT
            id_a,
            id_b,
            ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.35
    """,
    "text_stats": """
        SELECT
            doc_id,
            CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                 ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) END AS INTEGER)
                AS n_tokens,
            CAST(LENGTH(text) AS INTEGER) AS n_chars_computed,
            ROUND(CASE WHEN LENGTH(text) = 0 THEN 0.0
                  ELSE CAST(LENGTH(REGEXP_REPLACE(text, '[^.,;:!?()''"-]', '', 'g')) AS DOUBLE)
                       / LENGTH(text) END, 4) AS punct_ratio,
            ROUND(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0.0
                  ELSE CAST(LENGTH(REGEXP_REPLACE(TRIM(text), '\\s+', '', 'g')) AS DOUBLE)
                       / LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) END, 4)
                AS avg_token_len
        FROM documents
    """,
    "text_fingerprint": """
        SELECT
            doc_id,
            MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
    """,
    "text_quality": """
        WITH stats AS (
            SELECT
                doc_id,
                CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                     ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) END AS n_tok,
                CASE WHEN LENGTH(text) = 0 THEN 0.0
                     ELSE CAST(LENGTH(REGEXP_REPLACE(text, '[^.,;:!?()''"-]', '', 'g')) AS DOUBLE)
                          / LENGTH(text) END AS punct,
                CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0.0
                     ELSE CAST(LENGTH(REGEXP_REPLACE(TRIM(text), '\\s+', '', 'g')) AS DOUBLE)
                          / LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) END AS awl
            FROM documents
        )
        SELECT
            doc_id,
            ROUND(
                0.4 * LEAST(n_tok / 50.0, 1.0)
                + 0.3 * (CASE WHEN awl >= 3.0 AND awl <= 8.0 THEN 1.0 ELSE 0.5 END)
                + 0.3 * GREATEST(0.0, 1.0 - punct * 5.0),
            4) AS quality
        FROM stats
    """,
}
