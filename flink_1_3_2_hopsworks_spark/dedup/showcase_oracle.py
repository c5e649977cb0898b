"""DuckDB oracle SQL for dedup + text-analysis showcase queries.

Every gate here is fully oracled (hash-match): the registry variants use
DuckDB-reproducible hashes — the md5-prefix portable hash for SimHash and
MinHash, seeded hyperplane constants for embedding LSH — so the generated
SQL replays each pipeline end-to-end (fingerprints/signatures → blocking →
caps → verification). Accuracy vs exact baselines stays pytest-covered.
"""


def _simhash_oracle(
    bits: int = 60,
    max_distance: int = 8,
    max_bucket: int = 1000,
    mode: str = "pairs",
) -> str:
    """Replays dedup/simhash.py with portable_hash60 in DuckDB SQL; the
    per-bit majority sums are generated (60 small SUMs, mirroring the Spark
    side's packed accumulators). ``mode="pairs"`` replays the full
    bucket-join pair listing; ``mode="stars"`` replays simhash_star_edges
    (bucket-min anchor vs members only)."""
    bit_sums = ",\n                ".join(
        f"SUM((h >> {b}) & 1) AS b{b}" for b in range(bits)
    )
    fp_terms = "\n                + ".join(
        f"(CASE WHEN 2 * b{b} > n THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) AS tok
            FROM documents
        ),
        hashed AS (
            SELECT doc_id,
                ('0x' || SUBSTR(MD5(tok), 1, 15))::BIGINT AS h
            FROM toks WHERE tok <> ''
        ),
        sums AS (
            SELECT doc_id, COUNT(*) AS n,
                {bit_sums}
            FROM hashed GROUP BY doc_id
        ),
        fps0 AS (
            SELECT doc_id,
                {fp_terms}
                AS simhash
            FROM sums
        ),
        fps AS (
            SELECT d.doc_id, COALESCE(f.simhash, 0) AS simhash
            FROM documents d LEFT JOIN fps0 f USING (doc_id)
        ),
        chunked AS (
            SELECT doc_id, simhash, ci,
                (simhash >> (ci * 16)) & 65535 AS cv
            FROM fps CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS ci)
        ),
        capped AS (
            SELECT * FROM (
                SELECT *, COUNT(*) OVER (PARTITION BY ci, cv) AS bsize
                FROM chunked
            ) WHERE bsize <= {max_bucket}
        ),
        anchors AS (
            SELECT ci, cv, MIN(doc_id) AS aid FROM capped GROUP BY ci, cv
        ),
        anch AS (
            SELECT a.ci, a.cv, a.aid, f.simhash AS afp
            FROM anchors a JOIN fps f ON f.doc_id = a.aid
        ),
        stars AS (
            SELECT DISTINCT n.aid AS id_a, c.doc_id AS id_b,
                CAST(BIT_COUNT(XOR(n.afp, c.simhash)) AS BIGINT) AS hamming
            FROM capped c
            JOIN anch n ON c.ci = n.ci AND c.cv = n.cv AND c.doc_id > n.aid
        ),
        blocked AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(BIT_COUNT(XOR(a.simhash, b.simhash)) AS BIGINT) AS hamming
            FROM capped a
            JOIN capped b ON a.ci = b.ci AND a.cv = b.cv
                         AND a.doc_id < b.doc_id
        ),
        exact AS (
            SELECT min_id AS id_a, doc_id AS id_b, 0::BIGINT AS hamming
            FROM (
                SELECT doc_id,
                    MIN(doc_id) OVER (PARTITION BY simhash) AS min_id
                FROM fps
            ) WHERE doc_id <> min_id
        )
        SELECT * FROM {"stars" if mode == "stars" else "blocked"}
        WHERE hamming <= {max_distance}
        UNION
        SELECT * FROM exact
    """


def _lang_id_oracle() -> str:
    """Replays functions/text.py lang_id in SQL: CJK-ratio gate, stopword
    hit votes (lists generated from the same STOPWORDS dict), earliest
    language wins ties, zero hits → 'und'."""
    from flink_1_3_2_hopsworks_spark.functions.text import STOPWORDS

    langs = list(STOPWORDS)
    hit_cols = ",\n                ".join(
        "LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(["
        + ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        + f"], t))) AS {lang}"
        for lang in langs
    )
    best = "GREATEST(" + ", ".join(langs) + ")"
    pick = "\n                ".join(
        f"WHEN {lang} = {best} THEN '{lang}'" for lang in langs[:-1]
    )
    return f"""
        WITH t AS (
            SELECT doc_id, lang, text,
                CASE WHEN LENGTH(TRIM(LOWER(text))) = 0 THEN []
                     ELSE STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')
                END AS toks
            FROM documents
        ), hits AS (
            SELECT doc_id, lang, text,
                {hit_cols}
            FROM t
        )
        SELECT doc_id, lang,
            CASE
                WHEN LENGTH(text) = 0 THEN 'und'
                WHEN LENGTH(REGEXP_REPLACE(text, '[^一-鿿]', '', 'g')) * 1.0
                     / LENGTH(text) > 0.2 THEN 'zh'
                WHEN {best} = 0 THEN 'und'
                {pick}
                ELSE '{langs[-1]}'
            END AS lang_guess
        FROM hits
    """


def _minhash_cte_prefix(
    shingle_k: int,
    num_hashes: int,
    bands: int,
    max_bucket: int,
    source: str = "documents",
    materialized: bool = False,
) -> str:
    """The shared CTE chain of the minhash oracles (norm → shingles → base
    hash → signature → band buckets → capped), replaying dedup/minhash.py
    with portable=True: the affine-permutation coefficients come from the
    SAME seeded generator the Spark side uses and band buckets are the same
    '|'-joined value strings. ``source`` swaps the (doc_id, text) relation
    the signatures derive from — the curation-funnel oracle passes its
    survivor-gated corpus join here, with ``materialized=True`` so the
    multiply-referenced sig/capped CTEs don't inline-expand (DuckDB's
    default inlining multiplies each reference's subtree — composed with
    the funnel's CTE depth that exhausts file handles)."""
    from flink_1_3_2_hopsworks_spark.dedup.minhash import _MERSENNE, _coeffs

    rows = num_hashes // bands
    coeffs = _coeffs(num_hashes)
    sig_mins = ",\n                ".join(
        f"MIN(({a}::BIGINT * h + {b}) % {_MERSENNE}) AS h{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_rows = "\n            UNION ALL\n            ".join(
        "SELECT id, {b} AS band, CONCAT_WS('|', {cols}) AS bucket FROM sig".format(
            b=b, cols=", ".join(f"h{b * rows + r}" for r in range(rows))
        )
        for b in range(bands)
    )
    mat = "MATERIALIZED " if materialized else ""
    return f"""norm AS (
            SELECT doc_id AS id,
                REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g') AS nrm
            FROM {source}
        ), sh AS (
            SELECT id,
                SUBSTR(nrm, UNNEST(RANGE(1,
                    GREATEST(LENGTH(nrm) - {shingle_k - 1}, 1) + 1)),
                    {shingle_k}) AS s
            FROM norm
        ), based AS (
            SELECT id,
                ('0x' || SUBSTR(MD5(s), 1, 15))::BIGINT % {_MERSENNE} AS h
            FROM sh
        ), sig AS {mat}(
            SELECT id,
                {sig_mins}
            FROM based GROUP BY id
        ), buckets AS (
            {band_rows}
        ), capped AS {mat}(
            SELECT * FROM (
                SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bs
                FROM buckets
            ) WHERE bs <= {max_bucket}
        )"""


def _incremental_near_oracle(
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 8,
    max_bucket: int = 1000,
) -> str:
    """Replays dedup/incremental.py incremental_near_ingest (portable):
    corpus = source<>'src7', batch = source='src7'; corpus-bucket cap →
    corpus⋈batch estimator probe → batch star edges (survivor-side cap) →
    recursive-CTE closure → per-batch-doc verdicts."""
    agree = _minhash_agree(num_hashes)
    return f"""
        WITH RECURSIVE {_minhash_cte_prefix(shingle_k, num_hashes, bands, max_bucket)},
        corpus_ids AS (
            SELECT doc_id AS id FROM documents WHERE source <> 'src7'
        ), batch_ids AS (
            SELECT doc_id AS id FROM documents WHERE source = 'src7'
        ), corpus_b AS (
            SELECT b.* FROM buckets b JOIN corpus_ids USING (id)
        ), batch_b AS (
            SELECT b.* FROM buckets b JOIN batch_ids USING (id)
        ), corpus_capped AS (
            SELECT * FROM (
                SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS cbs
                FROM corpus_b
            ) WHERE cbs <= {max_bucket}
        ), corpus_dups AS (
            SELECT DISTINCT bb.id
            FROM corpus_capped cb
            JOIN batch_b bb ON cb.band = bb.band AND cb.bucket = bb.bucket
            JOIN sig sa ON sa.id = cb.id
            JOIN sig sb ON sb.id = bb.id
            WHERE ({agree}) / {float(num_hashes)} >= {threshold}
        ), surv_b AS (
            SELECT * FROM batch_b
            WHERE id NOT IN (SELECT id FROM corpus_dups)
        ), surv_capped AS (
            SELECT * FROM (
                SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS sbs
                FROM surv_b
            ) WHERE sbs <= {max_bucket}
        ), anch AS (
            SELECT band, bucket, MIN(id) AS aid
            FROM surv_capped GROUP BY band, bucket
        ), edges AS (
            SELECT DISTINCT a.aid AS id_a, c.id AS id_b
            FROM anch a
            JOIN surv_capped c ON a.band = c.band AND a.bucket = c.bucket
                              AND c.id > a.aid
            JOIN sig sa ON sa.id = a.aid
            JOIN sig sb ON sb.id = c.id
            WHERE ({agree}) / {float(num_hashes)} >= {threshold}
        ), sym AS (
            SELECT id_a AS src, id_b AS dst FROM edges
            UNION ALL
            SELECT id_b AS src, id_a AS dst FROM edges
        ), verts AS (
            SELECT DISTINCT src AS id FROM sym
        ), reach(root, node) AS (
            SELECT id, id FROM verts
            UNION
            SELECT reach.root, sym.dst
            FROM reach JOIN sym ON sym.src = reach.node
        ), comp AS (
            SELECT root AS id, MIN(node) AS component FROM reach GROUP BY root
        )
        SELECT b.id AS doc_id,
            CASE WHEN cd.id IS NOT NULL THEN FALSE
                 ELSE COALESCE(c.component, b.id) = b.id END AS kept,
            CASE WHEN cd.id IS NOT NULL THEN 'corpus_near_dup'
                 WHEN COALESCE(c.component, b.id) = b.id THEN 'kept'
                 ELSE 'batch_near_dup' END AS reason
        FROM batch_ids b
        LEFT JOIN corpus_dups cd ON cd.id = b.id
        LEFT JOIN comp c ON c.id = b.id
        ORDER BY b.id
    """


def _minhash_agree(num_hashes: int) -> str:
    return "\n                + ".join(
        f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )


def _minhash_oracle(
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 8,
    max_bucket: int = 1000,
) -> str:
    """Replays dedup/minhash.py minhash_near_dups (portable estimate path):
    all same-bucket pairs, estimator verify; the estimator's k/num_hashes
    division is exact (dyadic)."""
    agree = _minhash_agree(num_hashes)
    return f"""
        WITH {_minhash_cte_prefix(shingle_k, num_hashes, bands, max_bucket)},
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM capped a
            JOIN capped b ON a.band = b.band AND a.bucket = b.bucket
                         AND a.id < b.id
        )
        SELECT id_a, id_b,
            ({agree}) / {float(num_hashes)} AS jaccard
        FROM cand
        JOIN sig sa ON sa.id = id_a
        JOIN sig sb ON sb.id = id_b
        WHERE ({agree}) / {float(num_hashes)} >= {threshold}
    """


def _minhash_star_oracle(
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 8,
    max_bucket: int = 1000,
) -> str:
    """Replays dedup/minhash.py minhash_star_edges (portable): per capped
    band bucket only the (min-id anchor, member) edges, estimator verify."""
    agree = _minhash_agree(num_hashes)
    return f"""
        WITH {_minhash_cte_prefix(shingle_k, num_hashes, bands, max_bucket)},
        anch AS (
            SELECT band, bucket, MIN(id) AS aid
            FROM capped GROUP BY band, bucket
        ), cand AS (
            SELECT DISTINCT a.aid AS id_a, c.id AS id_b
            FROM anch a
            JOIN capped c ON a.band = c.band AND a.bucket = c.bucket
                         AND c.id > a.aid
        )
        SELECT id_a, id_b,
            ({agree}) / {float(num_hashes)} AS jaccard
        FROM cand
        JOIN sig sa ON sa.id = id_a
        JOIN sig sb ON sb.id = id_b
        WHERE ({agree}) / {float(num_hashes)} >= {threshold}
    """


def _embedding_oracle(
    threshold: float = 0.3,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    extra_planes: int = 16,
    max_bucket: int = 256,
) -> str:
    """Replays dedup/embedding.py in DuckDB SQL: the seeded hyperplanes are
    inlined as literal DOUBLE[] constants (full-precision repr → exact same
    doubles), sign bits pack MSB-first exactly like the Spark UDF, the
    adaptive bucket split (base bits; full bits when the base bucket
    exceeds max_bucket) is replayed with the same disjoint key spaces, and
    the cosine verify mirrors the engine's dot/(|a||b|) formula."""
    from flink_1_3_2_hopsworks_spark.dedup.embedding import (
        hyperplane_bit_terms_sql,
        hyperplanes,
    )

    total = num_planes + extra_planes
    bit_terms = hyperplane_bit_terms_sql(hyperplanes(dim, total, seed))
    return f"""
        WITH vecs AS (
            SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
        ), sig AS (
            SELECT id, v,
                {bit_terms}
                AS s
            FROM vecs
        ), based AS (
            SELECT id, v, s, s >> {extra_planes} AS b FROM sig
        ), cnt AS (
            SELECT b, COUNT(*) AS c FROM based GROUP BY b
        ), keyed AS (
            SELECT id, v,
                CASE WHEN c > {max_bucket} THEN s
                     ELSE b + {1 << total} END AS k
            FROM based JOIN cnt USING (b)
        ), pairs AS (
            SELECT a.id AS id_a, b.id AS id_b,
                ROUND(
                    LIST_INNER_PRODUCT(a.v, b.v)
                    / (SQRT(LIST_INNER_PRODUCT(a.v, a.v))
                       * SQRT(LIST_INNER_PRODUCT(b.v, b.v))),
                    4
                ) AS cosine
            FROM keyed a JOIN keyed b ON a.k = b.k AND a.id < b.id
        )
        SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= {threshold}
    """


def _embedding_recall_oracle(
    threshold: float = 0.3,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    num_sets: int = 3,
    extra_planes: int = 16,
    max_bucket: int = 256,
) -> str:
    """Replays embedding_near_dups_amplified + the brute-force truth set:
    one sig/base/cnt/keyed CTE chain PER plane set (seeds seed…seed+sets-1,
    planes inlined as literals), candidates unioned and deduped, exact
    cosine verify, and the recall division — all with the same arithmetic
    as the Spark plan."""
    from flink_1_3_2_hopsworks_spark.dedup.embedding import (
        hyperplane_bit_terms_sql,
        hyperplanes,
    )

    total = num_planes + extra_planes
    set_ctes, set_sel = [], []
    for s in range(num_sets):
        bit_terms = hyperplane_bit_terms_sql(hyperplanes(dim, total, seed + s))
        set_ctes.append(
            f"""sig{s} AS (
            SELECT id, v,
                {bit_terms}
                AS s
            FROM vecs
        ), based{s} AS (
            SELECT id, s, s >> {extra_planes} AS b FROM sig{s}
        ), cnt{s} AS (
            SELECT b, COUNT(*) AS c FROM based{s} GROUP BY b
        ), keyed{s} AS (
            SELECT id,
                CASE WHEN c > {max_bucket} THEN s
                     ELSE b + {1 << total} END AS k
            FROM based{s} JOIN cnt{s} USING (b)
        )"""
        )
        set_sel.append(
            f"SELECT a.id AS id_a, b.id AS id_b FROM keyed{s} a "
            f"JOIN keyed{s} b ON a.k = b.k AND a.id < b.id"
        )
    cos = (
        "ROUND(LIST_INNER_PRODUCT(a.v, b.v)"
        " / (SQRT(LIST_INNER_PRODUCT(a.v, a.v))"
        " * SQRT(LIST_INNER_PRODUCT(b.v, b.v))), 4)"
    )
    return f"""
        WITH vecs AS (
            SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
        ), {", ".join(set_ctes)}, cand AS (
            SELECT DISTINCT id_a, id_b FROM (
                {" UNION ALL ".join(set_sel)}
            )
        ), found AS (
            SELECT c.id_a, c.id_b FROM cand c
            JOIN vecs a ON a.id = c.id_a
            JOIN vecs b ON b.id = c.id_b
            WHERE {cos} >= {threshold}
        ), truth AS (
            SELECT a.id AS id_a, b.id AS id_b
            FROM vecs a JOIN vecs b ON a.id < b.id
            WHERE {cos} >= {threshold}
        )
        SELECT
            (SELECT COUNT(*) FROM truth) AS n_true,
            (SELECT COUNT(*) FROM found) AS n_found,
            ROUND(
                CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN 1.0
                     ELSE (SELECT COUNT(*) FROM found)::DOUBLE
                          / (SELECT COUNT(*) FROM truth)
                END, 4
            ) AS recall
    """


def _near_dedup_oracle(edge_sql: str | None = None) -> str:
    """pipe_near_dedup[_pairs]: a portable minhash edge oracle (the pair
    oracle by default — the audit gate; the star-edge oracle for the
    default linear pipeline) feeds a recursive-CTE transitive closure —
    MIN(reachable id) per vertex is exactly the label-propagation fixpoint
    the Spark side iterates to."""
    return f"""
        WITH RECURSIVE pairs AS (
            {edge_sql or _minhash_oracle()}
        ), sym AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL
            SELECT id_b AS src, id_a AS dst FROM pairs
        ), verts AS (
            SELECT DISTINCT src AS id FROM sym
        ), reach(root, node) AS (
            SELECT id, id FROM verts
            UNION
            SELECT reach.root, sym.dst
            FROM reach JOIN sym ON sym.src = reach.node
        ), comp AS (
            SELECT root AS id, MIN(node) AS component FROM reach GROUP BY root
        )
        SELECT d.doc_id,
            CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS canonical_id,
            COALESCE(c.component, d.doc_id) = d.doc_id AS kept
        FROM documents d
        LEFT JOIN comp c ON c.id = d.doc_id
        ORDER BY d.doc_id
    """


def _semantic_dedup_oracle(threshold: float = 0.40) -> str:
    """SemDeDup oracle: frozen-centroid assignment (same literals as the
    Spark expression) -> within-cell pairs -> recursive-CTE transitive
    closure -> min-id canonical per group, one row per embedding."""
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import (
        FROZEN_CENTROIDS,
    )

    values = ",\n                ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(FROZEN_CENTROIDS)
    )
    return f"""
        WITH RECURSIVE cent(cell, cv) AS (
            VALUES {values}
        ), vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), assigned AS (
            SELECT vec_id, v, cell FROM (
                SELECT vec_id, v, cell, ROW_NUMBER() OVER (
                    PARTITION BY vec_id
                    ORDER BY LIST_COSINE_SIMILARITY(v, cv) DESC, cell ASC
                ) AS rn
                FROM vecs CROSS JOIN cent
            ) WHERE rn = 1
        ), pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM assigned a JOIN assigned b
                ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 4) >= {threshold}
        ), sym AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL
            SELECT id_b AS src, id_a AS dst FROM pairs
        ), verts AS (
            SELECT DISTINCT src AS id FROM sym
        ), reach(root, node) AS (
            SELECT id, id FROM verts
            UNION
            SELECT reach.root, sym.dst
            FROM reach JOIN sym ON sym.src = reach.node
        ), comp AS (
            SELECT root AS id, MIN(node) AS component FROM reach GROUP BY root
        )
        SELECT e.vec_id,
            CAST(COALESCE(c.component, e.vec_id) AS BIGINT) AS canonical_id,
            COALESCE(c.component, e.vec_id) = e.vec_id AS kept
        FROM embeddings e
        LEFT JOIN comp c ON c.id = e.vec_id
        ORDER BY e.vec_id
    """


ORACLE: dict[str, str] = {
    "dd_simhash_pairs": _simhash_oracle(),
    "dd_simhash_stars": _simhash_oracle(mode="stars"),
    "pipe_near_dedup": _near_dedup_oracle(_minhash_star_oracle()),
    "pipe_near_dedup_pairs": _near_dedup_oracle(),
    "pipe_incremental_near_ingest": _incremental_near_oracle(),
    "text_normalize_unicode": """
        WITH aug AS (
            SELECT doc_id,
                text || ' cafe' || chr(769) || ' A' || chr(778) AS t
            FROM documents
        )
        SELECT doc_id,
            nfc_normalize(t) AS text_nfc,
            LENGTH(t) - LENGTH(nfc_normalize(t)) AS chars_composed
        FROM aug
    """,
    "dd_minhash_pairs": _minhash_oracle(),
    "dd_embedding_pairs": _embedding_oracle(),
    "dd_embedding_recall": _embedding_recall_oracle(),
    "dd_semantic_dedup": _semantic_dedup_oracle(),
    "text_lang_id": _lang_id_oracle(),
    "dd_exact_dedup": """
        SELECT
            MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS fp,
            MIN(doc_id) AS doc_id,
            COUNT(*) AS group_size
        FROM documents
        GROUP BY 1
    """,
    "pipe_incremental_ingest": """
        WITH newb AS (
            SELECT doc_id,
                MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents WHERE source <> 'src0'
        ), store AS (
            SELECT DISTINCT
                MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents WHERE source = 'src0'
        )
        SELECT MIN(n.doc_id) AS doc_id, n.fp, COUNT(*) AS batch_dups
        FROM newb n
        WHERE n.fp NOT IN (SELECT fp FROM store)
        GROUP BY n.fp
    """,
    "pipe_quality_filter": """
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
        ), scored AS (
            SELECT
                doc_id,
                ROUND(
                    0.4 * LEAST(n_tok / 50.0, 1.0)
                    + 0.3 * (CASE WHEN awl >= 3.0 AND awl <= 8.0 THEN 1.0 ELSE 0.5 END)
                    + 0.3 * GREATEST(0.0, 1.0 - punct * 5.0),
                4) AS quality
            FROM stats
        ), thr AS (
            SELECT COALESCE(
                CAST(ROUND(QUANTILE_CONT(quality, 0.5), 4) AS DOUBLE),
                '-infinity'::DOUBLE)
                AS threshold
            FROM scored
            WHERE ('0x' || SUBSTR(MD5(CONCAT_WS('|',
                    CAST(doc_id AS VARCHAR), 'qq42')), 1, 8))::BIGINT
                < 858993459
        )
        SELECT s.doc_id, s.quality, t.threshold
        FROM scored s CROSS JOIN thr t
        WHERE s.quality >= t.threshold
    """,
    "text_chunk_documents": """
        WITH base AS (
            SELECT doc_id,
                LIST_FILTER(STRING_SPLIT_REGEX(TRIM(COALESCE(text, '')),
                                               '\\s+'),
                            t -> t <> '') AS tk
            FROM documents
        ), sized AS (
            SELECT doc_id, tk, LEN(tk) AS n FROM base
        ), chunks AS (
            SELECT doc_id, s // 24 AS chunk_id, tk[s + 1 : s + 32] AS ck
            FROM sized,
                UNNEST(RANGE(0, GREATEST(n - 8 - 1, 0) + 1, 24)) AS t(s)
        )
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
            ARRAY_TO_STRING(ck, ' ') AS chunk_text,
            CAST(LEN(ck) AS BIGINT) AS n_tokens
        FROM chunks
        ORDER BY doc_id, chunk_id
    """,
    "pipe_token_mixture": """
        WITH toks AS (
            SELECT doc_id, lang,
                CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                     ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+'))
                END AS n_tok
            FROM documents
        ), tgt AS (
            SELECT * FROM (VALUES
                ('en', 0.4), ('de', 0.2), ('es', 0.2), ('fr', 0.2)
            ) t(lang, target)
        ), totals AS (
            SELECT k.lang, SUM(CAST(k.n_tok AS DOUBLE)) AS tt,
                ANY_VALUE(g.target) AS target
            FROM toks k JOIN tgt g ON k.lang = g.lang
            GROUP BY k.lang
        ), ratios AS (
            SELECT lang,
                target / (tt / SUM(tt) OVER ()) AS ratio
            FROM totals
        ), rates AS (
            SELECT lang, ROUND(ratio / MAX(ratio) OVER (), 6) AS rate
            FROM ratios
        )
        SELECT d.doc_id, d.lang, CAST(d.n_tok AS BIGINT) AS n_tokens, r.rate
        FROM toks d JOIN rates r ON d.lang = r.lang
        WHERE ('0x' || SUBSTR(MD5(CONCAT_WS('|',
                CAST(d.doc_id AS VARCHAR), 'tm42')), 1, 8))::BIGINT
            < r.rate * 4294967296.0
        ORDER BY d.doc_id
    """,
    "pipe_token_budget": """
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
        ), scored AS (
            SELECT
                doc_id,
                ROUND(
                    0.4 * LEAST(n_tok / 50.0, 1.0)
                    + 0.3 * (CASE WHEN awl >= 3.0 AND awl <= 8.0 THEN 1.0 ELSE 0.5 END)
                    + 0.3 * GREATEST(0.0, 1.0 - punct * 5.0),
                4) AS quality,
                CAST(n_tok AS BIGINT) AS n_tokens
            FROM stats
        ), buckets AS (
            SELECT quality, SUM(n_tokens) AS btok
            FROM scored
            WHERE ('0x' || SUBSTR(MD5(CONCAT_WS('|',
                    CAST(doc_id AS VARCHAR), 'tb42')), 1, 8))::BIGINT
                < 858993459
            GROUP BY quality
        ), runs AS (
            SELECT quality,
                SUM(btok) OVER (ORDER BY quality DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM buckets
        ), thr AS (
            SELECT MIN(quality) AS threshold FROM runs WHERE cum <= 4600.0
        )
        SELECT s.doc_id, s.quality, s.n_tokens, t.threshold
        FROM scored s CROSS JOIN thr t
        WHERE s.quality >= t.threshold
        ORDER BY s.doc_id
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
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
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
    "text_pii_redact": """
        SELECT doc_id,
            MD5(red) AS redacted_fp,
            LENGTH(red) <> LENGTH(text) AS was_redacted
        FROM (
            SELECT doc_id, text,
                REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                    '<EMAIL>', 'g'),
                    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                    '<IP>', 'g'),
                    '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b',
                    '<PHONE>', 'g') AS red
            FROM documents
        )
    """,
    "text_pack_sequences": """
        WITH t AS (
            SELECT lang, doc_id,
                CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                     ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+'))
                     END AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT lang, doc_id, n_tokens,
            CAST(FLOOR(
                (SUM(n_tokens) OVER (
                    PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) - n_tokens) / 2048.0
            ) AS BIGINT) AS bin_id
        FROM t
    """,
    "pipe_corpus_clean": """
        WITH stats AS (
            SELECT
                doc_id, text,
                CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                     ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) END AS n_tok,
                CASE WHEN LENGTH(text) = 0 THEN 0.0
                     ELSE CAST(LENGTH(REGEXP_REPLACE(text, '[^.,;:!?()''"-]', '', 'g')) AS DOUBLE)
                          / LENGTH(text) END AS punct,
                CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0.0
                     ELSE CAST(LENGTH(REGEXP_REPLACE(TRIM(text), '\\s+', '', 'g')) AS DOUBLE)
                          / LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) END AS awl
            FROM documents
        ), kept AS (
            SELECT doc_id, text FROM stats
            WHERE ROUND(
                    0.4 * LEAST(n_tok / 50.0, 1.0)
                    + 0.3 * (CASE WHEN awl >= 3.0 AND awl <= 8.0
                             THEN 1.0 ELSE 0.5 END)
                    + 0.3 * GREATEST(0.0, 1.0 - punct * 5.0),
                  4) >= 0.8
              AND n_tok >= 20
        )
        SELECT
            MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS fp,
            MIN(doc_id) AS doc_id,
            COUNT(*) AS group_size
        FROM kept
        GROUP BY 1
    """,
    "text_tfidf_top_terms": """
        WITH toks AS (
            SELECT doc_id,
                UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks WHERE term <> ''
            GROUP BY 1, 2
        ), dfreq AS (
            SELECT term, COUNT(*) AS dfr FROM tf GROUP BY 1
        ), nd AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
        ), scored AS (
            SELECT tf.doc_id, tf.term, tf.tf,
                tf.tf * (LN(((SELECT n FROM nd) + 1.0) / (dfr + 1.0)) + 1.0)
                    AS tfidf
            FROM tf JOIN dfreq USING (term)
        ), ranked AS (
            SELECT doc_id, term, tf, tfidf,
                CAST(ROW_NUMBER() OVER (
                    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
                ) AS INTEGER) AS rank
            FROM scored
        )
        SELECT doc_id, term, tf,
            CAST(ROUND(tfidf, 4) AS DOUBLE) AS tfidf, rank
        FROM ranked WHERE rank <= 3
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
    "text_vocab_top_terms": """
        WITH toks AS (
            SELECT doc_id,
                UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) AS term
            FROM documents
        )
        SELECT term,
            CAST(COUNT(*) AS BIGINT) AS tf,
            CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM toks WHERE term <> ''
        GROUP BY term
        ORDER BY tf DESC, term ASC
        LIMIT 200
    """,
    "mm_binary_stats": """
        SELECT doc_id,
            CAST(OCTET_LENGTH(ENCODE(text)) AS INTEGER) AS n_bytes,
            MD5(text) AS digest
        FROM documents
    """,
    # 5-word-gram overlap vs the source='src0' benchmark slice. i ranges
    # 1..len-4 (RANGE upper bound is exclusive); toks[i:i+4] is DuckDB's
    # 1-based inclusive list slice = 5 tokens.
    "text_decontaminate": """
        WITH tok AS (
            SELECT doc_id, source,
                STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+') AS toks
            FROM documents
        ),
        bg AS (
            SELECT DISTINCT ARRAY_TO_STRING(toks[i:i+4], ' ') AS gram
            FROM (
                SELECT toks, UNNEST(RANGE(1, LEN(toks) - 3)) AS i
                FROM tok WHERE source = 'src0' AND LEN(toks) >= 5
            )
        ),
        cg AS (
            SELECT DISTINCT doc_id,
                ARRAY_TO_STRING(toks[i:i+4], ' ') AS gram
            FROM (
                SELECT doc_id, toks, UNNEST(RANGE(1, LEN(toks) - 3)) AS i
                FROM tok WHERE source <> 'src0' AND LEN(toks) >= 5
            )
        ),
        hits AS (
            SELECT doc_id, COUNT(*) AS n_hits
            FROM cg JOIN bg USING (gram) GROUP BY doc_id
        )
        SELECT d.doc_id,
            CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
            COALESCE(h.n_hits, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.source <> 'src0'
    """,
    "text_repetition_stats": """
        WITH tok AS (
            SELECT doc_id,
                STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+') AS toks
            FROM documents
        ),
        base AS (
            SELECT doc_id, LEN(toks) AS n_tokens,
                LEN(LIST_DISTINCT(toks)) AS n_distinct
            FROM tok
        ),
        bigrams AS (
            SELECT doc_id, ARRAY_TO_STRING(toks[i:i+1], ' ') AS gram
            FROM (
                SELECT doc_id, toks, UNNEST(RANGE(1, LEN(toks))) AS i
                FROM tok WHERE LEN(toks) >= 2
            )
        ),
        per_gram AS (
            SELECT doc_id, gram, COUNT(*) AS c
            FROM bigrams GROUP BY doc_id, gram
        ),
        top AS (
            SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bigrams
            FROM per_gram GROUP BY doc_id
        )
        SELECT b.doc_id,
            CAST(b.n_tokens AS INTEGER) AS n_tokens,
            ROUND(CAST(b.n_tokens - b.n_distinct AS DOUBLE) / b.n_tokens,
                  6) AS dup_token_ratio,
            COALESCE(ROUND(CAST(t.top_c AS DOUBLE) / t.n_bigrams, 6),
                     0.0) AS top_bigram_ratio
        FROM base b LEFT JOIN top t USING (doc_id)
    """,
    "text_unigram_rarity": """
        WITH toks AS (
            SELECT doc_id,
                UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) AS term
            FROM documents
        ),
        t2 AS (SELECT * FROM toks WHERE term <> ''),
        freq AS (SELECT term, COUNT(*) AS cnt FROM t2 GROUP BY term),
        tot AS (SELECT COUNT(*) AS total FROM t2),
        per AS (
            SELECT doc_id, SUM(cnt) AS s, COUNT(*) AS n
            FROM t2 JOIN freq USING (term) GROUP BY doc_id
        )
        SELECT doc_id,
            CAST(n AS BIGINT) AS n_tokens,
            ROUND(CAST(s AS DOUBLE) / (CAST(total AS DOUBLE) * n)
                  * 1000000.0, 4) AS token_ppm
        FROM per CROSS JOIN tot
    """,
    # en threshold = int(0.35 * 2^32); everything else keeps rate 1.0.
    "pipe_lang_mixture": """
        SELECT doc_id, lang, source FROM documents
        WHERE ('0x' || SUBSTR(MD5(CONCAT_WS('|',
                   CAST(doc_id AS VARCHAR), 'm42')), 1, 8))::BIGINT
            < CASE WHEN lang = 'en' THEN 1503238553 ELSE 4294967296 END
    """,
    "pipe_dataset_card": """
        WITH marked AS (
            SELECT doc_id, lang,
                CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                     ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) END AS tok,
                LENGTH(text) AS chars,
                COUNT(*) OVER (
                    PARTITION BY MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g'))
                ) > 1 AS is_dup
            FROM documents
        )
        SELECT lang,
            CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(tok) AS BIGINT) AS total_tokens,
            CAST(SUM(chars) AS BIGINT) AS total_chars,
            CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
            ROUND(CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
                  / COUNT(*), 6) AS dup_ratio
        FROM marked GROUP BY lang
    """,
    # 8-token sliding windows; a window's span is [p, p+7]. Coverage is the
    # classic ordered-running-max interval union. Spark keys by xxhash64 of
    # the gram; the oracle groups by the gram string itself — identical
    # results absent 64-bit collisions (~1e-10 expected rows at gate scale).
    "text_dup_span_stats": """
        WITH base AS (
            SELECT doc_id,
                LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))),
                                               '\\s+'),
                            t -> t <> '') AS tk
            FROM documents
        ),
        sized AS (SELECT doc_id, tk, LEN(tk) AS n FROM base),
        wins AS (
            SELECT doc_id, i AS p,
                ARRAY_TO_STRING(tk[i + 1 : i + 8], ' ') AS gram
            FROM sized, UNNEST(RANGE(0, n - 7)) AS t(i)
        ),
        cnts AS (SELECT gram FROM wins GROUP BY gram HAVING COUNT(*) > 1),
        flagged AS (SELECT w.doc_id, w.p FROM wins w JOIN cnts USING (gram)),
        cov AS (
            SELECT doc_id,
                GREATEST(0, (p + 7) - GREATEST(p - 1,
                    COALESCE(MAX(p + 7) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1))) AS cadd
            FROM flagged
        ),
        agg AS (
            SELECT doc_id, COUNT(*) AS hits, SUM(cadd) AS covered
            FROM cov GROUP BY doc_id
        )
        SELECT s.doc_id,
            CAST(s.n AS BIGINT) AS n_tokens,
            CAST(COALESCE(a.hits, 0) AS BIGINT) AS dup_windows,
            CAST(COALESCE(a.covered, 0) AS BIGINT) AS covered_tokens,
            CASE WHEN s.n = 0 THEN 0.0
                 ELSE ROUND(CAST(COALESCE(a.covered, 0) AS DOUBLE) / s.n, 4)
            END AS covered_frac
        FROM sized s LEFT JOIN agg a USING (doc_id)
    """,
    "text_dup_span_removal": """
        WITH base AS (
            SELECT doc_id,
                LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))),
                                               '\\s+'),
                            t -> t <> '') AS tk
            FROM documents
        ),
        sized AS (SELECT doc_id, tk, LEN(tk) AS n FROM base),
        wins AS (
            SELECT doc_id, i AS p,
                ARRAY_TO_STRING(tk[i + 1 : i + 8], ' ') AS gram
            FROM sized, UNNEST(RANGE(0, n - 7)) AS t(i)
        ),
        owners AS (
            SELECT gram, MIN(doc_id) AS owner FROM wins
            GROUP BY gram HAVING COUNT(*) > 1
        ),
        losing AS (
            SELECT w.doc_id, w.p FROM wins w JOIN owners o USING (gram)
            WHERE w.doc_id > o.owner
        ),
        drop_pos AS (
            SELECT DISTINCT doc_id, p + i AS pos
            FROM losing, UNNEST(RANGE(0, 8)) AS t(i)
        ),
        tokpos AS (
            SELECT doc_id, i - 1 AS pos, tk[i] AS tok
            FROM sized, UNNEST(RANGE(1, n + 1)) AS t(i)
        ),
        kept AS (
            SELECT t.doc_id, t.pos, t.tok
            FROM tokpos t LEFT JOIN drop_pos d
                ON t.doc_id = d.doc_id AND t.pos = d.pos
            WHERE d.pos IS NULL
        ),
        rebuilt AS (
            SELECT doc_id, STRING_AGG(tok, ' ' ORDER BY pos) AS clean_text,
                COUNT(*) AS n_kept
            FROM kept GROUP BY doc_id
        )
        SELECT s.doc_id,
            COALESCE(r.clean_text, '') AS clean_text,
            CAST(s.n - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
        FROM sized s LEFT JOIN rebuilt r USING (doc_id)
    """,
    "text_boilerplate_removal": """
        WITH base AS (
            SELECT doc_id,
                LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))),
                                               '\\s+'),
                            t -> t <> '') AS tk
            FROM documents
        ),
        sized AS (SELECT doc_id, tk, LEN(tk) AS n FROM base),
        wins AS (
            SELECT doc_id, i AS p,
                ARRAY_TO_STRING(tk[i + 1 : i + 8], ' ') AS gram
            FROM sized, UNNEST(RANGE(0, n - 7)) AS t(i)
        ),
        boiler AS (
            SELECT gram FROM wins
            GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 3
        ),
        losing AS (
            SELECT w.doc_id, w.p FROM wins w JOIN boiler USING (gram)
        ),
        drop_pos AS (
            SELECT DISTINCT doc_id, p + i AS pos
            FROM losing, UNNEST(RANGE(0, 8)) AS t(i)
        ),
        tokpos AS (
            SELECT doc_id, i - 1 AS pos, tk[i] AS tok
            FROM sized, UNNEST(RANGE(1, n + 1)) AS t(i)
        ),
        kept AS (
            SELECT t.doc_id, t.pos, t.tok
            FROM tokpos t LEFT JOIN drop_pos d
                ON t.doc_id = d.doc_id AND t.pos = d.pos
            WHERE d.pos IS NULL
        ),
        rebuilt AS (
            SELECT doc_id, STRING_AGG(tok, ' ' ORDER BY pos) AS clean_text,
                COUNT(*) AS n_kept
            FROM kept GROUP BY doc_id
        )
        SELECT s.doc_id,
            COALESCE(r.clean_text, '') AS clean_text,
            CAST(s.n - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
        FROM sized s LEFT JOIN rebuilt r USING (doc_id)
    """,
    "pipe_shuffle_shard": """
        WITH hashed AS (
            SELECT doc_id, lang,
                MD5(CONCAT_WS('|', CAST(doc_id AS VARCHAR), 'ep0')) AS h
            FROM documents
        ), sharded AS (
            SELECT doc_id, lang, h,
                CAST(('0x' || SUBSTR(h, 1, 8))::BIGINT % 8 AS INTEGER)
                    AS shard
            FROM hashed
        )
        SELECT doc_id, lang, shard,
            ROW_NUMBER() OVER (
                PARTITION BY shard ORDER BY h, doc_id
            ) AS pos
        FROM sharded
    """,
}


def _gopher_oracle(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mwl: float = 3.0,
    max_mwl: float = 10.0,
    max_sym: float = 0.1,
    min_alpha: float = 0.8,
    min_hits: int = 2,
) -> str:
    """Replays functions/text.py gopher_quality_rules (gate parameterization:
    the engine's en stopword list) — every rule column and the conjunction."""
    from flink_1_3_2_hopsworks_spark.functions.text import STOPWORDS

    words = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    kept = (
        f"(n >= {min_words} AND n <= {max_words}) "
        f"AND (mwl >= {min_mwl} AND mwl <= {max_mwl}) "
        f"AND symr <= {max_sym} AND alphaf >= {min_alpha} "
        f"AND hits >= {min_hits}"
    )
    return f"""
        WITH t AS (
            SELECT doc_id, COALESCE(text, '') AS text,
                CASE WHEN LENGTH(TRIM(LOWER(COALESCE(text, '')))) = 0 THEN []
                     ELSE STRING_SPLIT_REGEX(TRIM(LOWER(COALESCE(text, ''))), '\\s+')
                END AS tk
            FROM documents
        ), m AS (
            SELECT doc_id, LEN(tk) AS n,
                CASE WHEN LEN(tk) = 0 THEN 0.0
                     ELSE LIST_SUM(LIST_TRANSFORM(tk, x -> LENGTH(x))) * 1.0
                          / LEN(tk) END AS mwl,
                CASE WHEN LEN(tk) = 0 THEN 0.0
                     ELSE (LENGTH(REGEXP_REPLACE(text, '[^#…]', '', 'g'))
                           + LEN(REGEXP_EXTRACT_ALL(text, '\\.{{3}}'))) * 1.0
                          / LEN(tk) END AS symr,
                CASE WHEN LEN(tk) = 0 THEN 0.0
                     ELSE LEN(LIST_FILTER(tk, x -> REGEXP_MATCHES(x, '[a-z]')))
                          * 1.0 / LEN(tk) END AS alphaf,
                LEN(LIST_FILTER([{words}], w -> LIST_CONTAINS(tk, w))) AS hits
            FROM t
        )
        SELECT doc_id,
            CAST(n AS BIGINT) AS n_words,
            ROUND(mwl, 4) AS mean_word_len,
            ROUND(symr, 4) AS symbol_ratio,
            ROUND(alphaf, 4) AS alpha_word_frac,
            CAST(hits AS BIGINT) AS n_stop_hits,
            n >= {min_words} AND n <= {max_words} AS ok_words,
            mwl >= {min_mwl} AND mwl <= {max_mwl} AS ok_word_len,
            symr <= {max_sym} AS ok_symbols,
            alphaf >= {min_alpha} AS ok_alpha,
            hits >= {min_hits} AS ok_stopwords,
            {kept} AS kept
        FROM m
    """


def _ngram_novelty_oracle(n: int = 8) -> str:
    """Replays functions/text.py ngram_novelty with grams as STRINGS (the
    engine keys on xxhash64 of the gram; hash equality ≡ string equality
    at gate scale, same argument as the dup-span oracles)."""
    return f"""
        WITH t AS (
            SELECT doc_id,
                LIST_FILTER(
                    STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))), '\\s+'),
                    x -> x <> '') AS tk
            FROM documents
        ), g AS (
            SELECT DISTINCT doc_id,
                ARRAY_TO_STRING(tk[i + 1 : i + {n}], ' ') AS gram
            FROM t, UNNEST(RANGE(0, LEN(tk) - {n} + 1)) AS u(i)
            WHERE LEN(tk) >= {n}
        ), own AS (
            SELECT gram, MIN(doc_id) AS owner FROM g GROUP BY gram
        ), per AS (
            SELECT g.doc_id, COUNT(*) AS n_grams,
                SUM(CASE WHEN o.owner = g.doc_id THEN 1 ELSE 0 END) AS n_novel
            FROM g JOIN own o USING (gram) GROUP BY g.doc_id
        )
        SELECT d.doc_id,
            CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
            CAST(COALESCE(p.n_novel, 0) AS BIGINT) AS n_novel,
            ROUND(CASE WHEN COALESCE(p.n_grams, 0) = 0 THEN 1.0
                  ELSE p.n_novel * 1.0 / p.n_grams END, 4) AS novelty
        FROM documents d LEFT JOIN per p USING (doc_id)
    """


def _linified_sql(punctuate: bool) -> str:
    """The deterministic multi-line twin used by the line-granularity gates
    (mirrors showcase._linified_docs): 12-token lines, optional terminal
    '.' on the 24-token grid."""
    punct = (
        "|| CASE WHEN s % 24 = 0 THEN '.' ELSE '' END" if punctuate else ""
    )
    return f"""lin AS (
            SELECT doc_id,
                ARRAY_TO_STRING(
                    LIST_TRANSFORM(
                        RANGE(0, GREATEST(LEN(tk) - 1, 0) + 1, 12),
                        s -> ARRAY_TO_STRING(tk[s + 1 : s + 12], ' ') {punct}
                    ), chr(10)) AS text
            FROM (
                SELECT doc_id,
                    LIST_FILTER(
                        STRING_SPLIT_REGEX(TRIM(COALESCE(text, '')), '\\s+'),
                        t -> t <> '') AS tk
                FROM documents
            )
        )"""


def _c4_clean_oracle(min_words: int = 5) -> str:
    """Replays functions/text.py clean_lines_c4 over the linified twin."""
    return f"""
        WITH {_linified_sql(punctuate=True)},
        ln AS (
            SELECT doc_id, text, STRING_SPLIT(text, chr(10)) AS lines FROM lin
        ), rules AS (
            SELECT doc_id, lines,
                LIST_FILTER(lines, l ->
                    REGEXP_MATCHES(TRIM(l), '[.!?"]$')
                    AND LEN(LIST_FILTER(
                        STRING_SPLIT_REGEX(TRIM(l), '\\s+'), w -> w <> ''
                    )) >= {min_words}
                    AND NOT CONTAINS(LOWER(l), 'javascript')
                ) AS keptl,
                NOT (CONTAINS(LOWER(text), 'lorem ipsum')
                     OR CONTAINS(text, '{{')) AS doc_kept
            FROM ln
        )
        SELECT doc_id, doc_kept,
            CAST(LEN(lines) AS BIGINT) AS n_lines,
            CAST(CASE WHEN doc_kept THEN LEN(keptl) ELSE 0 END AS BIGINT)
                AS n_lines_kept,
            MD5(CASE WHEN doc_kept
                THEN COALESCE(ARRAY_TO_STRING(keptl, chr(10)), '')
                ELSE '<dropped>' END) AS clean_fp
        FROM rules
    """


def _line_dedup_oracle(min_docs: int = 2, min_chars: int = 1) -> str:
    """Replays functions/text.py remove_duplicate_lines over the linified
    twin, with normalized line STRINGS as keys (engine keys on xxhash64);
    trivial lines (normalized length < min_chars) are exempt."""
    return f"""
        WITH {_linified_sql(punctuate=False)},
        ln AS (
            SELECT doc_id, STRING_SPLIT(text, chr(10)) AS lines FROM lin
        ), ex AS (
            SELECT * FROM (
                SELECT doc_id, i, LOWER(TRIM(lines[i + 1])) AS key
                FROM ln, UNNEST(RANGE(0, LEN(lines))) u(i)
            ) WHERE LENGTH(key) >= {min_chars}
        ), shared AS (
            SELECT key FROM (
                SELECT key, COUNT(DISTINCT doc_id) AS nd FROM ex GROUP BY key
            ) WHERE nd >= {min_docs}
        ), drops AS (
            SELECT e.doc_id, LIST(e.i ORDER BY e.i) AS dr
            FROM ex e JOIN shared s USING (key) GROUP BY e.doc_id
        ), fin AS (
            SELECT l.doc_id, l.lines, COALESCE(d.dr, []) AS dr
            FROM ln l LEFT JOIN drops d USING (doc_id)
        )
        SELECT doc_id,
            CAST(LEN(lines) AS BIGINT) AS n_lines,
            CAST(LEN(dr) AS BIGINT) AS n_removed,
            MD5(COALESCE(ARRAY_TO_STRING(
                LIST_FILTER(lines, (x, i) -> NOT LIST_CONTAINS(dr, i - 1)),
                chr(10)), '')) AS clean_fp
        FROM fin
    """


def _temperature_mixture_oracle(
    temperature: float = 2.0, salt: str = "tt42"
) -> str:
    """Replays operators/sampling.py temperature_resample at the gate's
    T=2 over lang: token totals -> (t_min/t_s)^(1-1/T) rates rounded to
    6 dp -> portable salted draw."""
    exponent = repr(1.0 - 1.0 / float(temperature))
    return f"""
        WITH toks AS (
            SELECT doc_id, lang,
                CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                     ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+'))
                END AS n_tok
            FROM documents
        ), totals AS (
            SELECT lang, SUM(n_tok * 1.0) AS t
            FROM toks GROUP BY lang HAVING SUM(n_tok * 1.0) > 0
        ), rates AS (
            SELECT lang,
                ROUND(POWER((SELECT MIN(t) FROM totals) / t, {exponent}), 6)
                    AS rate
            FROM totals
        )
        SELECT t.doc_id, t.lang, CAST(t.n_tok AS BIGINT) AS n_tokens, r.rate
        FROM toks t JOIN rates r USING (lang)
        WHERE ('0x' || SUBSTR(MD5(CONCAT_WS('|',
                CAST(t.doc_id AS VARCHAR), '{salt}')), 1, 8))::BIGINT
            < r.rate * 4294967296.0
        ORDER BY t.doc_id
    """


ORACLE.update(
    {
        "pipe_gopher_filter": _gopher_oracle(),
        "text_ngram_novelty": _ngram_novelty_oracle(),
        "pipe_c4_clean": _c4_clean_oracle(),
        "text_line_dedup": _line_dedup_oracle(),
        "pipe_temperature_mixture": _temperature_mixture_oracle(),
    }
)


def _prefix_dups_oracle(prefix_k: int = 16, max_bucket: int = 1000) -> str:
    """Replays dedup/prefix.py prefix_containment_pairs over the gate's
    truncated-twin corpus, blocking on the prefix STRING (the engine
    blocks on its xxhash64 — equality is equivalent)."""
    return f"""
        WITH base AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id,
                ARRAY_TO_STRING(
                    (LIST_FILTER(
                        STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'),
                        x -> x <> ''))[1:24], ' ') AS text
            FROM documents WHERE doc_id % 10 = 0
        ), t AS (
            SELECT doc_id AS id,
                LIST_FILTER(
                    STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))), '\\s+'),
                    x -> x <> '') AS tk
            FROM base
        ), k AS (
            SELECT id, tk, LEN(tk) AS n,
                ARRAY_TO_STRING(tk[1:{prefix_k}], ' ') AS pk,
                MD5(ARRAY_TO_STRING(tk, ' ')) AS fp
            FROM t WHERE LEN(tk) >= {prefix_k}
        ), capped AS (
            SELECT * FROM (
                SELECT *, COUNT(*) OVER (PARTITION BY pk) AS bs FROM k
            ) WHERE bs <= {max_bucket}
        )
        SELECT s.id AS id_short, l.id AS id_long,
            CAST(s.n AS BIGINT) AS n_short_tokens
        FROM capped s JOIN capped l ON s.pk = l.pk
            AND (s.n < l.n OR (s.n = l.n AND s.id < l.id))
        WHERE MD5(ARRAY_TO_STRING(l.tk[1:s.n], ' ')) = s.fp
        ORDER BY id_short, id_long
    """


ORACLE["dd_prefix_dups"] = _prefix_dups_oracle()


def _model_quality_oracle(threshold: float = 0.5) -> str:
    """Replays functions/quality_model.py model_quality_filter: portable
    md5 bucket hash, the frozen literal weight array, per-doc mean +
    bias, sigmoid rounded to 6 dp BEFORE the threshold compare."""
    from flink_1_3_2_hopsworks_spark.functions.quality_model import (
        FROZEN_QUALITY_BIAS,
        FROZEN_QUALITY_WEIGHTS,
    )

    n = len(FROZEN_QUALITY_WEIGHTS)
    w = ", ".join(repr(x) for x in FROZEN_QUALITY_WEIGHTS)
    return f"""
        WITH toks AS (
            SELECT doc_id,
                UNNEST(LIST_FILTER(
                    STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))), '\\s+'),
                    x -> x <> '')) AS t
            FROM documents
        ), wtab AS (
            SELECT [{w}]::DOUBLE[] AS w
        ), weighted AS (
            SELECT doc_id,
                w[CAST(('0x' || SUBSTR(MD5(t), 1, 8))::BIGINT % {n} AS INT) + 1]
                    AS tw
            FROM toks, wtab
        ), sums AS (
            SELECT doc_id, SUM(tw) AS sw, COUNT(*) AS nt
            FROM weighted GROUP BY doc_id
        ), scored AS (
            SELECT d.doc_id,
                ROUND(1.0 / (1.0 + EXP(-(COALESCE(s.sw / s.nt, 0.0)
                    + {FROZEN_QUALITY_BIAS!r}))), 6) AS score
            FROM documents d LEFT JOIN sums s USING (doc_id)
        )
        SELECT doc_id, score, score >= {threshold} AS kept FROM scored
    """


ORACLE["pipe_model_quality_filter"] = _model_quality_oracle()


def _oov_rate_oracle(vocab_size: int = 200) -> str:
    """Replays functions/text.py oov_rate: corpus top-k vocabulary (tf
    desc, term asc) then per-doc membership rates."""
    return f"""
        WITH toks AS (
            SELECT doc_id,
                UNNEST(LIST_FILTER(
                    STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))), '\\s+'),
                    x -> x <> '')) AS t
            FROM documents
        ), vocab AS (
            SELECT t FROM (
                SELECT t, COUNT(*) AS tf FROM toks GROUP BY t
            ) ORDER BY tf DESC, t ASC LIMIT {vocab_size}
        ), per AS (
            SELECT tk.doc_id, COUNT(*) AS n_tokens,
                SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS n_oov
            FROM toks tk LEFT JOIN vocab v USING (t)
            GROUP BY tk.doc_id
        )
        SELECT d.doc_id,
            CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
            CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
            ROUND(CASE WHEN COALESCE(p.n_tokens, 0) = 0 THEN 0.0
                  ELSE p.n_oov * 1.0 / p.n_tokens END, 4) AS oov_rate
        FROM documents d LEFT JOIN per p USING (doc_id)
    """


def _corpus_diff_oracle() -> str:
    """Replays the pipe_corpus_diff gate: OLD = all but src7 (src6 text
    suffixed ' v2'), NEW = all but src0; verdict per id by md5 of the
    whitespace-normalized lowercase text."""
    fp = "MD5(REGEXP_REPLACE(LOWER(TRIM({t})), '\\s+', ' ', 'g'))"
    return f"""
        WITH old AS (
            SELECT doc_id,
                {fp.format(t="CASE WHEN source = 'src6' THEN text || ' v2' ELSE text END")}
                AS fo
            FROM documents WHERE source <> 'src7'
        ), new AS (
            SELECT doc_id, {fp.format(t="text")} AS fn
            FROM documents WHERE source <> 'src0'
        )
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
            CASE WHEN o.fo IS NULL THEN 'added'
                 WHEN n.fn IS NULL THEN 'removed'
                 WHEN o.fo = n.fn THEN 'unchanged'
                 ELSE 'changed' END AS status
        FROM old o FULL OUTER JOIN new n USING (doc_id)
        ORDER BY doc_id
    """


ORACLE["text_oov_rate"] = _oov_rate_oracle(vocab_size=16)
ORACLE["pipe_corpus_diff"] = _corpus_diff_oracle()


ORACLE["pipe_lm_perplexity_filter"] = r"""
    WITH base AS (
        SELECT doc_id, lang,
            LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))), '\s+'),
                        x -> x <> '') AS toks
        FROM documents
    ), bg AS (
        SELECT doc_id, lang, toks[i] AS prev, toks[i + 1] AS cur
        FROM base, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks) - 1, 0))) AS u(i)
    ), cbi AS (
        SELECT prev, cur, COUNT(*) AS cbi FROM bg WHERE lang = 'en' GROUP BY 1, 2
    ), cprev AS (
        SELECT prev, COUNT(*) AS cprev FROM bg WHERE lang = 'en' GROUP BY 1
    ), vsz AS (
        SELECT COUNT(DISTINCT t) AS v
        FROM (SELECT UNNEST(toks) AS t FROM base WHERE lang = 'en')
    ), scored AS (
        SELECT g.doc_id,
            ROUND(-LN((COALESCE(b.cbi, 0) + 0.5)
                      / (COALESCE(p.cprev, 0) + 0.5 * v.v)), 6) AS nll
        FROM bg g
        LEFT JOIN cbi b ON g.prev = b.prev AND g.cur = b.cur
        LEFT JOIN cprev p ON g.prev = p.prev
        CROSS JOIN vsz v
    ), per AS (
        SELECT doc_id, COUNT(*) AS n_events,
            SUM(CAST(nll AS DECIMAL(38, 6))) AS s
        FROM scored GROUP BY doc_id
    ), alldocs AS (
        SELECT d.doc_id,
            CAST(COALESCE(p.n_events, 0) AS BIGINT) AS n_events,
            CASE WHEN p.n_events IS NULL THEN 0.0
                 ELSE ROUND(CAST(p.s AS DOUBLE)
                            / (p.n_events * 0.6931471805599453), 4)
            END AS bits_per_token
        FROM documents d LEFT JOIN per p USING (doc_id)
    ), hist AS (
        SELECT bits_per_token AS v, COUNT(*) AS c FROM alldocs GROUP BY 1
    ), cum AS (
        SELECT v, SUM(c) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM hist
    ), thr AS (
        SELECT MIN(CASE WHEN cum >= CEIL(n.n / 3.0) THEN v END) AS t1,
               MIN(CASE WHEN cum >= CEIL(n.n * 2 / 3.0) THEN v END) AS t2
        FROM cum CROSS JOIN (SELECT COUNT(*) AS n FROM alldocs) n
    )
    SELECT a.doc_id, a.n_events, a.bits_per_token,
        CASE WHEN a.bits_per_token <= t.t1 THEN 'head'
             WHEN a.bits_per_token <= t.t2 THEN 'middle'
             ELSE 'tail' END AS bucket,
        (a.bits_per_token <= t.t2) AS kept
    FROM alldocs a CROSS JOIN thr t
    ORDER BY a.doc_id
"""

ORACLE["pipe_dsir_resample"] = r"""
    WITH toks AS (
        SELECT doc_id, lang,
            (('0x' || SUBSTR(MD5(CONCAT_WS('|', t, 'dsir42')), 1, 8))::BIGINT)
                % 256 AS b
        FROM (
            SELECT doc_id, lang,
                UNNEST(LIST_FILTER(
                    STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))), '\s+'),
                    x -> x <> '')) AS t
            FROM documents
        )
    ), cr AS (
        SELECT b, COUNT(*) AS cr FROM toks GROUP BY b
    ), ct AS (
        SELECT b, COUNT(*) AS ct FROM toks WHERE lang = 'en' GROUP BY b
    ), totals AS (
        SELECT (SELECT SUM(cr) FROM cr) AS tr,
               (SELECT COUNT(*) FROM toks WHERE lang = 'en') AS tt
    ), model AS (
        SELECT cr.b,
            ROUND(LN((COALESCE(ct.ct, 0) + 1.0) / (t.tt + 256.0))
                - LN((cr.cr + 1.0) / (t.tr + 256.0)), 6) AS lr
        FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN totals t
    ), per AS (
        SELECT tk.doc_id, COUNT(*) AS n_tokens,
            SUM(CAST(m.lr AS DECIMAL(38, 6))) AS w
        FROM toks tk JOIN model m ON tk.b = m.b
        GROUP BY tk.doc_id
    ), weights AS (
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
            ROUND(CAST(w AS DOUBLE) / n_tokens, 6) AS logratio_per_token
        FROM per
    ), keyed AS (
        SELECT doc_id, n_tokens, logratio_per_token,
            LN((('0x' || SUBSTR(MD5(CONCAT_WS('|',
                CAST(doc_id AS VARCHAR), 'dsir')), 1, 8))::BIGINT + 1)
               / 4294967296.0)
            / EXP(logratio_per_token * n_tokens) AS k
        FROM weights
    )
    SELECT doc_id, n_tokens, logratio_per_token FROM (
        SELECT doc_id, n_tokens, logratio_per_token FROM keyed
        ORDER BY k DESC, doc_id LIMIT 100
    ) ORDER BY doc_id
"""

ORACLE["dd_semantic_contamination"] = """
    WITH p AS (
        SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
        FROM embeddings WHERE vec_id < 10
    ), c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id >= 10
    ), scored AS (
        SELECT c.vec_id, p.probe_id,
            LIST_COSINE_SIMILARITY(p.pv, c.cv) AS cos
        FROM c CROSS JOIN p
    ), ranked AS (
        SELECT vec_id, probe_id, cos,
            ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY cos DESC, probe_id ASC
            ) AS rk
        FROM scored WHERE cos >= 0.30
    )
    SELECT vec_id, probe_id, ROUND(cos, 4) AS cosine
    FROM ranked WHERE rk = 1
    ORDER BY vec_id
"""


from flink_1_3_2_hopsworks_spark.ml.showcase_oracle import bpe_cte as _bpe_cte

ORACLE["text_bpe_tokenize"] = "WITH " + _bpe_cte(6) + r""",
    vocab AS (
        SELECT word, LEN(STRING_SPLIT(seq, ' ')) AS nsym FROM words6
    ), btoks AS (
        SELECT doc_id, UNNEST(LIST_FILTER(
            STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))), '\s+'),
            x -> x <> '')) AS word
        FROM documents
    ), bper AS (
        SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(v.nsym) AS n_bpe
        FROM btoks t JOIN vocab v USING (word) GROUP BY t.doc_id
    )
    SELECT d.doc_id, CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.n_bpe, 0) AS BIGINT) AS n_bpe_symbols
    FROM documents d LEFT JOIN bper p USING (doc_id)
    ORDER BY d.doc_id
"""


def _cluster_balanced_oracle(per_cell: int = 10, salt: str = "cb42") -> str:
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import (
        FROZEN_CENTROIDS,
    )

    values = ",\n                ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(FROZEN_CENTROIDS)
    )
    return f"""
        WITH cent(cell, cv) AS (
            VALUES {values}
        ), vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), assigned AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell, ROW_NUMBER() OVER (
                    PARTITION BY vec_id
                    ORDER BY LIST_COSINE_SIMILARITY(v, cv) DESC, cell ASC
                ) AS rn
                FROM vecs CROSS JOIN cent
            ) WHERE rn = 1
        )
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell, ROW_NUMBER() OVER (
                PARTITION BY cell
                ORDER BY MD5(CONCAT_WS('|', CAST(vec_id AS VARCHAR),
                                        '{salt}')) ASC, vec_id ASC
            ) AS rk
            FROM assigned
        ) WHERE rk <= {per_cell}
        ORDER BY vec_id
    """


ORACLE["pipe_cluster_balanced_sample"] = _cluster_balanced_oracle()


ORACLE["text_zipf_fit"] = r"""
    WITH freqs AS (
        SELECT t, COUNT(*) AS f
        FROM (SELECT UNNEST(LIST_FILTER(
                STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))), '\s+'),
                x -> x <> '')) AS t FROM documents)
        GROUP BY t ORDER BY f DESC, t ASC LIMIT 100
    ), pts AS (
        SELECT ROUND(LN(CAST(ROW_NUMBER() OVER (ORDER BY f DESC, t ASC)
                             AS DOUBLE)), 6) AS x,
               ROUND(LN(CAST(f AS DOUBLE)), 6) AS y
        FROM freqs
    ), sums AS (
        SELECT COUNT(*) AS n,
            SUM(CAST(ROUND(x, 6) AS DECIMAL(38,6))) AS sx,
            SUM(CAST(ROUND(y, 6) AS DECIMAL(38,6))) AS sy,
            SUM(CAST(ROUND(x * y, 6) AS DECIMAL(38,6))) AS sxy,
            SUM(CAST(ROUND(x * x, 6) AS DECIMAL(38,6))) AS sxx,
            SUM(CAST(ROUND(y * y, 6) AS DECIMAL(38,6))) AS syy
        FROM pts
    )
    -- mirrors lm.py zipf_fit's degenerate-input guard: varx=0 -> slope
    -- 0.0 / intercept mean(y) / r2 NULL; vary=0 -> r2 NULL.
    SELECT CAST(n AS BIGINT) AS n_terms,
        ROUND(slope, 4) AS slope,
        ROUND((sy - slope * sx) / n, 4) AS intercept,
        CASE WHEN varx = 0 OR vary = 0 THEN NULL
             ELSE ROUND(POW(cov, 2) / (varx * vary), 4) END AS r2
    FROM (
        SELECT n, sx, sy,
            n * sxy - sx * sy AS cov,
            n * sxx - sx * sx AS varx,
            n * syy - sy * sy AS vary,
            CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                 ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope
        FROM (
            SELECT n,
                CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
                CAST(sxy AS DOUBLE) AS sxy, CAST(sxx AS DOUBLE) AS sxx,
                CAST(syy AS DOUBLE) AS syy
            FROM sums
        )
    )
"""


def _curation_e2e_oracle(
    ngram_n: int = 4,
    semantic_threshold: float = 0.30,
    max_semantic_probes: int = 100,
    temperature: float = 2.0,
    n_shards: int = 8,
    salt: str = "cur9",
    near_threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 8,
    max_bucket: int = 1000,
) -> str:
    """Replays curation.py curation_funnel end-to-end by COMPOSING the
    stage oracles over survivor CTEs: C4 doc rules + Gopher signals +
    bigram-LM bits (train = the corpus en slice) + n-gram / embedding
    contamination flags build the per-doc frame; terciles, fingerprint
    keepers, the survivor-gated portable MinHash star edges with a
    recursive-CTE closure, survivor-derived temperature rates, and the
    shard assignment replay the set-dependent stages; ten UNION arms emit
    (count, token sum, salted-h32 survivor checksum) per stage."""
    from flink_1_3_2_hopsworks_spark.functions.text import STOPWORDS

    def h32(key_sql: str) -> str:
        return f"('0x' || SUBSTR(MD5({key_sql}), 1, 8))::BIGINT"

    words = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    exponent = repr(1.0 - 1.0 / float(temperature))
    agree = _minhash_agree(num_hashes)
    mh = _minhash_cte_prefix(
        shingle_k,
        num_hashes,
        bands,
        max_bucket,
        source="(SELECT c.doc_id, c.text FROM corpus c "
        "JOIN s4 ON c.doc_id = s4.doc_id)",
        materialized=True,
    )
    ck = h32(f"CONCAT_WS('|', CAST(doc_id AS VARCHAR), '{salt}ck')")
    ck_sh = h32(
        "CONCAT_WS('|', CAST(doc_id AS VARCHAR), "
        f"CAST(shard AS VARCHAR), '{salt}ck')"
    )
    draw = h32(f"CONCAT_WS('|', CAST(doc_id AS VARCHAR), '{salt}mix')")
    shard = (
        h32(f"CONCAT_WS('|', CAST(doc_id AS VARCHAR), '{salt}sh')")
        + f" % {n_shards}"
    )
    stages = [
        ("input", "d"), ("c4_doc_rules", "s1"), ("gopher_rules", "s2"),
        ("perplexity_tercile", "s3"), ("exact_dedup", "s4"),
        ("near_dedup_star", "s5"), ("decontaminate_ngram", "s6"),
        ("decontaminate_semantic", "s7"), ("temperature_mixture", "s8"),
        ("shuffle_shard", "s9"),
    ]
    arms = "\n        UNION ALL\n        ".join(
        f"SELECT {i} AS stage_idx, '{name}' AS stage,"
        f" CAST(COUNT(*) AS BIGINT) AS n_docs,"
        f" CAST(COALESCE(SUM(ntok), 0) AS BIGINT) AS n_tokens,"
        f" CAST(COALESCE(SUM({ck_sh if name == 'shuffle_shard' else ck}), 0)"
        f" AS BIGINT) AS id_checksum FROM {rel}"
        for i, (name, rel) in enumerate(stages)
    )
    return f"""
    WITH RECURSIVE corpus AS MATERIALIZED (
        SELECT doc_id, lang, text FROM documents WHERE source <> 'src0'
    ), sigd AS (
        SELECT doc_id, lang,
            CASE WHEN LENGTH(TRIM(COALESCE(text, ''))) = 0 THEN 0
                 ELSE LEN(STRING_SPLIT_REGEX(TRIM(COALESCE(text, '')), '\\s+'))
            END AS ntok,
            MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS fp,
            NOT (LOWER(COALESCE(text, '')) LIKE '%lorem ipsum%'
                 OR COALESCE(text, '') LIKE '%{{%') AS c4
        FROM corpus
    ), gtk AS (
        SELECT doc_id, COALESCE(text, '') AS text,
            CASE WHEN LENGTH(TRIM(LOWER(COALESCE(text, '')))) = 0 THEN []
                 ELSE STRING_SPLIT_REGEX(TRIM(LOWER(COALESCE(text, ''))), '\\s+')
            END AS tk
        FROM corpus
    ), gm AS (
        SELECT doc_id, LEN(tk) AS n,
            CASE WHEN LEN(tk) = 0 THEN 0.0
                 ELSE LIST_SUM(LIST_TRANSFORM(tk, x -> LENGTH(x))) * 1.0
                      / LEN(tk) END AS mwl,
            CASE WHEN LEN(tk) = 0 THEN 0.0
                 ELSE (LENGTH(REGEXP_REPLACE(text, '[^#…]', '', 'g'))
                       + LEN(REGEXP_EXTRACT_ALL(text, '\\.{{3}}'))) * 1.0
                      / LEN(tk) END AS symr,
            CASE WHEN LEN(tk) = 0 THEN 0.0
                 ELSE LEN(LIST_FILTER(tk, x -> REGEXP_MATCHES(x, '[a-z]')))
                      * 1.0 / LEN(tk) END AS alphaf,
            LEN(LIST_FILTER([{words}], w -> LIST_CONTAINS(tk, w))) AS hits
        FROM gtk
    ), gop AS (
        SELECT doc_id,
            (n >= 50 AND n <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
            AND symr <= 0.1 AND alphaf >= 0.8 AND hits >= 2 AS gok
        FROM gm
    ), lmtok AS MATERIALIZED (
        SELECT doc_id, lang,
            LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))),
                        '\\s+'), x -> x <> '') AS toks
        FROM corpus
    ), bgr AS MATERIALIZED (
        SELECT doc_id, lang, toks[i] AS prev, toks[i + 1] AS cur
        FROM lmtok,
            UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks) - 1, 0))) AS u(i)
    ), cbi AS (
        SELECT prev, cur, COUNT(*) AS cbi FROM bgr WHERE lang = 'en'
        GROUP BY 1, 2
    ), cprev AS (
        SELECT prev, COUNT(*) AS cprev FROM bgr WHERE lang = 'en' GROUP BY 1
    ), vsz AS (
        SELECT COUNT(DISTINCT t) AS v
        FROM (SELECT UNNEST(toks) AS t FROM lmtok WHERE lang = 'en')
    ), lmsc AS (
        SELECT g.doc_id,
            ROUND(-LN((COALESCE(b.cbi, 0) + 0.5)
                      / (COALESCE(p.cprev, 0) + 0.5 * v.v)), 6) AS nll
        FROM bgr g
        LEFT JOIN cbi b ON g.prev = b.prev AND g.cur = b.cur
        LEFT JOIN cprev p ON g.prev = p.prev
        CROSS JOIN vsz v
    ), lmper AS (
        SELECT doc_id, COUNT(*) AS n_events,
            SUM(CAST(nll AS DECIMAL(38, 6))) AS s
        FROM lmsc GROUP BY doc_id
    ), bitsd AS (
        SELECT c.doc_id,
            CASE WHEN p.n_events IS NULL THEN 0.0
                 ELSE ROUND(CAST(p.s AS DOUBLE)
                            / (p.n_events * 0.6931471805599453), 4)
            END AS bits
        FROM corpus c LEFT JOIN lmper p USING (doc_id)
    ), bgrams AS (
        SELECT DISTINCT ARRAY_TO_STRING(toks[i:i + {ngram_n - 1}], ' ') AS gram
        FROM (
            SELECT STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+') AS toks
            FROM documents WHERE source = 'src0'
        ), UNNEST(RANGE(1, LEN(toks) - {ngram_n - 2})) AS u(i)
        WHERE LEN(toks) >= {ngram_n}
    ), ngbad AS (
        SELECT DISTINCT doc_id FROM (
            SELECT doc_id,
                ARRAY_TO_STRING(toks[i:i + {ngram_n - 1}], ' ') AS gram
            FROM (
                SELECT doc_id,
                    STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+') AS toks
                FROM corpus
            ), UNNEST(RANGE(1, LEN(toks) - {ngram_n - 2})) AS u(i)
            WHERE LEN(toks) >= {ngram_n}
        ) JOIN bgrams USING (gram)
    ), sembad AS (
        SELECT DISTINCT c.vec_id AS doc_id
        FROM (
            SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS cv
            FROM embeddings e JOIN corpus ON e.vec_id = corpus.doc_id
        ) c
        JOIN (
            SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS pv
            FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
            WHERE d.source = 'src0'
            ORDER BY e.vec_id LIMIT {max_semantic_probes}
        ) p ON LIST_COSINE_SIMILARITY(p.pv, c.cv) >= {semantic_threshold}
    ), d AS MATERIALIZED (
        SELECT s.doc_id, s.lang, s.ntok, s.fp, s.c4, g.gok, b.bits,
            (n.doc_id IS NOT NULL) AS ngbadf,
            (m.doc_id IS NOT NULL) AS sembadf
        FROM sigd s
        JOIN gop g USING (doc_id)
        JOIN bitsd b USING (doc_id)
        LEFT JOIN ngbad n USING (doc_id)
        LEFT JOIN sembad m USING (doc_id)
    ), s1 AS MATERIALIZED (
        SELECT * FROM d WHERE c4
    ), s2 AS MATERIALIZED (
        SELECT * FROM s1 WHERE gok
    ), hist AS (
        SELECT bits AS v, COUNT(*) AS c FROM s2 GROUP BY 1
    ), cum AS (
        SELECT v, SUM(c) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM hist
    ), thr AS (
        SELECT MIN(CASE WHEN cum >= CEIL(n.n / 3.0) THEN v END) AS t1,
               MIN(CASE WHEN cum >= CEIL(n.n * 2 / 3.0) THEN v END) AS t2
        FROM cum CROSS JOIN (SELECT COUNT(*) AS n FROM s2) n
    ), s3 AS MATERIALIZED (
        SELECT s2.* FROM s2 CROSS JOIN thr WHERE s2.bits <= thr.t2
    ), keepers AS (
        SELECT fp, MIN(doc_id) AS kid FROM s3 GROUP BY fp
    ), s4 AS MATERIALIZED (
        SELECT s3.* FROM s3
        JOIN keepers ON s3.fp = keepers.fp AND s3.doc_id = keepers.kid
    ), {mh}, anch AS (
        SELECT band, bucket, MIN(id) AS aid
        FROM capped GROUP BY band, bucket
    ), candp AS (
        SELECT DISTINCT a.aid AS id_a, c.id AS id_b
        FROM anch a
        JOIN capped c ON a.band = c.band AND a.bucket = c.bucket
                     AND c.id > a.aid
    ), edges AS MATERIALIZED (
        SELECT id_a, id_b FROM candp
        JOIN sig sa ON sa.id = id_a
        JOIN sig sb ON sb.id = id_b
        WHERE ({agree}) / {float(num_hashes)} >= {near_threshold}
    ), sym AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM edges
    ), verts AS (
        SELECT DISTINCT src AS id FROM sym
    ), reach(root, node) AS (
        SELECT id, id FROM verts
        UNION
        SELECT reach.root, sym.dst
        FROM reach JOIN sym ON sym.src = reach.node
    ), comp AS (
        SELECT root AS id, MIN(node) AS component FROM reach GROUP BY root
    ), s5 AS MATERIALIZED (
        SELECT s4.* FROM s4
        LEFT JOIN comp ON comp.id = s4.doc_id
        WHERE COALESCE(comp.component, s4.doc_id) = s4.doc_id
    ), s6 AS MATERIALIZED (
        SELECT * FROM s5 WHERE NOT ngbadf
    ), s7 AS MATERIALIZED (
        SELECT * FROM s6 WHERE NOT sembadf
    ), tot AS (
        SELECT lang, SUM(ntok * 1.0) AS t
        FROM s7 GROUP BY lang HAVING SUM(ntok * 1.0) > 0
    ), ratesd AS (
        SELECT lang,
            ROUND(POWER((SELECT MIN(t) FROM tot) / t, {exponent}), 6) AS rate
        FROM tot
    ), s8 AS MATERIALIZED (
        SELECT s7.* FROM s7 JOIN ratesd USING (lang)
        WHERE {draw} < rate * 4294967296.0
    ), s9 AS (
        SELECT s8.*, CAST({shard} AS INTEGER) AS shard FROM s8
    )
    SELECT * FROM (
        {arms}
    ) ORDER BY stage_idx
    """


ORACLE["pipe_curation_e2e"] = _curation_e2e_oracle()


def _mm_frozen_fp_star_oracle(
    frozen_table,
    n_patterns: int = 16,
    n_variants: int = 3,
    max_distance: int = 3,
    max_bucket: int = 1000,
) -> str:
    """Shared replay for the multimodal near-dup gates (image aHash /
    audio energy hash): the payloads depend only on (pattern, variant),
    so the 48 fingerprints are a FROZEN regenerable pure-numpy model —
    ids join the frozen fingerprints, then the simhash star machinery
    replays exactly like dd_simhash_stars' oracle — 16-bit chunk blocking
    (the & 65535 mask makes arithmetic vs logical shift irrelevant),
    bucket cap, min-id anchors, XOR-popcount Hamming verify, the
    Hamming-0 canonical star, and a recursive-CTE transitive closure."""
    values = ",\n            ".join(
        f"({k}, {v}, {fp}::BIGINT)" for k, v, fp in frozen_table
    )
    return f"""
    WITH RECURSIVE fpmap(k, v, fp) AS (
        VALUES {values}
    ), fps AS MATERIALIZED (
        SELECT d.doc_id, m.fp AS simhash
        FROM (
            SELECT doc_id, doc_id % {n_patterns} AS k,
                (doc_id // {n_patterns}) % {n_variants} AS v
            FROM documents
        ) d JOIN fpmap m USING (k, v)
    ), chunked AS (
        SELECT doc_id, simhash, ci,
            (simhash >> (ci * 16)) & 65535 AS cv
        FROM fps CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS ci)
    ), capped AS MATERIALIZED (
        SELECT * FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY ci, cv) AS bsize
            FROM chunked
        ) WHERE bsize <= {max_bucket}
    ), anchors AS (
        SELECT ci, cv, MIN(doc_id) AS aid FROM capped GROUP BY ci, cv
    ), anch AS (
        SELECT a.ci, a.cv, a.aid, f.simhash AS afp
        FROM anchors a JOIN fps f ON f.doc_id = a.aid
    ), stars AS (
        SELECT DISTINCT n.aid AS id_a, c.doc_id AS id_b
        FROM capped c
        JOIN anch n ON c.ci = n.ci AND c.cv = n.cv AND c.doc_id > n.aid
        WHERE BIT_COUNT(XOR(n.afp, c.simhash)) <= {max_distance}
    ), exact AS (
        SELECT min_id AS id_a, doc_id AS id_b
        FROM (
            SELECT doc_id,
                MIN(doc_id) OVER (PARTITION BY simhash) AS min_id
            FROM fps
        ) WHERE doc_id <> min_id
    ), edges AS MATERIALIZED (
        SELECT * FROM stars UNION SELECT * FROM exact
    ), sym AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM edges
    ), verts AS (
        SELECT DISTINCT src AS id FROM sym
    ), reach(root, node) AS (
        SELECT id, id FROM verts
        UNION
        SELECT reach.root, sym.dst
        FROM reach JOIN sym ON sym.src = reach.node
    ), comp AS (
        SELECT root AS id, MIN(node) AS component FROM reach GROUP BY root
    )
    SELECT f.doc_id, f.simhash AS fingerprint,
        CAST(COALESCE(c.component, f.doc_id) AS BIGINT) AS canonical_id,
        COALESCE(c.component, f.doc_id) = f.doc_id AS kept
    FROM fps f
    LEFT JOIN comp c ON c.id = f.doc_id
    ORDER BY f.doc_id
    """


def _register_mm_oracles() -> None:
    from flink_1_3_2_hopsworks_spark.multimodal.synth import (
        frozen_ahash_table,
        frozen_audiofp_table,
    )

    ORACLE["mm_image_near_dups"] = _mm_frozen_fp_star_oracle(
        frozen_ahash_table(), max_distance=3
    )
    ORACLE["mm_audio_near_dups"] = _mm_frozen_fp_star_oracle(
        frozen_audiofp_table(), max_distance=4
    )


_register_mm_oracles()


def _mm_curation_funnel_stream_oracle(
    n_epochs: int = 3,
    min_brightness: float = 105.0,
    max_brightness: float = 137.0,
    min_contrast: float = 40.0,
    max_distance: int = 3,
    max_bucket: int = 1000,
    salt: str = "mmfun10",
    n_patterns: int = 16,
    n_variants: int = 3,
) -> str:
    """Replays streaming/media_funnel.py's sequential epoch loop:

    - ids join the FROZEN (pattern, variant) → (brightness, contrast,
      aHash, bytes) model (the mm_curation_funnel discipline — the twin
      corpus always decodes, so the 'decoded' stage equals 'input').
    - exact perceptual dedup collapses across epochs to the
      (epoch, id)-argmin per aHash among quality survivors (the exact
      store before epoch e holds hash H iff some quality survivor
      carried H in an epoch < e — same collapse as the text funnel).
    - the near stage genuinely unrolls per epoch: store_e = the kept
      sets of epochs < e, store-side 16-bit chunk buckets capped,
      Hamming probe ≤ max_distance, then the within-batch star
      (bucket-min anchor, member, Hamming verify) and a per-epoch
      recursive closure. simhash_star_edges' Hamming-0 exact arm is
      provably EMPTY here: the exact stage keeps one doc per aHash
      globally, so every epoch's batch fingerprints are all distinct.
    - funnel arms: (epochs × stages) UNION arms emit count, byte sum,
      and the salted-h32 survivor checksum per stage."""
    from flink_1_3_2_hopsworks_spark.multimodal.synth import (
        frozen_image_stats_table,
    )

    smap_values = ",\n                ".join(
        f"({k}, {v}, {mean}, {std}, {ah}::BIGINT, {nb})"
        for k, v, mean, std, ah, nb in frozen_image_stats_table(
            n_patterns, n_variants
        )
    )
    ck = (
        "('0x' || SUBSTR(MD5(CONCAT_WS('|', CAST(doc_id AS VARCHAR), "
        f"'{salt}ck')), 1, 8))::BIGINT"
    )
    epoch_ctes = []
    for e in range(n_epochs):
        if e == 0:
            store = "SELECT CAST(NULL AS BIGINT) AS id WHERE FALSE"
        else:
            store = "\n            UNION ALL\n            ".join(
                f"SELECT id FROM k{j}" for j in range(e)
            )
        epoch_ctes.append(f"""b{e} AS (
            SELECT doc_id AS id FROM s3 WHERE ep = {e}
        ), st{e} AS (
            {store}
        ), stc{e} AS (
            SELECT * FROM (
                SELECT c.*, COUNT(*) OVER (PARTITION BY ci, cv) AS cbs
                FROM ch c JOIN st{e} s ON c.doc_id = s.id
            ) WHERE cbs <= {max_bucket}
        ), bb{e} AS (
            SELECT c.* FROM ch c JOIN b{e} b ON c.doc_id = b.id
        ), cd{e} AS (
            SELECT DISTINCT bb.doc_id AS id
            FROM stc{e} sc
            JOIN bb{e} bb ON sc.ci = bb.ci AND sc.cv = bb.cv
            WHERE BIT_COUNT(XOR(sc.ah, bb.ah)) <= {max_distance}
            UNION
            -- the r11 uncapped EQUALITY arm (Hamming-0 guarantee under
            -- the bucket cap) — provably empty in THIS gate because the
            -- exact stage keeps one doc per aHash globally, mirrored for
            -- fidelity with incremental_simhash_ingest
            SELECT DISTINCT b.doc_id AS id
            FROM (SELECT doc_id, ah FROM s3 WHERE ep = {e}) b
            JOIN (
                SELECT s3.ah FROM s3 JOIN st{e} s ON s3.doc_id = s.id
            ) st ON st.ah = b.ah
        ), svc{e} AS (
            SELECT * FROM (
                SELECT sv.*, COUNT(*) OVER (PARTITION BY ci, cv) AS sbs
                FROM (
                    SELECT * FROM bb{e}
                    WHERE doc_id NOT IN (SELECT id FROM cd{e})
                ) sv
            ) WHERE sbs <= {max_bucket}
        ), an{e} AS (
            SELECT ci, cv, doc_id AS aid, ah AS aah FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY ci, cv ORDER BY doc_id
                ) AS rn FROM svc{e}
            ) WHERE rn = 1
        ), ed{e} AS MATERIALIZED (
            SELECT DISTINCT n.aid AS id_a, c.doc_id AS id_b
            FROM svc{e} c
            JOIN an{e} n ON c.ci = n.ci AND c.cv = n.cv
                        AND c.doc_id > n.aid
            WHERE BIT_COUNT(XOR(n.aah, c.ah)) <= {max_distance}
        ), sy{e} AS MATERIALIZED (
            SELECT id_a AS src, id_b AS dst FROM ed{e}
            UNION ALL
            SELECT id_b AS src, id_a AS dst FROM ed{e}
        ), rc{e}(root, node) AS (
            SELECT DISTINCT src, src FROM sy{e}
            UNION
            SELECT rc{e}.root, sy{e}.dst
            FROM rc{e} JOIN sy{e} ON sy{e}.src = rc{e}.node
        ), cp{e} AS (
            SELECT root AS id, MIN(node) AS component FROM rc{e} GROUP BY root
        ), k{e} AS MATERIALIZED (
            SELECT b.id FROM b{e} b
            LEFT JOIN cd{e} cd ON cd.id = b.id
            LEFT JOIN cp{e} c ON c.id = b.id
            WHERE cd.id IS NULL AND COALESCE(c.component, b.id) = b.id
        )""")
    arms = []
    for e in range(n_epochs):
        rels = [
            ("input", f"(SELECT * FROM sigd WHERE ep = {e})"),
            ("decoded", f"(SELECT * FROM sigd WHERE ep = {e})"),
            ("quality_rules", f"(SELECT * FROM s2 WHERE ep = {e})"),
            ("exact_perceptual_dedup", f"(SELECT * FROM s3 WHERE ep = {e})"),
            ("near_dup",
             f"(SELECT s3.* FROM s3 JOIN k{e} ON s3.doc_id = k{e}.id)"),
        ]
        for i, (name, rel) in enumerate(rels):
            arms.append(
                f"SELECT {e} AS batch_id, {i} AS stage_idx,"
                f" '{name}' AS stage,"
                f" CAST(COUNT(*) AS BIGINT) AS n_images,"
                f" CAST(COALESCE(SUM(nb), 0) AS BIGINT) AS n_bytes,"
                f" CAST(COALESCE(SUM({ck}), 0) AS BIGINT) AS id_checksum"
                f" FROM {rel}"
            )
    arms_sql = "\n        UNION ALL\n        ".join(arms)
    epochs_sql = ", ".join(epoch_ctes)
    return f"""
    WITH RECURSIVE smap(mk, mv, bright, contr, ah, nb) AS (
        VALUES {smap_values}
    ), sigd AS MATERIALIZED (
        SELECT d.doc_id, d.doc_id % {n_epochs} AS ep,
            m.bright, m.contr, m.ah, m.nb
        FROM documents d
        JOIN smap m ON m.mk = d.doc_id % {n_patterns}
                   AND m.mv = (d.doc_id // {n_patterns}) % {n_variants}
    ), s2 AS MATERIALIZED (
        SELECT * FROM sigd
        WHERE bright >= {min_brightness} AND bright <= {max_brightness}
          AND contr >= {min_contrast}
    ), s3 AS MATERIALIZED (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY ah ORDER BY ep, doc_id
            ) AS rn FROM s2
        ) WHERE rn = 1
    ), ch AS MATERIALIZED (
        SELECT doc_id, ep, ah, ci, (ah >> (ci * 16)) & 65535 AS cv
        FROM s3 CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS ci)
    ), {epochs_sql}
    SELECT * FROM (
        {arms_sql}
    ) ORDER BY batch_id, stage_idx
    """


ORACLE["mm_curation_funnel_stream"] = _mm_curation_funnel_stream_oracle()


def _mm_embed_topk_oracle(
    modality: str = "image",
    k: int = 10,
    nprobe: int = 2,
    n_queries: int = 5,
    n_patterns: int = 16,
    n_variants: int = 3,
) -> str:
    """Replays mm_embed_topk / mm_audio_embed_topk: ids join the FROZEN
    (pattern, variant) → descriptor table (multimodal/synth.py —
    regenerated through the real BMP / PCM-16 round-trip), then the
    IVF-PQ serve replay under that modality's frozen descriptor-space
    models (multimodal/embed.py): cosine cell assignment + nprobe
    probing, per-subspace argmin encode (ties ORDER BY dist, code), the
    explicit left-to-right ADC chain (pinning the engine's s-ascending
    sum), and the (cosine DESC, id ASC) rank — the _ivfpq_topk_oracle
    chain with the vector relation swapped for the frozen-descriptor
    join."""
    from flink_1_3_2_hopsworks_spark.multimodal.embed import (
        DESCRIPTOR_DIM,
        mm_audio_coarse_centroids,
        mm_audio_codebooks,
        mm_coarse_centroids,
        mm_codebooks,
    )
    from flink_1_3_2_hopsworks_spark.multimodal.synth import (
        frozen_audio_descriptor_table,
        frozen_descriptor_table,
    )
    from flink_1_3_2_hopsworks_spark.similarity.pq import _sqnorms

    if modality == "image":
        table = frozen_descriptor_table(n_patterns, n_variants)
        cents, books = mm_coarse_centroids(), mm_codebooks()
    elif modality == "audio":
        table = frozen_audio_descriptor_table(n_patterns, n_variants)
        cents, books = mm_audio_coarse_centroids(), mm_audio_codebooks()
    else:
        from flink_1_3_2_hopsworks_spark.multimodal.embed import (
            mm_video_coarse_centroids,
            mm_video_codebooks,
        )
        from flink_1_3_2_hopsworks_spark.multimodal.synth import (
            frozen_video_descriptor_table,
        )

        table = frozen_video_descriptor_table(n_patterns, n_variants)
        cents, books = mm_video_coarse_centroids(), mm_video_codebooks()
    desc_values = ",\n                ".join(
        "({}, {}, [{}]::DOUBLE[])".format(
            dk, dv, ", ".join(repr(x) for x in d)
        )
        for dk, dv, d in table
    )
    cent_values = ",\n                ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(cents)
    )
    books = [[list(c) for c in b] for b in books]
    m = len(books)
    d = DESCRIPTOR_DIM // m
    pq_values = ",\n                ".join(
        "({s}, {j}, [{cv}]::DOUBLE[], {sq})".format(
            s=s, j=j, cv=", ".join(repr(x) for x in c), sq=repr(sq)
        )
        for s, book in enumerate(books)
        for j, (c, sq) in enumerate(zip(book, _sqnorms(book)))
    )
    num_chain = "\n                + ".join(
        f"LIST_INNER_PRODUCT(q.qv[{s * d + 1}:{s * d + d}], c.cvs[{s + 1}])"
        for s in range(m)
    )
    xsq_chain = " + ".join(f"c.sqns[{s + 1}]" for s in range(m))
    return f"""
        WITH dmap(dk, dv, dvec) AS (
            VALUES {desc_values}
        ), cent(cell, ccv) AS (
            VALUES {cent_values}
        ), pqcent(s, code, cv, sqn) AS (
            VALUES {pq_values}
        ), vecs AS MATERIALIZED (
            SELECT d.doc_id AS vec_id, m.dvec AS v
            FROM documents d
            JOIN dmap m ON m.dk = d.doc_id % {n_patterns}
                       AND m.dv = (d.doc_id // {n_patterns}) % {n_variants}
        ), sims AS (
            SELECT vec_id, cell,
                LIST_COSINE_SIMILARITY(v, ccv) AS sim
            FROM vecs CROSS JOIN cent
        ), assigned AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY sim DESC, cell ASC
                ) AS rn FROM sims
            ) WHERE rn = 1
        ), probed AS (
            SELECT vec_id AS query_id, cell FROM (
                SELECT vec_id, cell, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY sim DESC, cell ASC
                ) AS rn FROM sims WHERE vec_id < {n_queries}
            ) WHERE rn <= {nprobe}
        ), subs AS (
            SELECT vec_id, s, v[s * {d} + 1 : s * {d} + {d}] AS sub
            FROM vecs CROSS JOIN (SELECT UNNEST(RANGE(0, {m})) AS s)
        ), distc AS (
            SELECT vec_id, p.s, p.code, p.cv, p.sqn,
                p.sqn - 2 * LIST_INNER_PRODUCT(sub, p.cv) AS dist
            FROM subs JOIN pqcent p USING (s)
        ), chosen AS (
            SELECT vec_id, s, cv, sqn FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id, s ORDER BY dist, code
                ) AS rn FROM distc
            ) WHERE rn = 1
        ), codesw AS (
            SELECT vec_id,
                LIST(cv ORDER BY s) AS cvs,
                LIST(sqn ORDER BY s) AS sqns
            FROM chosen GROUP BY vec_id
        ), queries AS (
            SELECT vec_id AS query_id, v AS qv,
                SQRT(LIST_INNER_PRODUCT(v, v)) AS qnorm
            FROM vecs WHERE vec_id < {n_queries}
        ), scored AS (
            SELECT p.query_id, a.vec_id,
                ROUND(
                    CASE WHEN q.qnorm * SQRT({xsq_chain}) = 0 THEN 0.0
                    ELSE (
                {num_chain}
                    ) / (q.qnorm * SQRT({xsq_chain})) END,
                4) AS cosine
            FROM probed p
            JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
            JOIN codesw c ON c.vec_id = a.vec_id
            JOIN queries q ON q.query_id = p.query_id
        ), ranked AS (
            SELECT query_id, vec_id AS doc_id, cosine,
                CAST(ROW_NUMBER() OVER (
                    PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
                ) AS INTEGER) AS rank
            FROM scored
        )
        SELECT query_id, doc_id, cosine, rank FROM ranked
        WHERE rank <= {k}
        ORDER BY query_id, rank
    """


ORACLE["mm_embed_topk"] = _mm_embed_topk_oracle("image")
ORACLE["mm_audio_embed_topk"] = _mm_embed_topk_oracle("audio")
ORACLE["mm_video_embed_topk"] = _mm_embed_topk_oracle("video")


def _mm_video_near_dups_oracle(
    n_patterns: int = 16,
    n_variants: int = 3,
    threshold: float = 0.6,
    max_bucket: int = 1000,
) -> str:
    """Replays mm_video_near_dups from the FROZEN (video, variant) →
    frame-hash set model (multimodal/synth.py frozen_video_frame_table):
    ids join their frozen frame sets, then the exact set-Jaccard replay —
    inverted self-join on the frame hash, hot-item cap, intersection
    counts over set sizes, threshold — and the recursive-CTE closure."""
    from flink_1_3_2_hopsworks_spark.multimodal.synth import (
        frozen_video_frame_table,
    )

    values = ",\n            ".join(
        f"({k}, {v}, {fh}::BIGINT)"
        for k, v, fh in frozen_video_frame_table(n_patterns, n_variants)
    )
    return f"""
    WITH RECURSIVE fmap(k, v, fh) AS (
        VALUES {values}
    ), vids AS MATERIALIZED (
        SELECT d.doc_id, m.fh
        FROM (
            SELECT doc_id, doc_id % {n_patterns} AS k,
                (doc_id // {n_patterns}) % {n_variants} AS v
            FROM documents
        ) d JOIN fmap m USING (k, v)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM vids GROUP BY doc_id
    ), capped AS MATERIALIZED (
        SELECT * FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY fh) AS b FROM vids
        ) WHERE b <= {max_bucket}
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        FROM capped a JOIN capped b
            ON a.fh = b.fh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS MATERIALIZED (
        SELECT id_a, id_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE ROUND(i * 1.0 / (sa.n + sb.n - i), 4) >= {threshold}
    ), sym AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs
    ), verts AS (
        SELECT DISTINCT src AS id FROM sym
    ), reach(root, node) AS (
        SELECT id, id FROM verts
        UNION
        SELECT reach.root, sym.dst
        FROM reach JOIN sym ON sym.src = reach.node
    ), comp AS (
        SELECT root AS id, MIN(node) AS component FROM reach GROUP BY root
    ), fsets AS (
        SELECT doc_id,
            MD5(STRING_AGG(CAST(fh AS VARCHAR), ',' ORDER BY fh))
                AS frameset_fp
        FROM vids GROUP BY doc_id
    )
    SELECT f.doc_id, f.frameset_fp,
        CAST(COALESCE(c.component, f.doc_id) AS BIGINT) AS canonical_id,
        COALESCE(c.component, f.doc_id) = f.doc_id AS kept
    FROM fsets f
    LEFT JOIN comp c ON c.id = f.doc_id
    ORDER BY f.doc_id
    """


ORACLE["mm_video_near_dups"] = _mm_video_near_dups_oracle()


def _snapshot_upsert_oracle() -> str:
    """Replays the pipe_snapshot_upsert gate: store = id%10 != 9; delta =
    rev2 updates (7), identical re-crawls (6), inserts (9), tombstones (5);
    anti/semi probe split + fingerprint compare, deletes dropped."""
    fp = "MD5(REGEXP_REPLACE(LOWER(TRIM({t})), '\\s+', ' ', 'g'))"
    return f"""
        WITH store AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 9
        ), delta AS (
            SELECT doc_id, text || ' rev2' AS text, FALSE AS del
            FROM documents WHERE doc_id % 10 = 7
            UNION ALL
            SELECT doc_id, text, FALSE FROM documents WHERE doc_id % 10 = 6
            UNION ALL
            SELECT doc_id, text, FALSE FROM documents WHERE doc_id % 10 = 9
            UNION ALL
            SELECT doc_id, NULL, TRUE FROM documents WHERE doc_id % 10 = 5
        ), live AS (
            SELECT doc_id, text FROM delta WHERE NOT del
        ), kept AS (
            SELECT s.doc_id, s.text, 'kept' AS action FROM store s
            WHERE s.doc_id NOT IN (SELECT doc_id FROM delta)
        ), matched AS (
            SELECT s.doc_id, {fp.format(t="s.text")} AS fo
            FROM store s
            WHERE s.doc_id IN (SELECT doc_id FROM delta)
        ), upserts AS (
            SELECT l.doc_id, l.text,
                CASE WHEN m.fo IS NULL THEN 'inserted'
                     WHEN m.fo = {fp.format(t="l.text")} THEN 'unchanged'
                     ELSE 'updated' END AS action
            FROM live l LEFT JOIN matched m USING (doc_id)
        ), snap AS (
            SELECT * FROM kept UNION ALL SELECT * FROM upserts
        )
        SELECT doc_id, {fp.format(t="text")} AS fp, action
        FROM snap ORDER BY doc_id
    """


ORACLE["pipe_snapshot_upsert"] = _snapshot_upsert_oracle()


def _minhash_recall_oracle(
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 8,
    max_bucket: int = 1000,
) -> str:
    """Replays dd_minhash_recall: the estimator pair set vs EXACT
    distinct-shingle Jaccard truth (integer cross-multiplied threshold),
    then recall/precision."""
    agree = _minhash_agree(num_hashes)
    prefix = _minhash_cte_prefix(shingle_k, num_hashes, bands, max_bucket)
    return f"""
        WITH {prefix},
        found AS (
            SELECT id_a, id_b FROM (
                SELECT DISTINCT a.id AS id_a, b.id AS id_b
                FROM capped a
                JOIN capped b ON a.band = b.band AND a.bucket = b.bucket
                             AND a.id < b.id
            ) cand
            JOIN sig sa ON sa.id = id_a
            JOIN sig sb ON sb.id = id_b
            WHERE ({agree}) / {float(num_hashes)} >= {threshold}
        ), dsh AS (
            SELECT DISTINCT id, s FROM sh
        ), sizes AS (
            SELECT id, COUNT(*) AS sz FROM dsh GROUP BY id
        ), inter AS (
            SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS i
            FROM dsh a JOIN dsh b ON a.s = b.s AND a.id < b.id
            GROUP BY a.id, b.id
        ), truth AS (
            SELECT id_a, id_b
            FROM inter
            JOIN sizes za ON za.id = id_a
            JOIN sizes zb ON zb.id = id_b
            WHERE i * 10 >= (za.sz + zb.sz - i) * 8
        ), hit AS (
            SELECT f.id_a, f.id_b FROM found f JOIN truth t
                ON f.id_a = t.id_a AND f.id_b = t.id_b
        )
        SELECT
            (SELECT COUNT(*) FROM truth) AS n_true,
            (SELECT COUNT(*) FROM found) AS n_found,
            (SELECT COUNT(*) FROM hit) AS n_hit,
            ROUND(CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN 1.0
                ELSE (SELECT COUNT(*) FROM hit) * 1.0
                     / (SELECT COUNT(*) FROM truth) END, 4) AS recall,
            ROUND(CASE WHEN (SELECT COUNT(*) FROM found) = 0 THEN 1.0
                ELSE (SELECT COUNT(*) FROM hit) * 1.0
                     / (SELECT COUNT(*) FROM found) END, 4) AS precision
    """


ORACLE["dd_minhash_recall"] = _minhash_recall_oracle()


def _mm_curation_funnel_oracle(
    n_patterns: int = 16,
    n_variants: int = 3,
    min_brightness: float = 105.0,
    max_brightness: float = 137.0,
    min_contrast: float = 40.0,
    max_distance: int = 3,
    max_bucket: int = 1000,
    n_shards: int = 8,
    salt: str = "mmcur9",
) -> str:
    """Replays the image curation funnel (multimodal/curation.py) from the
    FROZEN (pattern, variant) -> (brightness, contrast, aHash, bytes)
    model (synth.frozen_image_stats_table — same shared stats definition
    and codec round-trip as the live kernel): rules → min-id-per-hash
    exact perceptual dedup → the simhash star replay restricted to the
    survivor set → closure → shard, then the six funnel arms."""
    from flink_1_3_2_hopsworks_spark.multimodal.synth import (
        frozen_image_stats_table,
    )

    values = ",\n            ".join(
        f"({k}, {v}, {m!r}, {s!r}, {fp}::BIGINT, {nb})"
        for k, v, m, s, fp, nb in frozen_image_stats_table(
            n_patterns, n_variants
        )
    )

    def h32(key_sql: str) -> str:
        return f"('0x' || SUBSTR(MD5({key_sql}), 1, 8))::BIGINT"

    ck = h32(f"CONCAT_WS('|', CAST(doc_id AS VARCHAR), '{salt}ck')")
    ck_sh = h32(
        "CONCAT_WS('|', CAST(doc_id AS VARCHAR), "
        f"CAST(shard AS VARCHAR), '{salt}ck')"
    )
    shard = (
        h32(f"CONCAT_WS('|', CAST(doc_id AS VARCHAR), '{salt}sh')")
        + f" % {n_shards}"
    )
    stages = [
        ("input", "d"), ("decoded", "d"), ("quality_rules", "s2"),
        ("exact_perceptual_dedup", "s3"), ("near_dup_star", "s4"),
        ("shuffle_shard", "s5"),
    ]
    arms = "\n        UNION ALL\n        ".join(
        f"SELECT {i} AS stage_idx, '{name}' AS stage,"
        f" CAST(COUNT(*) AS BIGINT) AS n_images,"
        f" CAST(COALESCE(SUM(nb), 0) AS BIGINT) AS n_bytes,"
        f" CAST(COALESCE(SUM({ck_sh if name == 'shuffle_shard' else ck}), 0)"
        f" AS BIGINT) AS id_checksum FROM {rel}"
        for i, (name, rel) in enumerate(stages)
    )
    return f"""
    WITH RECURSIVE model(k, v, mean, std, fp, nb) AS (
        VALUES {values}
    ), d AS MATERIALIZED (
        SELECT i.doc_id, m.mean, m.std, m.fp AS simhash, m.nb
        FROM (
            SELECT doc_id, doc_id % {n_patterns} AS k,
                (doc_id // {n_patterns}) % {n_variants} AS v
            FROM documents
        ) i JOIN model m USING (k, v)
    ), s2 AS MATERIALIZED (
        SELECT * FROM d
        WHERE mean >= {min_brightness!r} AND mean <= {max_brightness!r}
          AND std >= {min_contrast!r}
    ), keep3 AS (
        SELECT MIN(doc_id) AS doc_id FROM s2 GROUP BY simhash
    ), s3 AS MATERIALIZED (
        SELECT s2.* FROM s2 JOIN keep3 USING (doc_id)
    ), chunked AS (
        SELECT doc_id, simhash, ci,
            (simhash >> (ci * 16)) & 65535 AS cv
        FROM s3 CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS ci)
    ), capped AS MATERIALIZED (
        SELECT * FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY ci, cv) AS bsize
            FROM chunked
        ) WHERE bsize <= {max_bucket}
    ), anchors AS (
        SELECT ci, cv, MIN(doc_id) AS aid FROM capped GROUP BY ci, cv
    ), anch AS (
        SELECT a.ci, a.cv, a.aid, f.simhash AS afp
        FROM anchors a JOIN s3 f ON f.doc_id = a.aid
    ), stars AS (
        SELECT DISTINCT n.aid AS id_a, c.doc_id AS id_b
        FROM capped c
        JOIN anch n ON c.ci = n.ci AND c.cv = n.cv AND c.doc_id > n.aid
        WHERE BIT_COUNT(XOR(n.afp, c.simhash)) <= {max_distance}
    ), sym AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM stars
        UNION
        SELECT id_b AS src, id_a AS dst FROM stars
    ), verts AS (
        SELECT DISTINCT src AS id FROM sym
    ), reach(root, node) AS (
        SELECT id, id FROM verts
        UNION
        SELECT reach.root, sym.dst
        FROM reach JOIN sym ON sym.src = reach.node
    ), comp AS (
        SELECT root AS id, MIN(node) AS component FROM reach GROUP BY root
    ), s4 AS MATERIALIZED (
        SELECT s3.* FROM s3
        LEFT JOIN comp c ON c.id = s3.doc_id
        WHERE COALESCE(c.component, s3.doc_id) = s3.doc_id
    ), s5 AS (
        SELECT s4.*, {shard} AS shard FROM s4
    )
    SELECT * FROM (
        {arms}
    ) ORDER BY stage_idx
    """


ORACLE["mm_curation_funnel"] = _mm_curation_funnel_oracle()


def _mm_pair_curation_oracle(
    n_patterns: int = 16,
    n_variants: int = 3,
    min_brightness: float = 105.0,
    max_brightness: float = 137.0,
    min_contrast: float = 40.0,
    near_threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 8,
    max_distance: int = 3,
    max_bucket: int = 1000,
    n_shards: int = 8,
    salt: str = "pair11",
) -> str:
    """Replays the PAIRED curation funnel (multimodal/pair_curation.py)
    by composing the two sibling funnels' oracle CTEs over JOINT survivor
    sets: caption signals (ntok, md5 fingerprint, C4 rules) from the
    documents text + image signals from the frozen (pattern, variant) →
    (brightness, contrast, aHash, bytes) model, then the alternating
    stage chain — caption rules → image quality → caption min-id keepers
    → image min-id keepers → the survivor-gated portable MinHash star
    closure → the survivor-restricted simhash star closure → shard —
    with pair-consistent checksums binding (id, caption fp, aHash)."""
    from flink_1_3_2_hopsworks_spark.multimodal.synth import (
        frozen_image_stats_table,
    )

    values = ",\n            ".join(
        f"({k}, {v}, {m!r}, {s!r}, {fp}::BIGINT, {nb})"
        for k, v, m, s, fp, nb in frozen_image_stats_table(
            n_patterns, n_variants
        )
    )

    def h32(key_sql: str) -> str:
        return f"('0x' || SUBSTR(MD5({key_sql}), 1, 8))::BIGINT"

    bind = (
        "CONCAT_WS('|', CAST(doc_id AS VARCHAR), cfp, "
        "CAST(simhash AS VARCHAR)"
    )
    ck = h32(f"{bind}, '{salt}ck')")
    ck_sh = h32(f"{bind}, CAST(shard AS VARCHAR), '{salt}ck')")
    shard = (
        h32(f"CONCAT_WS('|', CAST(doc_id AS VARCHAR), '{salt}sh')")
        + f" % {n_shards}"
    )
    agree = _minhash_agree(num_hashes)
    mh = _minhash_cte_prefix(
        shingle_k,
        num_hashes,
        bands,
        max_bucket,
        source="(SELECT c.doc_id, c.text FROM documents c "
        "JOIN s4 ON c.doc_id = s4.doc_id)",
        materialized=True,
    )
    stages = [
        ("input", "d"), ("caption_rules", "s1"), ("image_quality", "s2"),
        ("caption_exact_dedup", "s3"), ("image_exact_dedup", "s4"),
        ("caption_near_dedup", "s5"), ("image_near_dedup", "s6"),
        ("paired_shard", "s7"),
    ]
    arms = "\n        UNION ALL\n        ".join(
        f"SELECT {i} AS stage_idx, '{name}' AS stage,"
        f" CAST(COUNT(*) AS BIGINT) AS n_pairs,"
        f" CAST(COALESCE(SUM(ntok), 0) AS BIGINT) AS n_tokens,"
        f" CAST(COALESCE(SUM(nb), 0) AS BIGINT) AS n_bytes,"
        f" CAST(COALESCE(SUM({ck_sh if name == 'paired_shard' else ck}), 0)"
        f" AS BIGINT) AS pair_checksum FROM {rel}"
        for i, (name, rel) in enumerate(stages)
    )
    return f"""
    WITH RECURSIVE model(k, v, mean, std, ifp, nb) AS (
        VALUES {values}
    ), txt AS (
        SELECT doc_id,
            CASE WHEN LENGTH(TRIM(COALESCE(text, ''))) = 0 THEN 0
                 ELSE LEN(STRING_SPLIT_REGEX(TRIM(COALESCE(text, '')),
                          '\\s+'))
            END AS ntok,
            MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS cfp,
            NOT (LOWER(COALESCE(text, '')) LIKE '%lorem ipsum%'
                 OR COALESCE(text, '') LIKE '%{{%') AS c4
        FROM documents
    ), img AS (
        SELECT i.doc_id, m.mean, m.std, m.ifp AS simhash, m.nb
        FROM (
            SELECT doc_id, doc_id % {n_patterns} AS k,
                (doc_id // {n_patterns}) % {n_variants} AS v
            FROM documents
        ) i JOIN model m USING (k, v)
    ), d AS MATERIALIZED (
        SELECT t.doc_id, t.ntok, t.cfp, t.c4,
            i.mean, i.std, i.simhash, i.nb
        FROM txt t JOIN img i USING (doc_id)
    ), s1 AS MATERIALIZED (
        SELECT * FROM d WHERE c4
    ), s2 AS MATERIALIZED (
        SELECT * FROM s1
        WHERE mean >= {min_brightness!r} AND mean <= {max_brightness!r}
          AND std >= {min_contrast!r}
    ), k3 AS (
        SELECT MIN(doc_id) AS doc_id FROM s2 GROUP BY cfp
    ), s3 AS MATERIALIZED (
        SELECT s2.* FROM s2 JOIN k3 USING (doc_id)
    ), k4 AS (
        SELECT MIN(doc_id) AS doc_id FROM s3 GROUP BY simhash
    ), s4 AS MATERIALIZED (
        SELECT s3.* FROM s3 JOIN k4 USING (doc_id)
    ), {mh}, anch AS (
        SELECT band, bucket, MIN(id) AS aid
        FROM capped GROUP BY band, bucket
    ), candp AS (
        SELECT DISTINCT a.aid AS id_a, c.id AS id_b
        FROM anch a
        JOIN capped c ON a.band = c.band AND a.bucket = c.bucket
                     AND c.id > a.aid
    ), edges AS MATERIALIZED (
        SELECT id_a, id_b FROM candp
        JOIN sig sa ON sa.id = id_a
        JOIN sig sb ON sb.id = id_b
        WHERE ({agree}) / {float(num_hashes)} >= {near_threshold}
    ), sym AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM edges
    ), verts AS (
        SELECT DISTINCT src AS id FROM sym
    ), reach(root, node) AS (
        SELECT id, id FROM verts
        UNION
        SELECT reach.root, sym.dst
        FROM reach JOIN sym ON sym.src = reach.node
    ), comp AS (
        SELECT root AS id, MIN(node) AS component FROM reach GROUP BY root
    ), s5 AS MATERIALIZED (
        SELECT s4.* FROM s4
        LEFT JOIN comp ON comp.id = s4.doc_id
        WHERE COALESCE(comp.component, s4.doc_id) = s4.doc_id
    ), ichunk AS (
        SELECT doc_id, simhash, ci,
            (simhash >> (ci * 16)) & 65535 AS cv
        FROM s5 CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS ci)
    ), icap AS MATERIALIZED (
        SELECT * FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY ci, cv) AS bsize
            FROM ichunk
        ) WHERE bsize <= {max_bucket}
    ), ianchor AS (
        SELECT ci, cv, MIN(doc_id) AS aid FROM icap GROUP BY ci, cv
    ), ianch AS (
        SELECT a.ci, a.cv, a.aid, f.simhash AS afp
        FROM ianchor a JOIN s5 f ON f.doc_id = a.aid
    ), istars AS (
        SELECT DISTINCT n.aid AS id_a, c.doc_id AS id_b
        FROM icap c
        JOIN ianch n ON c.ci = n.ci AND c.cv = n.cv AND c.doc_id > n.aid
        WHERE BIT_COUNT(XOR(n.afp, c.simhash)) <= {max_distance}
    ), isym AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM istars
        UNION
        SELECT id_b AS src, id_a AS dst FROM istars
    ), iverts AS (
        SELECT DISTINCT src AS id FROM isym
    ), ireach(root, node) AS (
        SELECT id, id FROM iverts
        UNION
        SELECT ireach.root, isym.dst
        FROM ireach JOIN isym ON isym.src = ireach.node
    ), icomp AS (
        SELECT root AS id, MIN(node) AS component FROM ireach GROUP BY root
    ), s6 AS MATERIALIZED (
        SELECT s5.* FROM s5
        LEFT JOIN icomp c ON c.id = s5.doc_id
        WHERE COALESCE(c.component, s5.doc_id) = s5.doc_id
    ), s7 AS (
        SELECT s6.*, CAST({shard} AS INTEGER) AS shard FROM s6
    )
    SELECT * FROM (
        {arms}
    ) ORDER BY stage_idx
    """


ORACLE["mm_pair_curation_funnel"] = _mm_pair_curation_oracle()


def _mm_text_to_image_oracle(
    k: int = 10,
    bm25_k: int = 3,
    visual_k: int = 10,
    rrf_k: int = 60,
    n_patterns: int = 16,
    n_variants: int = 3,
    serve: str = "brute",
    nprobe: int = 2,
) -> str:
    """Replays caption_to_image_topk: the sim_bm25_topk SQL chain
    (top-bm25_k caption hits per literal query), the frozen descriptor
    table as both probe (hit images) and corpus side with
    best-probe-cosine ranking (ROUND 4 dp, ties by id), and the hybrid
    gate's reciprocal-rank fusion algebra (1/(rrf_k+rank) rounded 6 dp,
    DECIMAL(38,6) sums, ties by id).

    ``serve="ivfpq"`` swaps the brute best-probe block for the IVF-ADC
    serve replay (the _mm_embed_topk_oracle chain with the query side =
    the hits' probe descriptors under per-(query, rank) probe ids):
    cosine cell assignment + nprobe probing, per-subspace argmin encode
    (ties ORDER BY dist, code), the left-to-right ADC chain, the
    per-PROBE top-visual_k rank (ivfpq_topk's window), then
    best-probe-ADC-cosine per (query, image) feeding the same
    visual-rank + fusion tail."""
    from flink_1_3_2_hopsworks_spark.multimodal.synth import (
        frozen_descriptor_table,
    )

    desc_values = ",\n            ".join(
        "({}, {}, [{}]::DOUBLE[])".format(
            dk, dv, ", ".join(repr(x) for x in d)
        )
        for dk, dv, d in frozen_descriptor_table(n_patterns, n_variants)
    )
    vis_block = f"""probes AS (
        SELECT h.query_id, dd.dvec AS qv
        FROM hits h JOIN ddesc dd ON dd.doc_id = h.doc_id
    ), vis AS (
        SELECT p.query_id, c.doc_id,
            MAX(ROUND(LIST_COSINE_SIMILARITY(p.qv, c.dvec), 4)) AS mc
        FROM ddesc c CROSS JOIN probes p
        GROUP BY p.query_id, c.doc_id
    )"""
    if serve == "ivfpq":
        vis_block = _mm_ivfpq_vis_block(visual_k, nprobe)
    return f"""
    WITH queries(query_id, query_text) AS (
        VALUES (1, 'table scan join'), (2, 'window agg batch'),
               (3, 'customer order part'), (4, 'hash merge value'),
               (5, 'fast slow filter')
    ), toks AS (
        SELECT doc_id,
            UNNEST(LIST_FILTER(
                STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))), '\\s+'),
                x -> x <> '')) AS t
        FROM documents
    ), postings AS (
        SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY doc_id, t
    ), dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
    ), dft AS (
        SELECT t, COUNT(*) AS df FROM postings GROUP BY t
    ), stats AS (
        SELECT COUNT(*) AS n, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM dl
    ), qterms AS (
        SELECT DISTINCT query_id, UNNEST(LIST_FILTER(
            STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(query_text, ''))),
                '\\s+'),
            x -> x <> '')) AS t
        FROM queries
    ), contrib AS (
        SELECT q.query_id, p.doc_id,
            ROUND(
                LN(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5))
                * (p.tf * 2.2)
                / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)),
                6) AS c
        FROM postings p
        JOIN qterms q ON p.t = q.t
        JOIN dl d ON p.doc_id = d.doc_id
        JOIN dft f ON p.t = f.t
        CROSS JOIN stats s
    ), lexscored AS (
        SELECT query_id, doc_id, SUM(CAST(c AS DECIMAL(38, 6))) AS s
        FROM contrib GROUP BY query_id, doc_id
    ), lexranked AS (
        SELECT query_id, doc_id,
            ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY s DESC, doc_id ASC
            ) AS rank
        FROM lexscored
    ), hits AS MATERIALIZED (
        SELECT query_id, doc_id, rank FROM lexranked WHERE rank <= {bm25_k}
    ), dmap(dk, dv, dvec) AS (
        VALUES {desc_values}
    ), ddesc AS MATERIALIZED (
        SELECT d.doc_id, m.dvec
        FROM (
            SELECT doc_id, doc_id % {n_patterns} AS dk,
                (doc_id // {n_patterns}) % {n_variants} AS dv
            FROM documents
        ) d JOIN dmap m USING (dk, dv)
    ), {vis_block}, visranked AS (
        SELECT query_id, doc_id,
            ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY mc DESC, doc_id ASC
            ) AS rank
        FROM vis
    ), fuse AS (
        SELECT query_id, doc_id, rank FROM hits
        UNION ALL
        SELECT query_id, doc_id, rank FROM visranked
        WHERE rank <= {visual_k}
    ), contribs AS (
        SELECT query_id, doc_id,
            CAST(ROUND(1.0 / ({rrf_k}.0 + rank), 6) AS DECIMAL(38, 6)) AS c
        FROM fuse
    ), fused AS (
        SELECT query_id, doc_id, SUM(c) AS s,
            CAST(COUNT(*) AS BIGINT) AS n_lists
        FROM contribs GROUP BY query_id, doc_id
    ), ranked AS (
        SELECT query_id, doc_id, s, n_lists,
            CAST(ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY s DESC, doc_id ASC
            ) AS INTEGER) AS rank
        FROM fused
    )
    SELECT query_id, doc_id, ROUND(CAST(s AS DOUBLE), 6) AS rrf_score,
        n_lists, rank
    FROM ranked WHERE rank <= {k}
    ORDER BY query_id, rank
    """


def _mm_ivfpq_vis_block(visual_k: int, nprobe: int) -> str:
    """The IVF-ADC visual-expansion CTE block for
    _mm_text_to_image_oracle(serve='ivfpq') — ends in the same
    ``vis(query_id, doc_id, mc)`` relation the brute block produces.
    Probe ids are ``-(query_id·1000 + rank)``: negative, so the engine's
    ivfpq self-exclusion (id != probe id) never fires — mirrored here by
    simply omitting it."""
    from flink_1_3_2_hopsworks_spark.multimodal.embed import (
        DESCRIPTOR_DIM,
        mm_coarse_centroids,
        mm_codebooks,
    )
    from flink_1_3_2_hopsworks_spark.similarity.pq import _sqnorms

    cents, books = mm_coarse_centroids(), mm_codebooks()
    cent_values = ",\n                ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(cents)
    )
    books = [[list(c) for c in b] for b in books]
    m = len(books)
    d = DESCRIPTOR_DIM // m
    pq_values = ",\n                ".join(
        "({s}, {j}, [{cv}]::DOUBLE[], {sq})".format(
            s=s, j=j, cv=", ".join(repr(x) for x in c), sq=repr(sq)
        )
        for s, book in enumerate(books)
        for j, (c, sq) in enumerate(zip(book, _sqnorms(book)))
    )
    num_chain = "\n                + ".join(
        f"LIST_INNER_PRODUCT(q.qv[{s * d + 1}:{s * d + d}], c.cvs[{s + 1}])"
        for s in range(m)
    )
    xsq_chain = " + ".join(f"c.sqns[{s + 1}]" for s in range(m))
    return f"""cent(cell, ccv) AS (
        VALUES {cent_values}
    ), pqcent(s, code, cv, sqn) AS (
        VALUES {pq_values}
    ), probes AS MATERIALIZED (
        SELECT h.query_id, -(h.query_id * 1000 + h.rank) AS pid,
            dd.dvec AS qv,
            SQRT(LIST_INNER_PRODUCT(dd.dvec, dd.dvec)) AS qnorm
        FROM hits h JOIN ddesc dd ON dd.doc_id = h.doc_id
    ), csims AS (
        SELECT doc_id, cell, LIST_COSINE_SIMILARITY(dvec, ccv) AS sim
        FROM ddesc CROSS JOIN cent
    ), assigned AS (
        SELECT doc_id, cell FROM (
            SELECT doc_id, cell, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY sim DESC, cell ASC
            ) AS rn FROM csims
        ) WHERE rn = 1
    ), probed AS (
        SELECT pid, cell FROM (
            SELECT p.pid, ct.cell, ROW_NUMBER() OVER (
                PARTITION BY p.pid ORDER BY
                    LIST_COSINE_SIMILARITY(p.qv, ct.ccv) DESC, ct.cell ASC
            ) AS rn FROM probes p CROSS JOIN cent ct
        ) WHERE rn <= {nprobe}
    ), subs AS (
        SELECT doc_id, s, dvec[s * {d} + 1 : s * {d} + {d}] AS sub
        FROM ddesc CROSS JOIN (SELECT UNNEST(RANGE(0, {m})) AS s)
    ), distc AS (
        SELECT doc_id, p.s, p.code, p.cv, p.sqn,
            p.sqn - 2 * LIST_INNER_PRODUCT(sub, p.cv) AS dist
        FROM subs JOIN pqcent p USING (s)
    ), chosen AS (
        SELECT doc_id, s, cv, sqn FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id, s ORDER BY dist, code
            ) AS rn FROM distc
        ) WHERE rn = 1
    ), codesw AS (
        SELECT doc_id,
            LIST(cv ORDER BY s) AS cvs,
            LIST(sqn ORDER BY s) AS sqns
        FROM chosen GROUP BY doc_id
    ), adc AS (
        SELECT pr.pid, a.doc_id,
            ROUND(
                CASE WHEN q.qnorm * SQRT({xsq_chain}) = 0 THEN 0.0
                ELSE (
                {num_chain}
                ) / (q.qnorm * SQRT({xsq_chain})) END,
            4) AS cosine
        FROM probed pr
        JOIN assigned a ON a.cell = pr.cell
        JOIN codesw c ON c.doc_id = a.doc_id
        JOIN probes q ON q.pid = pr.pid
    ), perprobe AS (
        SELECT pid, doc_id, cosine FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY pid ORDER BY cosine DESC, doc_id ASC
            ) AS rn FROM adc
        ) WHERE rn <= {visual_k}
    ), vis AS (
        SELECT q.query_id, pp.doc_id, MAX(pp.cosine) AS mc
        FROM perprobe pp
        JOIN (SELECT DISTINCT pid, query_id FROM probes) q USING (pid)
        GROUP BY q.query_id, pp.doc_id
    )"""


ORACLE["mm_text_to_image_topk"] = _mm_text_to_image_oracle()
ORACLE["mm_text_to_image_ivf_topk"] = _mm_text_to_image_oracle(
    serve="ivfpq"
)
