"""DuckDB oracle SQL for the streaming-layer showcase queries (batch-mode
semantics over events)."""

ORACLE: dict[str, str] = {
    "ev_tumbling_hourly": """
        SELECT
            STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
            STRFTIME(DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
            event_type,
            COUNT(*) AS n_events,
            ROUND(SUM(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2, 3
    """,
    "ev_sliding_2h_1h": """
        WITH starts AS (
            SELECT
                UNNEST([
                    DATE_TRUNC('hour', ts),
                    DATE_TRUNC('hour', ts) - INTERVAL 1 HOUR
                ]) AS ws
            FROM events
        )
        SELECT
            STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
            STRFTIME(ws + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
            COUNT(*) AS n_events
        FROM starts
        GROUP BY 1, 2
    """,
    "ds_stream_program": """
        WITH w AS (
            SELECT user_id, value,
                DATE_TRUNC('day', ts)
                + INTERVAL 6 HOUR * CAST(DATE_PART('hour', ts) // 6 AS INT)
                    AS ws
            FROM events WHERE event_type = 'purchase'
        )
        SELECT
            STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
            STRFTIME(ws + INTERVAL 6 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
            user_id,
            COUNT(*) AS n_purchases,
            ROUND(MAX(value), 2) AS max_value
        FROM w
        GROUP BY 1, 2, 3
    """,
    "ev_session_5m": """
        WITH marked AS (
            SELECT
                user_id, ts, value,
                CASE WHEN LAG(ts) OVER w IS NULL
                          OR ts - LAG(ts) OVER w >= INTERVAL 5 MINUTE
                     THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sessions AS (
            SELECT
                user_id, ts, value,
                SUM(brk) OVER (
                    PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS sid
            FROM marked
        )
        SELECT
            STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS window_start,
            STRFTIME(MAX(ts) + INTERVAL 5 MINUTE, '%Y-%m-%d %H:%M:%S') AS window_end,
            user_id,
            COUNT(*) AS n_events,
            ROUND(SUM(value), 2) AS total_value
        FROM sessions
        GROUP BY user_id, sid
    """,
    "ev_running_user_total": """
        SELECT
            user_id,
            event_id,
            ROUND(SUM(value) OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ), 2) AS running_total
        FROM events
    """,
    "cep_signup_purchase": """
        WITH s AS (
            SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup'
        ),
        p AS (
            SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
        ),
        ranked AS (
            SELECT
                s.user_id,
                s.event_id AS signup_id,
                p.event_id AS purchase_id,
                s.ts AS start_ts,
                p.ts AS end_ts,
                ROW_NUMBER() OVER (
                    PARTITION BY s.user_id, s.event_id
                    ORDER BY p.ts ASC, p.event_id ASC
                ) AS rn
            FROM s
            JOIN p ON p.user_id = s.user_id
                  AND (p.ts > s.ts
                       OR (p.ts = s.ts AND p.event_id > s.event_id))
                  AND p.ts < s.ts + INTERVAL 30 MINUTE
        )
        SELECT
            user_id,
            signup_id,
            purchase_id,
            STRFTIME(start_ts, '%Y-%m-%d %H:%M:%S') AS start_ts,
            STRFTIME(end_ts, '%Y-%m-%d %H:%M:%S') AS end_ts
        FROM ranked WHERE rn = 1
    """,
    "cep_error_spike": """
        WITH err AS (
            SELECT user_id, event_id, ts, value
            FROM events WHERE event_type = 'error'
        ),
        ranked AS (
            SELECT
                err.user_id,
                err.event_id AS error_id,
                e2.event_id AS spike_id,
                err.ts AS start_ts,
                e2.ts AS end_ts,
                ROW_NUMBER() OVER (
                    PARTITION BY err.user_id, err.event_id
                    ORDER BY e2.ts ASC, e2.event_id ASC
                ) AS rn
            FROM err
            JOIN events e2 ON e2.user_id = err.user_id
                  AND (e2.ts > err.ts
                       OR (e2.ts = err.ts AND e2.event_id > err.event_id))
                  AND e2.ts < err.ts + INTERVAL 30 MINUTE
                  AND e2.value > err.value
        )
        SELECT
            user_id,
            error_id,
            spike_id,
            STRFTIME(start_ts, '%Y-%m-%d %H:%M:%S') AS start_ts,
            STRFTIME(end_ts, '%Y-%m-%d %H:%M:%S') AS end_ts
        FROM ranked WHERE rn = 1
    """,
    "cep_clean_purchase": """
        WITH s AS (
            SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup'
        ),
        p AS (
            SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
        ),
        e AS (
            SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'
        ),
        ranked AS (
            SELECT
                s.user_id,
                s.event_id AS signup_id,
                p.event_id AS purchase_id,
                s.ts AS start_ts,
                p.ts AS end_ts,
                ROW_NUMBER() OVER (
                    PARTITION BY s.user_id, s.event_id
                    ORDER BY p.ts ASC, p.event_id ASC
                ) AS rn
            FROM s
            JOIN p ON p.user_id = s.user_id
                  AND (p.ts > s.ts
                       OR (p.ts = s.ts AND p.event_id > s.event_id))
                  AND p.ts < s.ts + INTERVAL 30 MINUTE
        )
        SELECT
            user_id,
            signup_id,
            purchase_id,
            STRFTIME(start_ts, '%Y-%m-%d %H:%M:%S') AS start_ts,
            STRFTIME(end_ts, '%Y-%m-%d %H:%M:%S') AS end_ts
        FROM ranked r
        WHERE rn = 1
          AND NOT EXISTS (
            SELECT 1 FROM e
            WHERE e.user_id = r.user_id
              AND (e.ts > r.start_ts
                   OR (e.ts = r.start_ts AND e.event_id > r.signup_id))
              AND (e.ts < r.end_ts
                   OR (e.ts = r.end_ts AND e.event_id < r.purchase_id))
          )
    """,
    "cep_signup_timeout": """
        SELECT
            s.user_id,
            s.event_id AS signup_id,
            STRFTIME(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts
        FROM events s
        WHERE s.event_type = 'signup'
          AND NOT EXISTS (
            SELECT 1 FROM events p
            WHERE p.event_type = 'purchase'
              AND p.user_id = s.user_id
              AND (p.ts > s.ts
                   OR (p.ts = s.ts AND p.event_id > s.event_id))
              AND p.ts < s.ts + INTERVAL 30 MINUTE
          )
    """,
    "ev_count_tumbling_20": """
        SELECT user_id, window_id,
            CAST(ROUND(SUM(value), 2) AS DOUBLE) AS sum_value,
            MIN(event_id) AS first_id,
            MAX(event_id) AS last_id
        FROM (
            SELECT user_id, event_id, value,
                CAST((ROW_NUMBER() OVER (
                    PARTITION BY user_id ORDER BY event_id
                ) - 1) // 20 AS BIGINT) AS window_id
            FROM events
        )
        GROUP BY user_id, window_id
        HAVING COUNT(*) = 20
    """,
    "ev_count_sliding_20_5": """
        SELECT user_id,
            CAST((rn // 5) - 1 AS BIGINT) AS window_id,
            n,
            CAST(ROUND(sum_value, 2) AS DOUBLE) AS sum_value
        FROM (
            SELECT user_id,
                ROW_NUMBER() OVER w AS rn,
                COUNT(*) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
                    AS n,
                SUM(value) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
                    AS sum_value
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        )
        WHERE rn % 5 = 0
    """,
    "cep_double_error": """
        SELECT user_id,
            prev_id AS first_error_id,
            event_id AS second_error_id,
            STRFTIME(prev_ts, '%Y-%m-%d %H:%M:%S') AS start_ts,
            STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS end_ts
        FROM (
            SELECT user_id, event_id, ts, event_type,
                LAG(event_type) OVER w AS prev_type,
                LAG(event_id) OVER w AS prev_id,
                LAG(ts) OVER w AS prev_ts
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        WHERE event_type = 'error' AND prev_type = 'error'
    """,
    "ev_window_join_click_purchase": """
        WITH c AS (
            SELECT user_id, DATE_TRUNC('hour', ts) AS w, event_id AS click_id
            FROM events WHERE event_type = 'click'
        ), p AS (
            SELECT user_id, DATE_TRUNC('hour', ts) AS w,
                   event_id AS purchase_id, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT c.user_id,
            STRFTIME(c.w, '%Y-%m-%d %H:%M:%S') AS window_start,
            STRFTIME(c.w + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
            c.click_id,
            p.purchase_id,
            ROUND(p.value, 2) AS purchase_value
        FROM c JOIN p ON p.user_id = c.user_id AND p.w = c.w
    """,
    "ev_window_cogroup_click_purchase": """
        SELECT user_id,
            STRFTIME(w, '%Y-%m-%d %H:%M:%S') AS window_start,
            STRFTIME(w + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
            CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_clicks,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_purchases,
            CAST(ROUND(COALESCE(
                SUM(CASE WHEN event_type = 'click' THEN value END), 0), 2)
                 AS DOUBLE) AS click_value,
            CAST(ROUND(COALESCE(
                SUM(CASE WHEN event_type = 'purchase' THEN value END), 0), 2)
                 AS DOUBLE) AS purchase_value
        FROM (
            SELECT user_id, DATE_TRUNC('hour', ts) AS w, event_type, value
            FROM events WHERE event_type IN ('click', 'purchase')
        )
        GROUP BY user_id, w
    """,
    "ev_first_event_per_key": """
        SELECT
            user_id,
            event_type,
            STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS first_ts,
            event_id,
            ROUND(value, 2) AS value
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts ASC, event_id ASC
            ) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    "ev_async_enrich": """
        SELECT
            event_id,
            user_id,
            value,
            CASE WHEN value >= 75.0 THEN 'high'
                 WHEN value >= 25.0 THEN 'mid'
                 ELSE 'low' END AS tier,
            ROUND(value * 0.03, 4) AS fee
        FROM events
        WHERE event_type = 'purchase'
        ORDER BY event_id
    """,
}

# The fused-JVM coGroup gate computes the SAME pane statistics as the
# full-pane operator gate — sharing the oracle is the equivalence claim.
ORACLE["ev_window_cogroup_agg_fused"] = ORACLE["ev_window_cogroup_click_purchase"]

def _curation_funnel_stream_oracle(
    n_epochs: int = 3,
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 8,
    max_bucket: int = 1000,
    salt: str = "fun10",
) -> str:
    """Replays streaming/funnel.py's sequential epoch loop in one SQL
    statement, composing the existing oracle algebra:

    - exact dedup across epochs collapses to keep-the-(epoch,id)-argmin
      per fingerprint: the fingerprint store before epoch e contains fp X
      iff some rule survivor carried X in an epoch < e (the min-id keeper
      of X's first epoch always enters the store), so a doc survives iff
      it is first for its fp in (epoch, id) order — no unrolling needed.
    - near dedup genuinely unrolls per epoch (the store's CONTENTS depend
      on earlier near verdicts): each epoch replays the incremental-ingest
      oracle (_incremental_near_oracle's shape) — store-side bucket cap →
      estimator probe → survivor star edges → per-epoch recursive-CTE
      closure — with store_e = the kept sets of epochs < e. Signatures
      and band buckets are computed ONCE over the exact-dedup survivors
      (they depend only on text), so the unroll shares one materialized
      sig/bucket table.
    - funnel arms: (epochs × stages) UNION arms emit count, token sum,
      and the salted-h32 survivor checksum per stage, exactly like the
      batch funnel oracle."""
    from flink_1_3_2_hopsworks_spark.dedup.showcase_oracle import (
        _minhash_agree,
        _minhash_cte_prefix,
    )

    agree = _minhash_agree(num_hashes)
    est = f"({agree}) / {float(num_hashes)} >= {threshold}"
    mh = _minhash_cte_prefix(
        shingle_k,
        num_hashes,
        bands,
        max_bucket,
        source="(SELECT d.doc_id, d.text FROM documents d "
        "JOIN s2 ON d.doc_id = s2.doc_id)",
        materialized=True,
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
            SELECT doc_id AS id FROM s2 WHERE ep = {e}
        ), st{e} AS (
            {store}
        ), stc{e} AS (
            SELECT * FROM (
                SELECT bu.*, COUNT(*) OVER (PARTITION BY band, bucket) AS cbs
                FROM buckets bu JOIN st{e} USING (id)
            ) WHERE cbs <= {max_bucket}
        ), bb{e} AS (
            SELECT bu.* FROM buckets bu JOIN b{e} USING (id)
        ), cd{e} AS (
            SELECT DISTINCT bb.id
            FROM stc{e} cb
            JOIN bb{e} bb ON cb.band = bb.band AND cb.bucket = bb.bucket
            JOIN sig sa ON sa.id = cb.id
            JOIN sig sb ON sb.id = bb.id
            WHERE {est}
        ), svc{e} AS (
            SELECT * FROM (
                SELECT sv.*, COUNT(*) OVER (PARTITION BY band, bucket) AS sbs
                FROM (
                    SELECT * FROM bb{e}
                    WHERE id NOT IN (SELECT id FROM cd{e})
                ) sv
            ) WHERE sbs <= {max_bucket}
        ), an{e} AS (
            SELECT band, bucket, MIN(id) AS aid
            FROM svc{e} GROUP BY band, bucket
        ), ed{e} AS MATERIALIZED (
            SELECT DISTINCT a.aid AS id_a, c.id AS id_b
            FROM an{e} a
            JOIN svc{e} c ON a.band = c.band AND a.bucket = c.bucket
                         AND c.id > a.aid
            JOIN sig sa ON sa.id = a.aid
            JOIN sig sb ON sb.id = c.id
            WHERE {est}
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
    ck = (
        "('0x' || SUBSTR(MD5(CONCAT_WS('|', CAST(doc_id AS VARCHAR), "
        f"'{salt}ck')), 1, 8))::BIGINT"
    )
    arms = []
    for e in range(n_epochs):
        rels = [
            ("input", f"(SELECT * FROM sigd WHERE ep = {e})"),
            ("rules", f"(SELECT * FROM s1 WHERE ep = {e})"),
            ("exact_dedup", f"(SELECT * FROM s2 WHERE ep = {e})"),
            ("near_dedup", f"(SELECT s2.* FROM s2 JOIN k{e} ON s2.doc_id = k{e}.id)"),
        ]
        for i, (name, rel) in enumerate(rels):
            arms.append(
                f"SELECT {e} AS batch_id, {i} AS stage_idx,"
                f" '{name}' AS stage,"
                f" CAST(COUNT(*) AS BIGINT) AS n_docs,"
                f" CAST(COALESCE(SUM(ntok), 0) AS BIGINT) AS n_tokens,"
                f" CAST(COALESCE(SUM({ck}), 0) AS BIGINT) AS id_checksum"
                f" FROM {rel}"
            )
    arms_sql = "\n        UNION ALL\n        ".join(arms)
    epochs_sql = ", ".join(epoch_ctes)
    return f"""
    WITH RECURSIVE sigd AS MATERIALIZED (
        SELECT doc_id, doc_id % {n_epochs} AS ep,
            CASE WHEN LENGTH(TRIM(COALESCE(text, ''))) = 0 THEN 0
                 ELSE LEN(STRING_SPLIT_REGEX(TRIM(COALESCE(text, '')), '\\s+'))
            END AS ntok,
            MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS fp,
            NOT (LOWER(COALESCE(text, '')) LIKE '%lorem ipsum%'
                 OR COALESCE(text, '') LIKE '%{{%') AS c4
        FROM documents
    ), s1 AS MATERIALIZED (
        SELECT * FROM sigd WHERE c4
    ), s2 AS MATERIALIZED (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY fp ORDER BY ep, doc_id
            ) AS rn FROM s1
        ) WHERE rn = 1
    ), {mh}, {epochs_sql}
    SELECT * FROM (
        {arms_sql}
    ) ORDER BY batch_id, stage_idx
    """


ORACLE["ev_curation_funnel_stream"] = _curation_funnel_stream_oracle()
# The self-compacting arm reproduces the identical funnel rows from a
# mid-replay-compacted store (verdict equivalence is the compaction
# contract) — same oracle, deliberately.
ORACLE["ev_curation_funnel_stream_compacting"] = (
    _curation_funnel_stream_oracle()
)

ORACLE["ev_curation_stream_stats"] = """
    WITH kept AS (
        SELECT ts, event_id, value,
            MD5(REGEXP_REPLACE(LOWER(TRIM(props)), '\\s+', ' ', 'g')) AS fp
        FROM events
        WHERE event_type <> 'error' AND value >= 5.0
    ), firsts AS (
        SELECT ts, value FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY fp ORDER BY ts ASC, event_id ASC, value ASC
            ) AS rn FROM kept
        ) WHERE rn = 1
    )
    SELECT
        STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        STRFTIME(DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR,
                 '%Y-%m-%d %H:%M:%S') AS window_end,
        COUNT(*) AS n_docs,
        CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(38, 2))) AS DOUBLE)
            AS total_value
    FROM firsts
    GROUP BY 1, 2
    ORDER BY 1
"""


def _pair_funnel_stream_oracle(
    n_epochs: int = 3,
    n_patterns: int = 16,
    n_variants: int = 3,
    min_brightness: float = 105.0,
    max_brightness: float = 137.0,
    min_contrast: float = 40.0,
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 8,
    max_distance: int = 3,
    max_bucket: int = 1000,
    salt: str = "pairfun11",
) -> str:
    """Replays streaming/pair_funnel.py's sequential epoch loop in one
    SQL statement, composing the two sibling stream oracles over JOINT
    pair survivor sets:

    - caption signals (ntok, md5 fp, C4 rules) + the frozen image stats
      model build the per-pair frame; both EXACT stages collapse to
      (epoch, id)-argmin — per caption fp over the stateless survivors,
      then per aHash over the caption-exact survivors (each stage's
      candidate set is derivable without unrolling, so the min-id keeper
      of a key's first epoch always enters that store).
    - caption near-dedup unrolls per epoch over ONE shared materialized
      signature table restricted to the image-exact survivors (store_e =
      the caption-near kept sets of epochs < e), the text funnel
      oracle's k{e} blocks verbatim.
    - image near-dedup unrolls per epoch over the shared chunk table
      (batch = k{e}, store_e = the image-near kept sets m{j<e}), the
      media funnel oracle's blocks including the r11 uncapped equality
      arm (provably empty here — image-exact keeps one pair per aHash
      globally — mirrored for fidelity).
    - 21 funnel arms emit (pair count, caption tokens, image bytes,
      PAIR-CONSISTENT checksum binding id + caption fp + aHash)."""
    from flink_1_3_2_hopsworks_spark.dedup.showcase_oracle import (
        _minhash_agree,
        _minhash_cte_prefix,
    )
    from flink_1_3_2_hopsworks_spark.multimodal.synth import (
        frozen_image_stats_table,
    )

    values = ",\n            ".join(
        f"({k}, {v}, {m!r}, {s!r}, {fp}::BIGINT, {nb})"
        for k, v, m, s, fp, nb in frozen_image_stats_table(
            n_patterns, n_variants
        )
    )
    agree = _minhash_agree(num_hashes)
    est = f"({agree}) / {float(num_hashes)} >= {threshold}"
    mh = _minhash_cte_prefix(
        shingle_k,
        num_hashes,
        bands,
        max_bucket,
        source="(SELECT d.doc_id, d.text FROM documents d "
        "JOIN p4 ON d.doc_id = p4.doc_id)",
        materialized=True,
    )
    cap_blocks = []
    img_blocks = []
    for e in range(n_epochs):
        if e == 0:
            store = "SELECT CAST(NULL AS BIGINT) AS id WHERE FALSE"
            istore = "SELECT CAST(NULL AS BIGINT) AS id WHERE FALSE"
        else:
            store = "\n            UNION ALL\n            ".join(
                f"SELECT id FROM k{j}" for j in range(e)
            )
            istore = "\n            UNION ALL\n            ".join(
                f"SELECT id FROM m{j}" for j in range(e)
            )
        cap_blocks.append(f"""b{e} AS (
            SELECT doc_id AS id FROM p4 WHERE ep = {e}
        ), st{e} AS (
            {store}
        ), stc{e} AS (
            SELECT * FROM (
                SELECT bu.*, COUNT(*) OVER (PARTITION BY band, bucket) AS cbs
                FROM buckets bu JOIN st{e} USING (id)
            ) WHERE cbs <= {max_bucket}
        ), bb{e} AS (
            SELECT bu.* FROM buckets bu JOIN b{e} USING (id)
        ), cd{e} AS (
            SELECT DISTINCT bb.id
            FROM stc{e} cb
            JOIN bb{e} bb ON cb.band = bb.band AND cb.bucket = bb.bucket
            JOIN sig sa ON sa.id = cb.id
            JOIN sig sb ON sb.id = bb.id
            WHERE {est}
        ), svc{e} AS (
            SELECT * FROM (
                SELECT sv.*, COUNT(*) OVER (PARTITION BY band, bucket) AS sbs
                FROM (
                    SELECT * FROM bb{e}
                    WHERE id NOT IN (SELECT id FROM cd{e})
                ) sv
            ) WHERE sbs <= {max_bucket}
        ), an{e} AS (
            SELECT band, bucket, MIN(id) AS aid
            FROM svc{e} GROUP BY band, bucket
        ), ed{e} AS MATERIALIZED (
            SELECT DISTINCT a.aid AS id_a, c.id AS id_b
            FROM an{e} a
            JOIN svc{e} c ON a.band = c.band AND a.bucket = c.bucket
                         AND c.id > a.aid
            JOIN sig sa ON sa.id = a.aid
            JOIN sig sb ON sb.id = c.id
            WHERE {est}
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
        img_blocks.append(f"""ist{e} AS (
            {istore}
        ), istc{e} AS (
            SELECT * FROM (
                SELECT c.*, COUNT(*) OVER (PARTITION BY ci, cv) AS cbs
                FROM ch c JOIN ist{e} s ON c.doc_id = s.id
            ) WHERE cbs <= {max_bucket}
        ), ibb{e} AS (
            SELECT c.* FROM ch c JOIN k{e} b ON c.doc_id = b.id
        ), icd{e} AS (
            SELECT DISTINCT bb.doc_id AS id
            FROM istc{e} sc
            JOIN ibb{e} bb ON sc.ci = bb.ci AND sc.cv = bb.cv
            WHERE BIT_COUNT(XOR(sc.ah, bb.ah)) <= {max_distance}
            UNION
            -- the r11 uncapped EQUALITY arm (Hamming-0 under the cap) —
            -- provably empty here, mirrored for fidelity
            SELECT DISTINCT b.doc_id AS id
            FROM (SELECT p4.doc_id, p4.ah FROM p4
                  JOIN k{e} ON p4.doc_id = k{e}.id) b
            JOIN (SELECT p4.ah FROM p4
                  JOIN ist{e} s ON p4.doc_id = s.id) st ON st.ah = b.ah
        ), isvc{e} AS (
            SELECT * FROM (
                SELECT sv.*, COUNT(*) OVER (PARTITION BY ci, cv) AS sbs
                FROM (
                    SELECT * FROM ibb{e}
                    WHERE doc_id NOT IN (SELECT id FROM icd{e})
                ) sv
            ) WHERE sbs <= {max_bucket}
        ), ian{e} AS (
            SELECT ci, cv, doc_id AS aid, ah AS aah FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY ci, cv ORDER BY doc_id
                ) AS rn FROM isvc{e}
            ) WHERE rn = 1
        ), ied{e} AS MATERIALIZED (
            SELECT DISTINCT n.aid AS id_a, c.doc_id AS id_b
            FROM isvc{e} c
            JOIN ian{e} n ON c.ci = n.ci AND c.cv = n.cv
                        AND c.doc_id > n.aid
            WHERE BIT_COUNT(XOR(n.aah, c.ah)) <= {max_distance}
        ), isy{e} AS MATERIALIZED (
            SELECT id_a AS src, id_b AS dst FROM ied{e}
            UNION ALL
            SELECT id_b AS src, id_a AS dst FROM ied{e}
        ), irc{e}(root, node) AS (
            SELECT DISTINCT src, src FROM isy{e}
            UNION
            SELECT irc{e}.root, isy{e}.dst
            FROM irc{e} JOIN isy{e} ON isy{e}.src = irc{e}.node
        ), icp{e} AS (
            SELECT root AS id, MIN(node) AS component
            FROM irc{e} GROUP BY root
        ), m{e} AS MATERIALIZED (
            SELECT b.id FROM k{e} b
            LEFT JOIN icd{e} cd ON cd.id = b.id
            LEFT JOIN icp{e} c ON c.id = b.id
            WHERE cd.id IS NULL AND COALESCE(c.component, b.id) = b.id
        )""")
    ck = (
        "('0x' || SUBSTR(MD5(CONCAT_WS('|', CAST(doc_id AS VARCHAR), cfp, "
        f"CAST(ah AS VARCHAR), '{salt}ck')), 1, 8))::BIGINT"
    )
    arms = []
    for e in range(n_epochs):
        rels = [
            ("input", f"(SELECT * FROM sigd WHERE ep = {e})"),
            ("caption_rules", f"(SELECT * FROM p1 WHERE ep = {e})"),
            ("image_quality", f"(SELECT * FROM p2 WHERE ep = {e})"),
            ("caption_exact_dedup", f"(SELECT * FROM p3 WHERE ep = {e})"),
            ("image_exact_dedup", f"(SELECT * FROM p4 WHERE ep = {e})"),
            ("caption_near_dedup",
             f"(SELECT p4.* FROM p4 JOIN k{e} ON p4.doc_id = k{e}.id)"),
            ("image_near_dedup",
             f"(SELECT p4.* FROM p4 JOIN m{e} ON p4.doc_id = m{e}.id)"),
        ]
        for i, (name, rel) in enumerate(rels):
            arms.append(
                f"SELECT {e} AS batch_id, {i} AS stage_idx,"
                f" '{name}' AS stage,"
                f" CAST(COUNT(*) AS BIGINT) AS n_pairs,"
                f" CAST(COALESCE(SUM(ntok), 0) AS BIGINT) AS n_tokens,"
                f" CAST(COALESCE(SUM(nb), 0) AS BIGINT) AS n_bytes,"
                f" CAST(COALESCE(SUM({ck}), 0) AS BIGINT) AS pair_checksum"
                f" FROM {rel}"
            )
    arms_sql = "\n        UNION ALL\n        ".join(arms)
    blocks_sql = ", ".join(cap_blocks + img_blocks)
    return f"""
    WITH RECURSIVE model(mk, mv, mean, std, ah, nb) AS (
        VALUES {values}
    ), sigd AS MATERIALIZED (
        SELECT d.doc_id, d.doc_id % {n_epochs} AS ep,
            CASE WHEN LENGTH(TRIM(COALESCE(d.text, ''))) = 0 THEN 0
                 ELSE LEN(STRING_SPLIT_REGEX(TRIM(COALESCE(d.text, '')),
                          '\\s+'))
            END AS ntok,
            MD5(REGEXP_REPLACE(LOWER(TRIM(d.text)), '\\s+', ' ', 'g'))
                AS cfp,
            NOT (LOWER(COALESCE(d.text, '')) LIKE '%lorem ipsum%'
                 OR COALESCE(d.text, '') LIKE '%{{%') AS c4,
            m.mean, m.std, m.ah, m.nb
        FROM documents d
        JOIN model m ON m.mk = d.doc_id % {n_patterns}
                    AND m.mv = (d.doc_id // {n_patterns}) % {n_variants}
    ), p1 AS MATERIALIZED (
        SELECT * FROM sigd WHERE c4
    ), p2 AS MATERIALIZED (
        SELECT * FROM p1
        WHERE mean >= {min_brightness!r} AND mean <= {max_brightness!r}
          AND std >= {min_contrast!r}
    ), p3 AS MATERIALIZED (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY cfp ORDER BY ep, doc_id
            ) AS rn FROM p2
        ) WHERE rn = 1
    ), p4 AS MATERIALIZED (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY ah ORDER BY ep, doc_id
            ) AS rn2 FROM p3
        ) WHERE rn2 = 1
    ), {mh}, ch AS MATERIALIZED (
        SELECT doc_id, ep, ah, ci, (ah >> (ci * 16)) & 65535 AS cv
        FROM p4 CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS ci)
    ), {blocks_sql}
    SELECT * FROM (
        {arms_sql}
    ) ORDER BY batch_id, stage_idx
    """


ORACLE["mm_pair_curation_funnel_stream"] = _pair_funnel_stream_oracle()
