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
