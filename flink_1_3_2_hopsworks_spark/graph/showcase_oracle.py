"""DuckDB oracle SQL for the graph showcase queries."""

ORACLE: dict[str, str] = {
    "gr_degrees": """
        WITH edges AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey AS s
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey < 200
        )
        SELECT c AS id, COUNT(*) AS out_degree
        FROM edges
        GROUP BY c
        ORDER BY id
    """,
    "gr_sssp_hops": """
        WITH RECURSIVE base AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey < 200
        ), sym AS (
            SELECT c AS src, s AS dst FROM base
            UNION ALL
            SELECT s AS src, c AS dst FROM base
        ), reach(id, d) AS (
            SELECT (SELECT MIN(c) FROM base), 0
            UNION
            SELECT sym.dst, reach.d + 1
            FROM reach JOIN sym ON sym.src = reach.id
            WHERE reach.d < 20
        )
        SELECT id, MIN(d) AS hops
        FROM reach
        GROUP BY id
        ORDER BY id
    """,
    "gr_connected_components": """
        WITH RECURSIVE base AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey < 200 AND l_quantity >= 49.5
        ), sym AS (
            SELECT c AS src, s AS dst FROM base
            UNION ALL
            SELECT s AS src, c AS dst FROM base
        ), verts AS (
            SELECT DISTINCT src AS id FROM sym
        ), reach(root, node) AS (
            SELECT id, id FROM verts
            UNION
            SELECT reach.root, sym.dst
            FROM reach JOIN sym ON sym.src = reach.node
        )
        SELECT root AS id, CAST(MIN(node) AS BIGINT) AS component
        FROM reach
        GROUP BY root
        ORDER BY id
    """,
    "gr_triangle_count": """
        WITH base AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey < 200 AND l_quantity >= 49.5
        ), co AS (
            SELECT DISTINCT a.c AS u, b.c AS v
            FROM base a JOIN base b ON a.s = b.s AND a.c < b.c
        ), tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM co e1
            JOIN co e2 ON e2.u = e1.v
            JOIN co e3 ON e3.u = e1.u AND e3.v = e2.v
        ), ids AS (
            SELECT a AS id FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ), verts AS (
            SELECT DISTINCT id
            FROM (SELECT u AS id FROM co UNION ALL SELECT v AS id FROM co)
        )
        SELECT verts.id,
            CAST(COALESCE(t.cnt, 0) AS BIGINT) AS triangles
        FROM verts
        LEFT JOIN (SELECT id, COUNT(*) AS cnt FROM ids GROUP BY id) t
            USING (id)
        ORDER BY verts.id
    """,
    "gr_adamic_adar": """
        WITH base AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey < 200 AND l_quantity >= 49.5
        ), sym AS (
            SELECT DISTINCT src, dst FROM (
                SELECT c AS src, s AS dst FROM base
                UNION ALL
                SELECT s AS src, c AS dst FROM base
            ) WHERE src <> dst
        ), deg AS (
            SELECT src AS w, COUNT(*) AS wdeg FROM sym GROUP BY 1
        ), shared AS (
            SELECT l.dst AS u, r.dst AS v, l.src AS w
            FROM sym l JOIN sym r ON l.src = r.src AND l.dst < r.dst
        )
        SELECT u, v,
            CAST(ROUND(SUM(1.0 / LN(wdeg)), 4) AS DOUBLE) AS adamic_adar
        FROM shared JOIN deg USING (w)
        WHERE wdeg >= 2
        GROUP BY u, v
        ORDER BY u, v
    """,
    "gr_clustering_coef": """
        WITH base AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey < 200 AND l_quantity >= 49.5
        ), co AS (
            SELECT DISTINCT a.c AS u, b.c AS v
            FROM base a JOIN base b ON a.s = b.s AND a.c < b.c
        ), tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM co e1
            JOIN co e2 ON e2.u = e1.v
            JOIN co e3 ON e3.u = e1.u AND e3.v = e2.v
        ), ids AS (
            SELECT a AS id FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ), verts AS (
            SELECT id, CAST(COUNT(*) AS BIGINT) AS deg
            FROM (SELECT u AS id FROM co UNION ALL SELECT v AS id FROM co)
            GROUP BY id
        )
        SELECT verts.id,
            CAST(COALESCE(t.cnt, 0) AS BIGINT) AS triangles,
            deg AS degree,
            CASE WHEN deg >= 2 THEN
                CAST(ROUND(2.0 * COALESCE(t.cnt, 0) / (deg * (deg - 1)), 4)
                     AS DOUBLE)
            ELSE 0.0 END AS coefficient
        FROM verts
        LEFT JOIN (SELECT id, COUNT(*) AS cnt FROM ids GROUP BY id) t
            USING (id)
        ORDER BY verts.id
    """,
    "gr_graph_summarize": """
        WITH edges AS (
            SELECT DISTINCT o_custkey AS src, l_suppkey AS s
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey < 200
        )
        SELECT CAST(c.c_nationkey AS BIGINT) AS src_group,
            CAST(s.s_nationkey + 100 AS BIGINT) AS dst_group,
            CAST(COUNT(*) AS BIGINT) AS edge_count
        FROM edges
        JOIN customer c ON c.c_custkey = edges.src
        JOIN supplier s ON s.s_suppkey = edges.s
        GROUP BY 1, 2
        ORDER BY src_group, dst_group
    """,
    "gr_label_propagation": """
        WITH base AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey < 200 AND l_quantity >= 49.5
        ), sym AS (
            SELECT DISTINCT src, dst FROM (
                SELECT c AS src, s AS dst FROM base
                UNION ALL
                SELECT s AS src, c AS dst FROM base
            ) WHERE src <> dst
        ), state0 AS (
            SELECT DISTINCT src AS id, src AS label FROM sym
        ), votes1 AS (
            SELECT sym.dst AS id, s.label, COUNT(*) AS cnt
            FROM sym JOIN state0 s ON sym.src = s.id
            GROUP BY 1, 2
        ), best1 AS (
            SELECT id, label FROM (
                SELECT id, label, ROW_NUMBER() OVER (
                    PARTITION BY id ORDER BY cnt DESC, label ASC
                ) AS rn FROM votes1
            ) WHERE rn = 1
        ), state1 AS (
            SELECT s.id, COALESCE(b.label, s.label) AS label
            FROM state0 s LEFT JOIN best1 b ON b.id = s.id
        ), votes2 AS (
            SELECT sym.dst AS id, s.label, COUNT(*) AS cnt
            FROM sym JOIN state1 s ON sym.src = s.id
            GROUP BY 1, 2
        ), best2 AS (
            SELECT id, label FROM (
                SELECT id, label, ROW_NUMBER() OVER (
                    PARTITION BY id ORDER BY cnt DESC, label ASC
                ) AS rn FROM votes2
            ) WHERE rn = 1
        ), state2 AS (
            SELECT s.id, COALESCE(b.label, s.label) AS label
            FROM state1 s LEFT JOIN best2 b ON b.id = s.id
        )
        SELECT id, label FROM state2 ORDER BY id
    """,
    "gr_hits": """
        WITH base AS (
            SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey < 200 AND l_quantity >= 49.5
        ), verts AS (
            SELECT DISTINCT id FROM (
                SELECT src AS id FROM base UNION ALL SELECT dst FROM base
            )
        ), a1r AS (
            SELECT dst AS id, CAST(COUNT(*) AS DOUBLE) AS raw
            FROM base GROUP BY dst
        ), a1 AS (
            SELECT v.id,
                COALESCE(a1r.raw, 0) / (SELECT SUM(raw) FROM a1r) AS auth
            FROM verts v LEFT JOIN a1r USING (id)
        ), h1r AS (
            SELECT b.src AS id, SUM(a1.auth) AS raw
            FROM base b JOIN a1 ON a1.id = b.dst GROUP BY b.src
        ), h1 AS (
            SELECT v.id,
                COALESCE(h1r.raw, 0) / (SELECT SUM(raw) FROM h1r) AS hub
            FROM verts v LEFT JOIN h1r USING (id)
        ), a2r AS (
            SELECT b.dst AS id, SUM(h1.hub) AS raw
            FROM base b JOIN h1 ON h1.id = b.src GROUP BY b.dst
        ), a2 AS (
            SELECT v.id,
                COALESCE(a2r.raw, 0) / (SELECT SUM(raw) FROM a2r) AS auth
            FROM verts v LEFT JOIN a2r USING (id)
        ), h2r AS (
            SELECT b.src AS id, SUM(a2.auth) AS raw
            FROM base b JOIN a2 ON a2.id = b.dst GROUP BY b.src
        ), h2 AS (
            SELECT v.id,
                COALESCE(h2r.raw, 0) / (SELECT SUM(raw) FROM h2r) AS hub
            FROM verts v LEFT JOIN h2r USING (id)
        )
        SELECT h2.id,
            CAST(ROUND(ROUND(h2.hub, 6), 4) AS DOUBLE) AS hub,
            CAST(ROUND(ROUND(a2.auth, 6), 4) AS DOUBLE) AS auth
        FROM h2 JOIN a2 ON a2.id = h2.id
        ORDER BY h2.id
    """,
    "gr_facade_filtered_degrees": """
        WITH edges AS (
            SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey < 200
        ), verts AS (
            SELECT DISTINCT id FROM (
                SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges
            )
        ), kept AS (
            SELECT id FROM verts WHERE id <= 1000050
        ), fe AS (
            SELECT src, dst FROM edges
            WHERE src <= 1000050 AND dst <= 1000050
        ), outd AS (
            SELECT src AS id, COUNT(*) AS c FROM fe GROUP BY 1
        ), ind AS (
            SELECT dst AS id, COUNT(*) AS c FROM fe GROUP BY 1
        )
        SELECT k.id,
            CAST(COALESCE(o.c, 0) + COALESCE(i.c, 0) AS BIGINT) AS degree
        FROM kept k
        LEFT JOIN outd o USING (id)
        LEFT JOIN ind i USING (id)
        ORDER BY k.id
    """,
    "gr_pagerank": """
        WITH base AS (
            SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey < 200 AND l_quantity >= 49.5
        ), verts AS (
            SELECT DISTINCT id FROM (
                SELECT src AS id FROM base UNION ALL SELECT dst FROM base
            )
        ), nv AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts
        ), deg AS (
            SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS deg
            FROM base GROUP BY src
        ), r0 AS (
            SELECT v.id, 1.0 / (SELECT n FROM nv) AS rank FROM verts v
        ), d1 AS (
            SELECT COALESCE(SUM(r0.rank), 0) AS dangling
            FROM r0 LEFT JOIN deg USING (id) WHERE deg.id IS NULL
        ), c1 AS (
            SELECT b.dst AS id, SUM(r0.rank / deg.deg) AS c
            FROM base b
            JOIN r0 ON r0.id = b.src
            JOIN deg ON deg.id = b.src
            GROUP BY b.dst
        ), r1 AS (
            SELECT v.id,
                (0.15 / (SELECT n FROM nv)
                 + 0.85 * (SELECT dangling FROM d1) / (SELECT n FROM nv))
                + 0.85 * COALESCE(c1.c, 0) AS rank
            FROM verts v LEFT JOIN c1 USING (id)
        ), d2 AS (
            SELECT COALESCE(SUM(r1.rank), 0) AS dangling
            FROM r1 LEFT JOIN deg USING (id) WHERE deg.id IS NULL
        ), c2 AS (
            SELECT b.dst AS id, SUM(r1.rank / deg.deg) AS c
            FROM base b
            JOIN r1 ON r1.id = b.src
            JOIN deg ON deg.id = b.src
            GROUP BY b.dst
        ), r2 AS (
            SELECT v.id,
                (0.15 / (SELECT n FROM nv)
                 + 0.85 * (SELECT dangling FROM d2) / (SELECT n FROM nv))
                + 0.85 * COALESCE(c2.c, 0) AS rank
            FROM verts v LEFT JOIN c2 USING (id)
        )
        SELECT id, CAST(ROUND(rank, 5) AS DOUBLE) AS rank
        FROM r2 ORDER BY id
    """,
    "gr_customer_jaccard": """
        WITH edges AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey AS s
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey < 200
        ), deg AS (
            SELECT c, COUNT(*) AS d FROM edges GROUP BY c
        ), shared AS (
            SELECT a.c AS u, b.c AS v, COUNT(*) AS shared
            FROM edges a
            JOIN edges b ON a.s = b.s AND a.c < b.c
            GROUP BY 1, 2
        )
        SELECT
            u,
            v,
            shared,
            ROUND(shared / CAST(du.d + dv.d - shared AS DOUBLE), 4) AS jaccard
        FROM shared
        JOIN deg du ON du.c = u
        JOIN deg dv ON dv.c = v
        ORDER BY jaccard DESC, u, v
        LIMIT 500
    """,
}


def _k_core_oracle(k: int = 2, rounds: int = 40) -> str:
    """gr_k_core: the Matula–Beck peeling unrolled as a generated CTE chain
    (standard recursive CTEs cannot aggregate in the recursive term).
    ``rounds`` is far past the gate graph's fixpoint; once converged each
    extra round keeps the edge set unchanged, so over-unrolling is exact.
    Each round's CTEs are MATERIALIZED — every round references the
    previous ~3×, so default inlining would expand the tree 3^rounds."""
    ctes = [
        """e0 AS MATERIALIZED (
            SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey < 200 AND l_quantity >= 49.5
        )"""
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
            SELECT id FROM (
                SELECT src AS id FROM e{i - 1}
                UNION ALL SELECT dst AS id FROM e{i - 1}
            ) GROUP BY id HAVING COUNT(*) >= {k}
        ), e{i} AS MATERIALIZED (
            SELECT src, dst FROM e{i - 1}
            WHERE src IN (SELECT id FROM d{i})
              AND dst IN (SELECT id FROM d{i})
        )"""
        )
    return f"""
        WITH {", ".join(ctes)}
        SELECT id, COUNT(*) AS degree FROM (
            SELECT src AS id FROM e{rounds}
            UNION ALL SELECT dst AS id FROM e{rounds}
        ) GROUP BY id ORDER BY id
    """


ORACLE["gr_k_core"] = _k_core_oracle()


def _sssp_weighted_oracle(rounds: int = 25) -> str:
    """gr_sssp_weighted: Bellman-Ford unrolled as a MATERIALIZED CTE chain
    (recursive CTEs cannot take the per-vertex MIN in the recursive term
    without tracking every path; weights are integer-valued doubles so
    path sums are exact). Over-unrolling past the diameter is exact —
    converged rounds leave the distance table unchanged."""
    ctes = [
        """base AS MATERIALIZED (
            SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s,
                CAST(1 + (l_suppkey % 5) AS DOUBLE) AS w
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey < 200
        ), sym AS MATERIALIZED (
            SELECT c AS src, s AS dst, w FROM base
            UNION ALL
            SELECT s AS src, c AS dst, w FROM base
        ), d0 AS MATERIALIZED (
            SELECT (SELECT MIN(c) FROM base) AS id, 0.0 AS dist
        )"""
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
            SELECT id, MIN(dist) AS dist FROM (
                SELECT id, dist FROM d{i - 1}
                UNION ALL
                SELECT e.dst AS id, d.dist + e.w AS dist
                FROM d{i - 1} d JOIN sym e ON e.src = d.id
            ) GROUP BY id
        )"""
        )
    return f"""
        WITH {", ".join(ctes)}
        SELECT id, dist AS distance FROM d{rounds} ORDER BY id
    """


ORACLE["gr_sssp_weighted"] = _sssp_weighted_oracle()
