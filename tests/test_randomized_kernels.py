"""Randomized kernel tests (SURVEY §5 "Randomized/property-style" layer —
the reference drives hash/sort/join kernels with seeded random records:
HashTableITCase, ExternalSortITCase, NonReusingHashJoinIteratorITCase).

Here: one seeded random dataset (~2k rows, nulls included), each kernel
compared against an independent pandas model in one Spark action. Seeded,
not hypothesis-driven — mirroring the reference's approach (it used fixed
random generators, not a QuickCheck framework), and keeping the suite to a
handful of Spark jobs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

N = 2000
KEYS = 37  # forces collisions — the interesting hash-kernel case


def _random_pdf(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, KEYS, N),
            "v": np.round(rng.normal(100, 50, N), 4),
            "s": [f"s{int(x)}" for x in rng.integers(0, 500, N)],
        }
    )
    # ~5% null values and null keys
    pdf.loc[rng.random(N) < 0.05, "v"] = None
    pdf["k"] = pdf["k"].astype("object")
    pdf.loc[rng.random(N) < 0.05, "k"] = None
    return pdf


@pytest.fixture(scope="module")
def data(spark):
    pdf = _random_pdf(0)
    rows = [
        (
            None if pd.isna(k) else int(k),
            None if pd.isna(v) else float(v),
            s,
        )
        for k, v, s in zip(pdf["k"], pdf["v"], pdf["s"])
    ]
    df = spark.createDataFrame(rows, "k BIGINT, v DOUBLE, s STRING")
    return df.localCheckpoint(eager=True), pdf


def test_hash_aggregate_kernel(data):
    df, pdf = data
    got = {
        r.k: (r.n, r.n_v, round(r.total, 4) if r.total is not None else None)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("v").alias("n_v"),  # count skips nulls
            F.round(F.sum("v"), 4).alias("total"),
        )
        .collect()
    }
    model = {}
    for k, g in pdf.groupby("k", dropna=False):
        key = None if pd.isna(k) else int(k)
        total = g["v"].sum(min_count=1)
        model[key] = (
            len(g),
            int(g["v"].notna().sum()),
            None if pd.isna(total) else round(total, 4),
        )
    assert got == model


def test_sort_kernel_null_ordering(data):
    df, pdf = data
    got = [
        (r.k, r.v)
        for r in df.orderBy(F.asc_nulls_first("k"), F.desc_nulls_last("v"), F.asc("s"))
        .select("k", "v")
        .collect()
    ]
    # emulate Spark's per-key null placement (nulls FIRST for
    # asc_nulls_first(k), LAST for desc_nulls_last(v)) with rank columns.
    ordered = pdf.assign(
        _kn=pdf["k"].isna(), _vn=pdf["v"].isna()
    ).sort_values(
        ["_kn", "k", "_vn", "v", "s"],
        ascending=[False, True, True, False, True],
        kind="mergesort",
    )
    model = [
        (None if pd.isna(k) else int(k), None if pd.isna(v) else v)
        for k, v in zip(ordered["k"], ordered["v"])
    ]
    assert got == model


def test_hash_join_kernel_null_keys_never_match(spark, data):
    df, pdf = data
    build_pdf = _random_pdf(1).drop_duplicates("k").dropna(subset=["k"])[["k", "s"]]
    build = spark.createDataFrame(
        build_pdf.rename(columns={"s": "name"}).astype({"k": "int"}),
        "k LONG, name STRING",
    )
    got_inner = df.join(build, "k").count()
    got_left = df.join(build, "k", "left").count()

    probe = pdf.dropna(subset=["k"]).astype({"k": "int"})
    matches = probe.merge(build_pdf.astype({"k": "int"}), on="k")
    assert got_inner == len(matches)  # null probe keys drop out
    assert got_left == len(pdf)  # left keeps every probe row exactly once


def test_set_op_kernels_bag_semantics(spark):
    rng = np.random.default_rng(2)
    a_vals = rng.integers(0, 20, 300).tolist()
    b_vals = rng.integers(0, 20, 250).tolist()
    a = spark.createDataFrame([(int(v),) for v in a_vals], "x INT")
    b = spark.createDataFrame([(int(v),) for v in b_vals], "x INT")

    from collections import Counter

    ca, cb = Counter(a_vals), Counter(b_vals)
    got_except = sorted(r.x for r in a.exceptAll(b).collect())
    model_except = sorted(
        v for v, c in ((v, c - cb.get(v, 0)) for v, c in ca.items()) for _ in range(c) if c > 0
    )
    assert got_except == model_except

    got_intersect = sorted(r.x for r in a.intersectAll(b).collect())
    model_intersect = sorted(
        v for v in ca for _ in range(min(ca[v], cb.get(v, 0)))
    )
    assert got_intersect == model_intersect


def test_session_window_kernel_gap_islands(spark):
    """Session merge semantics on random timestamps vs a gap-island model
    (reference WindowOperatorTest's session coverage, randomized)."""
    rng = np.random.default_rng(3)
    base = pd.Timestamp("2024-01-01")
    rows = []
    for key in range(5):
        ts = np.sort(rng.integers(0, 3600, 80))
        rows.extend((key, base + pd.Timedelta(seconds=int(t))) for t in ts)
    pdf = pd.DataFrame(rows, columns=["k", "ts"])
    df = spark.createDataFrame(pdf)

    got = (
        df.groupBy(F.session_window("ts", "60 seconds"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("k", "n")
        .collect()
    )
    got_sessions = sorted((r.k, r.n) for r in got)

    model = []
    for key, g in pdf.groupby("k"):
        times = sorted(g["ts"])
        count = 1
        for prev, cur in zip(times, times[1:]):
            # Spark merges when the next event is <= gap away (closed
            # boundary: events exactly 60s apart share a session)
            if (cur - prev).total_seconds() > 60:
                model.append((key, count))
                count = 1
            else:
                count += 1
        model.append((key, count))
    assert got_sessions == sorted(model)



@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_asof_join_equals_naive_oracle(spark, seed):
    """The union-merge as-of join must equal the naive per-row 'latest right
    row with t <= left.t, ties by largest rid' definition on random inputs
    (seeded, like the other kernels here)."""
    from flink_1_3_2_hopsworks_spark.operators.asof import asof_join

    rng = np.random.default_rng(seed)
    left_rows = [
        (int(rng.integers(1, 4)), int(rng.integers(0, 50)), i)
        for i in range(30)
    ]
    right_rows = [
        (int(rng.integers(1, 4)), int(rng.integers(0, 50)), 1000 + i)
        for i in range(30)
    ]
    left = spark.createDataFrame(left_rows, "k long, t long, lid long")
    right = spark.createDataFrame(
        [(k, t, rid, float(rid % 7)) for k, t, rid in right_rows],
        "k long, t long, rid long, v double",
    )
    got = {
        r["lid"]: (r["last_rid"], r["last_v"])
        for r in asof_join(
            left, right, ["k"], "t", "t", ["rid", "v"], right_tiebreak="rid"
        ).collect()
    }
    for k, t, lid in left_rows:
        cand = [(rt, rid) for rk, rt, rid in right_rows if rk == k and rt <= t]
        if not cand:
            assert got[lid] == (None, None)
        else:
            _, best = max(cand)
            assert got[lid] == (best, float(best % 7))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_star_clusters_refine_pair_clusters(spark, seed):
    """Star edges are a subset of the pair graph, so star components must
    REFINE pair components: two docs the star pipeline puts in one cluster
    are always in one pair-pipeline cluster (precision is never worse),
    and any doc the star pipeline drops is also dropped by the pair
    pipeline's cluster containing it. Randomized corpora with planted
    exact-dup groups and shuffled filler."""
    from flink_1_3_2_hopsworks_spark.dedup.minhash import (
        minhash_near_dups,
        minhash_star_edges,
    )
    from flink_1_3_2_hopsworks_spark.dedup.neardup import (
        resolve_duplicate_clusters,
    )

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(120):
        words = rng.choice(vocab, size=rng.integers(6, 30))
        rows.append((i, " ".join(words)))
    # plant duplicate groups of varying size
    gid = 1000
    for size in (2, 3, 5):
        text = " ".join(rng.choice(vocab, size=20))
        for j in range(size):
            rows.append((gid + j, text))
        gid += 100
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = minhash_near_dups(docs, "doc_id", "text", threshold=0.8)
    star = minhash_star_edges(docs, "doc_id", "text", threshold=0.8)
    pv = {
        r["doc_id"]: r["canonical_id"]
        for r in resolve_duplicate_clusters(docs, pairs, "doc_id").collect()
    }
    sv = {
        r["doc_id"]: r["canonical_id"]
        for r in resolve_duplicate_clusters(docs, star, "doc_id").collect()
    }
    # refinement: same star canonical => same pair canonical
    for a in sv:
        for b in sv:
            if a < b and sv[a] == sv[b]:
                assert pv[a] == pv[b], (a, b, sv[a], pv[a], pv[b])
    # planted exact-dup groups must be fully clustered by BOTH pipelines
    for base in (1000, 1100, 1200):
        group = [d for d in sv if d >= base and d < base + 100]
        assert len({sv[d] for d in group}) == 1
        assert len({pv[d] for d in group}) == 1


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_k_core_matches_python_peeling(spark, seed):
    """k_core vs a direct python Matula–Beck peel on random graphs —
    same surviving vertex set and within-core degrees."""
    from flink_1_3_2_hopsworks_spark.graph.library import k_core

    rng = np.random.default_rng(seed)
    n = 60
    edges = {
        (int(a), int(b)) if a < b else (int(b), int(a))
        for a, b in rng.integers(0, n, (150, 2))
        if a != b
    }
    k = 3
    # python reference peel
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
    want = {v: len(nb) for v, nb in adj.items()}

    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {r["id"]: r["degree"] for r in k_core(df, k=k).collect()}
    assert got == want


@pytest.mark.parametrize("seed", [0, 1])
def test_sssp_weighted_matches_dijkstra(spark, seed):
    """Weighted sssp vs a python Dijkstra on random weighted digraphs."""
    import heapq

    from flink_1_3_2_hopsworks_spark.graph.pregel import sssp

    rng = np.random.default_rng(seed)
    n = 40
    rows = [
        (int(a), int(b), float(w))
        for (a, b), w in zip(
            rng.integers(0, n, (120, 2)), rng.integers(1, 9, 120)
        )
        if a != b
    ]
    adj = {}
    for a, b, w in rows:
        adj.setdefault(a, []).append((b, w))
    dist = {0: 0.0}
    pq = [(0.0, 0)]
    while pq:
        d, v = heapq.heappop(pq)
        if d > dist.get(v, float("inf")):
            continue
        for u, w in adj.get(v, []):
            nd = d + w
            if nd < dist.get(u, float("inf")):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))

    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    out = sssp(df, source=0, max_iterations=50)
    got = {
        r["id"]: r["distance"]
        for r in out.collect()
        if r["distance"] != float("inf")
    }
    assert got == dist


@pytest.mark.parametrize("seed", [0, 1])
def test_dup_span_removal_matches_python_reference(spark, seed):
    """remove_duplicated_spans vs a direct python replay (gram strings
    instead of hashes — equivalent modulo 64-bit collisions) on random
    low-entropy corpora that force window collisions."""
    from flink_1_3_2_hopsworks_spark.dedup.spans import remove_duplicated_spans

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(6)]
    window = 4
    rows = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(2, 14))))
        for i in range(40)
    ]

    # python reference: keep-first-occurrence removal
    toks = {i: t.lower().split() for i, t in rows}
    owners, counts = {}, {}
    for i, tk in toks.items():
        for p in range(max(len(tk) - window + 1, 0)):
            g = " ".join(tk[p : p + window])
            counts[g] = counts.get(g, 0) + 1
            owners[g] = min(owners.get(g, i), i)
    want = {}
    for i, tk in toks.items():
        drop = set()
        for p in range(max(len(tk) - window + 1, 0)):
            g = " ".join(tk[p : p + window])
            if counts[g] > 1 and i > owners[g]:
                drop.update(range(p, p + window))
        kept = [t for j, t in enumerate(tk) if j not in drop]
        want[i] = (" ".join(kept), len(tk) - len(kept))

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_duplicated_spans(df, "doc_id", "text", window).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [0, 1])
def test_boilerplate_removal_matches_python_reference(spark, seed):
    """remove_boilerplate_spans vs a direct python replay: grams in
    >= min_docs DISTINCT docs are dropped everywhere."""
    from flink_1_3_2_hopsworks_spark.dedup.spans import remove_boilerplate_spans

    rng = np.random.default_rng(seed + 100)
    vocab = [f"w{i}" for i in range(6)]
    window, min_docs = 4, 3
    rows = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(2, 14))))
        for i in range(40)
    ]

    toks = {i: t.lower().split() for i, t in rows}
    gram_docs = {}
    for i, tk in toks.items():
        for p in range(max(len(tk) - window + 1, 0)):
            g = " ".join(tk[p : p + window])
            gram_docs.setdefault(g, set()).add(i)
    boiler = {g for g, ds in gram_docs.items() if len(ds) >= min_docs}
    want = {}
    for i, tk in toks.items():
        drop = set()
        for p in range(max(len(tk) - window + 1, 0)):
            if " ".join(tk[p : p + window]) in boiler:
                drop.update(range(p, p + window))
        kept = [t for j, t in enumerate(tk) if j not in drop]
        want[i] = (" ".join(kept), len(tk) - len(kept))

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_boilerplate_spans(
            df, "doc_id", "text", window, min_docs
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [0, 1])
def test_minhash_star_edges_match_python_replay(spark, seed):
    """The PORTABLE star-edge pipeline end-to-end vs a pure-python replay
    of every stage (normalize -> shingles -> md5 base hash -> affine
    minima -> band keys -> cap -> anchors -> estimator) on random corpora
    — the same determinism contract the SQL oracles rely on, checked
    across corpus shapes instead of one gate dataset."""
    import hashlib
    import re

    from flink_1_3_2_hopsworks_spark.dedup.minhash import (
        _MERSENNE,
        _coeffs,
        minhash_star_edges,
    )

    k, num_hashes, bands, max_bucket, thr = 5, 32, 8, 4, 0.8
    rows_per = num_hashes // bands
    rng = np.random.default_rng(seed + 7)
    vocab = [f"w{i}" for i in range(8)]
    corpus = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(3, 12))))
        for i in range(30)
    ]
    # plant one exact-dup pair
    corpus.append((100, corpus[0][1]))

    coeffs = _coeffs(num_hashes)

    def sig_of(text):
        norm = re.sub(r"\s+", " ", text.lower().strip())
        n = len(norm)
        shingles = {
            norm[p : p + k] for p in range(max(n - (k - 1), 1))
        }
        bases = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % _MERSENNE
            for s in shingles
        ]
        return [min((a * b + c) % _MERSENNE for b in bases) for a, c in coeffs]

    sigs = {i: sig_of(t) for i, t in corpus}
    buckets = {}
    for i, s in sigs.items():
        for b in range(bands):
            key = (b, "|".join(str(v) for v in s[b * rows_per : (b + 1) * rows_per]))
            buckets.setdefault(key, []).append(i)
    want = set()
    for members in buckets.values():
        if len(members) > max_bucket:
            continue
        m = min(members)
        for x in members:
            if x > m:
                est = sum(
                    1 for j in range(num_hashes) if sigs[m][j] == sigs[x][j]
                ) / num_hashes
                if est >= thr:
                    want.add((m, x, est))

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_star_edges(
            df, "doc_id", "text", threshold=thr, shingle_k=k,
            num_hashes=num_hashes, bands=bands, max_bucket=max_bucket,
            portable=True,
        ).collect()
    }
    assert got == want and (0, 100, 1.0) in got


@pytest.mark.parametrize("seed", [0, 1])
def test_connected_components_match_union_find(spark, seed):
    """Pregel min-label connected components vs python union-find on
    random sparse graphs (long chains force many supersteps)."""
    from flink_1_3_2_hopsworks_spark.graph.pregel import connected_components

    rng = np.random.default_rng(seed + 11)
    n = 80
    edges = {
        (int(a), int(b))
        for a, b in rng.integers(0, n, (70, 2))
        if a != b
    }
    # add a long chain to force iteration depth
    edges |= {(1000 + i, 1000 + i + 1) for i in range(25)}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in parent}
    # canonical label = min vertex in component
    comp_min = {}
    for v, r in want.items():
        comp_min[r] = min(comp_min.get(r, v), v)
    want = {v: comp_min[find(v)] for v in parent}

    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, max_iterations=60).collect()
    }
    assert got == want
