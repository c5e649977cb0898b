"""Generate a larger-SF copy of the driver's synthetic tables for SCALING
measurements (not correctness — that stays at sf0.01 against the driver's
own data).

/root/testdata is read-only and tops out at sf0.1, so the sf1 scaling bench
generates its own 10x tables here, mimicking the driver data's schemas
(cast to the exact parquet footer schema of the sf0.1 table) and observed
distributions (key ranges, category frequencies, value ranges, doc vocab,
dup rate, embedding clusters — measured in round 5 from sf0.1):

  region/nation fixed dims (copied); customer/supplier/part/orders/lineitem/
  events/documents/embeddings scale linearly; events keep the same 30-day
  span with 10x density (same windows, 10x rows per window); users scale 10x
  so per-key state/history stays constant — the honest keyed-streaming
  scale-up.

Usage: python scripts/gen_scale_data.py [sf] [out_dir] [--tables a,b,...]
  default sf=1, out_dir=<repo>/.scaledata/sf1, all tables.
  --tables limits generation (e.g. --tables documents for a text-family
  probe at sf30 — the TPC-H fact tables at that scale are GBs the probe
  never reads). NOTE: the rng draws are sequential, so a filtered run's
  tables differ from the same table in a full run at the same sf; a probe
  directory is self-consistent but not row-identical to a full directory.
Deterministic (numpy PCG64 seed 42) given the same table selection.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF = "/root/testdata/sf0.1"
REF_SF = 0.1


def _ref_schema(name: str) -> pa.Schema:
    return pq.read_schema(f"{REF}/{name}.parquet")


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    table = table.cast(_ref_schema(name))
    pq.write_table(table, f"{out_dir}/{name}.parquet", row_group_size=1 << 18)
    print(f"  {name}: {table.num_rows} rows")


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(repo, ".scaledata", f"sf{sf:g}")
    )
    only = None
    if "--tables" in sys.argv:
        only = set(sys.argv[sys.argv.index("--tables") + 1].split(","))
    want = lambda *names: only is None or bool(only & set(names))  # noqa: E731
    os.makedirs(out_dir, exist_ok=True)
    k = sf / REF_SF  # row multiplier vs the sf0.1 reference tables
    rng = np.random.default_rng(42)
    print(f"Generating sf{sf:g} into {out_dir} ({k:g}x of sf0.1)"
          + (f" tables={sorted(only)}" if only else ""))

    # Fixed dims: copy verbatim.
    if want("region", "nation"):
        for name in ("region", "nation"):
            _write(out_dir, name, pq.read_table(f"{REF}/{name}.parquet"))

    n_cust = int(15000 * k)
    n_supp = int(1000 * k)
    n_part = int(20000 * k)
    n_ord = int(150000 * k)
    n_ev = int(100000 * k)
    n_doc = int(5000 * k)
    n_emb = int(2000 * k)

    if want("customer"):
        _write(
            out_dir,
            "customer",
            pa.table(
                {
                    "c_custkey": np.arange(n_cust, dtype=np.int64),
                    "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                    "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
                    "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
                    "c_mktsegment": rng.choice(
                        ["MACHINERY", "HOUSEHOLD", "BUILDING", "FURNITURE", "AUTOMOBILE"],
                        n_cust,
                    ),
                }
            ),
        )
    if want("supplier"):
        _write(
            out_dir,
            "supplier",
            pa.table(
                {
                    "s_suppkey": np.arange(n_supp, dtype=np.int64),
                    "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                    "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
                    "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
                }
            ),
        )
    if want("part"):
        adjs = ["large", "hot", "blue", "small", "red", "green", "dim", "cold", "new", "old"]
        nouns = ["ring", "bolt", "case", "disk", "gear", "pipe", "wire", "plate", "rod", "cap"]
        _write(
            out_dir,
            "part",
            pa.table(
                {
                    "p_partkey": np.arange(n_part, dtype=np.int64),
                    "p_name": [
                        f"{adjs[a]} {nouns[b]}"
                        for a, b in zip(
                            rng.integers(0, len(adjs), n_part),
                            rng.integers(0, len(nouns), n_part),
                        )
                    ],
                    "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
                    "p_type": rng.choice(
                        ["LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO", "ECONOMY"], n_part
                    ),
                    "p_size": rng.integers(1, 51, n_part).astype(np.int32),
                    "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
                }
            ),
        )

    if want("orders", "lineitem"):
        day_ms = 86_400_000
        d0 = np.datetime64("1995-01-01").astype("datetime64[ms]").astype(np.int64)
        d1 = np.datetime64("2001-08-01").astype("datetime64[ms]").astype(np.int64)
        o_date_ms = (
            d0 + (rng.integers(0, (d1 - d0) // day_ms + 1, n_ord)) * day_ms
        )
        _write(
            out_dir,
            "orders",
            pa.table(
                {
                    "o_orderkey": np.arange(n_ord, dtype=np.int64),
                    "o_custkey": rng.integers(0, n_cust, n_ord),
                    "o_orderstatus": rng.choice(["O", "P", "F"], n_ord),
                    "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
                    "o_orderdate": o_date_ms.astype("datetime64[ms]"),
                    "o_orderpriority": rng.choice(
                        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
                        n_ord,
                    ),
                }
            ),
        )

        lines_per = rng.integers(1, 8, n_ord)  # avg 4, matches observed 4.08
        l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
        n_li = len(l_orderkey)
        linenum = (
            np.arange(n_li) - np.repeat(np.cumsum(lines_per) - lines_per, lines_per) + 1
        ).astype(np.int32)
        ship_ms = np.repeat(o_date_ms, lines_per) + rng.integers(1, 96, n_li) * day_ms
        _write(
            out_dir,
            "lineitem",
            pa.table(
                {
                    "l_orderkey": l_orderkey,
                    "l_partkey": rng.integers(0, n_part, n_li),
                    "l_suppkey": rng.integers(0, n_supp, n_li),
                    "l_linenumber": linenum,
                    "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                    "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
                    "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
                    "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
                    "l_returnflag": rng.choice(["A", "N", "R"], n_li),
                    "l_linestatus": rng.choice(["O", "F"], n_li),
                    "l_shipdate": ship_ms.astype("datetime64[ms]"),
                }
            ),
        )

    if want("events"):
        # events: same 30-day span as sf0.1 at 10x density; 10x users so
        # per-user history stays ~constant.
        n_users = int(1500 * k)
        t0 = np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]").astype(np.int64)
        span_us = 30 * 86_400 * 1_000_000
        ts = np.sort(t0 + rng.integers(0, span_us, n_ev))
        _write(
            out_dir,
            "events",
            pa.table(
                {
                    "event_id": np.arange(n_ev, dtype=np.int64),
                    "ts": ts.astype("datetime64[us]"),
                    "user_id": rng.integers(0, n_users, n_ev),
                    "event_type": rng.choice(
                        ["click", "error", "purchase", "signup", "view"], n_ev
                    ),
                    "value": np.round(
                        np.clip(rng.exponential(50.0, n_ev), 0, 560), 2
                    ),
                    "props": [f'{{"k": {v}}}' for v in rng.integers(0, 100, n_ev)],
                }
            ),
        )

    if want("documents"):
        # documents: word soup over the sf0.1 corpus's own vocabulary, observed
        # length range (44-577 chars, mean ~297), lang mix (~41% en), 20 sources,
        # and ~0.16% planted exact duplicates.
        ref_docs = pq.read_table(f"{REF}/documents.parquet", columns=["text"])
        vocab = sorted({w for t in ref_docs["text"].to_pylist()[:2000] for w in t.split()})
        words_per = rng.integers(8, 106, n_doc)
        texts = [
            " ".join(np.asarray(vocab)[rng.integers(0, len(vocab), w)])
            for w in words_per
        ]
        n_dup = max(1, int(0.0016 * n_doc))
        dup_from = rng.integers(0, n_doc - n_dup, n_dup)
        for j, src_i in enumerate(dup_from):
            texts[n_doc - n_dup + j] = texts[src_i]
        _write(
            out_dir,
            "documents",
            pa.table(
                {
                    "doc_id": np.arange(n_doc, dtype=np.int64),
                    "text": texts,
                    "lang": rng.choice(
                        ["en", "de", "es", "fr", "zh"], n_doc,
                        p=[0.41, 0.14, 0.15, 0.15, 0.15],
                    ),
                    "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
                    "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
                }
            ),
        )

    if want("embeddings"):
        # embeddings: 64-dim unit-norm vectors in 10 label clusters (observed
        # per-dim stddev ~0.123 ≈ 1/sqrt(64) — unit sphere).
        dim = 64
        centers = np.random.default_rng(7).normal(0, 0.1, (10, dim))
        labels = rng.integers(0, 10, n_emb)
        vecs = centers[labels] + rng.normal(0, 0.08, (n_emb, dim))
        vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
        _write(
            out_dir,
            "embeddings",
            pa.table(
                {
                    "vec_id": np.arange(n_emb, dtype=np.int64),
                    "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
                    "label": labels.astype(np.int32),
                }
            ),
        )
    print("done")


if __name__ == "__main__":
    main()
