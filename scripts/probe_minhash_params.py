"""MinHash parameterization probe: WHY dd_minhash_pairs measured ~14x on
10x data (SCALE_SF10.json) and what restores linearity.

The sf1/sf10 corpora are deliberately low-entropy (word soup over a 31-word
vocabulary), so unrelated short docs share enough shingles that a 4-row
band collides at random: band collisions grew 7.1M (sf1) → 198M (sf10),
~quadratic, while TRUE near-dup pairs grew linearly. Two independent
levers, both measured here at sf1 and sf10:

1. rows-per-band (the operator's own num_hashes/bands knob): at r rows a
   random pair with Jaccard j collides per band with probability j^r —
   going r=4 → r=8 (num_hashes 32 → 64, bands 8) squares the collision
   probability, collapsing the random candidate stream while keeping
   >=0.8-Jaccard recall high (1-(1-0.8^8)^8 ≈ 0.80 per-pair; true
   duplicate clusters in this corpus are EXACT dups with identical
   signatures, caught with p=1 at any r).
2. the star reduction (minhash_star_edges): candidate work Θ(docs×bands)
   regardless of bucket sizes — the cluster-resolution path.

Writes SCALE_MINHASH_PARAMS.json. Run on an idle machine (it measures).

Usage: python scripts/probe_minhash_params.py [--passes N]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_1_3_2_hopsworks_spark import get_spark  # noqa: E402
from flink_1_3_2_hopsworks_spark.dedup.minhash import (  # noqa: E402
    minhash_near_dups,
    minhash_star_edges,
)

SF1_DIR = os.path.join(REPO, ".scaledata", "sf1")
SF10_DIR = os.path.join(REPO, ".scaledata", "sf10")

VARIANTS = {
    # the shipped gate parameterization (r=4): the measured-quadratic regime
    "pairs_r4": lambda df: minhash_near_dups(
        df, "doc_id", "text", threshold=0.8, num_hashes=32, bands=8
    ),
    # production parameterization for low-entropy corpora (r=8)
    "pairs_r8": lambda df: minhash_near_dups(
        df, "doc_id", "text", threshold=0.8, num_hashes=64, bands=8
    ),
    # the linear cluster-resolution path at the gate parameterization
    "star_r4": lambda df: minhash_star_edges(
        df, "doc_id", "text", threshold=0.8, num_hashes=32, bands=8
    ),
}


def main() -> None:
    passes = 2
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    spark = get_spark(app_name="probe_minhash_params")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, dict[str, float]]] = {}
    for tag, d in [("sf1", SF1_DIR), ("sf10", SF10_DIR)]:
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        docs.count()  # warm the scan
        per_variant: dict[str, dict[str, float]] = {}
        for name, build in VARIANTS.items():
            best, n_pairs = float("inf"), -1
            for _ in range(passes):
                spark.catalog.clearCache()  # each run pays its own persist
                t0 = time.time()
                n_pairs = build(docs).count()
                best = min(best, round(time.time() - t0, 3))
            per_variant[name] = {"sec": best, "result_rows": n_pairs}
            print(f"[{tag}] {name}: {best}s, {n_pairs} rows", flush=True)
        results[tag] = per_variant

    out = {
        "what": (
            "min-of-%d wall seconds + result rows per minhash variant at "
            "sf1 and sf10 (10x data; linear is 10x sec); see module "
            "docstring for the two levers" % passes
        ),
        "results": results,
        "ratios_sf10_over_sf1": {
            n: round(
                results["sf10"][n]["sec"] / max(results["sf1"][n]["sec"], 1e-9), 2
            )
            for n in VARIANTS
        },
    }
    path = os.path.join(REPO, "SCALE_MINHASH_PARAMS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["ratios_sf10_over_sf1"]))


if __name__ == "__main__":
    main()
