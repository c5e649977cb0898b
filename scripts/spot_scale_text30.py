"""sf10 → sf30 spot-probe for the high-ratio TEXT family.

The sf1→sf10 decade artifact (SCALE_SF10.json) showed the text-curation
family at the high end of linear: dup_span_stats 7.24×, ngram_novelty
7.06×, chunk_documents 6.66×, boilerplate_removal 6.55×, gopher 6.14× on
10× data. This probe extends those specific queries one more 3× step
(sf30 — 1.5M docs; a documents-only directory, the fact tables are never
read) to confirm the trend stays ~linear before the next decade would
make a hidden quadratic term dominate. Per the repo's measurement
discipline: always compare RATIOS within one sweep — host speed drifts
±35% between sweeps.

A 3× data step should cost ~3× wall for a linear operator (modulo fixed
overheads, which deflate the ratio). Writes SCALE_SF30.json.

Usage: python scripts/spot_scale_text30.py [--passes N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench import _cpu_probe  # noqa: E402

from flink_1_3_2_hopsworks_spark import get_spark, registry  # noqa: E402

NAMES = [
    "text_dup_span_stats",
    "text_ngram_novelty",
    "text_chunk_documents",
    "text_boilerplate_removal",
    "pipe_gopher_filter",
]

SF10_DIR = os.path.join(REPO, ".scaledata", "sf10")
SF30_DIR = os.path.join(REPO, ".scaledata", "sf30")


def main() -> None:
    passes = 2
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    if not os.path.isdir(SF30_DIR):
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "gen_scale_data.py"),
             "30", SF30_DIR, "--tables", "documents"],
            check=True,
        )
    spark = get_spark(app_name="spot_scale_text30")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    results: dict[str, dict[str, float]] = {}
    for tag, d in [("sf10", SF10_DIR), ("sf30", SF30_DIR)]:
        qs["pipe_gopher_filter"](spark, d).count()  # warm tables/codegen
        t: dict[str, float] = {}
        for _ in range(passes):
            for name in NAMES:
                t0 = time.time()
                qs[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                t[name] = min(t.get(name, float("inf")), dt)
                spark.catalog.clearCache()
        results[tag] = t
        print(f"[{tag}] " + json.dumps(t), flush=True)

    ratios = {
        n: round(results["sf30"][n] / results["sf10"][n], 2) for n in NAMES
    }
    out = {
        "data_ratio": 3.0,
        "cpu_probe_sec": _cpu_probe(),
        "sf10": {k: round(v, 2) for k, v in results["sf10"].items()},
        "sf30": {k: round(v, 2) for k, v in results["sf30"].items()},
        "wall_ratio_sf30_over_sf10": ratios,
        "total_ratio": round(
            sum(results["sf30"].values()) / sum(results["sf10"].values()), 2
        ),
    }
    path = os.path.join(REPO, "SCALE_SF30.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
