"""sf10 → sf30 spot-probe for the round-9 COMPOSITION family.

The sf1→sf10 decade artifact (SCALE_SF10.json) put the three composed
round-9 pipelines at the high end of the round's ratios:
pipe_curation_e2e 5.07×, sim_hybrid_rrf_topk 5.39×, mm_curation_funnel
4.37× on 10× data. This probe extends exactly those one more 3× step
(sf30: 1.5M docs + 600k embeddings — a documents+embeddings directory,
the fact tables are never read) and merges an ``sf30_funnel_probe``
section into SCALE_SF30.json. Linear = 3.0; compare ratios within one
sweep only (host drift ±35% between sweeps — cpu_probe recorded).

NOTE on the directory: gen_scale_data's rng draws are sequential, so this
documents+embeddings sf30 directory is self-consistent but not
row-identical to the documents-only directory the text probe used (that
one is regenerated fresh here too if absent).

Usage: python scripts/spot_scale_funnel30.py [--passes N]
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
    "pipe_curation_e2e",
    "sim_hybrid_rrf_topk",
    "mm_curation_funnel",
]

SF10_DIR = os.path.join(REPO, ".scaledata", "sf10")
SF30_DIR = os.path.join(REPO, ".scaledata", "sf30_funnel")


def main() -> None:
    passes = 1
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    if not os.path.isdir(SF10_DIR):
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "gen_scale_data.py"), "10"],
            check=True,
        )
    if not os.path.isdir(SF30_DIR):
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "gen_scale_data.py"),
             "30", SF30_DIR, "--tables", "documents,embeddings"],
            check=True,
        )
    spark = get_spark(app_name="spot_scale_funnel30")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    results: dict[str, dict[str, float]] = {}
    for tag, d in [("sf10", SF10_DIR), ("sf30", SF30_DIR)]:
        qs["mm_curation_funnel"](spark, d).count()  # warm tables/codegen
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
                print(f"[{tag}] {name}: {round(dt, 2)}s", flush=True)
        results[tag] = t

    ratios = {
        n: round(results["sf30"][n] / results["sf10"][n], 2) for n in NAMES
    }
    section = {
        "what": (
            "one further 3x step for the round-9 composed pipelines "
            "(documents+embeddings sf30 directory); linear = 3.0"
        ),
        "data_ratio": 3.0,
        "cpu_probe_sec": _cpu_probe(),
        "sf10": {k: round(v, 2) for k, v in results["sf10"].items()},
        "sf30": {k: round(v, 2) for k, v in results["sf30"].items()},
        "wall_ratio_sf30_over_sf10": ratios,
    }
    path = os.path.join(REPO, "SCALE_SF30.json")
    with open(path) as f:
        artifact = json.load(f)
    artifact["sf30_funnel_probe"] = section
    with open(path, "w") as f:
        json.dump(artifact, f, indent=2)
        f.write("\n")
    print(json.dumps(section))


if __name__ == "__main__":
    main()
