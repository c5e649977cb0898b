"""sf30 → sf90 spot-probe: ONE more 3× step for the two highest-ratio
text ops (round-9 watch-item).

SCALE_SF30.json's sf10→sf30 probe left text_boilerplate_removal at 1.83×
on 3× data — sub-linear but the family's high end and trending up (its
per-doc drop lists LENGTHEN as a fixed-vocabulary corpus saturates the
≥3-docs gram threshold — an output effect, but one worth watching). This
probe extends boilerplate + dup_span_stats one further 3× step (sf90:
4.5M docs, documents-only) and merges an "sf90_probe" section into
SCALE_SF30.json. Linear = 3.0; compare ratios within the sweep only.

Usage: python scripts/spot_scale_text90.py [--passes N]
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

NAMES = ["text_boilerplate_removal", "text_dup_span_stats"]

SF30_DIR = os.path.join(REPO, ".scaledata", "sf30")
SF90_DIR = os.path.join(REPO, ".scaledata", "sf90")


def main() -> None:
    passes = 2
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    for sf, d in [(30, SF30_DIR), (90, SF90_DIR)]:
        if not os.path.isdir(d):
            subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts", "gen_scale_data.py"),
                 str(sf), d, "--tables", "documents"],
                check=True,
            )
    spark = get_spark(app_name="spot_scale_text90")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    results: dict[str, dict[str, float]] = {}
    for tag, d in [("sf30", SF30_DIR), ("sf90", SF90_DIR)]:
        qs["pipe_gopher_filter"](spark, d).count()  # warm tables/codegen
        t: dict[str, float] = {}
        for _ in range(passes):
            for name in NAMES:
                t0 = time.time()
                qs[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                t[name] = min(t.get(name, float("inf")), time.time() - t0)
                spark.catalog.clearCache()
        results[tag] = t
        print(f"[{tag}] " + json.dumps(t), flush=True)

    section = {
        "data_ratio": 3.0,
        "cpu_probe_sec": _cpu_probe(),
        "sf30": {k: round(v, 2) for k, v in results["sf30"].items()},
        "sf90": {k: round(v, 2) for k, v in results["sf90"].items()},
        "wall_ratio_sf90_over_sf30": {
            n: round(results["sf90"][n] / results["sf30"][n], 2)
            for n in NAMES
        },
    }
    path = os.path.join(REPO, "SCALE_SF30.json")
    with open(path) as f:
        artifact = json.load(f)
    artifact["sf90_probe"] = section
    with open(path, "w") as f:
        json.dump(artifact, f, indent=2)
        f.write("\n")
    print(json.dumps(section))


if __name__ == "__main__":
    main()
