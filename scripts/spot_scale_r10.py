"""Round-10 scale probes, one session:

1. Re-measure mm_video_near_dups at sf0.1 AND sf1 (r9 watch-item #4: the
   SCALE_SF1 sf0.1 leg predated the fingerprint-persist fix, leaving the
   row internally inconsistent at ratio 0.41) — updates the SCALE_SF1.json
   row and totals in place.
2. Decade legs (sf0.1 → sf1 → sf10) for the two round-10 operators:
   mm_embed_topk (decode → descriptor → IVF-PQ serve) and
   ev_curation_funnel_stream (the sequential 3-epoch funnel replay —
   the gate runs the real foreachBatch body against temp stores, so the
   measurement includes the per-epoch store reads/writes the streaming
   loop pays). Written as an ``r10_ops_probe`` section in SCALE_SF10.json.
3. One further 3x step (sf10 → sf30) for pipe_incremental_ann_ingest —
   the highest remaining r9 sf10 ratio (5.45x) without a 3x probe
   (pipe_curation_e2e / sim_hybrid_rrf_topk / mm_curation_funnel got
   theirs in round 9). Appended to SCALE_SF30.json.

Linear = the data ratio of each step; compare ratios within one sweep only
(host drift ±35% between sweeps — cpu_probe recorded).

Usage: python scripts/spot_scale_r10.py [--passes N]
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

SF01_DIR = "/root/testdata/sf0.1"
SF1_DIR = os.path.join(REPO, ".scaledata", "sf1")
SF10_DIR = os.path.join(REPO, ".scaledata", "sf10")
SF30_DIR = os.path.join(REPO, ".scaledata", "sf30_funnel")

R10_OPS = ["mm_embed_topk", "ev_curation_funnel_stream"]


def _ensure(d: str, sf: str, tables: str | None = None) -> None:
    if os.path.isdir(d):
        return
    cmd = [sys.executable, os.path.join(REPO, "scripts", "gen_scale_data.py"), sf, d]
    if tables:
        cmd += ["--tables", tables]
    subprocess.run(cmd, check=True)


def _time(qs, spark, name: str, d: str, passes: int) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        qs[name](spark, d).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    print(f"[{os.path.basename(d)}] {name}: {round(best, 2)}s", flush=True)
    return best


def main() -> None:
    passes = 2
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    _ensure(SF1_DIR, "1")
    _ensure(SF10_DIR, "10")
    _ensure(SF30_DIR, "30", "documents,embeddings")
    spark = get_spark(app_name="spot_scale_r10")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    probe = _cpu_probe()

    # ---- 1. mm_video_near_dups re-measure (both legs, one session) ----
    qs["mm_video_near_dups"](spark, SF01_DIR).count()  # warm
    v01 = _time(qs, spark, "mm_video_near_dups", SF01_DIR, passes)
    v1 = _time(qs, spark, "mm_video_near_dups", SF1_DIR, passes)
    sf1_path = os.path.join(REPO, "SCALE_SF1.json")
    with open(sf1_path) as f:
        sf1 = json.load(f)
    old = sf1["queries"]["mm_video_near_dups"]
    sf1["queries"]["mm_video_near_dups"] = {
        "sf0.1": round(v01, 3),
        "sf1": round(v1, 3),
        "ratio": round(v1 / v01, 2),
    }
    sf1["total_sf0_1"] = round(sf1["total_sf0_1"] - old["sf0.1"] + v01, 3)
    sf1["total_sf1"] = round(sf1["total_sf1"] - old["sf1"] + v1, 3)
    sf1["total_ratio"] = round(sf1["total_sf1"] / sf1["total_sf0_1"], 2)
    sf1.setdefault("remeasured", {})["mm_video_near_dups"] = (
        "r10: both legs re-measured post fingerprint-persist fix "
        f"(old sf0.1 leg {old['sf0.1']}s predated it, ratio was "
        f"{old['ratio']}); cpu_probe_sec={probe}"
    )
    with open(sf1_path, "w") as f:
        json.dump(sf1, f, indent=2)
        f.write("\n")

    # ---- 2. r10 ops decade legs ----
    legs: dict[str, dict[str, float]] = {n: {} for n in R10_OPS}
    for tag, d in [("sf0.1", SF01_DIR), ("sf1", SF1_DIR), ("sf10", SF10_DIR)]:
        qs["mm_embed_topk"](spark, d).count()  # warm tables/codegen
        for name in R10_OPS:
            legs[name][tag] = round(_time(qs, spark, name, d, passes), 3)
    r10_section = {
        "what": (
            "round-10 operators across sf0.1 -> sf1 -> sf10 (10x per "
            "step, linear = 10); ev_curation_funnel_stream is the "
            "sequential 3-epoch replay of the real foreachBatch body "
            "including its per-epoch store reads/writes"
        ),
        "cpu_probe_sec": probe,
        "queries": {
            n: {
                **legs[n],
                "ratio_sf1_over_sf0.1": round(legs[n]["sf1"] / legs[n]["sf0.1"], 2),
                "ratio_sf10_over_sf1": round(legs[n]["sf10"] / legs[n]["sf1"], 2),
            }
            for n in R10_OPS
        },
    }
    sf10_path = os.path.join(REPO, "SCALE_SF10.json")
    with open(sf10_path) as f:
        sf10 = json.load(f)
    sf10["r10_ops_probe"] = r10_section
    with open(sf10_path, "w") as f:
        json.dump(sf10, f, indent=2)
        f.write("\n")

    # ---- 3. pipe_incremental_ann_ingest one further 3x step ----
    a10 = _time(qs, spark, "pipe_incremental_ann_ingest", SF10_DIR, passes)
    a30 = _time(qs, spark, "pipe_incremental_ann_ingest", SF30_DIR, passes)
    ann_section = {
        "what": (
            "one further 3x step for pipe_incremental_ann_ingest (the "
            "highest remaining r9 sf10 ratio, 5.45x — fixed-cost-"
            "dominated at current scale); linear = 3.0"
        ),
        "data_ratio": 3.0,
        "cpu_probe_sec": probe,
        "sf10": round(a10, 3),
        "sf30": round(a30, 3),
        "wall_ratio_sf30_over_sf10": round(a30 / a10, 2),
    }
    sf30_path = os.path.join(REPO, "SCALE_SF30.json")
    with open(sf30_path) as f:
        sf30 = json.load(f)
    sf30["ann_ingest_r10_probe"] = ann_section
    with open(sf30_path, "w") as f:
        json.dump(sf30, f, indent=2)
        f.write("\n")

    print(json.dumps({
        "mm_video": sf1["queries"]["mm_video_near_dups"],
        "r10_ops": r10_section["queries"],
        "ann_3x": ann_section,
    }))


if __name__ == "__main__":
    main()
