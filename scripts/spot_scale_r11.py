"""Round-11 scale probes, one session:

1. Re-measure the ev_curation_funnel_stream decade legs (sf0.1 → sf1 →
   sf10) after the r11 signature-reuse fix (ONE shingle+hash pass per
   epoch — r10 measured the sf10 leg at 1102 s with the survivor append
   re-shingling the dominant term twice) and the key-bucketed store
   layouts (+posting-key sidecar). The r10 verdict's done-criterion.
2. mm_video_embed_topk gets its missing sf1 → sf10 leg (r10 measured
   sf0.1 → sf1 at 5.39x, decode-dominated — the watch item).
3. mm_curation_funnel_stream re-measured sf0.1 → sf1 (its near store
   switched to the chunk-posting layout this round).
4. mm_pair_curation_funnel_stream (NEW r11 op) sf0.1 → sf1 legs —
   the paired crawl loop's first scale numbers.

Written as an ``r11_ops_probe`` section in SCALE_SF10.json. Linear = the
data ratio of each step; compare ratios within one sweep only
(host drift between sweeps — cpu_probe recorded).

Usage: python scripts/spot_scale_r11.py [--passes N]
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


def _ensure(d: str, sf: str) -> None:
    if os.path.isdir(d):
        return
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gen_scale_data.py"),
         sf, d],
        check=True,
    )


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
    spark = get_spark(app_name="spot_scale_r11")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    probe = _cpu_probe()
    legs: dict[str, dict[str, float]] = {}

    # warm tables/codegen once per sf dir with a cheap op
    def leg(name: str, tag: str, d: str, p: int) -> None:
        legs.setdefault(name, {})[tag] = round(_time(qs, spark, name, d, p), 3)

    qs["mm_embed_topk"](spark, SF01_DIR).count()
    # ---- sf0.1 legs ----
    for n in ("ev_curation_funnel_stream", "mm_curation_funnel_stream",
              "mm_pair_curation_funnel_stream"):
        leg(n, "sf0.1", SF01_DIR, passes)
    # ---- sf1 legs ----
    qs["mm_embed_topk"](spark, SF1_DIR).count()
    leg("mm_video_embed_topk", "sf1", SF1_DIR, passes)
    for n in ("ev_curation_funnel_stream", "mm_curation_funnel_stream",
              "mm_pair_curation_funnel_stream"):
        leg(n, "sf1", SF1_DIR, passes)
    # ---- sf10 legs (single pass: the funnel replay is a genuine
    # multi-hundred-second 3-epoch run) ----
    qs["mm_embed_topk"](spark, SF10_DIR).count()
    leg("mm_video_embed_topk", "sf10", SF10_DIR, 1)
    leg("ev_curation_funnel_stream", "sf10", SF10_DIR, 1)

    section = {
        "what": (
            "round-11 probes: ev_curation_funnel_stream decade legs "
            "re-measured after the one-signature-pass fix + key-bucketed "
            "stores (r10 sf10 leg was 1102s paying the shingle pass "
            "twice); mm_video_embed_topk sf1->sf10 leg (r10 watch item); "
            "mm_curation_funnel_stream on the chunk-posting near store; "
            "mm_pair_curation_funnel_stream (new r11 op) first legs. "
            "10x data per step, linear = 10; funnel gates run the real "
            "foreachBatch bodies including per-epoch store reads/writes"
        ),
        "cpu_probe_sec": probe,
        "r10_reference": {
            "ev_curation_funnel_stream": {
                "sf0.1": 61.533, "sf1": 189.159, "sf10": 1102.024,
            },
            "mm_video_embed_topk": {"sf0.1": 6.17, "sf1": 33.284},
        },
        "queries": {},
    }
    for n, d in legs.items():
        row = dict(d)
        if "sf0.1" in d and "sf1" in d:
            row["ratio_sf1_over_sf0.1"] = round(d["sf1"] / d["sf0.1"], 2)
        if "sf1" in d and "sf10" in d:
            row["ratio_sf10_over_sf1"] = round(d["sf10"] / d["sf1"], 2)
        section["queries"][n] = row

    sf10_path = os.path.join(REPO, "SCALE_SF10.json")
    with open(sf10_path) as f:
        sf10 = json.load(f)
    sf10["r11_ops_probe"] = section
    with open(sf10_path, "w") as f:
        json.dump(sf10, f, indent=2)
        f.write("\n")
    print(json.dumps(section, indent=2))


if __name__ == "__main__":
    main()
