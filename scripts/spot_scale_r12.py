"""Round-12 scale probes, one session:

1. mm_text_to_image_topk vs mm_text_to_image_ivf_topk (NEW r12 serve
   path) decade legs — the brute visual expansion is O(corpus × probes)
   by construction; the IVF-ADC arm should grow with corpus/num_cells ×
   nprobe plus fixed probe overhead.
2. ev_curation_funnel_stream PER-EPOCH attribution at sf1 and sf10
   (r11 verdict next-round item #7): the gate replays 3 epochs against
   a growing store — if later epochs cost disproportionately more, the
   super-sqrt(10) second-decade residual is store-growth (probe/listing);
   if epochs are flat, it is the per-batch passes (shingle/signature/
   shuffle width) scaling with batch size.
3. Crawl-LIFETIME listing-cost probe (r11 verdict item #4's SCALE note):
   a 24-epoch MinHash ingest store at fixed batch size — time the next
   epoch and count store files, compact epochs [0, 24), then time the
   following epoch against the consolidated base. Store content is
   equivalent by the compaction contract (pytest-pinned); the delta is
   pure file-count/listing + probe-plan cost.

Written as an ``r12_ops_probe`` section in SCALE_SF10.json.

Usage: python scripts/spot_scale_r12.py [--passes N]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench import _cpu_probe  # noqa: E402

import pyspark.sql.functions as F  # noqa: E402

from flink_1_3_2_hopsworks_spark import get_spark, registry  # noqa: E402
from flink_1_3_2_hopsworks_spark.catalog import load_table  # noqa: E402

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


def _funnel_epoch_times(spark, d: str) -> list[float]:
    """One sequential funnel replay with per-epoch wall times — the
    attribution probe: epoch e ingests docs (doc_id % 3 == e) against
    the stores epochs < e built (the gate's exact construction)."""
    from flink_1_3_2_hopsworks_spark.streaming.funnel import (
        ingest_funnel_batch,
    )

    docs = load_table(spark, d, "documents")
    base = tempfile.mkdtemp(prefix="r12_funnel_probe_")
    times = []
    try:
        for e in range(3):
            b = docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == e)
            t0 = time.time()
            ingest_funnel_batch(
                b, e, f"{base}/fp_store", f"{base}/sig_store",
                f"{base}/funnel",
            )
            times.append(round(time.time() - t0, 2))
            print(f"[{os.path.basename(d)}] funnel epoch {e}: "
                  f"{times[-1]}s", flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return times


def _lifetime_probe(spark, n_epochs: int = 24) -> dict:
    """24 fixed-size ingest epochs, then: probe-epoch time + store files
    pre-compaction vs post-compaction (the listing-cost lever)."""
    from flink_1_3_2_hopsworks_spark.streaming.neardup import (
        compact_signature_store,
        ingest_batch,
    )
    from flink_1_3_2_hopsworks_spark.streaming.stores import (
        count_store_files,
    )

    docs = load_table(spark, SF1_DIR, "documents")
    base = tempfile.mkdtemp(prefix="r12_lifetime_")
    store, verdicts = f"{base}/store", f"{base}/verdicts"
    try:
        for e in range(n_epochs):
            ingest_batch(
                docs.filter(
                    F.pmod(F.col("doc_id"), F.lit(n_epochs + 2)) == e
                ),
                e, store, verdicts,
            )
        probe_a = docs.filter(
            F.pmod(F.col("doc_id"), F.lit(n_epochs + 2)) == n_epochs
        )
        files_pre = count_store_files(spark, store) + count_store_files(
            spark, f"{store}_keys"
        )
        t0 = time.time()
        ingest_batch(probe_a, n_epochs, store, verdicts)
        t_pre = round(time.time() - t0, 2)

        stats = compact_signature_store(spark, store, n_epochs)
        files_post = count_store_files(spark, store) + count_store_files(
            spark, f"{store}_keys"
        )
        probe_b = docs.filter(
            F.pmod(F.col("doc_id"), F.lit(n_epochs + 2)) == n_epochs + 1
        )
        t0 = time.time()
        ingest_batch(probe_b, n_epochs + 1, store, verdicts)
        t_post = round(time.time() - t0, 2)
        return {
            "n_epochs": n_epochs,
            "files_store_plus_sidecar_pre": files_pre,
            "files_store_plus_sidecar_post": files_post,
            "epoch_sec_pre_compaction": t_pre,
            "epoch_sec_post_compaction": t_post,
            "compaction_stats": stats,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    passes = 2
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    _ensure(SF1_DIR, "1")
    _ensure(SF10_DIR, "10")
    spark = get_spark(app_name="spot_scale_r12")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    probe = _cpu_probe()
    legs: dict[str, dict[str, float]] = {}

    def leg(name: str, tag: str, d: str, p: int) -> None:
        legs.setdefault(name, {})[tag] = round(_time(qs, spark, name, d, p), 3)

    # ---- cross-modal serve legs (warm each dir's tables first) ----
    qs["mm_embed_topk"](spark, SF01_DIR).count()
    for n in ("mm_text_to_image_topk", "mm_text_to_image_ivf_topk"):
        leg(n, "sf0.1", SF01_DIR, passes)
    qs["mm_embed_topk"](spark, SF1_DIR).count()
    for n in ("mm_text_to_image_topk", "mm_text_to_image_ivf_topk"):
        leg(n, "sf1", SF1_DIR, passes)
    qs["mm_embed_topk"](spark, SF10_DIR).count()
    for n in ("mm_text_to_image_topk", "mm_text_to_image_ivf_topk"):
        leg(n, "sf10", SF10_DIR, 1)

    # ---- lifetime listing probe (fixed batch size, 24 epochs) ----
    lifetime = _lifetime_probe(spark)
    print(json.dumps(lifetime, indent=2), flush=True)

    # ---- funnel per-epoch attribution ----
    funnel_epochs = {
        "sf1": _funnel_epoch_times(spark, SF1_DIR),
        "sf10": _funnel_epoch_times(spark, SF10_DIR),
    }

    section = {
        "what": (
            "round-12 probes: the NEW IVF-ADC cross-modal serve path vs "
            "its brute baseline per decade; per-epoch wall times of the "
            "text funnel replay at sf1/sf10 (attribution of the r11 "
            "3.79x second decade: store-growth vs per-batch passes); a "
            "24-epoch crawl-lifetime store probed before and after "
            "offline compaction (file count + next-epoch wall time). "
            "10x data per decade step; compare ratios within one sweep "
            "only (cpu_probe recorded)"
        ),
        "cpu_probe_sec": probe,
        "queries": {},
        "funnel_epoch_times_sec": funnel_epochs,
        "lifetime_compaction_probe": lifetime,
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
    sf10["r12_ops_probe"] = section
    with open(sf10_path, "w") as f:
        json.dump(sf10, f, indent=2)
        f.write("\n")
    print(json.dumps(section, indent=2))


if __name__ == "__main__":
    main()
