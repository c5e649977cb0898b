"""Round-13 adjudication A/B (VERDICT r12 item 1): dd_minhash_pairs /
dd_simhash_pairs, r12 (`ad870aa`) shapes vs r11 (e7c9071) shapes, in ONE
quiet-gated session, interleaved min-of-5 per variant via the noop sink.

The r11 modules are loaded verbatim from git (`/tmp/r11mod/r11_*.py`) so the
comparison is against the exact pre-r12 code, not a reconstruction. Pass
order alternates each round so ambient drift cancels instead of biasing one
arm.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _load_gate  # noqa: E402

from flink_1_3_2_hopsworks_spark import get_spark  # noqa: E402
from flink_1_3_2_hopsworks_spark.catalog import TABLES, load_table  # noqa: E402
from flink_1_3_2_hopsworks_spark.dedup.minhash import minhash_near_dups  # noqa: E402
from flink_1_3_2_hopsworks_spark.dedup.simhash import (  # noqa: E402
    portable_hash60,
    simhash_near_dups,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("AB_PASSES", "5"))


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    r11_min = _load("r11_minhash", "/tmp/r11mod/r11_minhash.py")
    r11_sim = _load("r11_simhash", "/tmp/r11mod/r11_simhash.py")

    spark = get_spark(app_name="ab_dedup_r13")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, SF_DIR, "documents")

    variants = {
        "min_r12": lambda: minhash_near_dups(
            docs, "doc_id", "text", threshold=0.8, portable=True,
            recall_floor=None,
        ),
        "min_r11": lambda: r11_min.minhash_near_dups(
            docs, "doc_id", "text", threshold=0.8, portable=True,
            recall_floor=None,
        ),
        "sim_r12": lambda: simhash_near_dups(
            docs, "doc_id", "text", max_distance=8,
            hash_expr=portable_hash60,
        ),
        "sim_r11": lambda: r11_sim.simhash_near_dups(
            docs, "doc_id", "text", max_distance=8,
            hash_expr=r11_sim.portable_hash60,
        ),
    }

    # Warmup, mirroring bench.py.
    for t in TABLES:
        load_table(spark, SF_DIR, t).count()
    docs.groupBy("lang").count().collect()

    gate = _load_gate()
    print("load_gate:", json.dumps(gate), flush=True)

    samples: dict[str, list[float]] = {k: [] for k in variants}
    names = list(variants)
    for p in range(PASSES):
        order = names if p % 2 == 0 else list(reversed(names))
        for name in order:
            spark.sparkContext.setJobDescription(f"ab_r13:{name}:pass{p}")
            t0 = time.time()
            variants[name]().write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            samples[name].append(dt)
            print(f"pass {p} {name}: {dt}s", flush=True)
        spark.sparkContext.setJobDescription(None)

    out = {
        "sf_dir": SF_DIR,
        "passes": PASSES,
        "load_gate": gate,
        "samples": samples,
        "min": {k: min(v) for k, v in samples.items()},
        "median": {k: sorted(v)[len(v) // 2] for k, v in samples.items()},
    }
    print(json.dumps(out), flush=True)
    path = os.path.join(REPO, "plans", "r13", "ab_dedup_r13.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
