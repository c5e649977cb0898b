"""Round-12 optimization measurement harness.

Times registry queries via the noop sink (guide §1.4) with per-query job
descriptions (§1.5) and captures ``explain("formatted")`` for each into
plans/r13/<name>_<tag>.txt — the before/after evidence files the round's
deliverables require.

Usage:
  python scripts/measure_r13.py before [name ...]   # capture plans + times
  python scripts/measure_r13.py after  [name ...]
  python scripts/measure_r13.py time   [name ...]   # times only, no plans

With no names, runs the bench HEADLINE set. Times go to
plans/r13/timings_<tag>.json (merged across invocations).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402

from flink_1_3_2_hopsworks_spark import get_spark, registry  # noqa: E402

PLANS_DIR = os.path.join(REPO, "plans", "r13")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("MEASURE_PASSES", "3"))


def capture_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINE)
    plans = tag in ("before", "after")

    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark(app_name=f"measure_r13_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    # Warmup: touch every table + one shuffle, mirroring bench.py.
    from flink_1_3_2_hopsworks_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, SF_DIR, t).count()
    qs["q6_forecast_revenue"](spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        if plans:
            plan_txt = capture_plan(fn(spark, SF_DIR))
            with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan_txt)
        for _ in range(PASSES):
            spark.sparkContext.setJobDescription(f"r13:{tag}:{name}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, float("inf")), dt)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {timings[name]}s", flush=True)

    out = os.path.join(PLANS_DIR, f"timings_{tag}.json")
    merged: dict[str, float] = {}
    if os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
    merged.update(timings)
    merged["_loadavg"] = round(os.getloadavg()[0], 2)
    with open(out, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)
        f.write("\n")
    print(json.dumps({"tag": tag, "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
