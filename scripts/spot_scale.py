"""Dedup-family decade spot-check: sf1 → sf10 (10× more data on top of the
already-measured sf0.1 → sf1 decade in SCALE_SF1.json).

Round 5's sf1 loop caught two genuinely quadratic operators
(dd_ngram_jaccard_pairs, dd_embedding_pairs) that sf0.1 never showed; this
script confirms the caps/splits that fixed them hold ANOTHER decade.
Writes SCALE_SF10.json; SCALE.md summarizes.

Exclusion (documented, not silent): dd_ngram_jaccard_pairs is EXACT
all-pairs Jaccard, and the synthetic corpus is low-entropy (≈931 bigram
types over a 31-word vocabulary), so at 500k docs the RESULT SET itself is
quadratic — no exact algorithm is sub-quadratic on it, and the module
docstring names MinHash as the scale path for that regime. Its sf1 cost
(47.5 s, bitmap sweep) already reflects N² work; running N² × 100 here
would measure the corpus's degeneracy, not the engine. The approximate
family (minhash/simhash/embedding) IS the 100-TB path and is measured.

dd_simhash_pairs joined the exclusion in round 9, on the same OUTPUT
argument one step later: it is the PAIR-LISTING audit mode (the gate
docstring says so), and on this corpus its under-cap bucket co-membership
— therefore its result set — grows super-linearly (sf10 ratio 8.3× in the
r8 artifact, trending toward the 10× line). The measured engine answer is
dd_simhash_stars, the cluster-goal default at Θ(docs×4): **1.26× on 10×
data** (SCALE_SF10.json). Pairs mode keeps its Σb(b−1)/2 candidate-budget
guard for callers who need pair-level evidence and accept the output
size; measuring its decade again would re-measure the corpus, not the
engine.

Usage: python scripts/spot_scale.py [--passes N]
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

from bench_scale import _run_with_timeout  # noqa: E402

sys.path.insert(0, REPO)
from bench import _cpu_probe  # noqa: E402

from flink_1_3_2_hopsworks_spark import get_spark, registry  # noqa: E402

NAMES = [
    "dd_exact_dedup",
    "dd_minhash_pairs",
    # dd_simhash_pairs: excluded round 9 — see the module docstring
    "dd_embedding_pairs",
    "pipe_near_dedup",
    "text_decontaminate",
    "text_unigram_rarity",
    "text_repetition_stats",
    "pipe_lang_mixture",
    # round-6 additions
    "text_dup_span_stats",
    "text_dup_span_removal",
    "pipe_shuffle_shard",
    "pipe_near_dedup_pairs",
    "text_boilerplate_removal",
    "text_normalize_unicode",
    "op_weighted_sample",
    "pipe_token_budget",
    "pipe_token_mixture",
    "text_chunk_documents",
    # round-7 additions
    "pipe_gopher_filter",
    "text_ngram_novelty",
    "pipe_c4_clean",
    "text_line_dedup",
    "pipe_temperature_mixture",
    "sim_pq_topk",
    "dd_prefix_dups",
    "pipe_model_quality_filter",
    "text_oov_rate",
    "pipe_corpus_diff",
    "op_heavy_hitters_cms",
    # round-8 additions
    "dd_simhash_stars",
    "sim_ivfpq_topk",
    "pipe_lm_perplexity_filter",
    "pipe_dsir_resample",
    "sim_bm25_topk",
    "dd_semantic_contamination",
    "text_bpe_tokenize",
    "pipe_cluster_balanced_sample",
    "text_zipf_fit",
    # round-9 additions
    "pipe_curation_e2e",
    "mm_image_near_dups",
    "pipe_incremental_ann_ingest",
    "ev_curation_stream_stats",
    "mm_audio_near_dups",
    "mm_video_near_dups",
    "sim_hybrid_rrf_topk",
    "pipe_snapshot_upsert",
    "mm_curation_funnel",
]

SF1_DIR = os.path.join(REPO, ".scaledata", "sf1")
SF10_DIR = os.path.join(REPO, ".scaledata", "sf10")


def main() -> None:
    passes = 2
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    # --names a b c: re-measure ONLY those queries and MERGE their rows
    # into the existing artifacts (totals recomputed over the merged set).
    # For a post-fix re-measure of specific operators; the definitive
    # artifact is still a full sweep.
    names = list(NAMES)
    merge = False
    if "--names" in sys.argv:
        i = sys.argv.index("--names") + 1
        names = []
        while i < len(sys.argv) and not sys.argv[i].startswith("--"):
            names.append(sys.argv[i])
            i += 1
        merge = True
    timeout_s = float(os.environ.get("SCALE_QUERY_TIMEOUT", "600"))
    for sf, d in [(1, SF1_DIR), (10, SF10_DIR)]:
        if not os.path.isdir(d):
            subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts", "gen_scale_data.py"), str(sf)],
                check=True,
            )
    spark = get_spark(app_name="spot_scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    results: dict[str, dict[str, float]] = {}
    timeouts: dict[str, list[str]] = {}
    for tag, d in [("sf1", SF1_DIR), ("sf10", SF10_DIR)]:
        qs["dd_exact_dedup"](spark, d).count()  # warm tables/codegen
        t: dict[str, float] = {}
        timeouts[tag] = []
        for p in range(passes):
            for name in names:
                if name in timeouts[tag]:
                    continue
                t0 = time.time()
                ok = _run_with_timeout(
                    spark,
                    lambda: qs[name](spark, d)
                    .write.format("noop")
                    .mode("overwrite")
                    .save(),
                    timeout_s,
                )
                dt = round(time.time() - t0, 3)
                if not ok:
                    timeouts[tag].append(name)
                t[name] = min(t.get(name, float("inf")), dt)
                print(
                    f"[{tag} pass{p + 1}] {name}: {dt}s"
                    + ("" if ok else " TIMEOUT/CANCELLED"),
                    flush=True,
                )
        results[tag] = t

    if merge:
        remeasured = set(names)
        with open(os.path.join(REPO, "SCALE_SF10.json")) as f:
            prior_art = json.load(f)
        for n, row in prior_art["queries"].items():
            if n in remeasured:
                continue
            if row.get("sf1") is not None:
                results["sf1"].setdefault(n, row["sf1"])
            if row.get("sf10") is not None:
                results["sf10"].setdefault(n, row["sf10"])
        # A partial merge must not erase the full sweep's timeout verdicts
        # for names it didn't re-measure (they feed super_linear below).
        for tag in timeouts:
            prior_t = prior_art.get("timeouts", {}).get(tag, [])
            timeouts[tag] = sorted(
                set(timeouts[tag]) | {n for n in prior_t if n not in remeasured}
            )
    all_names = sorted(set(results["sf1"]) | set(results["sf10"]))
    ratios = {
        n: round(results["sf10"][n] / results["sf1"][n], 2)
        for n in all_names
        if results["sf1"].get(n, 0) > 0 and n in results["sf10"]
    }
    worst = max(ratios, key=ratios.get)
    out = {
        "what": (
            "dedup-family decade check: per-query min-of-%d wall seconds at "
            "sf1 and sf10 (both generated by scripts/gen_scale_data.py), one "
            "local[32] session; ratio = sf10/sf1 on 10x data — linear is 10"
            % passes
        ),
        "excluded": {
            "dd_ngram_jaccard_pairs": (
                "exact all-pairs Jaccard on a low-entropy corpus: the result "
                "set itself is quadratic at 500k docs; MinHash is the "
                "documented scale path (see module docstring)"
            ),
            "dd_embedding_recall": (
                "evaluation query: brute-force truth set is quadratic by "
                "design, run at gate scale only"
            ),
            "dd_semantic_dedup": (
                "the gate's FROZEN 16-cell quantizer is sf0.01-scale; "
                "SemDeDup's within-cell join is quadratic per cell, so "
                "production scales num_cells with the corpus (~sqrt(N), "
                "see dedup/semantic.py docstring) — measuring the frozen "
                "16-cell gate at 5M docs would measure a mis-sized "
                "quantizer, not the engine"
            ),
            "dd_simhash_pairs": (
                "pair-LISTING audit mode: under-cap bucket co-membership — "
                "the result set itself — grows super-linearly on this "
                "corpus (8.3x at sf10 in the r8 artifact, trending toward "
                "the 10x line); dd_simhash_stars is the measured "
                "cluster-goal default at 1.26x, and pairs mode keeps its "
                "candidate-budget guard (see module docstring)"
            ),
        },
        "total_sf1": round(sum(results["sf1"].values()), 3),
        "total_sf10": round(sum(results["sf10"].values()), 3),
        "total_ratio": round(
            sum(results["sf10"].values()) / sum(results["sf1"].values()), 2
        ),
        "worst_query": {"name": worst, "ratio": ratios[worst]},
        "super_linear": sorted(
            set(n for n, r in ratios.items() if r > 10) | set(timeouts["sf10"])
        ),
        "timeouts": timeouts,
        "queries": {
            n: {
                "sf1": results["sf1"].get(n),
                "sf10": results["sf10"].get(n),
                "ratio": ratios.get(n),
            }
            for n in all_names
        },
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        # Machine-speed denominator (bench.py's single-threaded probe):
        # host drift measured ±35% between sweeps — ratios WITHIN one sweep
        # are safe, cross-sweep second comparisons need this.
        "cpu_probe_sec": _cpu_probe(),
        "cpu_probe_ref": (
            "fixed 10M-iteration single-thread loop (bench.py); r5 "
            "reference ~0.80s. Scale cross-sweep second comparisons by "
            "the probe ratio; ratios within one sweep need no adjustment."
        ),
    }
    path = os.path.join(REPO, "SCALE_SF10.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("total_sf1", "total_sf10", "total_ratio",
                       "worst_query", "super_linear")}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
