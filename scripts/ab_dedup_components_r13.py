"""Round-13 component-level A/B: which of the r12 (`ad870aa`) dedup changes
loses? Variants built from current-module helpers with one knob each:

simhash fingerprints: union (r12) vs id-left-join restore (r11)
simhash pair dedup:   single end dedup (r12) vs dedup-then-union-dedup (r11)
minhash estimator:    int-cast join payload (r12) vs long payload (r11)

Interleaved, quiet-gated, min/median of AB_PASSES passes via the noop sink.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _load_gate  # noqa: E402

from flink_1_3_2_hopsworks_spark import get_spark  # noqa: E402
from flink_1_3_2_hopsworks_spark.catalog import TABLES, load_table  # noqa: E402
from flink_1_3_2_hopsworks_spark.dedup import minhash as MH  # noqa: E402
from flink_1_3_2_hopsworks_spark.dedup.simhash import (  # noqa: E402
    _chunked_capped,
    hamming64,
    portable_hash60,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("AB_PASSES", "5"))


def sim_fingerprints(df, union: bool):
    hash_expr = portable_hash60
    ids = df.select(F.col("doc_id").alias("_id"))
    toks = df.select(
        F.col("doc_id").alias("_id"),
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("_tok"),
    ).filter(F.col("_tok") != "")
    hashed = toks.select("_id", hash_expr(F.col("_tok")).alias("_h"))
    if union:
        hashed = hashed.unionByName(
            ids.select("_id", F.lit(None).cast("long").alias("_h"))
        )

    def _packed(g: int):
        h = F.col("_h")
        terms = [
            F.shiftleft(
                F.shiftrightunsigned(h, 4 * g + s).bitwiseAND(F.lit(1)).cast("long"),
                16 * s,
            )
            for s in range(4)
        ]
        t = terms[0]
        for extra in terms[1:]:
            t = t + extra
        return t

    sums = hashed.groupBy("_id").agg(
        (F.count("_h") if union else F.count(F.lit(1))).alias("_n"),
        *[F.sum(_packed(g)).alias(f"_p{g}") for g in range(16)],
    )
    fp = F.lit(0).cast("long")
    for b in range(64):
        count_b = F.shiftrightunsigned(
            F.col(f"_p{b // 4}"), 16 * (b % 4)
        ).bitwiseAND(F.lit(0xFFFF))
        fp = fp.bitwiseOR(
            F.when(count_b * 2 > F.col("_n"), F.shiftleft(F.lit(1).cast("long"), b))
            .otherwise(0)
            .cast("long")
        )
    if union:
        return sums.select("_id", fp.alias("simhash"))
    fps = sums.select("_id", fp.alias("simhash"))
    return ids.join(fps, "_id", "left").select(
        "_id", F.coalesce("simhash", F.lit(0)).alias("simhash")
    )


def sim_pairs(df, union: bool, double_dedup: bool):
    fps = sim_fingerprints(df, union).persist()
    capped, _ = _chunked_capped(fps, 1000)
    left = capped.select(
        "ci", "cv", F.col("_id").alias("id_a"), F.col("simhash").alias("fp_a")
    )
    right = capped.select(
        "ci", "cv", F.col("_id").alias("id_b"), F.col("simhash").alias("fp_b")
    )
    blocked = (
        left.join(right, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming64(F.col("fp_a"), F.col("fp_b")).cast("long"))
        .filter(F.col("hamming") <= 8)
        .select("id_a", "id_b", "hamming")
    )
    if double_dedup:
        blocked = blocked.dropDuplicates(["id_a", "id_b"])
    canon = fps.groupBy("simhash").agg(F.min("_id").alias("_cid"))
    exact = (
        fps.join(canon, "simhash")
        .filter(F.col("_id") != F.col("_cid"))
        .select(
            F.col("_cid").alias("id_a"),
            F.col("_id").alias("id_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    return blocked.unionByName(exact).dropDuplicates(["id_a", "id_b"])


def min_pairs(df, int_cast: bool):
    num_hashes, bands, rows, max_bucket, threshold = 64, 8, 8, 1000, 0.8
    shingles = MH._shingles(df, "doc_id", "text", 5)
    sig = MH._signatures(shingles, num_hashes, True).persist()

    def _bucket_key(b: int):
        cols = [F.col(f"_h{b * rows + r}") for r in range(rows)]
        return F.concat_ws("|", *cols).cast("string")

    buckets = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), _bucket_key(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("_b"),
    ).select(
        "_id", F.col("_b.band").alias("_band"), F.col("_b.bucket").alias("_bucket")
    )
    bucket_sizes = buckets.groupBy("_band", "_bucket").agg(
        F.count(F.lit(1)).alias("_bsize")
    )
    oversized = bucket_sizes.filter(F.col("_bsize") > max_bucket).select(
        "_band", "_bucket"
    )
    capped = buckets.join(oversized, ["_band", "_bucket"], "left_anti")
    sig_cols = [f"_h{i}" for i in range(num_hashes)]
    wide = sig.select("_id", *sig_cols).join(capped, "_id")

    def proj(c):
        return F.col(c).cast("int") if int_cast else F.col(c)

    left = wide.select(
        "_band",
        "_bucket",
        F.col("_id").alias("id_a"),
        *[proj(c).alias(f"_a{i}") for i, c in enumerate(sig_cols)],
    )
    right = wide.select(
        "_band",
        "_bucket",
        F.col("_id").alias("id_b"),
        *[proj(c).alias(f"_b{i}") for i, c in enumerate(sig_cols)],
    )
    agree = sum(
        F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    jac = agree / F.lit(float(num_hashes))
    return (
        left.join(right, ["_band", "_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .distinct()
    )


def main() -> None:
    spark = get_spark(app_name="ab_dedup_components_r13")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    variants = {
        "sim_union_1dedup": lambda: sim_pairs(docs, union=True, double_dedup=False),
        "sim_union_2dedup": lambda: sim_pairs(docs, union=True, double_dedup=True),
        "sim_join_1dedup": lambda: sim_pairs(docs, union=False, double_dedup=False),
        "sim_join_2dedup": lambda: sim_pairs(docs, union=False, double_dedup=True),
        "min_intcast": lambda: min_pairs(docs, int_cast=True),
        "min_long": lambda: min_pairs(docs, int_cast=False),
    }

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
            spark.sparkContext.setJobDescription(f"ab_r13c:{name}:pass{p}")
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
    with open(os.path.join(REPO, "plans", "r13", "ab_dedup_components_r13.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
