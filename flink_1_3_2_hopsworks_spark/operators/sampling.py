"""Sampling operators.

Reference parity: DataSetUtils#sample / #sampleWithSize (flink-java) with
Bernoulli / Poisson samplers and reservoir sampling for fixed-size samples
(ReservoirSamplerWithReplacement / WithoutReplacement).

Scale notes: fraction sampling is a narrow map (no shuffle). Fixed-size
sampling avoids collecting the dataset: over-sample by a safety margin at an
estimated fraction, then cut to exactly n — two jobs, no driver-side data.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_h32(*cols, salt: str):
    """THE repo-standard portable draw/shard hash: the first 32 bits of
    md5(col|col|...|salt) as a bigint in [0, 2^32). Every sampler, the
    sharder, and the curation funnel's checksums use exactly this scheme —
    one definition so the engine and every DuckDB oracle can never drift
    (SQL replay: ('0x' || SUBSTR(MD5(CONCAT_WS('|', ..., salt)), 1, 8))::BIGINT)."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", *[c.cast("string") for c in cols], F.lit(salt)
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")


def sample(
    df: DataFrame,
    fraction: float,
    with_replacement: bool = False,
    seed: int | None = None,
) -> DataFrame:
    """Bernoulli (or Poisson, with replacement) sampling by fraction."""
    return df.sample(withReplacement=with_replacement, fraction=fraction, seed=seed)


def sample_with_size(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Fixed-size sample without replacement (reference sampleWithSize,
    reservoir-based). Distributed two-pass: count → over-sampled Bernoulli →
    deterministic cut to n by a seeded random order."""
    total = df.count()
    if total <= n:
        return df
    # Over-sample ~3 sigma above the target so the cut has enough rows.
    frac = min(1.0, n / total + 3.0 * (n ** 0.5) / total + 1e-6)
    over = df.sample(withReplacement=False, fraction=frac, seed=seed)
    return over.withColumn("_r", F.rand(seed)).orderBy("_r").limit(n).drop("_r")


def sample_with_size_hashed(
    df: DataFrame, n: int, key_cols: Sequence[str], salt: str = "s42"
) -> DataFrame:
    """Fixed-size sample without replacement, selected by salted-hash order
    (top-n by md5 of the key): same reference semantics as sampleWithSize —
    a uniform fixed-size draw — but PORTABLE: any engine replays the exact
    row set from (key, salt), making samples auditable and the registry
    gate oracle-checkable (Spark's XORShift rand is not). Single pass, no
    count job; orderBy+limit plans as TakeOrderedAndProject (per-partition
    top-n, no full sort shuffle). Change ``salt`` to redraw."""
    h = F.md5(
        F.concat_ws(
            "|", *[F.col(c).cast("string") for c in key_cols], F.lit(salt)
        )
    )
    return df.withColumn("_h", h).orderBy("_h").limit(n).drop("_h")


def mixture_sample_hashed(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_cols: Sequence[str],
    salt: str = "m42",
    default_rate: float = 1.0,
) -> DataFrame:
    """Domain/language mixture resampling (training-pipeline op): keep each
    row with a per-stratum probability — e.g. downsample the dominant
    language to hit a target corpus mixture. The draw is the PORTABLE
    salted-md5 scheme shared by the other samplers: a row survives iff the
    first 32 bits of md5(key|salt) fall below rate·2³². Any engine replays
    the exact row set from (key, salt); change ``salt`` to redraw.

    Pure filter — a narrow map over the scan, no shuffle, no RNG state;
    at 100 TB this costs exactly one pass and composes with predicate
    pushdown (the md5 filter sits above the pruned scan)."""
    h32 = salted_h32(*[F.col(c) for c in key_cols], salt=salt)
    threshold = F.lit(int(default_rate * (1 << 32)))
    for stratum, rate in rates.items():
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(int(rate * (1 << 32)))
        ).otherwise(threshold)
    return df.filter(h32 < threshold)


def stratified_sample_hashed(
    df: DataFrame,
    n_per_stratum: int,
    strata_cols: Sequence[str],
    key_cols: Sequence[str],
    salt: str = "s42",
) -> DataFrame:
    """Fixed-size PER-STRATUM sample (training-pipeline class balancing —
    Spark's own sampleBy is fraction-based and draws from a non-portable
    RNG): the n smallest salted-md5 key hashes within each stratum. Same
    portable-draw design as sample_with_size_hashed — any engine replays
    the exact row set from (key, salt), so samples are auditable and
    oracle-checkable. One shuffle on the strata keys; the per-stratum
    row_number window holds at most the stratum, and the draw is uniform
    within it. Change ``salt`` to redraw."""
    from pyspark.sql import Window

    h = F.md5(
        F.concat_ws(
            "|", *[F.col(c).cast("string") for c in key_cols], F.lit(salt)
        )
    )
    w = Window.partitionBy(*strata_cols).orderBy(F.col("_h"))
    return (
        df.withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_h", "_rn")
    )


def weighted_sample_fixed_size(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_cols: Sequence[str],
    salt: str = "w42",
) -> DataFrame:
    """Weighted fixed-size sample WITHOUT replacement (Efraimidis–Spirakis
    A-Res), portable: each row draws u ∈ (0,1] from the salted-md5 scheme
    shared by the other samplers and gets sort key ln(u)/w — ordering-
    equivalent to the classic u^(1/w) — and the top-n keys survive, which
    selects each row with probability proportional to its weight (the
    quality-weighted corpus draw every curation pipeline needs). Any
    engine replays the exact row set from (key, salt); change ``salt`` to
    redraw. Rows with weight <= 0 or NULL are never sampled.

    Scale shape: one narrow map for the key then orderBy+limit, which
    Spark plans as TakeOrderedAndProject — each partition emits at most n
    rows, no full-sort shuffle.
    """
    h32 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    *[F.col(c).cast("string") for c in key_cols],
                    F.lit(salt),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h32 + F.lit(1)).cast("double") / F.lit(float(1 << 32))
    k = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_k", k)
        .orderBy(F.desc("_k"), *[F.col(c) for c in key_cols])
        .limit(n)
        .drop("_k")
    )


def token_mixture_resample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    token_count_col,
    targets: dict[str, float],
    salt: str = "tm42",
) -> DataFrame:
    """Resample a corpus so the TOKEN shares of the listed strata hit a
    target mixture (the Pile/ROOTS-style language/domain rebalance —
    training mixtures are specified in tokens, not documents).

    Keep-rates are DERIVED, not hand-picked: with ``share_s`` the
    stratum's current token share and ``t_s`` its target, the binding
    stratum (largest ``t_s / share_s``) keeps rate 1 and every other
    stratum keeps ``(t_s / share_s) / max_r(t_r / share_r)`` — the unique
    scaling that hits the target ratios without upsampling anything.
    Strata not in ``targets`` are dropped. The whole derivation is
    DECLARATIVE: one hash-aggregate over the corpus → a per-stratum rate
    table (bounded by the stratum count) whose windows cost nothing →
    broadcast-joined back, and each row survives the shared portable
    salted-md5 draw iff ``u < rate`` — one corpus pass, no driver collect,
    replayable in any engine. Output: kept rows
    ``(id_col, stratum_col, n_tokens, rate)``.
    """
    from pyspark.sql import Window

    tok = (
        F.col(token_count_col)
        if isinstance(token_count_col, str)
        else token_count_col
    ).cast("double")
    rows = df.select(F.col(id_col), F.col(stratum_col), tok.alias("_tok"))

    target = F.lit(None).cast("double")
    for stratum, share in targets.items():
        target = F.when(
            F.col(stratum_col) == stratum, F.lit(float(share))
        ).otherwise(target)
    totals = (
        rows.groupBy(stratum_col)
        .agg(F.sum("_tok").alias("_t"))
        .withColumn("_target", target)
        .filter(F.col("_target").isNotNull())
    )
    everything = Window.partitionBy()
    share = F.col("_t") / F.sum("_t").over(everything)
    ratio = F.col("_target") / share
    rates = (
        totals.withColumn("_ratio", ratio)
        .withColumn(
            "rate",
            F.round(F.col("_ratio") / F.max("_ratio").over(everything), 6),
        )
        .select(stratum_col, "rate")
    )

    h32 = salted_h32(F.col(id_col), salt=salt)
    return (
        rows.join(F.broadcast(rates), stratum_col)
        .filter(h32 < F.col("rate") * F.lit(float(1 << 32)))
        .select(
            F.col(id_col),
            F.col(stratum_col),
            F.col("_tok").cast("long").alias("n_tokens"),
            "rate",
        )
    )


def temperature_resample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    token_count_col,
    temperature: float = 2.0,
    salt: str = "tt42",
) -> DataFrame:
    """Temperature-scaled mixture resampling (the multilingual-LM
    rebalance: target token shares q_s ∝ p_s^(1/T), flattening the
    stratum distribution as T grows — T=1 keeps the corpus, T→∞
    approaches uniform).

    Subsampling-only derivation (no stratum is upsampled): with α = 1/T,
    keep-rate_s = (q_s/p_s) normalized so the binding stratum — the
    SMALLEST share, since p^(α−1) is decreasing for α < 1 — keeps rate 1:
    ``rate_s = (p_min / p_s)^(1−α)``, rounded to 6 dp so any engine
    replays the same broadcast rate table. Same declarative shape as
    :func:`token_mixture_resample`: one hash-aggregate → per-stratum rate
    table (window over the bounded stratum table) → broadcast join →
    portable salted-md5 draw, one corpus pass, no collect. Zero-token
    strata are dropped (no tokens to rebalance). Output: kept rows
    ``(id_col, stratum_col, n_tokens, rate)``.
    """
    from pyspark.sql import Window

    if temperature < 1.0:
        raise ValueError(
            f"temperature must be >= 1 (subsampling-only), got {temperature}"
        )
    tok = (
        F.col(token_count_col)
        if isinstance(token_count_col, str)
        else token_count_col
    ).cast("double")
    rows = df.select(F.col(id_col), F.col(stratum_col), tok.alias("_tok"))

    everything = Window.partitionBy()
    totals = (
        rows.groupBy(stratum_col)
        .agg(F.sum("_tok").alias("_t"))
        .filter(F.col("_t") > 0)
    )
    rate = F.round(
        F.pow(
            F.min("_t").over(everything) / F.col("_t"),
            F.lit(1.0 - 1.0 / float(temperature)),
        ),
        6,
    )
    rates = totals.withColumn("rate", rate).select(stratum_col, "rate")

    h32 = salted_h32(F.col(id_col), salt=salt)
    return (
        rows.join(F.broadcast(rates), stratum_col)
        .filter(h32 < F.col("rate") * F.lit(float(1 << 32)))
        .select(
            F.col(id_col),
            F.col(stratum_col),
            F.col("_tok").cast("long").alias("n_tokens"),
            "rate",
        )
    )


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    per_cell: int,
    salt: str = "cb42",
) -> DataFrame:
    """Diversity-preserving cluster-capped sample: assign each vector to
    its nearest (cosine) frozen centroid, keep at most ``per_cell`` rows
    per cell by a portable salted-md5 draw — the D4/cluster-balanced
    selection step that stops head clusters from dominating a downsample
    the way a uniform draw would.

    Output: ``(id, cell)`` for every surviving row. Deterministic from
    (id, salt) + the frozen model; any engine replays the draw and the
    per-cell rank.

    Scale shape: the cell assignment is a scan-fused argmax against the
    broadcast centroid literals (same expression the IVF index and
    k-means training use); the per-cell cap is a row_number window that
    Spark executes as WindowGroupLimit — each partition emits at most
    ``per_cell`` rows per cell before the shuffle. Cells ∝ √N keeps the
    window partitions bounded (the SemDeDup sizing contract).

    The assignment runs in the Arrow cell kernel
    (functions/vectors.py nearest_fixed_vector), not the K×D-literal
    Column expression: on the corpus-scale scan the expression tree blew
    Janino's 64 KB method limit and fell back to interpreted eval —
    measured at sf1→sf10 ratio 10.28× (time ∝ rows, zero amortization)
    before the kernel, ~linear-with-amortization after."""
    from pyspark.sql import Window

    from flink_1_3_2_hopsworks_spark.functions.vectors import (
        nearest_fixed_vector,
    )

    assigned = nearest_fixed_vector(
        df.select(F.col(id_col), F.col(vec_col)),
        vec_col,
        centroids,
        out_col="cell",
    ).select(id_col, "cell")
    key = F.md5(
        F.concat_ws("|", F.col(id_col).cast("string"), F.lit(salt))
    )
    w = Window.partitionBy("cell").orderBy(key.asc(), F.col(id_col).asc())
    return (
        assigned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_cell)
        .select(id_col, "cell")
    )
