"""Statistical language-model operators for corpus curation.

Two published curation methods re-expressed as declarative Spark plans:

- ``bigram_lm_perplexity`` + ``perplexity_buckets`` — CCNet-style LM
  quality bucketing (Wenzek et al. 2020): train an add-k-smoothed bigram
  LM on a reference slice, score every document's cross-entropy
  (bits/token), and split the corpus into head/middle/tail perplexity
  buckets. The reference-analogue surface is a scalar-function +
  aggregation pipeline (Flink 1.3's table API would express the serve
  side as a scalar UDF over a broadcast model — here the model IS a
  relational table and serving is a join, so Catalyst owns the plan).
- ``dsir_importance_weights`` — Data Selection via Importance Resampling
  (Xie et al. 2023): hashed n-gram bucket counts on a target and a raw
  corpus give per-bucket log importance ratios; each document scores the
  sum of its tokens' ratios. Composes with the Efraimidis–Spirakis
  weighted sampler (operators/sampling.py) for the resample step.

Determinism contract (shared with the rest of the repo): every float
that is SUMMED across rows is rounded to 6 decimals first and summed as
DECIMAL(38,6) — decimal addition is exact and order-independent, so the
result is identical under any partitioning and replayable in DuckDB.
``LN`` and IEEE double division match bit-for-bit between the JVM and
DuckDB on this host (pinned by the tfidf and A-Res gates).

Scale shape: the trained model is a TABLE (bigram counts / 256 hashed
buckets), never driver state. Model tables are broadcast when small; at
open-vocabulary scale the bigram join degrades gracefully to a shuffle
join on ``prev`` — still one pass over the token stream. Percentile
thresholds are computed from a HISTOGRAM of 4-dp-rounded scores
(bounded distinct values), so no global sort of per-doc stats is ever
needed — the only window runs over the tiny distinct-score table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_LN2 = 0.6931471805599453


def _tokens(col):
    """Whitespace tokens of lowercased trimmed text; NULL-safe; no empties."""
    return F.filter(
        F.split(F.lower(F.trim(F.coalesce(col, F.lit("")))), r"\s+"),
        lambda t: t != F.lit(""),
    )


def _token_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(_tokens(F.col(text_col))).alias("_t"),
    )


def _bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, prev, cur) for every consecutive token pair — built from the
    token array in the scan projection (no per-doc window shuffle)."""
    return (
        df.select(
            F.col(id_col).alias("_id"), _tokens(F.col(text_col)).alias("_toks")
        )
        .select(
            "_id",
            F.explode(
                F.expr(
                    "transform(slice(_toks, 1, greatest(size(_toks)-1, 0)),"
                    " (x, i) -> struct(x as prev, _toks[i+1] as cur))"
                )
            ).alias("_bg"),
        )
        .select("_id", F.col("_bg.prev").alias("prev"), F.col("_bg.cur").alias("cur"))
    )


def bigram_lm_perplexity(
    train: DataFrame,
    serve: DataFrame,
    id_col: str,
    text_col: str,
    add_k: float = 0.5,
) -> DataFrame:
    """Train an add-k bigram LM on ``train`` and score every ``serve`` doc.

    p(cur|prev) = (c(prev,cur) + k) / (c(prev) + k·V) with V = distinct
    train unigrams; a document scores the mean negative log2-likelihood of
    its bigram transitions (``bits_per_token``); docs with < 2 tokens
    score 0.0 over 0 events (they carry no transition evidence).

    Output: ``(id, n_events, bits_per_token)`` — one row per serve doc.

    Plan: two hash-aggregates build the model tables from one pass over
    the train token stream; serving is one pass over the serve bigram
    stream with two model joins and one per-doc aggregate. No Python, no
    driver model state. The model joins carry NO broadcast hint: a hint
    would override ``autoBroadcastJoinThreshold`` and force an
    open-vocabulary model table through the driver; instead Spark/AQE
    broadcasts when the built model measures small and falls back to a
    shuffle hash join on ``prev``/``(prev,cur)`` when it doesn't.
    ``vocab_n`` stays a hinted broadcast — it is one row by construction.
    """
    train_bg = _bigram_rows(train, id_col, text_col)
    c_bi = train_bg.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).alias("_cbi")
    )
    c_prev = train_bg.groupBy("prev").agg(F.count(F.lit(1)).alias("_cprev"))
    vocab_n = (
        _token_rows(train, id_col, text_col)
        .agg(F.countDistinct("_t").alias("_v"))
    )

    serve_bg = _bigram_rows(serve, id_col, text_col)
    p = (F.coalesce(F.col("_cbi"), F.lit(0)) + F.lit(add_k)) / (
        F.coalesce(F.col("_cprev"), F.lit(0)) + F.lit(add_k) * F.col("_v")
    )
    scored = (
        serve_bg.join(c_bi, ["prev", "cur"], "left")
        .join(c_prev, ["prev"], "left")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "_id",
            F.round(-F.log(p), 6).cast("decimal(38,6)").alias("_nll"),
        )
    )
    per_doc = scored.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("_nll").alias("_s")
    )
    return (
        serve.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
            F.when(F.col("n_events").isNull(), F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("_s").cast("double")
                    / (F.col("n_events") * F.lit(_LN2)),
                    4,
                )
            )
            .alias("bits_per_token"),
        )
    )


def perplexity_buckets(
    per_doc: DataFrame, id_col: str, bits_col: str = "bits_per_token"
) -> DataFrame:
    """CCNet head/middle/tail bucketing by exact discrete terciles.

    Thresholds t1/t2 are the ``bits`` values at ranks ⌈n/3⌉ and ⌈2n/3⌉
    (ascending) — computed from a HISTOGRAM of the 4-dp-rounded scores:
    one hash-aggregate over doc stats, then a cumulative window over the
    tiny distinct-value table. Exact, order-independent, and scale-safe
    (no global sort of per-document rows). ``kept`` = not tail.
    """
    hist = per_doc.groupBy(bits_col).agg(F.count(F.lit(1)).alias("_c"))
    w = (
        Window.orderBy(bits_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(w))
    n = per_doc.agg(F.count(F.lit(1)).alias("_n"))
    thr = (
        cum.crossJoin(F.broadcast(n))
        .agg(
            F.min(
                F.when(
                    F.col("_cum") >= F.ceil(F.col("_n") / 3.0), F.col(bits_col)
                )
            ).alias("_t1"),
            F.min(
                F.when(
                    F.col("_cum") >= F.ceil(F.col("_n") * 2 / 3.0),
                    F.col(bits_col),
                )
            ).alias("_t2"),
        )
    )
    return per_doc.crossJoin(F.broadcast(thr)).select(
        *[F.col(c) for c in per_doc.columns],
        F.when(F.col(bits_col) <= F.col("_t1"), F.lit("head"))
        .when(F.col(bits_col) <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
        (F.col(bits_col) <= F.col("_t2")).alias("kept"),
    )


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 256,
    salt: str = "dsir42",
) -> DataFrame:
    """DSIR (Xie et al. 2023) per-document importance weights.

    Tokens hash into ``n_buckets`` buckets (salted-md5 scheme shared with
    the repo's samplers — replayable anywhere); per-bucket add-1 log
    importance ratio ln(p_target(b)/p_raw(b)); each raw doc scores the
    mean ratio of its tokens (``logratio_per_token``, 6 dp). Positive
    means "looks like the target distribution".

    Output: ``(id, n_tokens, logratio_per_token)`` for every raw doc with
    at least one token. Feed ``exp(logratio_per_token)`` to
    ``weighted_sample_fixed_size`` for the resampling step.

    Plan: the model is a ≤ ``n_buckets``-row table built by two hash
    aggregates (target tokens ⊆ raw tokens, so the raw side hosts the
    left join); serving is one broadcast join on the bucket id and one
    per-doc aggregate. Nothing ever leaves the JVM.
    """
    def bucket(tok):
        h32 = F.conv(
            F.substring(
                F.md5(F.concat_ws("|", tok, F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        return (h32 % n_buckets).alias("_b")

    raw_toks = _token_rows(raw, id_col, text_col).select("_id", bucket(F.col("_t")))
    tgt_toks = _token_rows(target, id_col, text_col).select(bucket(F.col("_t")))

    cr = raw_toks.groupBy("_b").agg(F.count(F.lit(1)).alias("_cr"))
    ct = tgt_toks.groupBy("_b").agg(F.count(F.lit(1)).alias("_ct"))
    totals = cr.agg(F.sum("_cr").alias("_tr")).crossJoin(
        tgt_toks.agg(F.count(F.lit(1)).alias("_tt"))
    )
    model = (
        cr.join(ct, "_b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "_b",
            F.round(
                F.log(
                    (F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(1.0))
                    / (F.col("_tt") + F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.col("_cr") + F.lit(1.0))
                    / (F.col("_tr") + F.lit(float(n_buckets)))
                ),
                6,
            )
            .cast("decimal(38,6)")
            .alias("_lr"),
        )
    )
    per_doc = (
        raw_toks.join(F.broadcast(model), "_b")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("_lr").alias("_w"))
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        F.round(F.col("_w").cast("double") / F.col("n_tokens"), 6).alias(
            "logratio_per_token"
        ),
    )


def zipf_fit(df: DataFrame, text_col: str, top_k: int = 100) -> DataFrame:
    """Zipf-law fit over the corpus term distribution — the dataset-card
    statistic that flags synthetic/degenerate corpora (natural text fits
    log(freq) ≈ a + s·log(rank) with s ≈ −1; a flat slope means a
    templated vocabulary). Least squares over the top-``top_k`` terms.

    Output: ONE row ``(n_terms, slope, intercept, r2)`` (4 dp).

    Determinism: per-point log terms are rounded to 6 dp and summed as
    DECIMAL(38,6) (exact, order-free); the closed-form normal-equation
    arithmetic on the five sums is plain IEEE double. Scale shape: one
    token hash-aggregate + TakeOrdered top-k; the regression runs over k
    rows (the model, not the data)."""
    from pyspark.sql import Window

    freqs = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("_t"))
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_f"))
        .orderBy(F.desc("_f"), F.asc("_t"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("_f"), F.asc("_t"))
    pts = freqs.withColumn("_r", F.row_number().over(w)).select(
        F.round(F.log(F.col("_r").cast("double")), 6).alias("_x"),
        F.round(F.log(F.col("_f").cast("double")), 6).alias("_y"),
    )
    dec = lambda c: F.round(c, 6).cast("decimal(38,6)")  # noqa: E731
    sums = pts.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec(F.col("_x"))).alias("_sx"),
        F.sum(dec(F.col("_y"))).alias("_sy"),
        F.sum(dec(F.col("_x") * F.col("_y"))).alias("_sxy"),
        F.sum(dec(F.col("_x") * F.col("_x"))).alias("_sxx"),
        F.sum(dec(F.col("_y") * F.col("_y"))).alias("_syy"),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    # Degenerate-input contract: with a single distinct term (or top_k=1)
    # varx == 0, so the normal equations have no defined slope — return
    # slope 0.0 / intercept = mean(y) / r2 NULL instead of NaN/NULL noise.
    # An all-equal-frequency corpus whose log²f rounds cleanly at 6 dp hits
    # vary == 0 the same way (r2 NULL — correlation undefined, not
    # "perfect"); usually rounding leaves vary tiny-nonzero and r2 ≈ 0.
    slope = F.when(varx == 0, F.lit(0.0)).otherwise(cov / varx)
    return sums.select(
        F.col("_n").alias("n_terms"),
        F.round(slope, 4).alias("slope"),
        F.round((sy - slope * sx) / n, 4).alias("intercept"),
        F.when((varx == 0) | (vary == 0), F.lit(None).cast("double"))
        .otherwise(F.round((cov * cov) / (varx * vary), 4))
        .alias("r2"),
    )
