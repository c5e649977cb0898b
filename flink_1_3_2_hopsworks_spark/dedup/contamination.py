"""Benchmark decontamination: flag corpus documents sharing word n-grams
with a benchmark/eval set.

The standard pre-training hygiene step (the reference engine has no
counterpart; modeled on the n-gram-overlap procedure published with GPT-3
appendix C / PaLM / Llama: a document is contaminated if any length-n word
n-gram also occurs in the benchmark set).

Scale design: the benchmark side (eval sets — thousands of documents) is
tiny next to the corpus, so its distinct-gram set is BROADCAST and the
corpus side streams through a map-side hash join — no shuffle (and no
pre-join distinct) of the 100-TB corpus: the RAW gram stream probes the
broadcast hash table, and only the matching (doc_id, gram) pairs — bounded
by corpus-docs × benchmark-gram-count, in practice tiny — reach the one
aggregation, a per-doc ``countDistinct`` that dedups a document's repeated
matching grams AFTER the broadcast filter. Gram generation is pure Column
math (split → sequence → slice → concat), fully codegen'd (or the
Arrow-batched builder on numeric-id corpora).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def word_ngrams(text: Column | str, n: int) -> Column:
    """Array of length-``n`` word n-grams (space-joined) over lowercase
    whitespace tokens; empty array when the document has fewer than ``n``
    tokens. Deterministic string math — any engine replays it."""
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def benchmark_ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-corpus-document contamination verdict against ``benchmark``:
    ``(id_col, n_hits, contaminated)`` where ``n_hits`` counts the
    document's *distinct* n-grams that also occur anywhere in the benchmark
    set and ``contaminated`` is ``n_hits > 0``. Every corpus row appears in
    the output (zero-hit docs included via a left join).

    ``broadcast_benchmark=False`` falls back to a shuffle join for the
    rare benchmark set too large to broadcast."""
    numeric_id = dict(corpus.dtypes).get(id_col) in (
        "bigint", "int", "smallint", "tinyint",
    )
    if numeric_id:
        # Arrow-batched gram builder (same strings as word_ngrams; the
        # Catalyst HOF formulation is interpreted per element and ~20x
        # slower at corpus scale — see dedup/ngram.py).
        from flink_1_3_2_hopsworks_spark.dedup.ngram import _gram_sets

        corpus_grams = (
            _gram_sets(corpus, id_col, text_col, n, short_doc_whole_text=False)
            .select(F.col("_id").alias(id_col), F.explode("_g").alias("gram"))
        )
    else:
        corpus_grams = corpus.select(
            F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
        )
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams(text_col, n)).alias("gram")
        ).distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    # Map-side broadcast probe FIRST (raw gram stream, no corpus shuffle);
    # the per-doc distinct moves into the aggregation, whose input is only
    # the matching pairs.
    hits = (
        corpus_grams.join(bench_grams, "gram")
        .groupBy(id_col)
        .agg(F.countDistinct("gram").alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0).cast("long")) > 0).alias(
                "contaminated"
            ),
        )
    )


def embedding_decontaminate(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    probe_id: str = "probe_id",
    threshold: float = 0.30,
) -> DataFrame:
    """Semantic decontamination: flag corpus vectors whose cosine to ANY
    benchmark/probe vector reaches ``threshold`` — the embedding-space
    complement of ``benchmark_ngram_overlap`` (paraphrased leakage that
    shares no exact n-gram still lands next to the benchmark in embedding
    space).

    Same scale contract as the n-gram probe: the benchmark side is
    model-sized (eval sets — thousands of vectors) and ships to every
    task; the corpus streams ONCE through an Arrow-batched cosine kernel
    (functions/vectors.py) that emits only the flagged rows — no
    shuffle, no window, narrow scan end-to-end. The kernel, not the
    zip_with Column expression: per-row cosines against K fixed vectors
    is the measured Janino-fallback shape (sf1→sf10 ratio 10.15× before
    the kernel). The kernel's ascending accumulation keeps the values
    bit-identical to the expression AND the DuckDB oracle. Output:
    ``(id, probe_id, cosine)`` — each flagged corpus vector with its
    closest probe (ties broken by probe id, argmax-first on the
    probe-id-sorted matrix).
    """
    import numpy as np
    import pandas as pd

    from flink_1_3_2_hopsworks_spark.functions.vectors import (
        _batch_cosines,
        _seq_norms,
    )

    # The probe set is the MODEL here (k-means-gate discipline): a small
    # frozen benchmark collection, sorted by id so argmax ties pick the
    # lowest probe id exactly like the rank-1 window it replaces.
    prows = sorted(
        (r[probe_id], list(map(float, r[vec_col])))
        for r in probes.select(probe_id, vec_col).collect()
    )
    # Probe-id dtype follows probes.schema (like id_col follows corpus's):
    # string benchmark names work the same as integer ids — numpy keeps
    # them as an object/str array and Arrow maps the declared DDL type.
    pids = np.asarray([r[0] for r in prows])
    pvecs = np.asarray([r[1] for r in prows], dtype=np.float64)
    pnorms = np.asarray(_seq_norms([r[1] for r in prows]))

    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"))
    id_ddl = f"{id_col} {corpus.schema[id_col].dataType.simpleString()}"
    probe_ddl = f"{probe_id} {probes.schema[probe_id].dataType.simpleString()}"
    schema = f"{id_ddl}, {probe_ddl}, cosine double"

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf["_cv"].tolist(), dtype=np.float64)
            cos = _batch_cosines(x, pvecs, pnorms)
            best = cos.argmax(axis=1)
            bestcos = cos[np.arange(len(pdf)), best]
            keep = bestcos >= threshold
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col][keep],
                    probe_id: pids[best[keep]],
                    "cosine": bestcos[keep],
                }
            )

    # Round JVM-side: np.round is half-to-even, the repo contract (and
    # DuckDB ROUND) is half-away-from-zero — same pin as ml/kmeans.py.
    return c.mapInPandas(kernel, schema).withColumn(
        "cosine", F.round("cosine", 4)
    )
