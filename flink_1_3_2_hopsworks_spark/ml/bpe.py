"""Byte-pair-encoding tokenizer TRAINING on the engine's own primitives.

BPE (Sennrich et al. 2016): start from characters, repeatedly merge the
most frequent adjacent symbol pair. The classic formulation trains over
the word-frequency dictionary, not the raw corpus — so after ONE corpus
pass (token hash-aggregate) every Lloyd-style training step runs over a
vocabulary-sized table: one pair-count aggregate + one argmax per merge.
The per-step collect is the 1-row merge RULE (the model), never data —
the same contract as ml/kmeans.py.

Determinism contract: pair counts are integers, the argmax tie-breaks
lexicographically on (left, right), and the merge application is literal
string algebra — the double-space trick below makes `REPLACE` reproduce
BPE's left-to-right non-overlapping merge semantics exactly, in any
engine:

    apply(seq, l, r) = TRIM(REGEXP_REPLACE(
        REPLACE(' ' || REPLACE(seq, ' ', '  ') || ' ',
                ' l  r ', ' lr '),
        ' +', ' '))

Doubling the separators leaves one space on each side of every consumed
match, so consecutive occurrences ("a b a b") merge correctly ("ab ab")
while overlaps ("a a a" → "aa a") follow the left-to-right rule — byte
-for-byte replayable in DuckDB, which is how the training oracle audits
all ``num_merges`` unrolled steps.

Scale shape: the corpus is touched once (token count aggregate); the
training loop runs on the cached vocabulary table (bounded by the real
word vocabulary, ~10⁶ rows at web scale — a broadcast-sized model
table); serving (``bpe_segment_counts``) is a broadcast join of the
final word→segmentation table against the corpus token stream plus one
per-doc aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_1_3_2_hopsworks_spark.functions.lm import _tokens


def _char_seq(col):
    """Initial BPE state: characters separated by single spaces."""
    return F.trim(F.regexp_replace(col, "(.)", "$1 "))


def _apply_merge(seq, left: str, right: str):
    """One BPE merge over a space-separated symbol sequence (see module
    docstring for why the separator doubling is exact)."""
    doubled = F.concat(
        F.lit(" "), F.replace(seq, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    merged = F.replace(
        doubled,
        F.lit(f" {left}  {right} "),
        F.lit(f" {left}{right} "),
    )
    return F.trim(F.regexp_replace(merged, " +", " "))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(l, r, cnt): adjacent symbol pairs weighted by word frequency."""
    return (
        words.select(
            "_freq", F.split(F.col("_seq"), " ").alias("_sy")
        )
        .select(
            "_freq",
            F.explode(
                F.expr(
                    "transform(slice(_sy, 1, greatest(size(_sy)-1, 0)),"
                    " (x, i) -> struct(x as l, _sy[i+1] as r))"
                )
            ).alias("_p"),
        )
        .groupBy(F.col("_p.l").alias("l"), F.col("_p.r").alias("r"))
        .agg(F.sum("_freq").alias("cnt"))
    )


def bpe_fit(
    df: DataFrame, text_col: str, num_merges: int = 6
) -> list[dict]:
    """Train ``num_merges`` BPE merges over the corpus word-frequency
    table. Returns the merge rules (the model):
    ``[{step, left, right, merged, pair_count}, ...]``."""
    words = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_freq"))
        .select("_w", "_freq", _char_seq(F.col("_w")).alias("_seq"))
        .cache()
    )
    try:
        merges: list[dict] = []
        cur = words
        for step in range(1, num_merges + 1):
            best = (
                _pair_counts(cur)
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            b = best[0]
            merges.append(
                {
                    "step": step,
                    "left": b["l"],
                    "right": b["r"],
                    "merged": b["l"] + b["r"],
                    "pair_count": int(b["cnt"]),
                }
            )
            cur = cur.withColumn(
                "_seq", _apply_merge(F.col("_seq"), b["l"], b["r"])
            )
        return merges
    finally:
        words.unpersist()


def bpe_segment_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[dict],
) -> DataFrame:
    """Serve a trained BPE model: per document, the token count and the
    BPE symbol count after applying every merge — the compression-ratio
    signal a tokenizer-budget pipeline needs. The word→segmentation map
    is rebuilt as column algebra from the frozen merges (vocabulary-sized,
    broadcast); the corpus streams once through the join.

    Output: ``(id, n_tokens, n_bpe_symbols)``."""
    vocab = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("_w"))
        .distinct()
        .select("_w", _char_seq(F.col("_w")).alias("_seq"))
    )
    for m in merges:
        vocab = vocab.withColumn(
            "_seq", _apply_merge(F.col("_seq"), m["left"], m["right"])
        )
    vocab = vocab.select(
        "_w", F.size(F.split(F.col("_seq"), " ")).alias("_nsym")
    )
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_tokens(F.col(text_col))).alias("_w"),
    )
    per = (
        toks.join(F.broadcast(vocab), "_w")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_nsym").alias("n_bpe_symbols"),
        )
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(per, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce(
                F.col("n_bpe_symbols").cast("long"), F.lit(0).cast("long")
            ).alias("n_bpe_symbols"),
        )
    )
