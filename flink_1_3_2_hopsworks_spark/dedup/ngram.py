"""Token n-gram Jaccard near-duplicate detection.

North-star extension (SURVEY.md §2.14). Word n-gram sets + exact Jaccard.
Pure expression pipeline (tokens → n-grams → array_intersect/union ratio).

The all-pairs variant here joins on a cheap blocking key (shared rare
token-gram prefix buckets would be the production choice); for bounded inputs
(doc corpora per partition-range) it's an exact, oracle-checkable baseline
that the MinHash path approximates at scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from flink_1_3_2_hopsworks_spark.dedup.minhash import jaccard
from flink_1_3_2_hopsworks_spark.functions.text import tokens


def token_ngrams(text: Column | str, n: int = 2) -> Column:
    """Distinct word n-grams (array<string>), space-joined."""
    toks = tokens(F.lower(text if isinstance(text, Column) else F.col(text)))
    cnt = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(cnt - (n - 1), F.lit(1)))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(cnt < n, F.array_distinct(F.array(F.concat_ws(" ", toks)))).otherwise(
        F.array_distinct(F.transform(idx, gram))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n: int = 2,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= threshold)
    via an inverted-index join — the set-similarity-join shape that scales:

      explode grams → self-join on gram (only docs sharing a gram ever meet)
      → count shared grams per pair → jaccard from |A|,|B|,|A∩B|.

    Pair candidates are generated only for docs with ≥1 common gram, so the
    quadratic blowup is bounded by gram co-occurrence, not corpus size.
    Shuffles: one on gram (join), one on (id_a, id_b) (count) — both
    well-distributed keys.
    """
    grams = df.select(
        F.col(id_col).alias("_id"), token_ngrams(text_col, n).alias("_g")
    )
    sizes = grams.select("_id", F.size("_g").alias("_n"))
    posting = grams.select("_id", F.explode("_g").alias("_gram"))
    left = posting.select(F.col("_id").alias("id_a"), "_gram")
    right = posting.select(F.col("_id").alias("id_b"), "_gram")
    inter = (
        left.join(right, "_gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    # Size lookups join on id — AQE broadcasts them when small enough
    # (at corpus scale they are per-doc tables, not broadcastable by fiat).
    return (
        inter.join(
            sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na")), "id_a"
        )
        .join(
            sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb")), "id_b"
        )
        .withColumn(
            "jaccard",
            F.round(F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i")), 4),
        )
        .filter(F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i")) >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
