"""Near-duplicate cluster resolution — the removal half of fuzzy dedup.

Pair generators (minhash/simhash/ngram/embedding) emit near-dup PAIRS;
an actual corpus clean needs per-document verdicts: transitive clusters
(doc A ~ B, B ~ C puts A,C in one cluster even if never paired directly)
with ONE canonical survivor each. This is the standard MinHash-LSH +
connected-components composition used to dedup LLM training corpora.

Spark-first: the pair graph goes through the Gelly-style label-propagation
connected components (graph/pregel.py — one edges⋈state join + one
hash-aggregate per superstep, localCheckpoint-truncated), then one
broadcast-friendly left join marks every document. Docs in no pair never
enter the iteration — cluster work scales with the DUPLICATE population,
not the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_1_3_2_hopsworks_spark.graph.pregel import connected_components


def resolve_duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    max_iterations: int = 20,
) -> DataFrame:
    """Per-document dedup verdicts from a near-dup pair table.

    ``pairs`` must have ``id_a``/``id_b`` columns (any extra columns are
    ignored). Returns one row per input document:
    ``(<id_col>, canonical_id, kept)`` where ``canonical_id`` is the
    smallest id in the document's transitive near-dup cluster (itself when
    it has no near-dups) and ``kept`` marks the cluster's one survivor.
    """
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components(edges, max_iterations=max_iterations).select(
        # Rename away from "id" so a caller whose id_col IS "id" doesn't
        # hit an ambiguous-reference clash after the join.
        F.col("id").alias("_nd_id"),
        "component",
    )
    out_id = F.col(id_col)
    canonical = F.coalesce(F.col("component"), out_id)
    return (
        docs.select(out_id)
        .join(comp, docs[id_col] == comp["_nd_id"], "left")
        .select(
            out_id,
            canonical.alias("canonical_id"),
            (canonical == out_id).alias("kept"),
        )
    )
