"""BM25 lexical retrieval over a document corpus.

The lexical complement to the embedding ANN family: Okapi BM25
(Robertson & Zaragoza 2009, Lucene's non-negative idf variant) as one
declarative Spark plan — postings and document-length tables are hash
aggregates over the token stream, scoring is a broadcast join of the
(tiny) query-term set against the postings, and the top-k per query is a
``row_number`` window that Spark executes as WindowGroupLimit (each
partition keeps at most k rows before the shuffle).

Determinism: per-term contributions are rounded to 6 dp and summed as
DECIMAL(38,6) (exact, order-independent — the repo-wide contract), ranks
break ties by doc id. ``LN`` and IEEE double division replay bit-for-bit
in DuckDB.

Scale shape: the corpus streams once to build (doc, term, tf) postings;
scoring touches only postings rows whose term appears in a query
(broadcast semi-shaped join — the scan never shuffles on anything wider
than the matched postings). df/N/avgdl are one corpus aggregate
broadcast back. No Python anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from flink_1_3_2_hopsworks_spark.functions.lm import _tokens


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    query_id: str = "query_id",
    query_text: str = "query_text",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    exclude_self: bool = False,
    persist: bool = True,
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)); query terms are
    deduplicated (short-query convention). Output:
    ``(query_id, id, score, rank)`` — rank by (score desc, id asc).

    ``exclude_self=True`` drops (query, doc) pairs whose ids are equal
    BEFORE ranking (gap-free ranks) — the "more like this" convention when
    queries are corpus documents themselves, e.g. under
    ``similarity.hybrid.rrf_fuse``.

    The df and N/avgdl statistics DERIVE from the postings table, which is
    pinned (``persist=True``, library-internal cache caller-owned — the
    minhash signature-table contract) so the corpus text is scanned ONCE;
    without the pin Catalyst recomputes the token explode per consumer
    (three text scans — measured). Pass ``persist=False`` in shared-cache
    test sessions.
    """
    base = docs.select(
        F.col(id_col).alias("_id"), _tokens(F.col(text_col)).alias("_toks")
    )
    # Document length rides the scan projection (size of the token array)
    # through the explode, so the per-doc length never needs a corpus-wide
    # join back on the id — the only corpus shuffle is the postings build.
    toks = base.select(
        "_id",
        F.size("_toks").alias("_dl"),
        F.explode("_toks").alias("_t"),
    )
    postings = toks.groupBy("_id", "_t").agg(
        F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl")
    )
    if persist:
        postings = postings.persist()
    df_t = postings.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    # N and avgdl from the pinned postings (docs with >= 1 token have
    # >= 1 posting row; empty docs were excluded before, too).
    dl = postings.groupBy("_id").agg(F.first("_dl").alias("_l"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("_n"),
        (F.sum("_l").cast("double") / F.count(F.lit(1))).alias("_avgdl"),
    )

    qterms = (
        queries.select(
            F.col(query_id).alias("_qid"),
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(
                            F.lower(F.trim(F.coalesce(F.col(query_text), F.lit("")))),
                            r"\s+",
                        ),
                        lambda t: t != F.lit(""),
                    )
                )
            ).alias("_t"),
        )
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    tf_norm = (F.col("_tf") * F.lit(k1 + 1.0)) / (
        F.col("_tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
    )
    qdf = (
        df_t.join(F.broadcast(qterms.select("_t").distinct()), "_t")
        .select("_t", "_df")
    )
    pairs = postings.join(F.broadcast(qterms), "_t")
    if exclude_self:
        pairs = pairs.filter(F.col("_id") != F.col("_qid"))
    contrib = (
        pairs
        .join(F.broadcast(qdf), "_t")
        .crossJoin(F.broadcast(stats))
        .select(
            "_qid",
            "_id",
            F.round(idf * tf_norm, 6).cast("decimal(38,6)").alias("_c"),
        )
    )
    scored = contrib.groupBy("_qid", "_id").agg(F.sum("_c").alias("_s"))
    w = Window.partitionBy("_qid").orderBy(F.desc("_s"), F.asc("_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_id").alias(id_col),
            F.round(F.col("_s").cast("double"), 4).alias("score"),
            "rank",
        )
    )
