"""Registry showcase queries for deduplication + text analysis
(north-star extensions, SURVEY.md §2.14)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_3_2_hopsworks_spark.catalog import load_table
from flink_1_3_2_hopsworks_spark.dedup.embedding import embedding_near_dups
from flink_1_3_2_hopsworks_spark.dedup.exact import dedup_documents
from flink_1_3_2_hopsworks_spark.dedup.minhash import (
    minhash_near_dups,
    minhash_star_edges,
)
from flink_1_3_2_hopsworks_spark.dedup.neardup import resolve_duplicate_clusters
from flink_1_3_2_hopsworks_spark.dedup.ngram import ngram_jaccard_pairs
from flink_1_3_2_hopsworks_spark.dedup.simhash import (
    portable_hash60,
    simhash_near_dups,
)
from flink_1_3_2_hopsworks_spark.functions import text as T


def dd_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one representative doc (min doc_id) per normalized-text
    fingerprint, with duplicate-group size."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_documents(docs, "text", "doc_id")


def dd_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact bigram-set Jaccard near-dup pairs via a PREFIX-FILTERED
    inverted-index join (AllPairs/PPJoin) — the SQL-checkable ground truth
    that MinHash approximates, at MinHash's own 0.8 operating point (where
    the prefix is each doc's ~20% rarest grams and candidates collapse to
    true near-dups; a 0.35 threshold on this uniform-vocabulary corpus
    degenerates any inverted index toward all-pairs). Bigrams (not
    unigrams): the tiny vocabulary makes unigram posting lists degenerate
    (every doc shares every token)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8, n=2)


def dd_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (shingle→minhash→band→bucket-join),
    scored by the signature-agreement estimator. Full DuckDB hash-match:
    ``portable=True`` makes every hash md5-derived so the oracle replays
    shingling, the 64 affine permutations, banding, the bucket cap, and
    the estimator in SQL. Accuracy vs. the exact-Jaccard baseline is
    additionally pytest-covered."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_near_dups(
        docs, "doc_id", "text", threshold=0.8, portable=True,
        # r=8 geometry consciously chosen (measured decade-scale trade);
        # recall at the operating point is pytest-measured, not silent.
        recall_floor=None,
    )


def dd_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (bit-majority fingerprint, 16-bit-chunk
    blocking, Hamming XOR-popcount verify, hamming-0 star recovery).

    Hashes tokens with the md5-prefix portable hash so the DuckDB oracle
    replays the ENTIRE pipeline — fingerprints, chunk blocking, bucket cap,
    Hamming verify, exact-duplicate star — in SQL (full hash-match, not
    rows-only). Production callers use the default xxhash64."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dups(
        docs, "doc_id", "text", max_distance=8, hash_expr=portable_hash60
    )


def dd_simhash_stars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash star-edge near-dup edges (dedup/simhash.py
    simhash_star_edges) — the LINEAR cluster-goal geometry: per 16-bit-chunk
    bucket only (bucket-min anchor, member) XOR-popcount-verified edges,
    Θ(docs × 4) regardless of bucket sizes, plus the Hamming-0 canonical
    star. The scale answer to the pairs mode's quadratic bucket
    co-membership (the r7 sf10 worst case); dd_simhash_pairs survives as
    the explicit audit gate. Portable hash → the DuckDB oracle replays
    fingerprints, blocking, cap, anchor choice, and verify in SQL."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    from flink_1_3_2_hopsworks_spark.dedup.simhash import simhash_star_edges

    return simhash_star_edges(
        docs, "doc_id", "text", max_distance=8, hash_expr=portable_hash60
    )


def dd_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via hyperplane LSH. Full DuckDB
    hash-match: the seeded hyperplanes are deterministic, so the oracle
    inlines them and replays sign-bit bucketing + cosine verify in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dups(emb, "vec_id", "embedding", threshold=0.3)


def dd_embedding_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall evaluation of the OR-AMPLIFIED embedding near-dup operator
    (3 independent hyperplane sets, candidates deduped before the exact
    verify) against the exact brute-force pair set at the same threshold —
    the tuning metric for num_sets/num_planes, mirroring sim_recall_eval.
    One row: (n_true, n_found, recall). Deterministic (seeded planes), so
    the DuckDB oracle replays all three plane sets, the candidate union,
    the verify, and the division exactly."""
    from flink_1_3_2_hopsworks_spark.dedup.embedding import (
        embedding_near_dups_amplified,
    )
    from flink_1_3_2_hopsworks_spark.functions.vectors import dot, norm

    emb = load_table(spark, sf_dir, "embeddings")
    found = embedding_near_dups_amplified(
        emb, "vec_id", "embedding", threshold=0.3, num_sets=3
    )
    # Exact truth set: brute-force all pairs with per-vector precomputed
    # norms — the same cosine arithmetic (dot/(|a|·|b|), round 4) as the
    # operator's verify, so found ⊆ truth by construction. An EVALUATION
    # query: quadratic on purpose, run at gate scale like sim_recall_eval.
    vecs = emb.select(
        F.col("vec_id").alias("_vid"), F.col("embedding").alias("_v")
    ).withColumn("_nrm", norm(F.col("_v")))
    denom = F.col("n_a") * F.col("n_b")
    truth = (
        vecs.select(
            F.col("_vid").alias("id_a"),
            F.col("_v").alias("v_a"),
            F.col("_nrm").alias("n_a"),
        )
        .crossJoin(
            vecs.select(
                F.col("_vid").alias("id_b"),
                F.col("_v").alias("v_b"),
                F.col("_nrm").alias("n_b"),
            )
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                F.when(denom == 0.0, F.lit(0.0)).otherwise(
                    dot(F.col("v_a"), F.col("v_b")) / denom
                ),
                4,
            ),
        )
        .filter(F.col("cosine") >= 0.3)
    )
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
    return n_true.crossJoin(n_found).select(
        "n_true",
        "n_found",
        F.round(
            F.when(F.col("n_true") == 0, F.lit(1.0)).otherwise(
                F.col("n_found") / F.col("n_true")
            ),
            4,
        ).alias("recall"),
    )


def dd_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision evaluation of the MinHash estimator pair set (the
    r=8 production geometry, portable hashes) against EXACT character-
    5-shingle Jaccard truth at the same threshold — the text-side twin of
    dd_embedding_recall and sim_recall_eval: the metric a pipeline tracks
    when tuning bands/num_hashes (scripts/probe_minhash_params.py explores
    the same trade offline). Truth is exact-by-construction: distinct
    shingle sets, inverted-index pair intersections, and the integer
    cross-multiplied threshold compare (10·|A∩B| >= 8·|A∪B| — no float
    boundary). An EVALUATION query, quadratic-by-output on purpose,
    gate-scale by design like its two siblings. One row:
    (n_true, n_found, n_hit, recall, precision).
    Deterministic end-to-end, so the DuckDB oracle replays shingling, the
    64 affine permutations, banding, the cap, the estimator, the exact
    truth, and both divisions."""
    from flink_1_3_2_hopsworks_spark.dedup.minhash import (
        exact_shingle_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    found = minhash_near_dups(
        docs, "doc_id", "text", threshold=0.8, portable=True,
        recall_floor=None,
    ).select("id_a", "id_b")
    truth = exact_shingle_jaccard_pairs(
        docs, "doc_id", "text", shingle_k=5, threshold_num=8, threshold_den=10
    )
    hit = found.join(truth, ["id_a", "id_b"])
    counts = (
        truth.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(found.agg(F.count(F.lit(1)).alias("n_found")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
    )
    return counts.select(
        "n_true",
        "n_found",
        "n_hit",
        F.round(
            F.when(F.col("n_true") == 0, F.lit(1.0)).otherwise(
                F.col("n_hit") / F.col("n_true")
            ),
            4,
        ).alias("recall"),
        F.round(
            F.when(F.col("n_found") == 0, F.lit(1.0)).otherwise(
                F.col("n_hit") / F.col("n_found")
            ),
            4,
        ).alias("precision"),
    )


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics: token/char counts, punctuation ratio,
    average token length — all JVM-side expressions."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.char_count("text").alias("n_chars_computed"),
        F.round(T.punct_ratio("text"), 4).alias("punct_ratio"),
        F.round(T.avg_token_length("text"), 4).alias("avg_token_len"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over normalized text (reproducible in
    any engine — the cross-engine dedup key)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint("text").alias("fp"))


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score per document (deterministic heuristic)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.quality_score("text").alias("quality"))


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (CJK ratio + stopword votes). Full DuckDB
    hash-match — the oracle replays the whole voting cascade in SQL,
    stopword lists generated from the same STOPWORDS dict; accuracy against
    the corpus ``lang`` label is additionally pytest-covered."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", T.lang_id("text").alias("lang_guess"))


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (north-star training-pipeline op:
    keyword/feature extraction over a corpus). Fully relational — explode →
    tf → document frequency → smoothed idf → per-doc top-k — and the
    oracle replays the whole computation in SQL: every number derives from
    integers through identical double ops, so the hash matches exactly."""
    docs = load_table(spark, sf_dir, "documents")
    return T.tfidf_top_terms(docs, "doc_id", "text", k=3)


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (north-star training-pipeline op): emails, IPv4s, and
    phone patterns masked by a codegen'd regexp_replace chain; the oracle
    applies the same RE2-compatible patterns. Output is fingerprinted so
    the gate hashes redacted CONTENT, not multi-KB strings."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    red = T.redact_pii("text")
    return docs.select(
        "doc_id",
        F.md5(red).alias("redacted_fp"),
        (F.length(red) != F.length("text")).alias("was_redacted"),
    )


def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing (north-star training-pipeline op): per-lang
    shards, 2048-token bins, docs laid head-to-tail in doc_id order —
    bin_id = floor(tokens-before / budget). Pure integer window math,
    replayed exactly by the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return T.pack_sequences(docs, "doc_id", "text", 2048, shard_cols=["lang"])


def pipe_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus cleaning pipeline (the north-star composition):
    quality filter (score ≥ 0.8, ≥ 20 tokens) → exact dedup on the
    normalized-text fingerprint keeping the smallest doc_id — one
    declarative plan, filter pushed below the dedup shuffle. The oracle
    replays quality scoring, the filter, and the dedup group-by in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(
        (T.quality_score("text") >= 0.8) & (T.token_count("text") >= 20)
    )
    return dedup_documents(kept, "text", "doc_id")


def pipe_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate REMOVAL pipeline (the standard LLM-corpus fuzzy-dedup
    composition), on the LINEAR star-edge geometry — the 100 TB default
    since r7: per LSH bucket only the verified (bucket-min anchor, member)
    STAR edges — Θ(docs × bands) work regardless of bucket sizes, where
    the pair mode's candidate stream measured quadratic on a low-entropy
    corpus (198M band collisions at sf10, SCALE_SF10.json) — then
    connected components over the edge graph → keep the min-doc_id
    canonical per transitive cluster. One row per document:
    (doc_id, canonical_id, kept). Pair-level audit lives in
    :func:`pipe_near_dedup_pairs`.

    Full DuckDB hash-match: the portable star edges replay in SQL and the
    cluster resolution replays as a recursive-CTE transitive closure
    (min reachable id ≡ the label-propagation fixpoint)."""
    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_star_edges(
        docs, "doc_id", "text", threshold=0.8, portable=True, recall_floor=None
    )
    return resolve_duplicate_clusters(docs, edges, "doc_id").orderBy("doc_id")


def pipe_near_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PAIR-AUDIT fuzzy-dedup pipeline: full MinHash-LSH near-dup pair
    listing → connected components → min-doc_id canonical. Same verdict
    schema as pipe_near_dedup; use when pair-level evidence (which doc
    matched which) must be auditable — the pair listing is inherently
    super-linear on low-entropy corpora, which is why the cluster-goal
    default composes star edges instead. The oracle replays the portable
    pairs and the transitive closure exactly."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dups(
        docs, "doc_id", "text", threshold=0.8, portable=True, recall_floor=None
    )
    return resolve_duplicate_clusters(docs, pairs, "doc_id").orderBy("doc_id")


def text_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary building (north-star training-pipeline op): global
    term frequencies and document frequencies, top-200 terms by count
    (ties alphabetical) — the tokenizer-training input. One explode + one
    hash-aggregate; TakeOrderedAndProject for the top-k."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(200)
    )


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (north-star training-pipeline op): flag
    corpus docs sharing any 5-word-gram with the held-out benchmark slice
    (source = 'src0' stands in for an eval set). Benchmark gram set is
    broadcast; the corpus streams map-side — no corpus shuffle. The oracle
    replays gram generation, the semi-join, and the hit count in SQL."""
    from flink_1_3_2_hopsworks_spark.dedup.contamination import (
        benchmark_ngram_overlap,
    )

    docs = load_table(spark, sf_dir, "documents")
    return benchmark_ngram_overlap(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id",
        "text",
        n=5,
    )


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document:
    duplicate-token fraction + top-bigram coverage fraction."""
    docs = load_table(spark, sf_dir, "documents")
    return T.repetition_stats(docs, "doc_id", "text")


def text_unigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram-LM rarity score (ppm) per document — the model-free
    perplexity proxy for lexical-typicality ranking."""
    docs = load_table(spark, sf_dir, "documents")
    return T.unigram_rarity(docs, "doc_id", "text")


def pipe_lang_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixture resampling (north-star training-pipeline op):
    downsample the dominant language (en → 35%) to rebalance the corpus,
    via the portable salted-md5 per-stratum draw — a pure filter, no
    shuffle, exactly replayable by the oracle."""
    from flink_1_3_2_hopsworks_spark.operators.sampling import (
        mixture_sample_hashed,
    )

    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample_hashed(
        docs, {"en": 0.35}, "lang", ["doc_id"], salt="m42"
    ).select("doc_id", "lang", "source")


def mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing (multimodal §2.14 — payloads are
    binary + typed metadata): text encoded to utf-8 bytes, with byte
    length and content digest computed ON THE BINARY column. The decode
    paths (BMP/WAV) are pytest-gated in tests/test_multimodal_codecs.py;
    this gate driver-proves the binary column type survives the engine
    end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("digest"),
    )


def pipe_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card generator (north-star training-pipeline op): per-language
    corpus summary — doc count, token/char totals, exact-duplicate counts
    and ratio. All exact-integer aggregates plus one final division, so any
    engine replays it bit-for-bit. One fingerprint window (keyed by the
    high-cardinality fingerprint — never global) + one per-lang hash-agg."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(T.fingerprint("text"))
    marked = docs.select(
        "doc_id",
        "lang",
        T.token_count("text").alias("_tok"),
        F.length("text").alias("_chars"),
        (F.count(F.lit(1)).over(w) > 1).alias("_is_dup"),
    )
    return marked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").alias("total_tokens"),
        F.sum("_chars").alias("total_chars"),
        F.sum(F.when(F.col("_is_dup"), 1).otherwise(0)).alias("n_dup_docs"),
        F.round(
            F.sum(F.when(F.col("_is_dup"), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_ratio"),
    )


def pipe_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup (north-star training-pipeline op):
    treat source='src0' documents as the EXISTING corpus and the rest as
    the NEW crawl batch; drop new docs whose fingerprint the corpus
    already holds, dedup the batch within itself, and emit the surviving
    representatives with their within-batch duplicate counts. The corpus
    side is only scanned (broadcast semi probe — no corpus shuffle,
    plan-audited); full SQL oracle replays fingerprints, the NOT-IN store
    check, and the group-min."""
    from flink_1_3_2_hopsworks_spark.dedup.incremental import (
        incremental_ingest,
    )

    docs = load_table(spark, sf_dir, "documents")
    return incremental_ingest(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id",
        "text",
    )


def pipe_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-thresholded quality curation (north-star training-pipeline
    op): keep documents whose quality score clears the corpus median,
    where the median is estimated from a deterministic 20% salted-hash
    sample and rides the plan as a broadcast one-row aggregate — the
    "drop the worst half" step with an auditable, engine-replayable
    threshold. Full SQL oracle replays the sample, the interpolated
    percentile, and the verdict."""
    docs = load_table(spark, sf_dir, "documents")
    return T.quality_quantile_filter(
        docs, "doc_id", "text", keep_quantile=0.5, sample_fraction=0.2
    )


def text_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span coverage (Lee et al. exact-substring dedup,
    relational form): per-doc count of 8-token windows whose gram occurs
    more than once corpus-wide, plus the interval-union token coverage of
    those spans. Gram strings are hashed in the scan projection; duplicate
    population bounds all post-scan work. Full SQL oracle replays windows,
    global counts, and the ordered-running-max interval union."""
    from flink_1_3_2_hopsworks_spark.dedup.spans import duplicated_span_stats

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_span_stats(docs, "doc_id", "text", window=8)


def text_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first-occurrence duplicated-span removal: the lowest doc_id
    holding each duplicated 8-token gram keeps its text; every later doc
    drops the covered positions and is rebuilt from per-doc drop-position
    lists (the corpus token stream never explodes or shuffles). Full SQL
    oracle replays owners, drop positions, and the rebuilt text."""
    from flink_1_3_2_hopsworks_spark.dedup.spans import remove_duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicated_spans(docs, "doc_id", "text", window=8)


def dd_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) semantic dedup over the embeddings
    table: frozen-quantizer cell assignment (scan-fused, shuffle-free) →
    within-cell cosine >= 0.40 pairs → connected components → min-id
    survivor. Deterministic given the frozen centroids, so the DuckDB
    oracle replays assignment, pairs, and a recursive-CTE transitive
    closure for a full hash-match."""
    from flink_1_3_2_hopsworks_spark.dedup.semantic import semantic_dedup
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import (
        FROZEN_CENTROIDS,
    )

    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    return semantic_dedup(
        emb, "vec_id", "embedding", FROZEN_CENTROIDS, threshold=0.40
    ).orderBy("vec_id")


def pipe_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + sharding (north-star training-pipeline
    op): every doc gets a reproducible (shard, pos) training position from
    the portable salted-md5 draw — shard is a narrow map, order is one
    shard-keyed shuffle with independent per-shard sorts (no global sort).
    Full SQL oracle replays hash → shard → within-shard row_number."""
    from flink_1_3_2_hopsworks_spark.operators.sharding import (
        corpus_shuffle_shard,
    )

    docs = load_table(spark, sf_dir, "documents")
    return corpus_shuffle_shard(
        docs.select("doc_id", "lang"), ["doc_id"], n_shards=8, salt="ep0"
    )


def pipe_incremental_near_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup ingestion (north-star training-pipeline op):
    source='src7' documents are the NEW crawl batch (~5%), everything else
    the EXISTING corpus (~95%) — src7 is the slice whose near-dup pairs
    span both sides, so all three verdicts appear. Batch docs within MinHash-estimator 0.8 of
    any corpus doc sharing an LSH band bucket are dropped
    ('corpus_near_dup'); the rest fuzzy-dedup within the batch via the
    linear star reduction ('batch_near_dup' / 'kept'). The corpus is only
    scanned + probed by the BROADCAST batch bucket keys — never self-
    joined, never shuffled. Full SQL oracle replays caps, probe,
    star edges, and the transitive closure."""
    from flink_1_3_2_hopsworks_spark.dedup.incremental import (
        incremental_near_ingest,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return incremental_near_ingest(
        docs.filter(F.col("source") == "src7"),
        docs.filter(F.col("source") != "src7"),
        "doc_id",
        "text",
        portable=True,
    ).orderBy("doc_id")


def text_normalize_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (north-star training-pipeline op — the
    canonical composition applied before fingerprinting/dedup). The gate
    corpus is pure ASCII, so the query appends a DECOMPOSED suffix
    ('cafe'+U+0301, 'A'+U+030A) to every row to force real composition
    work through both engines; ``chars_composed`` (always 2) pins that
    the combining marks actually composed. DuckDB's nfc_normalize is the
    same UAX#15 NFC, so the oracle hash-matches; cross-engine equivalence
    on richer Unicode is pytest-covered."""
    docs = load_table(spark, sf_dir, "documents")
    decomposed = F.concat(F.col("text"), F.lit(" cafe\u0301 A\u030a"))
    nfc = T.normalize_unicode(decomposed)
    return docs.select(
        "doc_id",
        nfc.alias("text_nfc"),
        (F.length(decomposed) - F.length(nfc)).cast("long").alias("chars_composed"),
    )


def text_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-span removal (CCNet/RefinedWeb shared-line policy on
    token windows): 8-token grams occurring in >= 3 DISTINCT docs are
    template text and are dropped from EVERY doc, owner included (the
    keep-first policy is text_dup_span_removal). Full SQL oracle replays
    the distinct-doc threshold, drop positions, and the rebuilt text."""
    from flink_1_3_2_hopsworks_spark.dedup.spans import remove_boilerplate_spans

    docs = load_table(spark, sf_dir, "documents")
    return remove_boilerplate_spans(docs, "doc_id", "text", window=8, min_docs=3)


def pipe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget curation ("best 23k tokens"): keep the highest-quality
    docs whose total tokens fit the budget, threshold estimated from the
    deterministic 20% sample over ROUNDED-quality buckets (bounded window,
    no global doc sort) and broadcast into one filter pass. Full SQL
    oracle replays sample, bucket cumsum, threshold, and filter."""
    from flink_1_3_2_hopsworks_spark.functions.text import select_token_budget

    docs = load_table(spark, sf_dir, "documents")
    return select_token_budget(docs, "doc_id", "text", 23_000).orderBy("doc_id")


def pipe_token_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-share mixture resampling (Pile/ROOTS-style rebalance): keep-
    rates DERIVED from target token shares (en 40 / de 20 / es 20 / fr 20,
    zh dropped) — the binding stratum keeps rate 1, others scale to hit
    the ratios; rates are a broadcast per-stratum table from one corpus
    aggregate, each row survives the portable salted draw iff u < rate.
    Full SQL oracle replays token totals, the rate derivation, and the
    draw."""
    from flink_1_3_2_hopsworks_spark.operators.sampling import (
        token_mixture_resample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return token_mixture_resample(
        docs.select("doc_id", "lang", T.token_count("text").alias("_tc")),
        "doc_id",
        "lang",
        "_tc",
        {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.2},
    ).orderBy("doc_id")


def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking (pre-tokenization splitter): 32-token chunks with
    8-token overlap (stride 24), final partial chunk kept, one row per
    chunk. Pure Catalyst explode+slice; the oracle replays the start grid
    and list slicing exactly."""
    from flink_1_3_2_hopsworks_spark.functions.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", 32, overlap=8).orderBy(
        "doc_id", "chunk_id"
    )


def _linified_docs(docs: DataFrame, punctuate: bool = False) -> DataFrame:
    """The gate corpus has no newlines, so line-granularity gates build a
    DETERMINISTIC multi-line twin: 12-token lines; with ``punctuate`` every
    line starting on the 24-token grid gains a terminal '.' (forcing a real
    kept/dropped mix through the C4 rules). Same force-real-work precedent
    as text_normalize_unicode's decomposed suffix; the oracle replays the
    linification exactly."""
    punct = (
        "case when s % 24 = 0 then '.' else '' end" if punctuate else "''"
    )
    lin = F.expr(
        "array_join(transform(sequence(0, greatest(size(_tk) - 1, 0), 12), "
        f"s -> concat(array_join(slice(_tk, s + 1, 12), ' '), {punct})), "
        "'\n')"
    )
    return docs.select(
        "doc_id",
        F.filter(
            F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
            lambda t: t != F.lit(""),
        ).alias("_tk"),
    ).select("doc_id", lin.alias("text"))


def pipe_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality filtering (Rae et al. 2021): the published
    heuristics — word-count bounds, mean-word-length bounds, symbol ratio,
    alphabetic-word fraction, required-stopword count — each as an
    audit-friendly boolean column plus the conjunction verdict. One row
    per doc; scan-shaped pure expressions. The gate uses the engine's
    en-stopword list (the corpus vocabulary contains no Gopher stopwords
    beyond 'the'); the published GOPHER_STOPWORDS set is the library
    default, pytest-pinned. Full SQL oracle replays every rule."""
    docs = load_table(spark, sf_dir, "documents")
    return T.gopher_quality_rules(
        docs, "doc_id", "text", stop_words=T.STOPWORDS["en"]
    )


def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 8-gram novelty: the fraction of a doc's distinct token
    8-grams whose corpus-wide first owner (min doc_id) is the doc itself —
    the crawl-increment contribution score (duplicates score ~0). Gram
    hashes ride the scan projection; the only corpus-sized shuffle key is
    the 64-bit hash. The oracle replays grams as strings (hash equality ≡
    string equality at gate scale)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.ngram_novelty(docs, "doc_id", "text", n=8)


def pipe_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020): terminal-punctuation +
    min-words + no-'javascript' line rules, whole-doc drop on
    'lorem ipsum'/braces — over the deterministic multi-line twin of the
    gate corpus (see _linified_docs; alternate lines are punctuated so
    both verdicts occur). clean_text is fingerprinted so the gate hashes
    content, not multi-KB strings. Full SQL oracle replays linification
    and every rule."""
    docs = load_table(spark, sf_dir, "documents")
    out = T.clean_lines_c4(_linified_docs(docs, punctuate=True), "doc_id", "text")
    return out.select(
        "doc_id",
        "doc_kept",
        "n_lines",
        "n_lines_kept",
        F.md5(F.coalesce("clean_text", F.lit("<dropped>"))).alias("clean_fp"),
    )


def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document line deduplication (CCNet/RefinedWeb shared-line
    policy at line granularity): normalized lines occurring in >= 2
    distinct docs drop from every doc — over the deterministic multi-line
    twin (duplicate docs share all their lines, so the planted exact-dup
    structure surfaces as shared lines). Line hashes are the only
    corpus-sized shuffle key; rebuild is per-doc drop-index lists. Full
    SQL oracle replays linification, the distinct-doc threshold, and the
    rebuilt text."""
    docs = load_table(spark, sf_dir, "documents")
    out = T.remove_duplicate_lines(_linified_docs(docs), "doc_id", "text")
    return out.select(
        "doc_id",
        "n_lines",
        "n_removed",
        F.md5("clean_text").alias("clean_fp"),
    )


def pipe_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture resampling (the multilingual-LM
    rebalance, q_s ∝ p_s^(1/T)): T=2 over the language strata by token
    share — keep-rates derived from one corpus aggregate (the smallest
    stratum binds at rate 1), broadcast, portable salted draw. Full SQL
    oracle replays token totals, the (p_min/p_s)^(1-1/T) rate derivation,
    and the draw."""
    from flink_1_3_2_hopsworks_spark.operators.sampling import (
        temperature_resample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return temperature_resample(
        docs.select("doc_id", "lang", T.token_count("text").alias("_tc")),
        "doc_id",
        "lang",
        "_tc",
        temperature=2.0,
    ).orderBy("doc_id")


def dd_prefix_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-truncation dedup (asymmetric prefix containment): pairs where
    the short doc's normalized token stream is exactly a prefix of the
    long doc's — the duplicates exact fingerprints and symmetric Jaccard
    both miss. The corpus has no organic truncations, so the gate unions a
    deterministic 24-token truncated twin of every 10th doc (id + 10^6) —
    forcing real containment work, same precedent as the NFC/linified
    gates. Blocking key = hash of the first 16 tokens (scan projection);
    verify = one md5 of the long side's n_short-token slice per candidate.
    Full SQL oracle replays the twin, blocking, cap, and verify."""
    from flink_1_3_2_hopsworks_spark.dedup.prefix import (
        prefix_containment_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    trunc = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.slice(
                F.filter(
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                    lambda t: t != F.lit(""),
                ),
                1,
                24,
            ),
            " ",
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(trunc)
    return prefix_containment_pairs(corpus, "doc_id", "text").orderBy(
        "id_short", "id_long"
    )


def pipe_model_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the CCNet/LLaMA-pipeline fastText
    step, serving shape): hashed bag-of-words featurization + a FROZEN
    linear weight vector evaluated as column expressions — explode →
    bucket hash + weight lookup in the projection → one per-doc
    hash-aggregate → sigmoid verdict. Audit form (one row per doc). Full
    SQL oracle replays the md5 buckets, the literal weights, and the
    rounded sigmoid."""
    from flink_1_3_2_hopsworks_spark.functions.quality_model import (
        model_quality_filter,
    )

    docs = load_table(spark, sf_dir, "documents")
    return model_quality_filter(docs, "doc_id", "text", keep_all=True)


def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per doc against the corpus's own top-16
    term vocabulary (tokenizer-fit signal): vocabulary built by one
    explode + hash-aggregate + TakeOrdered, broadcast back for the
    membership probe, one per-doc aggregate. vocab_size=16 — the gate
    corpus has only 31 distinct tokens, so a 200-term vocabulary would
    cover everything and the rate would be degenerately 0; 16 covers the
    head and leaves a real OOV tail. Full SQL oracle replays the
    vocabulary (same tie-break) and the rates."""
    docs = load_table(spark, sf_dir, "documents")
    return T.oov_rate(docs, "doc_id", "text", vocab_size=16)


def pipe_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (the audit before an incremental retrain):
    OLD = every source except src7 (so src7 reads as 'added'), with src6
    texts carrying a marker suffix (so src6 reads as 'changed'); NEW =
    every source except src0 (so src0 reads as 'removed'), original
    texts. Per id: added/removed/changed/unchanged by normalized-text
    fingerprint, one full-outer join of (id, fp) projections. Full SQL
    oracle replays both snapshot constructions and the verdicts."""
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("source") != "src7").select(
        "doc_id",
        F.when(
            F.col("source") == "src6", F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    new = docs.filter(F.col("source") != "src0").select("doc_id", "text")
    from flink_1_3_2_hopsworks_spark.functions.text import corpus_diff

    return corpus_diff(old, new, "doc_id", "text").orderBy("doc_id")


def pipe_snapshot_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot MERGE (functions/text.py snapshot_upsert) — the
    apply-the-delta step after pipe_corpus_diff's audit: store = docs with
    id%10 != 9, delta = revised texts (id%10 == 7 → ' rev2' suffix),
    identical re-crawls (id%10 == 6), brand-new ids (id%10 == 9), and
    tombstones (id%10 == 5) — all slices scale with the corpus, so the
    decade row measures the real shape. Output: the new snapshot as
    (doc_id, fp, action) with action ∈ kept/unchanged/updated/inserted
    (deletes vanish). Store-side contract: scanned twice (anti + semi
    against the broadcast delta id set), never shuffled; total shuffle
    O(|delta|). Full SQL oracle replays both probes, the fingerprint
    compare, and the union."""
    from flink_1_3_2_hopsworks_spark.functions.text import (
        fingerprint,
        snapshot_upsert,
    )

    docs = load_table(spark, sf_dir, "documents")
    cls = F.col("doc_id") % 10
    store = docs.filter(cls != 9).select("doc_id", "text")
    delta = (
        docs.filter(cls == 7)
        .select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" rev2")).alias("text"),
            F.lit(False).alias("_del"),
        )
        .unionByName(
            docs.filter(cls == 6).select(
                "doc_id", "text", F.lit(False).alias("_del")
            )
        )
        .unionByName(
            docs.filter(cls == 9).select(
                "doc_id", "text", F.lit(False).alias("_del")
            )
        )
        .unionByName(
            docs.filter(cls == 5).select(
                "doc_id",
                F.lit(None).cast("string").alias("text"),
                F.lit(True).alias("_del"),
            )
        )
    )
    snap = snapshot_upsert(store, delta, "doc_id", "text", delete_col="_del")
    return snap.select(
        "doc_id", fingerprint("text").alias("fp"), "action"
    ).orderBy("doc_id")


def pipe_lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality bucketing (Wenzek et al. 2020): an
    add-k bigram LM trained on the lang='en' reference slice scores
    every document's cross-entropy (bits/token, rounded-decimal exact
    sums), then exact discrete terciles split the corpus into
    head/middle/tail buckets; kept = not tail. The model is a table
    (broadcast joins), thresholds come from a histogram of the rounded
    scores (no global sort). Full SQL oracle replays training, scoring,
    and the tercile thresholds. Reference-analogue: the scalar-function
    + group-agg surface of flink-table's expression pipeline
    (flink-libraries/flink-table scalar call + aggregate translation)."""
    from flink_1_3_2_hopsworks_spark.functions.lm import (
        bigram_lm_perplexity,
        perplexity_buckets,
    )

    docs = load_table(spark, sf_dir, "documents")
    per = bigram_lm_perplexity(
        docs.filter(F.col("lang") == "en"), docs, "doc_id", "text"
    )
    return perplexity_buckets(per, "doc_id")


def pipe_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): hashed-unigram bucket
    importance ratios ln(p_target/p_raw) with the lang='en' slice as the
    target, per-doc log-ratio, then a 100-doc weighted resample WITHOUT
    replacement via the portable Efraimidis–Spirakis sampler (weight =
    exp(DOC-LEVEL log-ratio sum — the paper's estimator; the per-token
    mean is reported for interpretability), salted-md5 draws). Composition:
    functions/lm.py model + operators/sampling.py sampler. Full SQL
    oracle replays bucket hashing, the 256-row model, the decimal-exact
    doc scores, and the A-Res draw."""
    from flink_1_3_2_hopsworks_spark.functions.lm import dsir_importance_weights
    from flink_1_3_2_hopsworks_spark.operators.sampling import (
        weighted_sample_fixed_size,
    )

    docs = load_table(spark, sf_dir, "documents")
    w = dsir_importance_weights(
        docs, docs.filter(F.col("lang") == "en"), "doc_id", "text"
    )
    sampled = weighted_sample_fixed_size(
        w.withColumn(
            "_ew", F.exp(F.col("logratio_per_token") * F.col("n_tokens"))
        ),
        100,
        "_ew",
        ["doc_id"],
        salt="dsir",
    )
    return sampled.select("doc_id", "n_tokens", "logratio_per_token")


def dd_semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination
    (dedup/contamination.py embedding_decontaminate): vec_id < 10 plays
    the benchmark probe set, the rest of the embeddings table is the
    corpus; a corpus vector is contaminated when its cosine to any probe
    reaches 0.30 (corpus-calibrated for this synthetic table — real
    paraphrase leakage sits near 1.0; the mechanism is threshold-
    agnostic). Broadcast probes, one corpus scan, per-vector rank-1
    window. Full SQL oracle via LIST_COSINE_SIMILARITY."""
    from flink_1_3_2_hopsworks_spark.dedup.contamination import (
        embedding_decontaminate,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    return embedding_decontaminate(
        corpus, probes, "vec_id", "embedding", threshold=0.30
    )


def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve the trained BPE model (ml/bpe.py bpe_segment_counts): per
    document, whitespace-token count and BPE symbol count after the 6
    trained merges — the tokenizer-budget / compression-ratio signal.
    The word→segmentation map is rebuilt as column algebra from the
    frozen merges (vocabulary-sized, broadcast); the corpus streams once.
    The oracle replays training AND serving (train→freeze→serve audited
    end-to-end, the classifier/k-means discipline applied to the
    tokenizer)."""
    from flink_1_3_2_hopsworks_spark.ml.bpe import bpe_fit, bpe_segment_counts

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_fit(docs, "text", num_merges=6)
    return bpe_segment_counts(docs, "doc_id", "text", merges)


def pipe_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced downsample (operators/sampling.py
    cluster_balanced_sample): embeddings assigned to the frozen 16-cell
    quantizer, at most 10 survivors per cell by the portable salted-md5
    draw — the diversity-preserving selection step (D4-style) that a
    uniform draw lacks. Composes the IVF cell expression with the
    repo's sampling discipline; full SQL oracle replays assignment,
    draw, and per-cell rank."""
    from flink_1_3_2_hopsworks_spark.operators.sampling import (
        cluster_balanced_sample,
    )
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import (
        FROZEN_CENTROIDS,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return cluster_balanced_sample(
        emb, "vec_id", "embedding", FROZEN_CENTROIDS, per_cell=10
    )


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus term distribution (functions/lm.py
    zipf_fit): least squares of log(freq) on log(rank) over the top-100
    terms — the dataset-card statistic that flags templated/synthetic
    corpora (natural text slopes ≈ −1; this synthetic corpus fits
    slope ≈ −0.18 at r² ≈ 0.06, i.e. a near-uniform vocabulary, which
    is precisely the signal). One token hash-aggregate + TakeOrdered;
    the regression runs over the k-row model. Decimal-exact moment sums;
    full SQL oracle replays ranks, logs, and the normal equations."""
    from flink_1_3_2_hopsworks_spark.functions.lm import zipf_fit

    docs = load_table(spark, sf_dir, "documents")
    return zipf_fit(docs, "text", top_k=100)


def pipe_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation pipeline (curation.py curation_funnel) — the
    composition the operator library exists for, as ONE plan: benchmark
    exclusion (source='src0' plays the eval set) → C4 doc rules → Gopher
    rules → CCNet perplexity terciles (en-slice bigram LM) → exact dedup →
    MinHash-star near-dedup over the survivors → 4-gram + embedding
    decontamination against the benchmark → T=2 temperature mixture →
    shuffle-shard. Output is the auditable funnel: per-stage survivor
    count, token count, and an order-independent salted-h32 survivor-set
    checksum (the shard row's checksum binds the (doc, shard) assignment).
    The oracle composes the stage oracles over survivor CTEs — every
    stage's exact survivor SET is hash-verified, not just its size.
    ``ngram_n=4`` (library default 5) so the decontamination stage
    measurably drops docs on this synthetic corpus (2 hits at n=5, 49 at
    n=4). Plan contract: ONE corpus parquet scan in the funnel plan (the
    survivor-gated near-dedup re-read; everything else reads the pinned
    slim frame) — audited in tests/test_plans_audit.py."""
    from flink_1_3_2_hopsworks_spark.curation import curation_funnel

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return curation_funnel(docs, emb, ngram_n=4)


def mm_image_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal image near-dup CLUSTERS — the dedup machinery connected
    to the binary-column plumbing: each doc id derives a deterministic
    32×32 BMP (multimodal/synth.py: 16 patterns × 3 variants — base,
    brightness-shifted copy, locally-edited copy), genuinely encoded to
    BMP bytes, decoded by the pure-numpy codec, and aHash-fingerprinted in
    one Arrow kernel; then the EXISTING simhash star machinery (a 64-bit
    perceptual hash is a simhash-shaped fingerprint) blocks on 16-bit
    chunks, Hamming-verifies (<= 3) against bucket-min anchors, and
    connected components resolve per-image verdicts. Brightness copies
    collide at Hamming 0 (exact star); local edits land at 1–10 bits, so
    some variants cluster and some correctly don't. Output:
    (doc_id, fingerprint, canonical_id, kept). The oracle joins ids to the
    FROZEN (pattern, variant) → aHash table (regenerable pure-numpy model,
    gate_model.py discipline) and replays blocking + Hamming + the
    transitive closure in SQL — a hash match proves the whole
    encode→decode→hash→cluster round-trip."""
    from flink_1_3_2_hopsworks_spark.dedup.simhash import simhash_star_edges
    from flink_1_3_2_hopsworks_spark.multimodal.binary_ops import (
        image_ahash_fingerprints,
    )
    from flink_1_3_2_hopsworks_spark.multimodal.synth import image_twin

    docs = load_table(spark, sf_dir, "documents")
    # Persist: the star machinery references the fingerprint frame ~5x
    # (chunk explode, anchors, canonical star, final join) — without the
    # pin each reference re-runs the full codec round-trip per doc.
    fps = image_ahash_fingerprints(image_twin(docs, "doc_id"), "doc_id").persist()
    edges = simhash_star_edges(
        fps, "doc_id", "simhash", max_distance=3, fingerprints=fps
    )
    verdicts = resolve_duplicate_clusters(
        docs.select("doc_id"), edges, "doc_id"
    )
    return (
        fps.join(verdicts, "doc_id")
        .select(
            "doc_id",
            F.col("simhash").alias("fingerprint"),
            "canonical_id",
            "kept",
        )
        .orderBy("doc_id")
    )


def mm_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END image curation funnel (multimodal/curation.py) — the
    binary-column twin of pipe_curation_e2e over the deterministic BMP
    corpus (multimodal/synth.py image_twin of the doc ids): decode-validate
    → brightness/contrast quality rules (the C4/Gopher analogue for
    images) → exact perceptual dedup (aHash collisions — brightness-
    shifted re-encodes land at Hamming 0) → star near-dup clustering
    (Hamming <= 3) → shuffle-shard, as ONE plan over the pinned slim
    signal frame from a single decode pass (payloads never shuffle, never
    decode twice). Output: the auditable funnel — per-stage survivor
    count, byte total, and salted-h32 survivor-set checksum (the shard
    row binds (id, shard)). The oracle joins ids to the FROZEN
    (pattern, variant) → (brightness, contrast, aHash, bytes) model —
    same shared stats definition + codec round-trip as the live kernel —
    and replays rules, min-id collapse, the survivor-restricted star
    closure, and the shard in SQL."""
    from flink_1_3_2_hopsworks_spark.multimodal.curation import (
        image_curation_funnel,
    )
    from flink_1_3_2_hopsworks_spark.multimodal.synth import image_twin

    docs = load_table(spark, sf_dir, "documents")
    return image_curation_funnel(image_twin(docs, "doc_id"), "doc_id")


def mm_audio_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal AUDIO near-dup clusters — the WAV twin of
    mm_image_near_dups: each doc id derives a deterministic 1-second
    PCM-16 clip (multimodal/synth.py: 16 amplitude-envelope patterns × 3
    variants — base, half-gain remaster, two-frame local edit), genuinely
    encoded to WAV bytes, decoded by the stdlib codec, and
    energy-fingerprinted in one Arrow kernel (codecs.energyhash64 —
    gain-invariant, Haitsma–Kalker-style); then the SAME simhash star
    machinery blocks, Hamming-verifies (<= 4: the edits measure 2–7 bits,
    so some variants cluster and some correctly don't), and connected
    components resolve per-clip verdicts. Output:
    (doc_id, fingerprint, canonical_id, kept). Oracle: frozen
    (pattern, variant) → fingerprint model (computed THROUGH the PCM-16
    quantization round-trip) + the shared blocking/Hamming/closure
    replay."""
    from flink_1_3_2_hopsworks_spark.dedup.simhash import simhash_star_edges
    from flink_1_3_2_hopsworks_spark.multimodal.binary_ops import (
        audio_energy_fingerprints,
    )
    from flink_1_3_2_hopsworks_spark.multimodal.synth import audio_twin

    docs = load_table(spark, sf_dir, "documents")
    # Persist: the star machinery references the fingerprint frame ~5x
    # (chunk explode, anchors, canonical star, final join) — without the
    # pin each reference re-runs the full codec round-trip per doc.
    fps = audio_energy_fingerprints(audio_twin(docs, "doc_id"), "doc_id").persist()
    edges = simhash_star_edges(
        fps, "doc_id", "simhash", max_distance=4, fingerprints=fps
    )
    verdicts = resolve_duplicate_clusters(
        docs.select("doc_id"), edges, "doc_id"
    )
    return (
        fps.join(verdicts, "doc_id")
        .select(
            "doc_id",
            F.col("simhash").alias("fingerprint"),
            "canonical_id",
            "kept",
        )
        .orderBy("doc_id")
    )


def mm_video_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal VIDEO near-dup clusters — frame-level composition over
    the image machinery: each doc id derives a deterministic 8-frame BMV1
    container (multimodal/synth.py synth_video: 16 base videos × 3
    variants — base, re-encode whose per-frame aHashes are identical,
    partial copy sharing 7 of 8 frames), genuinely encoded and demuxed
    (codecs.encode_bmv/decode_bmv), every frame BMP-decoded and aHashed in
    one executor-side fan-out kernel; then EXACT frame-set Jaccard ≥ 0.6
    via the inverted-index self-join on the frame hash
    (dedup/ngram.py item_set_jaccard_pairs — selective 64-bit keys keep
    buckets at true-duplicate size) and connected components resolve
    per-video verdicts. Output: (doc_id, frameset_fp, canonical_id, kept)
    — frameset_fp binds each video's exact distinct-frame-hash set. The
    oracle joins ids to the FROZEN (video, variant) → frame-hash set
    model and replays sets → inverted join → Jaccard → closure."""
    from flink_1_3_2_hopsworks_spark.dedup.ngram import item_set_jaccard_pairs
    from flink_1_3_2_hopsworks_spark.multimodal.binary_ops import (
        video_frame_hashes,
    )
    from flink_1_3_2_hopsworks_spark.multimodal.synth import video_twin

    docs = load_table(spark, sf_dir, "documents")
    # Persist: the set-similarity join references the frame table four
    # ways (sizes, two join sides, the fingerprint aggregate) — without
    # the pin each re-runs the demux+decode+hash kernel.
    frames = video_frame_hashes(video_twin(docs, "doc_id"), "doc_id").persist()
    pairs = item_set_jaccard_pairs(
        frames, "doc_id", "simhash", threshold=0.6
    )
    verdicts = resolve_duplicate_clusters(
        docs.select("doc_id"), pairs, "doc_id"
    )
    framesets = frames.groupBy("doc_id").agg(
        F.md5(
            F.concat_ws(",", F.sort_array(F.collect_set("simhash")))
        ).alias("frameset_fp")
    )
    return (
        framesets.join(verdicts, "doc_id")
        .select("doc_id", "frameset_fp", "canonical_id", "kept")
        .orderBy("doc_id")
    )


def mm_curation_funnel_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-replay twin of the streaming MULTIMODAL ingest funnel
    (streaming/media_funnel.py — decode-validate → quality rules → exact
    perceptual dedup → incremental simhash near-dedup, per-epoch funnel
    rows, each perceptual stage's survivors appended to that stage's
    fingerprint store). The documents ids derive the deterministic BMP
    corpus (multimodal/synth.py) split into three epochs (doc_id % 3);
    the gate RUNS the real foreachBatch body sequentially
    (media_funnel_replay — the backfill path), so the oracle checks the
    store-probe / keeper / chunk-block star algebra every epoch executes
    against state built by the epochs before it. The oracle joins ids to
    the FROZEN (pattern, variant) → (stats, aHash, bytes) model,
    collapses cross-epoch exact dedup to the (epoch, id)-argmin per
    aHash, and unrolls the near stage per epoch (store-side chunk cap →
    Hamming probe → survivor star → closure). Stream-equals-replay and
    crash-replay idempotency are pytest-pinned
    (tests/test_streaming_media_funnel.py). Output: 15 rows (3 epochs ×
    5 stages), materialized so the epoch stores can be cleaned up."""
    import shutil
    import tempfile

    from flink_1_3_2_hopsworks_spark.multimodal.synth import image_twin
    from flink_1_3_2_hopsworks_spark.streaming.media_funnel import (
        media_funnel_replay,
    )

    docs = load_table(spark, sf_dir, "documents")
    batches = [
        image_twin(
            docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == e).select(
                "doc_id"
            ),
            "doc_id",
        )
        for e in range(3)
    ]
    base = tempfile.mkdtemp(prefix="mmfunnel_gate_")
    try:
        rows = media_funnel_replay(batches, base).collect()  # 15 rows
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "batch_id long, stage_idx int, stage string, n_images long, "
        "n_bytes long, id_checksum long",
    ).orderBy("batch_id", "stage_idx")


def mm_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal similarity SEARCH — "top-10 images like this one" through
    the EXISTING IVF-PQ serve path (the bridge from the perceptual-hash
    dedup family into the embedding ANN stack): each doc id derives its
    deterministic BMP (multimodal/synth.py), the payload decodes and
    embeds in one Arrow kernel (codecs.image_descriptor — centered
    block-mean luminance, the continuous relaxation of aHash, so
    brightness re-encodes land at cosine 1.0 and local edits nearby),
    docs 0–4's images act as probes, and similarity/pq.py ivfpq_topk
    serves them under the FROZEN descriptor-space models
    (multimodal/embed.py — deterministic Lloyd's on the frozen
    48-descriptor table, regenerated at import). The oracle joins ids to
    the frozen descriptor table and replays cell assignment → nprobe
    probing → per-subspace argmin encode → the explicit left-to-right ADC
    chain → rank. Planted-neighbor recall is pytest-covered
    (tests/test_multimodal_embed.py)."""
    from flink_1_3_2_hopsworks_spark.multimodal.embed import image_topk
    from flink_1_3_2_hopsworks_spark.multimodal.synth import image_twin

    docs = load_table(spark, sf_dir, "documents")
    corpus = image_twin(docs, "doc_id")
    probes = image_twin(
        docs.filter(F.col("doc_id") < 5).select(
            F.col("doc_id").alias("query_id")
        ),
        "query_id",
    )
    return image_topk(corpus, probes, "doc_id", k=10, nprobe=2).orderBy(
        "query_id", "rank"
    )


def mm_audio_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio similarity SEARCH — "top-10 clips like this one",
    the audio twin of mm_embed_topk: each doc id derives its
    deterministic PCM-16 WAV, the payload decodes and embeds in one
    Arrow kernel (codecs.audio_descriptor — L2-normalized 16-segment RMS
    energy envelope, the continuous relaxation of energyhash64, so
    half-gain remasters land within PCM-quantization noise of cosine
    1.0), and ivfpq_topk serves docs 0–4's clips as probes under the
    audio-space frozen models. The oracle joins ids to the frozen audio
    descriptor table (computed THROUGH the PCM-16 quantization
    round-trip) and replays the full serve chain."""
    from flink_1_3_2_hopsworks_spark.multimodal.embed import audio_topk
    from flink_1_3_2_hopsworks_spark.multimodal.synth import audio_twin

    docs = load_table(spark, sf_dir, "documents")
    corpus = audio_twin(docs, "doc_id")
    probes = audio_twin(
        docs.filter(F.col("doc_id") < 5).select(
            F.col("doc_id").alias("query_id")
        ),
        "query_id",
    )
    return audio_topk(corpus, probes, "doc_id", k=10, nprobe=2).orderBy(
        "query_id", "rank"
    )


def mm_video_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal video similarity SEARCH — "top-10 videos like this one",
    completing the modality set (image/audio/video all reach the
    embedding ANN stack): each doc id derives its deterministic BMV
    container, frames demux + decode + pool into one mean-pooled
    descriptor per video (codecs.video_descriptor — inherits the frame
    descriptor's brightness invariance, so re-encoded videos pool to the
    IDENTICAL vector; 7-of-8-frame partial copies land at cosine
    0.76–0.95), and ivfpq_topk serves docs 0–4's videos as probes under
    the video-space frozen models. Oracle joins the frozen video
    descriptor table and replays the serve chain."""
    from flink_1_3_2_hopsworks_spark.multimodal.embed import video_topk
    from flink_1_3_2_hopsworks_spark.multimodal.synth import video_twin

    docs = load_table(spark, sf_dir, "documents")
    corpus = video_twin(docs, "doc_id")
    probes = video_twin(
        docs.filter(F.col("doc_id") < 5).select(
            F.col("doc_id").alias("query_id")
        ),
        "query_id",
    )
    return video_topk(corpus, probes, "doc_id", k=10, nprobe=2).orderBy(
        "query_id", "rank"
    )


def mm_pair_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal PAIRED curation funnel (multimodal/pair_curation.py) —
    joint survivorship over (caption, image) pairs: the pair drops if the
    caption fails the C4 rules / is an exact or MinHash-star near dup, OR
    the image fails brightness/contrast quality / is an exact or
    simhash-star perceptual dup — each dedup stage restricted to the
    previous stage's PAIR survivors, so drops propagate across
    modalities. Captions are the documents table's text; images are the
    deterministic BMP twin of the doc ids (multimodal/synth.py — the
    mm_curation_funnel corpus). Output: the auditable 8-stage funnel with
    PAIR-CONSISTENT checksums (each salted-h32 binds pair id + caption
    fingerprint + image aHash; the shard row also binds the shard).
    Oracle: composes the text-funnel CTEs (ntok/fp/C4 + the survivor-
    gated portable MinHash star closure) with the image-funnel CTEs (the
    frozen (pattern, variant) stats model + the survivor-restricted
    simhash star closure), stage by stage.
    Reference-analogue: the two-input keyed coGroup
    (F-J/operators/CoGroupOperator.java) joining two cleaned streams."""
    from flink_1_3_2_hopsworks_spark.multimodal.pair_curation import (
        pair_curation_funnel,
    )
    from flink_1_3_2_hopsworks_spark.multimodal.synth import image_twin

    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select("doc_id", "text").join(
        image_twin(docs, "doc_id"), "doc_id"
    )
    return pair_curation_funnel(pairs, "doc_id")


def mm_text_to_image_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal retrieval — TEXT query → IMAGE results
    (multimodal/cross_modal.py caption_to_image_topk): BM25 retrieves
    captions for five literal text queries (the sim_bm25_topk probe set),
    each hit's PAIRED image becomes a visual probe (the one-decode-pass
    descriptors, continuous aHash relaxation), visual expansion scores
    every corpus image by its best cosine against any probe, and
    reciprocal-rank fusion merges the caption-match and looks-like lists
    (1/(60+rank), 6-dp DECIMAL exact sums) — the deterministic
    caption-mediated bridge a stack without a joint text/image model
    runs. n_lists = 2 marks images found by BOTH channels. Oracle:
    composes the BM25 SQL chain (k=3), the frozen (pattern, variant) →
    descriptor table with LIST_COSINE_SIMILARITY best-probe ranking, and
    the hybrid gate's RRF fusion algebra."""
    from flink_1_3_2_hopsworks_spark.multimodal.cross_modal import (
        caption_to_image_topk,
    )
    from flink_1_3_2_hopsworks_spark.multimodal.synth import image_twin

    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select("doc_id", "text").join(
        image_twin(docs, "doc_id"), "doc_id"
    )
    queries = spark.createDataFrame(
        [
            (1, "table scan join"),
            (2, "window agg batch"),
            (3, "customer order part"),
            (4, "hash merge value"),
            (5, "fast slow filter"),
        ],
        "query_id int, query_text string",
    )
    return caption_to_image_topk(pairs, queries).orderBy("query_id", "rank")


def mm_text_to_image_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal retrieval at SERVE scale — mm_text_to_image_topk with
    the visual expansion on the IVF-ADC path
    (multimodal/cross_modal.py caption_to_image_topk serve='ivfpq'): the
    BM25 caption hits' images probe the corpus through the audited
    ivfpq_topk contract under the frozen image-descriptor-space models
    (corpus pruned to nprobe=2 of 4 coarse cells per probe, PQ
    lookup-table cosine, per-probe top-10), a candidate scores its best
    ADC cosine over the query's probes, and the same RRF fusion merges
    the lists — the documented 100 TB swap for the brute expansion (the
    corpus descriptor scan becomes nprobe partition reads of a persisted
    cell-partitioned code index; the full-width corpus is never
    re-scanned). Recall vs the brute arm is pytest-measured
    (tests/test_multimodal_embed.py). Oracle: the brute oracle's BM25 +
    fusion chain with the visual block swapped for the IVF-ADC replay
    (cell assignment, nprobe probing, per-subspace argmin encode, the
    explicit ADC chain, per-probe rank)."""
    from flink_1_3_2_hopsworks_spark.multimodal.cross_modal import (
        caption_to_image_topk,
    )
    from flink_1_3_2_hopsworks_spark.multimodal.synth import image_twin

    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select("doc_id", "text").join(
        image_twin(docs, "doc_id"), "doc_id"
    )
    queries = spark.createDataFrame(
        [
            (1, "table scan join"),
            (2, "window agg batch"),
            (3, "customer order part"),
            (4, "hash merge value"),
            (5, "fast slow filter"),
        ],
        "query_id int, query_text string",
    )
    return caption_to_image_topk(pairs, queries, serve="ivfpq").orderBy(
        "query_id", "rank"
    )
