"""Dedup + text-analysis accuracy tests: the approximate paths (MinHash,
SimHash) are validated against the exact Jaccard baseline; lang-ID against
the corpus labels."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_1_3_2_hopsworks_spark.catalog import load_table
from flink_1_3_2_hopsworks_spark.dedup.exact import dedup_exact_keep_min
from flink_1_3_2_hopsworks_spark.dedup.minhash import jaccard, minhash_near_dups
from flink_1_3_2_hopsworks_spark.dedup.ngram import ngram_jaccard_pairs
from flink_1_3_2_hopsworks_spark.dedup.simhash import simhash_near_dups
from flink_1_3_2_hopsworks_spark.functions import text as T
from flink_1_3_2_hopsworks_spark.multimodal.binary_ops import (
    documents_as_media,
    extract_features,
)
from flink_1_3_2_hopsworks_spark.similarity.knn import brute_force_topk, lsh_topk

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog today"),  # near-dup of 1
    (3, "completely different content about spark engines"),
    (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_keep_min(spark, docs):
    out = dedup_exact_keep_min(docs, T.fingerprint("text"), "doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 2, 3]  # 4 collapses into 1


def test_minhash_finds_planted_near_dup(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dups(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert (1, 4) in pairs  # exact dup always caught
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup caught
    assert all(3 not in p for p in pairs)


def test_simhash_distance_zero_for_exact_dup(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(docs, "doc_id", "text", max_distance=16).collect()
    }
    assert pairs.get((1, 4)) == 0
    assert all(3 not in k for k in pairs)


def test_simhash_caller_owned_caching(spark, docs):
    """persist=False and a caller-supplied pre-computed fingerprint table give
    the same pairs as the default path (library never leaks a cache the
    caller can't release)."""
    from flink_1_3_2_hopsworks_spark.dedup.simhash import simhash_fingerprints

    expected = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(docs, "doc_id", "text", max_distance=16).collect()
    }
    no_persist = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(
            docs, "doc_id", "text", max_distance=16, persist=False
        ).collect()
    }
    assert no_persist == expected

    fps = simhash_fingerprints(docs, "doc_id", "text").persist()
    try:
        supplied = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_near_dups(
                docs, "doc_id", "text", max_distance=16, fingerprints=fps
            ).collect()
        }
    finally:
        fps.unpersist()
    assert supplied == expected


def test_ngram_jaccard_exact_values(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5, n=1).collect()
    }
    assert pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs  # 8 shared tokens / 9 union ≈ 0.889
    assert abs(pairs[(1, 2)] - round(8 / 9, 4)) < 1e-9


def test_lang_id_accuracy(spark):
    # The corpus's `lang` column is a random label over English word soup, so
    # accuracy is asserted on true-language samples instead.
    samples = [
        ("en", "the cat and the dog are in the house and it is fine"),
        ("es", "el perro y el gato en la casa de los vecinos y un dia"),
        ("de", "der hund und die katze von dem haus mit der tür ist da"),
        ("fr", "le chien et le chat est dans la maison des voisins une fois"),
        ("zh", "这是一个中文句子用来测试语言识别功能"),
        ("und", ""),
    ]
    df = spark.createDataFrame(samples, "lang string, text string")
    out = df.select("lang", T.lang_id("text").alias("guess")).collect()
    assert all(r["lang"] == r["guess"] for r in out)


def test_quality_score_bounds(spark, docs):
    vals = [r["q"] for r in docs.select(T.quality_score("text").alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_knn_bruteforce_self_similarity_excluded(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(emb, queries, "vec_id", "embedding", k=5)
    rows = out.collect()
    assert len(rows) == 15
    assert all(r["vec_id"] != r["query_id"] for r in rows)
    assert all(-1.0001 <= r["cosine"] <= 1.0001 for r in rows)
    # ranks are 1..5 per query
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_lsh_topk_subset_of_bruteforce_candidates(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, "vec_id", "embedding", k=10)
    approx = lsh_topk(emb, queries, "vec_id", "embedding", k=10)
    # Approximate results are valid pairs with correct cosines: join back and
    # compare values.
    joined = approx.alias("a").join(
        exact.alias("e"),
        (F.col("a.query_id") == F.col("e.query_id"))
        & (F.col("a.vec_id") == F.col("e.vec_id")),
    )
    for r in joined.select(F.col("a.cosine").alias("ca"), F.col("e.cosine").alias("ce")).collect():
        assert abs(r["ca"] - r["ce"]) < 1e-6


def test_multimodal_feature_plumbing(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    media = documents_as_media(docs)
    feats = extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["features"]) == 16 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # Determinism: same payload → same features.
    again = {r["media_id"]: r["features"] for r in extract_features(media, fake=True).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]


def test_decode_stub_raises(spark):
    from flink_1_3_2_hopsworks_spark.multimodal.binary_ops import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"xx")


def test_jaccard_expression(spark):
    df = spark.createDataFrame([(["a", "b"], ["b", "c"])], "x array<string>, y array<string>")
    assert df.select(jaccard(F.col("x"), F.col("y")).alias("j")).collect()[0]["j"] == pytest.approx(1 / 3)


def test_multimodal_resize_plumbing(spark):
    from flink_1_3_2_hopsworks_spark.multimodal.binary_ops import resize_images

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(10)
    media = documents_as_media(docs)
    resized = resize_images(media, 32, 32, fake=True).collect()
    assert len(resized) == 10
    assert all(r["width"] == 32 and r["height"] == 32 for r in resized)
    # output size scales with target area (realistic batch-memory shape)
    assert all(len(r["payload"]) == (32 * 32) // 8 for r in resized)
    # deterministic on payload
    again = {r["media_id"]: r["payload"] for r in
             resize_images(media, 32, 32, fake=True).collect()}
    assert all(again[r["media_id"]] == r["payload"] for r in resized)


def test_multimodal_frame_sample_fanout_and_chain(spark):
    import pyspark.sql.functions as FF
    from flink_1_3_2_hopsworks_spark.multimodal.binary_ops import (
        FEATURE_DIM,
        extract_features,
        sample_frames,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(5)
    videos = documents_as_media(docs).withColumn(
        "media_type", FF.lit("video")
    ).withColumn("duration_ms", FF.lit(3500).cast("long"))
    frames = sample_frames(videos, every_ms=1000, max_frames=32, fake=True)
    rows = frames.collect()
    # 3500ms at 1000ms stride → 3 frames per video
    assert len(rows) == 15
    assert {r["frame_idx"] for r in rows} == {0, 1, 2}
    assert all(r["frame_ms"] == r["frame_idx"] * 1000 for r in rows)

    # frames chain into the image pipeline: frame → media record → features
    as_media = frames.select(
        (FF.col("media_id") * 100 + FF.col("frame_idx")).alias("media_id"),
        FF.lit("image").alias("media_type"),
        FF.col("frame").alias("payload"),
    )
    feats = extract_features(as_media, fake=True).collect()
    assert len(feats) == 15
    assert all(len(r["features"]) == FEATURE_DIM for r in feats)


def test_multimodal_frame_cap_bounds_fanout(spark):
    from flink_1_3_2_hopsworks_spark.multimodal.binary_ops import sample_frames

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(2)
    import pyspark.sql.functions as FF

    pathological = documents_as_media(docs).withColumn(
        "media_type", FF.lit("video")
    ).withColumn("duration_ms", FF.lit(36_000_000).cast("long"))  # 10 hours
    n = sample_frames(pathological, every_ms=1000, max_frames=32, fake=True).count()
    assert n == 2 * 32  # capped, not 2 × 36000


def test_simhash_cap_preserves_exact_duplicates(spark):
    """Round-2 advice: when a degenerate identical-fingerprint group (here,
    empty docs → fingerprint 0) overflows every chunk bucket, its hamming-0
    pairs must still surface via the canonical star — not vanish."""
    empties = [(i, "") for i in range(10)]
    df = spark.createDataFrame(empties, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(
            df, "doc_id", "text", max_distance=3, max_bucket=5
        ).collect()
    }
    # star: doc 0 (min id) pairs with each of the other 9, all hamming 0
    assert pairs == {(0, i): 0 for i in range(1, 10)}


def test_simhash_cap_bounds_bucket_join(spark):
    """The max_bucket cap drops oversized chunk buckets BEFORE the
    self-join (bounding the worst task at max_bucket² pairs), while a
    small bucket's genuine near-dup pair (hamming > 0) still surfaces and
    an over-cap identical group degrades to its linear star."""
    base = " ".join(f"w{i}" for i in range(64))
    near = " ".join(f"w{i}" for i in range(63)) + " zz"  # 1 of 64 tokens differs
    hot = "the same exact document body repeated verbatim many times over"
    df = spark.createDataFrame(
        [(1, base), (2, near), *[(100 + i, hot) for i in range(20)]],
        "doc_id long, text string",
    )
    out = simhash_near_dups(df, "doc_id", "text", max_distance=16, max_bucket=8)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    # near-dup found through an uncapped chunk bucket, with real distance
    assert (1, 2) in pairs and 0 < pairs[(1, 2)] <= 16
    # the 20-doc identical group overflows every chunk bucket (cap 8): the
    # blocked join contributes nothing, so exactly the 19 star pairs
    # remain instead of C(20,2)=190 all-pairs
    hot_pairs = {k: v for k, v in pairs.items() if k[0] >= 100}
    assert hot_pairs == {(100, 100 + i): 0 for i in range(1, 20)}


def test_tfidf_top_terms_hand_checked(spark):
    """tf·idf on a 3-doc corpus against hand-computed smoothed-idf scores;
    ties break alphabetically, rank is dense per doc."""
    import math

    from flink_1_3_2_hopsworks_spark.functions.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["term"]): (r["tf"], r["tfidf"], r["rank"])
        for r in tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    }

    def idf(dfreq):
        return math.log(4.0 / (dfreq + 1.0)) + 1.0

    # doc 1: apple tf=2 df=1 beats banana tf=1 df=2
    assert out[(1, "apple")] == (2, round(2 * idf(1), 4), 1)
    assert out[(1, "banana")][2] == 2
    # doc 3: cherry tf=3 dominates; durian df=1 second
    assert out[(3, "cherry")][2] == 1
    assert out[(3, "durian")] == (1, round(idf(1), 4), 2)
    # k=2 → no rank-3 rows
    assert all(rank <= 2 for (_, _, rank) in out.values())


def test_stratified_sample_fixed_size_per_stratum(spark):
    """Each stratum yields exactly min(n, stratum size) rows, the draw is
    deterministic for a salt, and a different salt redraws."""
    from flink_1_3_2_hopsworks_spark.operators.sampling import (
        stratified_sample_hashed,
    )

    df = spark.createDataFrame(
        [(i, "big" if i < 80 else "small") for i in range(100)],
        "id long, grp string",
    )
    out = stratified_sample_hashed(df, 10, ["grp"], ["id"])
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"big": 10, "small": 10}
    again = stratified_sample_hashed(df, 10, ["grp"], ["id"])
    assert sorted(r["id"] for r in out.collect()) == sorted(
        r["id"] for r in again.collect()
    )
    redraw = stratified_sample_hashed(df, 10, ["grp"], ["id"], salt="other")
    assert sorted(r["id"] for r in redraw.collect()) != sorted(
        r["id"] for r in out.collect()
    )


def test_redact_pii_masks_and_preserves(spark):
    from flink_1_3_2_hopsworks_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk or call 555-867-5309"),
            (2, "server at 192.168.1.254 responded"),
            (3, "no pii here, just 3.14 and v1.2.3 strings"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["red"] for r in df.select(
        "id", redact_pii("text").alias("red")).collect()}
    assert out[1] == "mail me at <EMAIL> or call <PHONE>"
    assert out[2] == "server at <IP> responded"
    # version strings and decimals must survive untouched
    assert out[3] == "no pii here, just 3.14 and v1.2.3 strings"


def test_pack_sequences_bins_are_budgeted(spark):
    from flink_1_3_2_hopsworks_spark.functions.text import pack_sequences

    # 6 docs x 5 tokens, budget 10 → bins of 2 docs each, per shard
    rows = [(i, "a b c d e", "s1" if i < 6 else "s2") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = pack_sequences(df, "doc_id", "text", 10, shard_cols=["lang"])
    got = {(r["lang"], r["doc_id"]): r["bin_id"] for r in out.collect()}
    assert got == {
        ("s1", 0): 0, ("s1", 1): 0, ("s1", 2): 1,
        ("s1", 3): 1, ("s1", 4): 2, ("s1", 5): 2,
        ("s2", 6): 0, ("s2", 7): 0, ("s2", 8): 1,
    }


def test_resolve_duplicate_clusters_transitive(spark):
    """A~B and B~C (never A~C) must land in ONE cluster with the min id as
    the single survivor; unpaired docs survive as their own canonical."""
    from flink_1_3_2_hopsworks_spark.dedup.neardup import resolve_duplicate_clusters

    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 6)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: (r["canonical_id"], r["kept"])
        for r in resolve_duplicate_clusters(docs, pairs, "doc_id").collect()
    }
    assert got == {
        1: (1, True), 3: (1, False), 5: (1, False),  # transitive chain
        2: (2, True), 6: (2, False),
        4: (4, True),  # never paired
    }


def test_pack_sequences_warns_on_global_window(spark):
    """Without shard_cols the running sum is a single global window (one
    task at scale) — the sharp edge warns at call time; sharded calls stay
    silent."""
    import warnings

    from flink_1_3_2_hopsworks_spark.functions.text import pack_sequences

    df = spark.createDataFrame(
        [(0, "a b", "s1"), (1, "c d", "s1")], "doc_id long, text string, lang string"
    )
    with pytest.warns(RuntimeWarning, match="GLOBAL unpartitioned window"):
        out = pack_sequences(df, "doc_id", "text", 4)
    assert {r["bin_id"] for r in out.collect()} == {0}

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning would fail the test
        pack_sequences(df, "doc_id", "text", 4, shard_cols=["lang"])


def test_minhash_candidate_budget_guard(spark):
    """candidate_budget estimates under-cap pairs from the bucket-size
    aggregate BEFORE enumerating them: over budget raises (default) or
    warns-and-proceeds; under budget is silent; the estimate counts only
    under-cap buckets (the capped blowup never enumerates anyway)."""
    rows = [
        (i, "the exact same duplicated payload text appears here verbatim")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # 30 identical docs co-bucket in EVERY band: 8 bands x C(30,2) = 3480
    # under-cap candidates, far over a budget of 100.
    with pytest.raises(ValueError, match="candidate_budget"):
        minhash_near_dups(docs, "doc_id", "text", candidate_budget=100)

    with pytest.warns(RuntimeWarning, match="candidate_budget"):
        out = minhash_near_dups(
            docs, "doc_id", "text", candidate_budget=100, on_over_budget="warn"
        )
    assert out.count() == 30 * 29 // 2  # proceeds; all pairs found

    # comfortably under budget: no raise, no warning
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        minhash_near_dups(
            docs, "doc_id", "text", candidate_budget=10_000, recall_floor=None
        )

    # capped buckets are excluded from the estimate: with max_bucket=10 the
    # single 30-doc bucket per band is dropped, so 0 candidates survive and
    # even a budget of 0 passes.
    minhash_near_dups(
        docs, "doc_id", "text", max_bucket=10, candidate_budget=0
    )

    with pytest.raises(ValueError, match="on_over_budget"):
        minhash_near_dups(
            docs, "doc_id", "text", candidate_budget=1, on_over_budget="bogus"
        )


def test_star_edges_subset_and_same_clusters(spark):
    """Star edges are a verified subset of the pair graph (identical
    precision), and on the gate corpus the cluster verdicts match the full
    pair pipeline exactly."""
    from flink_1_3_2_hopsworks_spark.dedup.minhash import minhash_star_edges
    from flink_1_3_2_hopsworks_spark.dedup.neardup import (
        resolve_duplicate_clusters,
    )

    corpus = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = minhash_near_dups(corpus, "doc_id", "text", threshold=0.8)
    star = minhash_star_edges(corpus, "doc_id", "text", threshold=0.8)
    pair_set = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    star_set = {(r["id_a"], r["id_b"]) for r in star.collect()}
    assert star_set <= pair_set

    verdict = lambda edges: {  # noqa: E731
        r["doc_id"]: (r["canonical_id"], r["kept"])
        for r in resolve_duplicate_clusters(corpus, edges, "doc_id").collect()
    }
    assert verdict(star) == verdict(pairs)


def test_star_edges_connect_exact_duplicate_clusters(spark):
    """Exact duplicates share ALL band buckets (identical signatures), so a
    star anchor always reaches every member of its own duplicate cluster —
    an exact-dup cluster can never be split by the star reduction, even
    with unrelated smaller-id docs colliding into some buckets."""
    from flink_1_3_2_hopsworks_spark.dedup.minhash import minhash_star_edges
    from flink_1_3_2_hopsworks_spark.dedup.neardup import (
        resolve_duplicate_clusters,
    )

    rows = [(i, f"unique filler document number {i} with its own words") for i in range(20)]
    dup_text = "the exact same duplicated payload text appears here verbatim"
    rows += [(100 + j, dup_text) for j in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    edges = minhash_star_edges(docs, "doc_id", "text", threshold=0.8)
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in resolve_duplicate_clusters(docs, edges, "doc_id").collect()
    }
    assert {got[100 + j] for j in range(5)} == {100}


def test_incremental_near_ingest_verdicts(spark):
    """Batch docs near-dup to the corpus drop as corpus_near_dup; batch-
    internal near-dups cluster with one survivor; corpus docs emit no
    verdict rows."""
    from flink_1_3_2_hopsworks_spark.dedup.incremental import (
        incremental_near_ingest,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(100, base), (101, "completely unrelated corpus text about engines")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, base),                      # exact dup of corpus 100
            (2, "fresh unseen content one two three four five six"),
            (3, "fresh unseen content one two three four five six"),  # dup of 2
            (4, "a lone novel document unlike anything else at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["kept"], r["reason"])
        for r in incremental_near_ingest(
            batch, corpus, "doc_id", "text"
        ).collect()
    }
    assert got == {
        1: (False, "corpus_near_dup"),
        2: (True, "kept"),
        3: (False, "batch_near_dup"),
        4: (True, "kept"),
    }


def test_normalize_unicode_matches_duckdb_nfc(spark):
    """normalize_unicode (pandas_udf over unicodedata NFC) must agree with
    DuckDB's nfc_normalize byte-for-byte — the equivalence every oracle
    over the column depends on — including combining marks, already-
    composed text, ligatures (NFC preserves them), and NULLs."""
    import duckdb

    from flink_1_3_2_hopsworks_spark.functions.text import normalize_unicode

    cases = [
        "cafe\u0301",            # combining acute -> composes to \u00e9
        "caf\u00e9",             # already composed -> unchanged
        "\ufb01le",              # fi ligature -> NFC keeps it
        "A\u030a ring",          # combining ring -> \u00c5
        "\uff46\uff55\uff4c\uff4cwidth",  # fullwidth -> NFC keeps it
        "a\u0308\u0301bc",      # double combining stack
        "",                      # empty
        None,                    # NULL-safe
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, s string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_unicode("s").alias("n")).collect()
    }
    con = duckdb.connect()
    for i, c in enumerate(cases):
        want = (
            None
            if c is None
            else con.sql("SELECT nfc_normalize(?)", params=[c]).fetchone()[0]
        )
        assert got[i] == want, (i, c, got[i], want)


def test_incremental_near_ingest_from_signature_store(spark, tmp_path):
    """The persisted signature store round-trips: ingest verdicts computed
    against the store parquet equal verdicts computed against the raw
    corpus text — and the store path never touches the text column."""
    from flink_1_3_2_hopsworks_spark.dedup.incremental import (
        incremental_near_ingest,
        minhash_signature_store,
    )

    corpus = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("source") != "src1"
    )
    batch = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("source") == "src1"
    )
    path = str(tmp_path / "sig_store")
    minhash_signature_store(corpus, "doc_id", "text").write.parquet(path)
    store = spark.read.parquet(path)
    assert "text" not in store.columns

    direct = {
        r["doc_id"]: (r["kept"], r["reason"])
        for r in incremental_near_ingest(
            batch, corpus, "doc_id", "text"
        ).collect()
    }
    stored = {
        r["doc_id"]: (r["kept"], r["reason"])
        for r in incremental_near_ingest(
            batch, store, "doc_id", "text"
        ).collect()
    }
    assert direct == stored and len(direct) > 0


def test_incremental_near_ingest_rejects_mismatched_store(spark, tmp_path):
    """A store stamped with a different hash family (shingle_k/num_hashes/
    portable) must raise, not silently read as 'no duplicates'. The stamp
    lives in a column NAME, so the check is schema-only."""
    from flink_1_3_2_hopsworks_spark.dedup.incremental import (
        incremental_near_ingest,
        minhash_signature_store,
    )

    corpus = spark.createDataFrame(
        [(1, "some corpus text right here for the store")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(2, "a new batch document arriving later")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "sig_store_k7")
    minhash_signature_store(corpus, "doc_id", "text", shingle_k=7).write.parquet(
        path
    )
    store = spark.read.parquet(path)
    assert any(c.startswith("_mh_params_") for c in store.columns)

    # same shingle_k: accepted
    incremental_near_ingest(batch, store, "doc_id", "text", shingle_k=7)
    # default shingle_k=5 disagrees with the k7 stamp: refused
    with pytest.raises(ValueError, match="different hash family"):
        incremental_near_ingest(batch, store, "doc_id", "text")
    # portable mismatch likewise
    with pytest.raises(ValueError, match="different hash family"):
        incremental_near_ingest(
            batch, store, "doc_id", "text", shingle_k=7, portable=True
        )


def test_minhash_key_store_rejects_mismatched_signatures(spark):
    """minhash_key_store stamps the keys store from its ARGUMENTS — so a
    stamped signature frame that disagrees with them must raise, or the
    keys stamp would misrepresent the hash family its rows came from and
    the keyed probe (which can only verify the keys stamp) would silently
    read the mismatched dimension as 'no duplicates'."""
    from flink_1_3_2_hopsworks_spark.dedup.incremental import (
        minhash_key_store,
        minhash_signature_store,
    )

    docs = spark.createDataFrame(
        [(1, "some corpus text right here for the store")],
        "doc_id long, text string",
    )
    sig = minhash_signature_store(docs, "doc_id", "text", shingle_k=7)
    # matching parameters: accepted (and the keys stamp carries them)
    keys = minhash_key_store(sig, "doc_id", shingle_k=7)
    assert any(c.startswith("_mh_keys_") for c in keys.columns)
    # default shingle_k=5 disagrees with the frame's k7 stamp: refused
    with pytest.raises(ValueError, match="different hash family"):
        minhash_key_store(sig, "doc_id")
    with pytest.raises(ValueError, match="different hash family"):
        minhash_key_store(sig, "doc_id", shingle_k=7, portable=True)


def test_simhash_star_edges_subset_of_pairs(spark):
    """Star edges are a verified subset of the pair graph with identical
    per-edge hamming (a pure function of the two fingerprints)."""
    from flink_1_3_2_hopsworks_spark.dedup.simhash import simhash_star_edges

    corpus = load_table(spark, "/root/testdata/sf0.001", "documents")
    # persist=False: the default internal persist is caller-owned with no
    # unpersist hook (see simhash_near_dups docstring); leaking it here
    # would leave a cache entry on the shared documents plan fragment that
    # the plan-audit suite (test_plans_audit) would then see as an
    # InMemoryRelation echoing extra HashAggregates.
    pairs = simhash_near_dups(
        corpus, "doc_id", "text", max_distance=8, persist=False
    )
    stars = simhash_star_edges(
        corpus, "doc_id", "text", max_distance=8, persist=False
    )
    pair_rows = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    star_rows = {(r["id_a"], r["id_b"]): r["hamming"] for r in stars.collect()}
    assert set(star_rows) <= set(pair_rows)
    assert star_rows  # non-trivial on the gate corpus
    for k, h in star_rows.items():
        assert pair_rows[k] == h


def test_simhash_star_edges_connect_exact_duplicates_past_cap(spark):
    """>max_bucket identical docs: every chunk bucket is capped away, yet
    the Hamming-0 canonical star still connects the group — N-1 edges to
    the min id, never N^2."""
    from flink_1_3_2_hopsworks_spark.dedup.simhash import simhash_star_edges

    rows = [(i, "same duplicated payload text") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = simhash_star_edges(docs, "doc_id", "text", max_bucket=10).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {
        (0, i) for i in range(1, 30)
    }
    assert all(r["hamming"] == 0 for r in out)


def test_simhash_candidate_budget_guard(spark):
    """Same guard contract as minhash: the under-cap candidate estimate
    comes from the bucket-size aggregate before enumeration; over budget
    raises (default) or warns-and-proceeds; capped buckets are excluded."""
    rows = [
        (i, "the exact same duplicated payload text appears here verbatim")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # identical fingerprints co-bucket in all 4 chunks: 4 x C(30,2) = 1740
    with pytest.raises(ValueError, match="candidate_budget"):
        simhash_near_dups(docs, "doc_id", "text", candidate_budget=100)

    with pytest.warns(RuntimeWarning, match="candidate_budget"):
        out = simhash_near_dups(
            docs, "doc_id", "text", candidate_budget=100, on_over_budget="warn"
        )
    assert out.count() == 30 * 29 // 2

    # capped buckets are excluded from the estimate: max_bucket=10 drops
    # all four 30-doc buckets, so even budget 0 passes.
    simhash_near_dups(docs, "doc_id", "text", max_bucket=10, candidate_budget=0)

    with pytest.raises(ValueError, match="on_over_budget"):
        simhash_near_dups(
            docs, "doc_id", "text", candidate_budget=1, on_over_budget="bogus"
        )


def test_minhash_recall_floor_warning(spark):
    """The default r=8 geometry catches a j=0.8 pair with p~0.77: below
    the 0.9 recall floor the call WARNS so the trade is conscious; a high
    threshold (p~0.9998) or recall_floor=None is silent."""
    import warnings as _w

    docs = spark.createDataFrame([(1, "some text here")], "doc_id long, text string")
    with pytest.warns(RuntimeWarning, match="recall_floor"):
        minhash_near_dups(docs, "doc_id", "text", threshold=0.8)
    from flink_1_3_2_hopsworks_spark.dedup.minhash import minhash_star_edges

    with pytest.warns(RuntimeWarning, match="recall_floor"):
        minhash_star_edges(docs, "doc_id", "text", threshold=0.8)
    with _w.catch_warnings():
        _w.simplefilter("error")
        minhash_near_dups(docs, "doc_id", "text", threshold=0.95)
        minhash_near_dups(docs, "doc_id", "text", threshold=0.8, recall_floor=None)


def test_exact_shingle_jaccard_pairs_threshold_boundary(spark):
    """The integer cross-multiplied threshold is exact at the boundary:
    identical docs (J=1) pass, disjoint docs never pair, and a constructed
    J=0.5 pair flips in/out exactly at num/den = 1/2."""
    from flink_1_3_2_hopsworks_spark.dedup.minhash import (
        exact_shingle_jaccard_pairs,
    )

    # k=1 shingles on single-char-per-token strings make set algebra
    # transparent: doc1={a,b}, doc2={b,c} -> J = 1/3; doc3=doc1 -> J=1.
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "bc"), (3, "ab")], "doc_id long, text string"
    )
    at = lambda num, den: {
        (r["id_a"], r["id_b"])
        for r in exact_shingle_jaccard_pairs(
            docs, "doc_id", "text", shingle_k=1,
            threshold_num=num, threshold_den=den,
        ).collect()
    }
    assert at(1, 1) == {(1, 3)}                      # only the exact dup
    assert at(1, 3) == {(1, 2), (1, 3), (2, 3)}      # J=1/3 passes at 1/3
    assert at(34, 100) == {(1, 3)}                   # and fails just above


def test_minhash_recall_gate_consistency(spark):
    """Gate invariants at sf0.001: one row, n_hit <= min(n_true, n_found),
    both ratios in [0, 1], and recall = n_hit/n_true when n_true > 0."""
    from flink_1_3_2_hopsworks_spark.dedup.showcase import dd_minhash_recall

    r = dd_minhash_recall(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_hit"] <= min(r["n_true"], r["n_found"])
    assert 0.0 <= r["recall"] <= 1.0 and 0.0 <= r["precision"] <= 1.0
    if r["n_true"]:
        assert r["recall"] == round(r["n_hit"] / r["n_true"], 4)


def test_incremental_simhash_ingest_hamming0_past_cap(spark):
    """r11 advice: the ingest's corpus probe must keep the Hamming-0
    guarantee under the bucket cap — a batch fingerprint exactly equal to
    a STORED fingerprint drops as corpus_near_dup even when every shared
    chunk bucket is oversized (degenerate fingerprint-0 store), via the
    uncapped equality arm; and the hot bucket must stop growing (the
    masked re-append the advice named)."""
    from flink_1_3_2_hopsworks_spark.dedup.simhash import (
        incremental_simhash_ingest,
    )

    # store: 20 copies of fingerprint 0 — all 4 chunk buckets size 20 > cap
    store = spark.createDataFrame(
        [(1000 + i, 0) for i in range(20)], "doc_id long, simhash long"
    )
    batch = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1 << 40)], "doc_id long, simhash long"
    )
    got = {
        r["doc_id"]: (r["kept"], r["reason"])
        for r in incremental_simhash_ingest(
            batch, store, "doc_id", max_distance=3, max_bucket=5
        ).collect()
    }
    assert got == {
        1: (False, "corpus_near_dup"),
        2: (False, "corpus_near_dup"),
        3: (True, "kept"),
    }
