"""Round-5 corpus-pipeline ops: benchmark decontamination, repetition
metrics, unigram-LM rarity, and mixture resampling."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_1_3_2_hopsworks_spark.dedup.contamination import (
    benchmark_ngram_overlap,
    word_ngrams,
)
from flink_1_3_2_hopsworks_spark.functions.text import (
    repetition_stats,
    unigram_rarity,
)
from flink_1_3_2_hopsworks_spark.operators.sampling import mixture_sample_hashed


def test_word_ngrams_basic_and_short(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "only")], ["id", "text"]
    )
    rows = {
        r["id"]: r["g"]
        for r in df.select("id", word_ngrams("text", 3).alias("g")).collect()
    }
    assert rows[1] == ["a b c", "b c d"]
    assert rows[2] == []  # shorter than n
    assert rows[3] == []


def test_benchmark_ngram_overlap_flags_copied_span(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            # contains the 5-gram "beta gamma delta epsilon zeta"
            (1, "intro words beta gamma delta epsilon zeta trailing"),
            (2, "totally unrelated text with no overlap at all here"),
            (3, "alpha beta gamma delta epsilon"),  # exact 5-gram hit
            (4, "tiny"),  # < 5 tokens: zero grams, still in output
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in benchmark_ngram_overlap(
            corpus, bench, "doc_id", "text", n=5
        ).collect()
    }
    assert out[1] == (1, True)
    assert out[2] == (0, False)
    assert out[3] == (1, True)
    assert out[4] == (0, False)
    assert len(out) == 4


def test_repetition_stats_hand_checked(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),  # 4 tokens, 1 distinct, bigram 'spam spam' x3/3
            (2, "all words here differ"),  # no repetition
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert out[1]["n_tokens"] == 4
    assert out[1]["dup_token_ratio"] == 0.75
    assert out[1]["top_bigram_ratio"] == 1.0
    assert out[2]["dup_token_ratio"] == 0.0
    # 3 distinct bigrams each once -> top covers 1/3
    assert abs(out[2]["top_bigram_ratio"] - 1 / 3) < 1e-5


def test_unigram_rarity_ranks_rare_vocab_lower(spark):
    df = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common common rareword otherrare"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in unigram_rarity(df, "doc_id", "text").collect()}
    # total=8 tokens; 'common' count=6, rares count=1 each.
    # doc1 avg p = 6/8; doc2 avg p = (6+6+1+1)/4/8 = 14/32
    assert out[1]["token_ppm"] == 750000.0
    assert out[2]["token_ppm"] == 437500.0
    assert out[1]["token_ppm"] > out[2]["token_ppm"]


def test_ngram_strategies_identical(spark):
    """The adaptive physical strategy (bitmap broadcast sweep vs
    prefix-filtered inverted index) never changes results."""
    from flink_1_3_2_hopsworks_spark.dedup.ngram import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g x"),  # high overlap with 1
            (3, "p q r s t u v w"),
            (4, "a b c d e f g h"),  # exact dup of 1
            (5, "m n o p"),
        ],
        ["doc_id", "text"],
    )
    for t in (0.5, 0.8):
        bitmap = set(
            map(tuple, ngram_jaccard_pairs(df, "doc_id", "text", t, 2).collect())
        )
        prefix = set(
            map(
                tuple,
                ngram_jaccard_pairs(
                    df, "doc_id", "text", t, 2, universe_cap=0
                ).collect(),
            )
        )
        assert bitmap == prefix
        assert (1, 4, 1.0) in bitmap


def test_sim_recall_eval_bounds_and_consistency(spark):
    """recall@10 lies in [0, 1], covers every query, and equals the direct
    overlap of the two gated top-k results."""
    from flink_1_3_2_hopsworks_spark.similarity.showcase import (
        sim_bruteforce_topk,
        sim_lsh_topk,
        sim_recall_eval,
    )

    sf = "/root/testdata/sf0.001"
    out = {r["query_id"]: r for r in sim_recall_eval(spark, sf).collect()}
    bf = sim_bruteforce_topk(spark, sf).collect()
    lsh = {(r["query_id"], r["vec_id"]) for r in sim_lsh_topk(spark, sf).collect()}
    assert set(out) == {r["query_id"] for r in bf}
    for qid, row in out.items():
        direct = sum(
            1 for r in bf if r["query_id"] == qid and (qid, r["vec_id"]) in lsh
        )
        assert row["n_hits"] == direct
        assert 0.0 <= row["recall"] <= 1.0
        assert row["recall"] == round(direct / 10.0, 4)


def test_mixture_sample_rates_zero_and_one(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(200)],
        ["doc_id", "lang"],
    )
    none_en = mixture_sample_hashed(df, {"en": 0.0}, "lang", ["doc_id"])
    assert none_en.filter(F.col("lang") == "en").count() == 0
    assert none_en.filter(F.col("lang") == "de").count() == 100
    all_kept = mixture_sample_hashed(df, {"en": 1.0}, "lang", ["doc_id"])
    assert all_kept.count() == 200


def test_mixture_sample_is_deterministic_and_rate_shaped(spark):
    df = spark.createDataFrame(
        [(i, "en") for i in range(1000)], ["doc_id", "lang"]
    )
    a = sorted(
        r["doc_id"]
        for r in mixture_sample_hashed(
            df, {"en": 0.35}, "lang", ["doc_id"]
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in mixture_sample_hashed(
            df, {"en": 0.35}, "lang", ["doc_id"]
        ).collect()
    )
    assert a == b  # portable draw: same salt -> same rows
    assert 250 <= len(a) <= 450  # ~0.35 of 1000
    redraw = sorted(
        r["doc_id"]
        for r in mixture_sample_hashed(
            df, {"en": 0.35}, "lang", ["doc_id"], salt="other"
        ).collect()
    )
    assert redraw != a  # different salt draws a different row set


def test_kmv_exact_below_k(spark):
    from flink_1_3_2_hopsworks_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame([(i % 50,) for i in range(500)], ["v"])
    row = kmv_distinct(df, ["v"], k=256).first()
    assert row["n_sketch"] == 50
    assert row["est_distinct"] == 50.0  # under k -> exact


def test_kmv_estimates_within_theory_bound(spark):
    from flink_1_3_2_hopsworks_spark.operators.sketches import kmv_distinct

    true_n = 20_000
    df = spark.range(true_n).selectExpr("id as v")
    row = kmv_distinct(df, ["v"], k=256).first()
    # KMV relative error ~ 1/sqrt(k) = 6.25%; allow 4 sigma.
    assert abs(row["est_distinct"] - true_n) / true_n < 0.25
    assert row["n_sketch"] == 256


def test_sampled_percentiles_deterministic_and_close(spark):
    from flink_1_3_2_hopsworks_spark.operators.sketches import (
        sampled_percentiles,
    )

    df = spark.range(20_000).selectExpr("id", "cast(id as double) as x")
    a = sampled_percentiles(df, "x", ["id"], 0.2, percentiles=(0.5,)).first()
    b = sampled_percentiles(df, "x", ["id"], 0.2, percentiles=(0.5,)).first()
    assert a["p50"] == b["p50"]  # portable draw: identical sample
    assert abs(a["p50"] - 10_000) / 10_000 < 0.05


def _python_jaccard_pairs(docs, threshold, n=2):
    """Independent reference model: brute-force n-gram Jaccard in python."""
    import re

    gsets = {}
    for i, text in docs:
        t = text.strip().lower()
        toks = re.split(r"\s+", t) if t else []
        if len(toks) < n:
            gsets[i] = {" ".join(toks)}
        else:
            gsets[i] = {
                " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
            }
    out = set()
    ids = sorted(gsets)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            ia, ib = ids[a], ids[b]
            inter = len(gsets[ia] & gsets[ib])
            union = len(gsets[ia] | gsets[ib])
            j = inter / union if union else 0.0
            if j >= threshold:
                out.add((ia, ib, round(j, 4)))
    return out


def test_ngram_pairs_random_corpora_match_python_model(spark):
    """Seeded random low-entropy corpora (the adversarial case for the
    prefix filter): BOTH physical strategies must equal the brute-force
    python model at several thresholds — this is the randomized check on
    the hand-implemented AllPairs prefix/length-filter theorem."""
    import numpy as np

    from flink_1_3_2_hopsworks_spark.dedup.ngram import ngram_jaccard_pairs

    rng = np.random.default_rng(1234)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> dense overlaps
    docs = []
    for i in range(60):
        length = int(rng.integers(2, 14))
        words = [vocab[int(x)] for x in rng.integers(0, len(vocab), length)]
        docs.append((i, " ".join(words)))
    # plant exact + near dups
    docs[50] = (50, docs[0][1])
    docs[51] = (51, docs[1][1] + " extra")
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for t in (0.3, 0.6, 0.9):
        expected = _python_jaccard_pairs(docs, t)
        bitmap = set(
            map(tuple, ngram_jaccard_pairs(df, "doc_id", "text", t, 2).collect())
        )
        prefix = set(
            map(
                tuple,
                ngram_jaccard_pairs(
                    df, "doc_id", "text", t, 2, universe_cap=0
                ).collect(),
            )
        )
        assert bitmap == expected, f"bitmap t={t}"
        assert prefix == expected, f"prefix t={t}"


def test_ngram_prefix_bounds_survive_ieee_rounding(spark):
    """Exact-boundary pair at J = 7/100 = t = 0.07 with |A| = 100,
    |B| = 7 ⊂ A. IEEE gives 0.07·100 = 7.000000000000001, so without the
    ε nudges BOTH AllPairs filters break: ceil → 8 shortens A's prefix to
    93 while the 7 shared grams (df = 2, ranked last) start at rank 94,
    and the length filter computes t·max = 7.000000000000001 > 7 = min —
    either alone silently drops the pair. The fixed bounds must keep it,
    on the prefix path and the bitmap path alike."""
    from flink_1_3_2_hopsworks_spark.dedup.ngram import ngram_jaccard_pairs

    toks = [f"a{i:03d}" for i in range(101)]  # 100 distinct bigrams
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, " ".join(toks[:8]))],  # B = 7 bigrams ⊂ A
        ["doc_id", "text"],
    )
    for kwargs in ({"universe_cap": 0}, {}):  # prefix path, then bitmap
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                df, "doc_id", "text", threshold=0.07, n=2, **kwargs
            ).collect()
        }
        assert got == {(1, 2): 0.07}, f"path {kwargs or 'bitmap'}"


def test_gram_builders_match_engine_on_edge_whitespace(spark):
    """The Arrow-batched gram builder (numeric-id fast path) must tokenize
    EXACTLY like the Catalyst expression path: ASCII-space-only strip
    (TRIM), ASCII \\s class (Java regex), NULL → no grams. Docs with
    tab/newline/NBSP edges and a NULL are the adversarial inputs."""
    from flink_1_3_2_hopsworks_spark.dedup.ngram import _gram_sets, token_ngrams

    docs = [
        (1, "\tleading tab and words here"),
        (2, "trailing newline words here\n"),
        (3, " nbsp separated words"),  # NBSP is NOT Java \s
        (4, "inner\ttab and\nnewline splits"),
        (5, None),
        (6, "   only spaces   "),
        (7, "plain old text"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fast = {
        r["_id"]: list(r["_g"])
        for r in _gram_sets(df, "doc_id", "text", 2).collect()
    }
    engine = {
        r["doc_id"]: list(r["g"])
        for r in df.select(
            "doc_id", token_ngrams("text", 2).alias("g")
        ).collect()
    }
    assert fast == engine


def test_word_ngrams_builder_matches_engine_on_edge_whitespace(spark):
    """Same parity check for the contamination convention
    (short_doc_whole_text=False ↔ word_ngrams): within one
    benchmark_ngram_overlap call the corpus side (Python builder) and the
    benchmark side (Catalyst) MUST tokenize identically."""
    from flink_1_3_2_hopsworks_spark.dedup.contamination import word_ngrams
    from flink_1_3_2_hopsworks_spark.dedup.ngram import _gram_sets

    docs = [
        (1, "\tone two three four five six\n"),
        (2, "short\ttext"),
        (3, None),
        (4, "a b c d e f"),  # NBSP stays inside a token
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fast = {
        r["_id"]: sorted(r["_g"])
        for r in _gram_sets(
            df, "doc_id", "text", 5, short_doc_whole_text=False
        ).collect()
    }
    engine = {
        r["doc_id"]: sorted(set(r["g"]))
        for r in df.select(
            "doc_id", word_ngrams("text", 5).alias("g")
        ).collect()
    }
    assert fast == engine


def test_ngram_bitmap_cap_is_byte_aware(spark):
    """A wide-universe corpus must not take the bitmap path just because
    the row count is small: the gate is docs × ⌈U/64⌉ × 8 bytes. With
    broadcast_bytes_cap=0 the prefix path must serve (and stay exact)."""
    from flink_1_3_2_hopsworks_spark.dedup.ngram import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d x"),
            (3, "p q r s t"),
        ],
        ["doc_id", "text"],
    )
    capped = set(
        map(
            tuple,
            ngram_jaccard_pairs(
                df, "doc_id", "text", 0.5, 2, broadcast_bytes_cap=0
            ).collect(),
        )
    )
    default = set(
        map(tuple, ngram_jaccard_pairs(df, "doc_id", "text", 0.5, 2).collect())
    )
    assert capped == default
    assert (1, 2, 0.6) in capped


def test_decontaminate_random_matches_python_model(spark):
    """Seeded random corpus vs an independent python n-gram-overlap model."""
    import numpy as np
    import re

    from flink_1_3_2_hopsworks_spark.dedup.contamination import (
        benchmark_ngram_overlap,
    )

    rng = np.random.default_rng(77)
    vocab = [f"t{i}" for i in range(20)]
    mk = lambda k: " ".join(  # noqa: E731
        vocab[int(x)] for x in rng.integers(0, len(vocab), k)
    )
    bench_docs = [(100 + i, mk(int(rng.integers(3, 12)))) for i in range(8)]
    corpus_docs = [(i, mk(int(rng.integers(2, 15)))) for i in range(40)]
    corpus_docs[30] = (30, "zzz " + bench_docs[0][1])  # planted contamination
    n = 3

    def grams(text):
        toks = re.split(r"\s+", text.strip().lower()) if text.strip() else []
        return {
            " ".join(toks[j : j + n]) for j in range(max(len(toks) - n + 1, 0))
        } if len(toks) >= n else set()

    bench_grams = set().union(*(grams(t) for _, t in bench_docs))
    expected = {
        i: len(grams(t) & bench_grams) for i, t in corpus_docs
    }
    got = {
        r["doc_id"]: r["n_hits"]
        for r in benchmark_ngram_overlap(
            spark.createDataFrame(corpus_docs, ["doc_id", "text"]),
            spark.createDataFrame(bench_docs, ["doc_id", "text"]),
            "doc_id",
            "text",
            n=n,
        ).collect()
    }
    assert got == expected
    assert got[30] > 0


def test_bloom_no_false_negatives_and_reduces_scan(spark):
    from flink_1_3_2_hopsworks_spark.operators.bloom import (
        bloom_build,
        bloom_filter_rows,
        bloom_join,
    )

    dim = spark.range(0, 500).selectExpr("id * 7 as k", "id as payload")
    fact = spark.range(0, 20_000).selectExpr("id as k", "id % 97 as v")
    words = bloom_build(dim, ["k"])
    # no false negatives: every true dim key passes the filter
    passed = bloom_filter_rows(dim.select("k"), ["k"], words).count()
    assert passed == 500
    # selective: most non-joining fact rows are dropped before the join
    pre = bloom_filter_rows(fact, ["k"], words).count()
    assert pre < 2000  # 500 true keys + a small false-positive tail
    # result equals the plain join
    got = sorted(map(tuple, bloom_join(fact, dim, ["k"]).collect()))
    want = sorted(map(tuple, fact.join(dim, ["k"]).collect()))
    assert got == want


def test_oracle_constants_in_sync_with_gates():
    """The oracle SQL inlines literal thresholds / parameter defaults that
    must track the gate parameters; a drift here would show up only as a
    confusing hash mismatch at driver time — pin it as an import-time
    check instead (no Spark needed)."""
    import inspect

    from flink_1_3_2_hopsworks_spark.dedup import showcase_oracle as dd_o
    from flink_1_3_2_hopsworks_spark.dedup.embedding import embedding_near_dups
    from flink_1_3_2_hopsworks_spark.operators import showcase_oracle as op_o

    # pipe_lang_mixture: en rate 0.35 -> int(0.35 * 2^32)
    assert str(int(0.35 * (1 << 32))) in dd_o.ORACLE["pipe_lang_mixture"]
    # pipe_quality_filter: sample_fraction 0.2 -> int(0.2 * 2^32), salt qq42
    assert str(int(0.2 * (1 << 32))) in dd_o.ORACLE["pipe_quality_filter"]
    assert "qq42" in dd_o.ORACLE["pipe_quality_filter"]
    # op_sampled_percentiles: fraction 0.1 -> int(0.1 * 2^32)
    assert str(int(0.1 * (1 << 32))) in op_o.ORACLE["op_sampled_percentiles"]
    # embedding oracle builder defaults == embedding_near_dups defaults
    f = inspect.signature(embedding_near_dups).parameters
    g = inspect.signature(dd_o._embedding_oracle).parameters
    for name in ("num_planes", "dim", "seed", "extra_planes", "max_bucket"):
        assert f[name].default == g[name].default, name
    # the dd_embedding_pairs gate uses threshold=0.3 == oracle default
    assert g["threshold"].default == 0.3
    # amplified operator and its recall oracle share every default
    from flink_1_3_2_hopsworks_spark.dedup.embedding import (
        embedding_near_dups_amplified,
    )

    h = inspect.signature(embedding_near_dups_amplified).parameters
    r = inspect.signature(dd_o._embedding_recall_oracle).parameters
    for name in ("num_planes", "dim", "seed", "num_sets", "extra_planes",
                 "max_bucket"):
        assert h[name].default == r[name].default, name


def test_incremental_ingest_semantics(spark):
    """New batch vs store: already-seen fingerprints drop, within-batch
    dups collapse to the min-id representative with a correct count, and
    novel docs survive untouched."""
    from flink_1_3_2_hopsworks_spark.dedup.incremental import (
        incremental_ingest,
    )

    corpus = spark.createDataFrame(
        [(1, "seen text"), (2, "other seen")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (10, "seen text"),       # exact dup of corpus -> dropped
            (11, "SEEN   text"),     # normalizes to the same fp -> dropped
            (12, "fresh content"),   # novel
            (13, "fresh content"),   # within-batch dup of 12
            (14, "unique doc"),      # novel
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["batch_dups"]
        for r in incremental_ingest(new, corpus, "doc_id", "text").collect()
    }
    assert got == {12: 2, 14: 1}
    # pre-computed store (fp column) path gives the same answer
    from flink_1_3_2_hopsworks_spark.functions.text import fingerprint

    store = corpus.select(fingerprint("text").alias("fp"))
    got2 = {
        r["doc_id"]: r["batch_dups"]
        for r in incremental_ingest(new, store, "doc_id", "text").collect()
    }
    assert got2 == got


def test_quality_quantile_filter_keeps_above_threshold(spark):
    """Kept set == docs scoring >= the sample-estimated quantile; the
    threshold column is constant and reproducible."""
    from flink_1_3_2_hopsworks_spark.functions.text import (
        quality_quantile_filter,
        quality_score,
    )

    docs = spark.createDataFrame(
        [(i, ("good words here " * (i % 7 + 1)).strip()) for i in range(60)]
        + [(100 + i, "!!! ??? ,,, ...") for i in range(10)],
        "doc_id long, text string",
    )
    out = quality_quantile_filter(
        docs, "doc_id", "text", keep_quantile=0.5, sample_fraction=0.5
    ).collect()
    thrs = {r["threshold"] for r in out}
    assert len(thrs) == 1
    thr = thrs.pop()
    scored = {
        r["doc_id"]: r["q"]
        for r in docs.select(
            "doc_id", quality_score("text").alias("q")
        ).collect()
    }
    kept = {r["doc_id"] for r in out}
    assert kept == {d for d, q in scored.items() if q >= thr}
    assert kept and len(kept) < len(scored)  # filter actually bites


def test_quality_quantile_filter_empty_sample_keeps_everything(spark):
    """A sample_fraction so small the salted draw selects zero docs must
    coalesce the NULL percentile to -inf and KEEP every document (no
    evidence != drop everything); threshold column reads -inf."""
    import math

    from flink_1_3_2_hopsworks_spark.functions.text import (
        quality_quantile_filter,
    )

    docs = spark.createDataFrame(
        [(i, "some ordinary words right here") for i in range(5)],
        "doc_id long, text string",
    )
    out = quality_quantile_filter(
        docs, "doc_id", "text", keep_quantile=0.5, sample_fraction=0.0
    ).collect()
    assert {r["doc_id"] for r in out} == set(range(5))
    assert all(math.isinf(r["threshold"]) and r["threshold"] < 0 for r in out)


def test_embedding_amplified_rejects_bad_num_sets(spark):
    from flink_1_3_2_hopsworks_spark.dedup.embedding import (
        embedding_near_dups_amplified,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="num_sets"):
        embedding_near_dups_amplified(df, "vec_id", "embedding", num_sets=0)


def test_embedding_amplified_superset_and_single_set_equivalence(spark):
    """OR-amplification invariants: (1) num_sets=1 reproduces the base
    operator EXACTLY (set 0 uses the base seed, so buckets and verify are
    identical); (2) more sets never lose a pair (candidates are unioned);
    (3) every amplified pair is a true pair (verify is exact)."""
    import numpy as np

    from flink_1_3_2_hopsworks_spark.dedup.embedding import (
        embedding_near_dups,
        embedding_near_dups_amplified,
    )
    from flink_1_3_2_hopsworks_spark.functions.vectors import cosine

    rng = np.random.default_rng(7)
    base_vecs = rng.standard_normal((40, 16))
    rows = []
    for i, v in enumerate(base_vecs):
        rows.append((i, [float(x) for x in v]))
    # plant near-dups: small perturbations of vectors 0..4
    for j in range(5):
        rows.append(
            (100 + j, [float(x) for x in base_vecs[j] + 0.05 * rng.standard_normal(16)])
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(threshold=0.8, num_planes=6, dim=16, extra_planes=8)
    single = set(
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_dups(df, "vec_id", "embedding", **kw).collect()
    )
    amp1 = set(
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_dups_amplified(
            df, "vec_id", "embedding", num_sets=1, **kw
        ).collect()
    )
    amp4 = set(
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_dups_amplified(
            df, "vec_id", "embedding", num_sets=4, **kw
        ).collect()
    )
    assert amp1 == single  # set 0 == base plane set
    assert amp1 <= amp4  # OR-amplification is monotone
    truth = set(
        (r["id_a"], r["id_b"])
        for r in df.alias("a")
        .crossJoin(df.alias("b"))
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(
                cosine(F.col("a.embedding"), F.col("b.embedding")), 4
            ).alias("c"),
        )
        .filter(F.col("c") >= 0.8)
        .collect()
    )
    assert {(a, b) for a, b, _ in amp4} <= truth  # exact verify: no FPs
    # the planted perturbation pairs give amplification something to find
    assert len(amp4) >= len(amp1)


def test_weighted_sample_matches_python_replay_and_distribution(spark):
    """weighted_sample_fixed_size: (1) the Spark row set equals a pure-
    python replay of the A-Res formula (portability is the contract);
    (2) across many salts, single-draw selection frequencies track the
    weights (the E-S property: P(selected) = w_i/Σw for n=1)."""
    import hashlib
    import math

    from flink_1_3_2_hopsworks_spark.operators.sampling import (
        weighted_sample_fixed_size,
    )

    rows = [(1, 10.0), (2, 30.0), (3, 60.0), (4, 0.0), (5, None)]
    df = spark.createDataFrame(rows, "id long, w double")

    def py_keys(salt):
        out = {}
        for i, w in rows:
            if w is None or w <= 0:
                continue
            h = hashlib.md5(f"{i}|{salt}".encode()).hexdigest()
            u = (int(h[:8], 16) + 1) / 2**32
            out[i] = math.log(u) / w
        return out

    # (1) exact replay on a handful of salts, n=2
    for salt in ("a", "b", "c"):
        want = sorted(py_keys(salt), key=lambda i: (-py_keys(salt)[i], i))[:2]
        got = sorted(
            r["id"]
            for r in weighted_sample_fixed_size(
                df, 2, "w", ["id"], salt=salt
            ).collect()
        )
        assert got == sorted(want), (salt, got, want)

    # (2) distribution: 400 python single-draws; doc 3 (60% of weight)
    # must win roughly 60% of the time, doc 1 (10%) roughly 10%.
    wins = {1: 0, 2: 0, 3: 0}
    trials = 400
    for t in range(trials):
        ks = py_keys(f"s{t}")
        wins[max(ks, key=ks.get)] += 1
    assert 0.5 < wins[3] / trials < 0.7
    assert 0.03 < wins[1] / trials < 0.2
    # zero/NULL-weight rows can never be drawn (checked via python replay
    # domain and the Spark filter above: ids 4 and 5 never appear).


def test_select_token_budget_threshold_and_degenerate(spark):
    """Bucket-granular budget: whole quality buckets are admitted best-
    first until the sample-scaled budget would overflow; a budget smaller
    than the best bucket keeps nothing (NULL threshold)."""
    from flink_1_3_2_hopsworks_spark.functions.text import select_token_budget

    # Three quality tiers via doc length (quality_score saturates at 50
    # tokens): long docs score highest, tiny docs lowest.
    rows = (
        [(i, " ".join(["alpha"] * 60)) for i in range(10)]       # tier A
        + [(100 + i, " ".join(["beta"] * 25)) for i in range(10)]  # tier B
        + [(200 + i, "x y") for i in range(10)]                    # tier C
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # sample_fraction=1.0 -> the sample IS the corpus; tier A holds 600
    # tokens, A+B 850, A+B+C 870.
    out = select_token_budget(
        df, "doc_id", "text", 700, sample_fraction=1.0
    ).collect()
    kept = {r["doc_id"] for r in out}
    assert kept == {i for i in range(10)}  # budget 700 fits A, not A+B
    out2 = select_token_budget(
        df, "doc_id", "text", 860, sample_fraction=1.0
    ).collect()
    assert {r["doc_id"] for r in out2} == {i for i in range(10)} | {
        100 + i for i in range(10)
    }
    # degenerate: budget below the best bucket -> empty
    assert (
        select_token_budget(df, "doc_id", "text", 50, sample_fraction=1.0).count()
        == 0
    )


def test_token_mixture_rates_hit_targets(spark):
    """Derived keep-rates: binding stratum keeps rate 1; expected post-
    sample token shares equal the targets; unlisted strata are dropped;
    the kept set replays from (id, salt) in pure python."""
    import hashlib

    from flink_1_3_2_hopsworks_spark.operators.sampling import (
        token_mixture_resample,
    )

    # en: 8000 tokens, de: 1000, es: 1000, xx: 500 (unlisted)
    rows = (
        [(i, "en", 80) for i in range(100)]
        + [(200 + i, "de", 50) for i in range(20)]
        + [(300 + i, "es", 20) for i in range(50)]
        + [(400 + i, "xx", 50) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "id long, lang string, tc long")
    targets = {"en": 0.5, "de": 0.25, "es": 0.25}
    out = token_mixture_resample(df, "id", "lang", "tc", targets).collect()
    got_rates = {r["lang"]: r["rate"] for r in out}
    # shares: en 0.8, de 0.1, es 0.1 (within targeted strata);
    # ratios: en 0.625, de 2.5, es 2.5 -> de/es bind at 1, en keeps 0.25.
    assert got_rates == {"en": 0.25, "de": 1.0, "es": 1.0}
    # expected tokens: en 8000*0.25 = 2000, de 1000, es 1000 -> 50/25/25.
    assert not any(r["lang"] == "xx" for r in out)
    # portable replay: a row survives iff h32 < rate * 2^32
    for r in out:
        h = hashlib.md5(f"{r['id']}|tm42".encode()).hexdigest()
        assert int(h[:8], 16) < r["rate"] * 2**32
    # every de/es row kept (rate 1)
    assert sum(1 for r in out if r["lang"] == "de") == 20
    assert sum(1 for r in out if r["lang"] == "es") == 50


def test_round6_oracle_constants_in_sync_with_gates():
    """Same import-time pin for the round-6 oracles: inlined budgets,
    salts, targets, and hash-family defaults must track the gate
    parameters (drift reads as an opaque driver hash mismatch)."""
    import inspect

    from flink_1_3_2_hopsworks_spark.dedup import showcase_oracle as dd_o
    from flink_1_3_2_hopsworks_spark.dedup.minhash import (
        minhash_near_dups,
        minhash_star_edges,
    )
    from flink_1_3_2_hopsworks_spark.operators import showcase_oracle as op_o

    # pipe_token_budget: budget 23000 * fraction 0.2 -> 4600.0, salt tb42
    assert "4600.0" in dd_o.ORACLE["pipe_token_budget"]
    assert "tb42" in dd_o.ORACLE["pipe_token_budget"]
    # pipe_token_mixture: targets + salt tm42
    for frag in ("('en', 0.4)", "('de', 0.2)", "('es', 0.2)", "('fr', 0.2)", "tm42"):
        assert frag in dd_o.ORACLE["pipe_token_mixture"], frag
    # op_weighted_sample: n=50, salt wq0, 2^32 divisor
    assert "LIMIT 50" in op_o.ORACLE["op_weighted_sample"]
    assert "wq0" in op_o.ORACLE["op_weighted_sample"]
    assert "4294967296.0" in op_o.ORACLE["op_weighted_sample"]
    # star oracle builder defaults == minhash_star_edges defaults
    f = inspect.signature(minhash_star_edges).parameters
    g = inspect.signature(dd_o._minhash_star_oracle).parameters
    for name in ("threshold", "shingle_k", "num_hashes", "bands", "max_bucket"):
        assert f[name].default == g[name].default, name
    # incremental-near oracle builder defaults == gate operator defaults
    from flink_1_3_2_hopsworks_spark.dedup.incremental import (
        incremental_near_ingest,
    )

    h = inspect.signature(incremental_near_ingest).parameters
    k = inspect.signature(dd_o._incremental_near_oracle).parameters
    for name in ("threshold", "shingle_k", "num_hashes", "bands", "max_bucket"):
        assert h[name].default == k[name].default, name
    # pair-mode oracle builder still tracks minhash_near_dups too
    m = inspect.signature(minhash_near_dups).parameters
    n = inspect.signature(dd_o._minhash_oracle).parameters
    for name in ("threshold", "shingle_k", "num_hashes", "bands", "max_bucket"):
        assert m[name].default == n[name].default, name
    # src7 batch split is stated identically in gate and oracle
    assert "src7" in dd_o.ORACLE["pipe_incremental_near_ingest"]


def test_chunk_documents_boundaries_and_overlap(spark):
    """Chunk grid: stride = max - overlap; final partial chunk kept; no
    trailing chunk fully contained in its predecessor; empty/NULL docs
    yield one empty chunk; overlap >= max rejected."""
    import pytest as _pytest

    from flink_1_3_2_hopsworks_spark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "a b c"),                               # shorter than max
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(docs, "doc_id", "text", 4, overlap=2).collect()
    }
    # doc 1: starts 0,2,4,6 (start<n-overlap=8) -> last covers t6..t9
    assert got[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert got[(1, 1)] == ("t2 t3 t4 t5", 4)
    assert got[(1, 2)] == ("t4 t5 t6 t7", 4)
    assert got[(1, 3)] == ("t6 t7 t8 t9", 4)
    assert (1, 4) not in got  # start 8 would be contained in chunk 3
    assert got[(2, 0)] == ("a b c", 3) and (2, 1) not in got
    assert got[(3, 0)] == ("", 0)
    assert got[(4, 0)] == ("", 0)
    with _pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", 4, overlap=4)


# ------------------------------------------------------------ snapshot upsert


def test_snapshot_upsert_actions_and_tombstones(spark):
    from flink_1_3_2_hopsworks_spark.functions.text import snapshot_upsert

    store = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [
            (2, "beta revised", False),   # updated
            (3, "  GAMMA ", False),       # unchanged (normalized fp equal)
            (4, None, True),              # tombstone
            (5, "epsilon", False),        # inserted
            (9, None, True),              # delete of absent id: no row
        ],
        "doc_id long, text string, del boolean",
    )
    out = {
        r["doc_id"]: (r["text"], r["action"])
        for r in snapshot_upsert(
            store, delta, "doc_id", "text", delete_col="del"
        ).collect()
    }
    assert out == {
        1: ("alpha", "kept"),
        2: ("beta revised", "updated"),
        3: ("  GAMMA ", "unchanged"),
        5: ("epsilon", "inserted"),
    }


def test_snapshot_upsert_without_delete_col(spark):
    from flink_1_3_2_hopsworks_spark.functions.text import snapshot_upsert

    store = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    delta = spark.createDataFrame([(1, "b")], "doc_id long, text string")
    rows = snapshot_upsert(store, delta, "doc_id", "text").collect()
    assert [(r["doc_id"], r["text"], r["action"]) for r in rows] == [
        (1, "b", "updated")
    ]
