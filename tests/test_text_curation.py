"""Round-7 curation operators: Gopher rules, C4 line cleaning, cross-doc
line dedup, n-gram novelty, temperature mixture resampling."""

from __future__ import annotations

import pytest

from flink_1_3_2_hopsworks_spark.functions.text import (
    GOPHER_STOPWORDS,
    clean_lines_c4,
    gopher_quality_rules,
    ngram_novelty,
    remove_duplicate_lines,
)
from flink_1_3_2_hopsworks_spark.operators.sampling import temperature_resample


def test_gopher_rules_each_rule_fires(spark):
    good = (
        "the quick brown fox likes to run with all of that energy and "
        "every day it would have gone further than the rest of them did "
        "because running with friends near the old mill is what they do "
        "when the weather holds and the path stays dry for hours on end "
        "so they keep going until the light fades and they head home"
    )
    docs = spark.createDataFrame(
        [
            (1, good),  # passes everything
            (2, "too short to pass the word count rule with these few"),
            (3, " ".join(["a"] * 60)),  # mean word length 1 < 3
            (4, " ".join(["the#fox#ran#" for _ in range(60)])),  # symbols
            (5, " ".join(["12345"] * 60)),  # no alphabetic words
            (6, " ".join(["zebra"] * 60)),  # no required stopwords
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_rules(docs, "doc_id", "text").collect()
    }
    assert got[1]["kept"] is True
    assert got[2]["ok_words"] is False and got[2]["kept"] is False
    assert got[3]["ok_word_len"] is False and got[3]["kept"] is False
    assert got[4]["ok_symbols"] is False and got[4]["kept"] is False
    assert got[5]["ok_alpha"] is False and got[5]["kept"] is False
    assert got[6]["ok_stopwords"] is False and got[6]["kept"] is False
    # published stopword set is the default
    assert GOPHER_STOPWORDS[0] == "the" and "with" in GOPHER_STOPWORDS


def test_ngram_novelty_duplicates_score_zero(spark):
    base = "one two three four five six seven eight nine ten eleven twelve"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "completely different words " * 5), (4, "tiny")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["novelty"])
        for r in ngram_novelty(docs, "doc_id", "text", n=8).collect()
    }
    assert got[1][1] == 1.0  # first owner of every gram
    assert got[2][1] == 0.0 and got[2][0] == got[1][0]  # exact dup restates all
    assert got[3][1] == 1.0
    assert got[4] == (0, 1.0)  # < n tokens -> no grams -> novel by definition


def test_c4_clean_line_and_doc_rules(spark):
    multi = "\n".join(
        [
            "This line ends with a period and has enough words.",
            "no terminal punctuation here so it drops",
            "Too short.",
            "This line mentions javascript somewhere inside it.",
            'A quoted ending line with plenty of words here too."',
        ]
    )
    docs = spark.createDataFrame(
        [
            (1, multi),
            (2, "Contains lorem ipsum filler text and should drop entirely."),
            (3, "A code block { appears } so the doc drops."),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in clean_lines_c4(docs, "doc_id", "text").collect()
    }
    assert got[1]["doc_kept"] is True and got[1]["n_lines"] == 5
    kept = got[1]["clean_text"].split("\n")
    assert got[1]["n_lines_kept"] == 2 and len(kept) == 2
    assert kept[0].startswith("This line ends") and kept[1].startswith("A quoted")
    assert got[2]["doc_kept"] is False and got[2]["clean_text"] is None
    assert got[3]["doc_kept"] is False


def test_remove_duplicate_lines_cross_doc(spark):
    shared = "this exact line is shared boilerplate"
    docs = spark.createDataFrame(
        [
            (1, f"unique first line\n{shared}\nunique third line"),
            (2, f"{shared.upper()}\nanother unique line"),  # normalized match
            (3, "totally original content only"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicate_lines(docs, "doc_id", "text").collect()
    }
    assert got[1]["n_removed"] == 1
    assert got[1]["clean_text"] == "unique first line\nunique third line"
    assert got[2]["n_removed"] == 1
    assert got[2]["clean_text"] == "another unique line"
    assert got[3]["n_removed"] == 0
    assert got[3]["clean_text"] == "totally original content only"


def test_temperature_resample_rates(spark):
    rows = [(i, "big", 10) for i in range(100)] + [
        (1000 + i, "small", 10) for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, tc int")

    # T=1: alpha=1 -> every rate 1, everything kept
    kept1 = temperature_resample(
        docs, "doc_id", "lang", "tc", temperature=1.0
    ).collect()
    assert len(kept1) == 110 and {r["rate"] for r in kept1} == {1.0}

    # T=2: smallest stratum binds at 1, big stratum keeps sqrt(t_min/t_big)
    out = temperature_resample(
        docs, "doc_id", "lang", "tc", temperature=2.0
    ).collect()
    rates = {r["lang"]: r["rate"] for r in out}
    assert rates["small"] == 1.0
    assert abs(rates["big"] - round((100 / 1000) ** 0.5, 6)) < 1e-9

    with pytest.raises(ValueError, match="temperature"):
        temperature_resample(docs, "doc_id", "lang", "tc", temperature=0.5)

    # zero-token strata are dropped
    docs2 = docs.union(
        spark.createDataFrame([(2000, "empty", 0)], "doc_id long, lang string, tc int")
    )
    out2 = temperature_resample(docs2, "doc_id", "lang", "tc", temperature=2.0)
    assert out2.filter("lang = 'empty'").count() == 0


def test_prefix_containment_pairs(spark):
    from flink_1_3_2_hopsworks_spark.dedup.prefix import (
        prefix_containment_pairs,
    )

    base = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, base),                                   # prefix of 2 and 3
            (2, base + " extra tail tokens here"),
            (3, base + " different continuation text"),
            (4, "UNRELATED " + " ".join(f"q{i}" for i in range(20))),
            (5, "short doc under sixteen tokens"),       # excluded (< k)
            (6, base),                                   # exact dup of 1
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id_short"], r["id_long"]): r["n_short_tokens"]
        for r in prefix_containment_pairs(docs, "doc_id", "text").collect()
    }
    assert got[(1, 2)] == 20 and got[(1, 3)] == 20
    assert (1, 6) in got and (6, 1) not in got  # equal streams: lower id short
    assert got[(6, 2)] == 20 and got[(6, 3)] == 20
    assert not any(4 in p or 5 in p for p in got)
    # 2 and 3 share the prefix block but neither contains the other
    assert (2, 3) not in got and (3, 2) not in got


def test_model_quality_filter_python_replay(spark):
    """Spark scores == a direct python replay of the hashed-linear model
    (portable md5 buckets, frozen weights, mean + bias, sigmoid@6dp)."""
    import hashlib
    import math

    from flink_1_3_2_hopsworks_spark.functions.quality_model import (
        FROZEN_QUALITY_BIAS,
        FROZEN_QUALITY_WEIGHTS,
        model_quality_filter,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "spark engines process big data with columnar speed"),
        (3, ""),  # empty: score = sigmoid(bias)
        (4, "ONE one OnE"),  # case-normalized buckets
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["score"], r["kept"])
        for r in model_quality_filter(
            docs, "doc_id", "text", keep_all=True
        ).collect()
    }

    def replay(text):
        toks = [t for t in text.lower().strip().split() if t]
        ws = [
            FROZEN_QUALITY_WEIGHTS[
                int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 1024
            ]
            for t in toks
        ]
        s = (sum(ws) / len(ws) if ws else 0.0) + FROZEN_QUALITY_BIAS
        return round(1.0 / (1.0 + math.exp(-s)), 6)

    for did, text in rows:
        want = replay(text)
        assert abs(got[did][0] - want) < 1e-9, (did, got[did][0], want)
        assert got[did][1] == (want >= 0.5)

    # filter form drops the below-threshold docs
    kept_only = model_quality_filter(docs, "doc_id", "text")
    assert {r["doc_id"] for r in kept_only.collect()} == {
        d for d, _ in rows if replay(_) >= 0.5
    }


def test_oov_rate_against_known_vocab(spark):
    from flink_1_3_2_hopsworks_spark.functions.text import oov_rate

    docs = spark.createDataFrame(
        [
            (1, "aa aa aa bb"),      # aa,bb in top-2 vocab
            (2, "aa bb cc dd"),      # cc,dd OOV -> 0.5
            (3, ""),                  # empty -> 0.0
            (4, "cc cc"),            # all OOV
        ],
        "doc_id long, text string",
    )
    # global tf: aa=4, bb=2, cc=3, dd=1 -> top-2 vocab = {aa, cc}
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in oov_rate(docs, "doc_id", "text", vocab_size=2).collect()
    }
    assert got[1] == (4, 1, 0.25)   # bb OOV
    assert got[2] == (4, 2, 0.5)    # bb, dd OOV
    assert got[3] == (0, 0, 0.0)
    assert got[4] == (2, 0, 0.0)    # cc made the vocab


def test_corpus_diff_statuses(spark):
    from flink_1_3_2_hopsworks_spark.functions.text import corpus_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "gets removed")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "Same   TEXT"), (2, "changed now"), (4, "brand new doc")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(old, new, "doc_id", "text").collect()
    }
    # fingerprint normalizes case + whitespace -> 1 unchanged
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_model_quality_filter_serves_trained_weights(spark):
    """Train -> freeze -> serve: a pyspark.ml LogisticRegression trained on
    OUR md5-bucket features separates two word distributions, and its
    extracted coefficients drive model_quality_filter to the same verdicts
    — the serving path is the real contract, the frozen gate weights are
    just one instance."""
    import hashlib

    import numpy as np
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors

    from flink_1_3_2_hopsworks_spark.functions.quality_model import (
        model_quality_filter,
    )

    n_buckets = 64
    good_vocab = [f"good{i}" for i in range(10)]
    bad_vocab = [f"bad{i}" for i in range(10)]
    rng = np.random.default_rng(3)
    rows = []
    for i in range(120):
        label = i % 2
        vocab = good_vocab if label else bad_vocab
        words = rng.choice(vocab, size=12)
        rows.append((i, " ".join(words), float(label)))

    def feats(text):
        v = np.zeros(n_buckets)
        toks = [t for t in text.lower().split() if t]
        for t in toks:
            v[int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % n_buckets] += 1
        return Vectors.dense(v / max(len(toks), 1))

    train = spark.createDataFrame(
        [(feats(t), lbl) for _, t, lbl in rows], ["features", "label"]
    )
    lr = LogisticRegression(maxIter=30, regParam=0.0)
    model = lr.fit(train)
    weights = [round(float(c), 6) for c in model.coefficients]
    bias = round(float(model.intercept), 6)

    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["kept"]
        for r in model_quality_filter(
            docs, "doc_id", "text", weights=weights, bias=bias, keep_all=True
        ).collect()
    }
    acc = sum(got[i] == bool(i % 2) for i, _, _ in rows) / len(rows)
    assert acc >= 0.95, acc


def test_cms_never_underestimates_and_merges(spark):
    """CMS guarantees: (1) est >= exact for EVERY key even with heavy
    collisions (width 8 << key count); (2) sketches merge by addition —
    building on two halves and summing counters equals one build."""
    import pyspark.sql.functions as F

    from flink_1_3_2_hopsworks_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    rows = [(i % 40,) for i in range(400)] + [(999,)] * 50
    df = spark.createDataFrame(rows, "k long")
    sketch = cms_build(df, ["k"], depth=3, width=8)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(
        sketch, exact.select("k"), ["k"], depth=3, width=8
    )
    joined = {
        r["k"]: (r["n"], r["est_n"])
        for r in exact.join(est, "k").collect()
    }
    assert len(joined) == 41
    assert all(e >= n for n, e in joined.values())
    assert joined[999][1] >= 50

    half_a = cms_build(df.filter("k < 20"), ["k"], depth=3, width=8)
    half_b = cms_build(df.filter("k >= 20"), ["k"], depth=3, width=8)
    merged = {
        (r["row"], r["bucket"]): r["n"]
        for r in half_a.unionByName(half_b)
        .groupBy("row", "bucket")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    whole = {
        (r["row"], r["bucket"]): r["n"] for r in sketch.collect()
    }
    assert merged == whole


def test_spherical_kmeans_recovers_clusters_and_replays(spark):
    """Fit recovers planted directions from a rotated init, matches a
    numpy replay of the same quantized Lloyd steps, and empty cells keep
    their previous centroid."""
    import numpy as np

    from flink_1_3_2_hopsworks_spark.ml.kmeans import (
        spherical_kmeans_assign,
        spherical_kmeans_fit,
    )

    rng = np.random.default_rng(11)
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    rows = []
    for i in range(60):
        base = a if i % 2 else b
        v = base + rng.normal(0, 0.05, 3)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    init = [[0.8, 0.6, 0.0], [0.6, 0.8, 0.0], [0.0, 0.0, 1.0]]
    model = spherical_kmeans_fit(df, "embedding", init, iterations=3)

    # numpy replay of the same quantized Lloyd steps
    X = np.array([r[1] for r in rows])
    cents = np.array(init, dtype=np.float64)
    for _ in range(3):
        cos = (X / np.linalg.norm(X, axis=1, keepdims=True)) @ (
            cents / np.linalg.norm(cents, axis=1, keepdims=True)
        ).T
        assign = cos.argmax(axis=1)
        nxt = cents.copy()
        for c in range(len(init)):
            pts = X[assign == c]
            if len(pts):
                m = pts.mean(axis=0)
                n = np.sqrt((m * m).sum())
                if n > 0:
                    nxt[c] = np.round(m / n, 6)
        cents = nxt
    assert np.allclose(np.array(model), cents, atol=2e-6)

    # the two planted directions are recovered; the z cell stayed put
    # (no points assigned -> previous centroid kept)
    got = np.array(model)
    assert abs(got[0] @ a) > 0.98 or abs(got[1] @ a) > 0.98
    assert abs(got[0] @ b) > 0.98 or abs(got[1] @ b) > 0.98
    assert np.allclose(got[2], [0.0, 0.0, 1.0])

    out = {
        r["vec_id"]: r["cell"]
        for r in spherical_kmeans_assign(
            df, "vec_id", "embedding", model
        ).collect()
    }
    evens = {out[i] for i in range(0, 60, 2)}
    odds = {out[i] for i in range(1, 60, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds


def test_gopher_counts_ascii_ellipsis_and_nulls(spark):
    """ASCII three-dot ellipsis runs count toward the symbol ratio (the
    published Gopher rule counts '#' or '...'; pre-fix only the Unicode
    ellipsis counted), and NULL text behaves as the empty doc."""
    dotty = " ".join(["the"] * 55 + ["..."] * 7)  # 7/62 > 0.1 symbol ratio
    docs = spark.createDataFrame(
        [(1, dotty), (2, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_rules(docs, "doc_id", "text").collect()
    }
    assert got[1]["n_words"] == 62
    assert got[1]["symbol_ratio"] == round(7 / 62, 4)
    assert got[1]["ok_symbols"] is False and got[1]["kept"] is False
    assert got[2]["n_words"] == 0
    assert got[2]["kept"] is False  # False, not NULL


def test_remove_duplicate_lines_exempts_blank_lines(spark):
    """Empty/whitespace-only lines are exempt from the shared-line
    population: they occur in >= min_docs docs in any real corpus and
    would otherwise strip all paragraph structure from every document
    (the CCNet-style policy this operator mirrors avoids exactly that)."""
    shared = "this exact line is shared boilerplate"
    docs = spark.createDataFrame(
        [
            (1, f"para one\n\n{shared}\n\npara two"),
            (2, f"{shared}\n \nother text"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicate_lines(docs, "doc_id", "text").collect()
    }
    assert got[1]["n_removed"] == 1
    assert got[1]["clean_text"] == "para one\n\n\npara two"
    assert got[2]["n_removed"] == 1
    assert got[2]["clean_text"] == " \nother text"


def test_frozen_quality_weights_are_trained_not_random(spark):
    """The shipped FROZEN_QUALITY_WEIGHTS are the scripts/
    train_quality_model.py artifact (hashed-BoW logistic, proxy label
    lang=='en' on the public testdata): served scores must rank en docs
    above non-en better than chance. The synthetic corpus shares one
    vocabulary across langs, so the measured training AUC is ~0.65 (the
    honest ceiling — documented in quality_gate_model.py); this pins the
    weights carry that real signal rather than noise."""
    from flink_1_3_2_hopsworks_spark.catalog import load_table
    from flink_1_3_2_hopsworks_spark.functions.quality_model import (
        model_quality_filter,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    scored = {
        r["doc_id"]: r["score"]
        for r in model_quality_filter(
            docs, "doc_id", "text", keep_all=True
        ).collect()
    }
    langs = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    pos = sorted(s for d, s in scored.items() if langs[d] == "en")
    neg = sorted(s for d, s in scored.items() if langs[d] != "en")
    import bisect

    wins = sum(bisect.bisect_left(neg, s) for s in pos)
    auc = wins / (len(pos) * len(neg))
    assert auc > 0.58, auc  # trained signal, not random (train AUC ~0.65)


# ------------------------------------------------------- curation funnel


def _funnel_corpus(spark):
    """Synthetic corpus with one planted drop per funnel stage.

    Each planted doc repeats its OWN 12-word stopword-anchored phrase 5
    times: phrases pass every Gopher rule, repeated bigrams score LOW LM
    bits (the model trains on this very corpus), and docs built from
    DIFFERENT phrases share almost no char shingles, so only the planted
    pairs collide in MinHash. 'Filler' docs are 60 distinct words each —
    count-1 bigrams score the highest bits, so the perplexity tercile
    drops exactly them. One lang stratum → the T=2 mixture rate is 1.0
    (deterministic keep-all). src0 doc 900 is the benchmark (its 4-grams
    and its embedding are the decontamination probes)."""

    def phrase(words: str) -> str:
        assert len(words.split()) == 12
        return " ".join([words] * 5)

    p1 = phrase("the quiet cats and calm dogs run fast near the old barn")
    p3 = phrase("the green birds and small fish swim slow near the warm reef")
    p5 = phrase("the alpha beta gamma delta words and the secret eval line here")
    p6 = phrase("the bright moons and pale stars glow soft over the dark sea")
    p7 = phrase("the heavy rains and loud winds blow hard over the wide land")
    fill = lambda seed: " ".join(  # noqa: E731
        ["the", "and"]
        + [f"w{seed}x{i}q{(seed * 7 + i) % 97}" for i in range(58)]
    )
    rows = [
        (1, "en", "srcA", p1),                         # survivor
        (2, "en", "srcA", p1),                         # exact dup of 1
        (3, "en", "srcA", p3),
        # 4 ~ 3 near-dup: final word of the last repetition changed
        (4, "en", "srcA", p3[: -len("reef")] + "bay"),
        (5, "en", "srcA", p5),                         # shares src0 4-gram
        (6, "en", "srcA", p6),                         # embedding ~ src0
        (7, "en", "srcB", p7),
        (8, "en", "srcB", "too short to pass gopher"),  # gopher drop
        # fillers: unique rare bigrams -> highest bits -> tercile tail
        (10, "en", "srcB", fill(1)),
        (11, "en", "srcB", fill(2)),
        (12, "en", "srcB", fill(3)),
        (900, "en", "src0", "alpha beta gamma delta epsilon benchmark "
                            "holdout sentence for the eval set"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    unit = [0.0] * 7
    emb_rows = []
    for i, (d, *_), in enumerate(rows):
        v = list(unit)
        if d == 900:
            v[0] = 1.0
        elif d == 6:
            v[0] = 0.98
            v[1] = 0.199
        else:
            v[1 + i % 6] = 1.0
        emb_rows.append((d, v))
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<float>")
    return docs, emb


def test_curation_funnel_every_stage_drops_its_plant(spark):
    from flink_1_3_2_hopsworks_spark.curation import STAGES, curation_funnel

    docs, emb = _funnel_corpus(spark)
    out = curation_funnel(
        docs, emb, ngram_n=4, persist_signatures=False
    ).collect()
    n = {r["stage"]: r["n_docs"] for r in out}
    assert [r["stage"] for r in out] == list(STAGES)
    # monotone funnel
    counts = [r["n_docs"] for r in out]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert n["input"] == 11                      # src0 excluded
    assert n["gopher_rules"] == 10               # doc 8
    assert n["perplexity_tercile"] < n["gopher_rules"]  # filler tail
    assert n["exact_dedup"] == n["perplexity_tercile"] - 1   # doc 2
    assert n["near_dedup_star"] == n["exact_dedup"] - 1      # doc 4
    assert n["decontaminate_ngram"] == n["near_dedup_star"] - 1   # doc 5
    assert n["decontaminate_semantic"] == n["decontaminate_ngram"] - 1  # 6
    tok = {r["stage"]: r["n_tokens"] for r in out}
    ck = {r["stage"]: r["id_checksum"] for r in out}
    assert tok["shuffle_shard"] == tok["temperature_mixture"]
    assert n["shuffle_shard"] == n["temperature_mixture"]
    # the shard row's checksum binds the (doc, shard) assignment
    if n["temperature_mixture"] > 0:
        assert ck["shuffle_shard"] != ck["temperature_mixture"]


def test_curation_verdicts_monotone_and_keeper_semantics(spark):
    import pyspark.sql.functions as F

    from flink_1_3_2_hopsworks_spark.curation import curation_verdicts

    docs, emb = _funnel_corpus(spark)
    v = curation_verdicts(
        docs, emb, ngram_n=4, persist_signatures=False
    ).collect()
    for r in v:
        flags = [r[f"s{i}"] for i in range(10)]
        # cumulative verdicts: once dropped, never resurrected
        assert all(a or not b for a, b in zip(flags, flags[1:])), r
        assert (r["shard"] is not None) == r["s9"], r
    by_id = {r["doc_id"]: r for r in v}
    assert by_id[2]["s3"] and not by_id[2]["s4"]   # exact-dup loser
    assert by_id[1]["s4"]                          # min-id keeper survives
    assert by_id[4]["s4"] and not by_id[4]["s5"]   # near-dup loser
    assert by_id[3]["s5"]                          # near-dup anchor kept
    assert by_id[5]["s5"] and not by_id[5]["s6"]   # ngram-contaminated
    assert by_id[6]["s6"] and not by_id[6]["s7"]   # semantically close


def test_minhash_star_id_filter_equals_prejoin(spark):
    """id_filter semi-joins the slim signature table — must emit exactly
    the edges of running star edges on the pre-joined subset (signatures
    are per-doc independent, so anchors/buckets coincide)."""
    from flink_1_3_2_hopsworks_spark.catalog import load_table
    from flink_1_3_2_hopsworks_spark.dedup.minhash import minhash_star_edges

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    subset = docs.filter("doc_id % 3 != 1").select("doc_id")
    kw = dict(threshold=0.8, portable=True, recall_floor=None, persist=False)
    a = minhash_star_edges(
        docs, "doc_id", "text", id_filter=subset, **kw
    ).collect()
    b = minhash_star_edges(
        docs.join(subset, "doc_id"), "doc_id", "text", **kw
    ).collect()
    key = lambda r: (r["id_a"], r["id_b"])  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))
    assert len(a) > 0
