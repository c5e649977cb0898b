"""Round-6 exact duplicated-span detection/removal (Lee et al.
exact-substring dedup, relational form) — dedup/spans.py."""

from __future__ import annotations

from flink_1_3_2_hopsworks_spark.dedup.spans import (
    duplicated_span_stats,
    remove_duplicated_spans,
)

# Doc 1 and 2 share the 5-token span "one two three four five"; doc 3 is
# clean; doc 4 repeats a 3-token span WITHIN itself; doc 5 is shorter than
# the window; doc 6 is blank.
DOCS = [
    (1, "one two three four five alpha beta gamma delta"),
    (2, "prefix words one two three four five suffix tail"),
    (3, "nothing here matches anything else in this corpus at all"),
    (4, "x y z pad pad2 x y z pad3 pad4"),
    (5, "too short"),
    (6, "   "),
    (7, None),
]


def _stats(spark, window):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in duplicated_span_stats(df, "doc_id", "text", window).collect()
    }


def test_stats_cross_doc_span(spark):
    got = _stats(spark, window=5)
    # Doc 1: exactly one 5-window is duplicated ("one two three four five"
    # at p=0); coverage = 5 of 9 tokens.
    assert got[1]["n_tokens"] == 9
    assert got[1]["dup_windows"] == 1
    assert got[1]["covered_tokens"] == 5
    assert abs(got[1]["covered_frac"] - round(5 / 9, 4)) < 1e-9
    # Doc 2 holds the same span at p=2.
    assert got[2]["dup_windows"] == 1
    assert got[2]["covered_tokens"] == 5
    # Clean doc, short doc, blank doc: zero coverage, correct n_tokens.
    assert got[3]["dup_windows"] == 0 and got[3]["covered_tokens"] == 0
    assert got[5] == {
        "doc_id": 5, "n_tokens": 2, "dup_windows": 0,
        "covered_tokens": 0, "covered_frac": 0.0,
    }
    assert got[6]["n_tokens"] == 0 and got[6]["covered_frac"] == 0.0
    # NULL text degrades to zero tokens, not size(NULL) = -1.
    assert got[7] == {
        "doc_id": 7, "n_tokens": 0, "dup_windows": 0,
        "covered_tokens": 0, "covered_frac": 0.0,
    }


def test_stats_within_doc_repeat_and_interval_union(spark):
    got = _stats(spark, window=3)
    # Doc 4 = x y z pad pad2 x y z pad3 pad4: "x y z" occurs at p=0 and
    # p=5 (2 dup windows), union covers 6 tokens of 10.
    assert got[4]["dup_windows"] == 2
    assert got[4]["covered_tokens"] == 6
    # Doc 1/2 share three overlapping 3-grams; union must NOT double-count
    # the overlap: windows at p=0,1,2 in doc 1 cover exactly tokens 0..4.
    assert got[1]["dup_windows"] == 3
    assert got[1]["covered_tokens"] == 5


def test_removal_keeps_first_occurrence(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicated_spans(df, "doc_id", "text", 5).collect()
    }
    # Doc 1 (lowest id) owns the shared gram — keeps everything.
    assert got[1]["n_removed"] == 0
    assert got[1]["clean_text"] == DOCS[0][1]
    # Doc 2 drops the 5 covered positions (p=2..6), keeps the rest in order.
    assert got[2]["n_removed"] == 5
    assert got[2]["clean_text"] == "prefix words suffix tail"
    # Within-doc repeats are NOT removed (doc 4 owns its own gram).
    got3 = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicated_spans(df, "doc_id", "text", 3).collect()
    }
    assert got3[4]["n_removed"] == 0
    # Blank doc survives with empty clean_text.
    assert got[6]["clean_text"] == "" and got[6]["n_removed"] == 0
    assert got[7]["clean_text"] == "" and got[7]["n_removed"] == 0
    assert set(got) == {1, 2, 3, 4, 5, 6, 7}


def test_stats_match_oracle_shape_on_gate_table(spark, sf_dir):
    """Spot-parity on the real gate input (full parity runs via
    check_parity.py / the driver): totals over the documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = duplicated_span_stats(docs, "doc_id", "text", 8)
    assert stats.count() == docs.count()
    rem = remove_duplicated_spans(docs, "doc_id", "text", 8)
    # Every removed token was inside a flagged span: per-doc n_removed
    # never exceeds covered_tokens, and both ops agree on doc set.
    joined = stats.join(rem, "doc_id").collect()
    assert len(joined) == docs.count()
    for r in joined:
        assert 0 <= r["n_removed"] <= r["covered_tokens"]


def test_boilerplate_removal_drops_from_every_doc(spark):
    """A gram in >= min_docs distinct docs is removed EVERYWHERE — owner
    included — while a 2-doc duplicate is untouched at min_docs=3; a doc
    made entirely of boilerplate collapses to empty."""
    from flink_1_3_2_hopsworks_spark.dedup.spans import remove_boilerplate_spans

    docs = spark.createDataFrame(
        [
            (1, "shared header one two three body alpha"),
            (2, "shared header one two three body beta"),
            (3, "shared header one two three"),     # pure boilerplate
            (4, "pairwise dup span here only twice tail"),
            (5, "pairwise dup span here only twice coda"),
            (6, "clean独 unrelated text entirely its own"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in remove_boilerplate_spans(
            docs, "doc_id", "text", window=5, min_docs=3
        ).collect()
    }
    # "shared header one two three" occurs in docs 1,2,3 -> removed from ALL
    assert got[1]["clean_text"] == "body alpha" and got[1]["n_removed"] == 5
    assert got[2]["clean_text"] == "body beta" and got[2]["n_removed"] == 5
    assert got[3]["clean_text"] == "" and got[3]["n_removed"] == 5
    # 2-doc duplicate stays below the min_docs=3 threshold
    assert got[4]["n_removed"] == 0 and got[5]["n_removed"] == 0
    assert got[6]["n_removed"] == 0
