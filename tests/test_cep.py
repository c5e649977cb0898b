"""CEP NFA semantics tests — scripted sequences asserting strict vs relaxed
contiguity, within-pruning, and all-matches behavior (mirrors the
reference's flink-cep NFA tests)."""

from __future__ import annotations

from datetime import datetime

import pytest

from flink_1_3_2_hopsworks_spark.streaming.cep import Pattern


def _events(spark, rows):
    data = [
        (i, datetime.fromisoformat(ts), 1, etype, 0.0)
        for i, (ts, etype) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _matches(df, pattern):
    out = pattern.match_batch(df, ["user_id"], "ts", "event_id")
    return sorted(tuple(r["event_ids"]) for r in out.collect())


def test_followed_by_skips_noise(spark):
    df = _events(spark, [
        ("2024-01-01 00:00:00", "a"),
        ("2024-01-01 00:01:00", "x"),
        ("2024-01-01 00:02:00", "b"),
    ])
    p = Pattern.begin("s1", lambda e: e["event_type"] == "a").followed_by(
        "s2", lambda e: e["event_type"] == "b"
    )
    assert _matches(df, p) == [(0, 2)]


def test_next_requires_strict_contiguity(spark):
    df = _events(spark, [
        ("2024-01-01 00:00:00", "a"),
        ("2024-01-01 00:01:00", "x"),   # breaks strict a→b
        ("2024-01-01 00:02:00", "b"),
        ("2024-01-01 00:03:00", "a"),
        ("2024-01-01 00:04:00", "b"),   # strict pair
    ])
    p = Pattern.begin("s1", lambda e: e["event_type"] == "a").next(
        "s2", lambda e: e["event_type"] == "b"
    )
    assert _matches(df, p) == [(3, 4)]


def test_within_prunes_old_partials(spark):
    df = _events(spark, [
        ("2024-01-01 00:00:00", "a"),
        ("2024-01-01 01:00:00", "b"),   # 1h later — outside within
        ("2024-01-01 01:00:30", "a"),
        ("2024-01-01 01:05:00", "b"),   # inside within
    ])
    p = (
        Pattern.begin("s1", lambda e: e["event_type"] == "a")
        .followed_by("s2", lambda e: e["event_type"] == "b")
        .within(600)
    )
    assert _matches(df, p) == [(2, 3)]


def test_every_event_starts_a_partial(spark):
    df = _events(spark, [
        ("2024-01-01 00:00:00", "a"),
        ("2024-01-01 00:01:00", "a"),
        ("2024-01-01 00:02:00", "b"),
    ])
    p = Pattern.begin("s1", lambda e: e["event_type"] == "a").followed_by(
        "s2", lambda e: e["event_type"] == "b"
    )
    # Both 'a' events reach the same 'b' (all-matches semantics).
    assert _matches(df, p) == [(0, 2), (1, 2)]


def test_three_step_mixed_contiguity(spark):
    df = _events(spark, [
        ("2024-01-01 00:00:00", "a"),
        ("2024-01-01 00:01:00", "b"),
        ("2024-01-01 00:02:00", "x"),
        ("2024-01-01 00:03:00", "c"),
    ])
    p = (
        Pattern.begin("s1", lambda e: e["event_type"] == "a")
        .next("s2", lambda e: e["event_type"] == "b")
        .followed_by("s3", lambda e: e["event_type"] == "c")
    )
    assert _matches(df, p) == [(0, 1, 3)]


def test_keys_are_isolated(spark):
    data = [
        (0, datetime.fromisoformat("2024-01-01 00:00:00"), 1, "a", 0.0),
        (1, datetime.fromisoformat("2024-01-01 00:01:00"), 2, "b", 0.0),  # other key
        (2, datetime.fromisoformat("2024-01-01 00:02:00"), 1, "b", 0.0),
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    p = Pattern.begin("s1", lambda e: e["event_type"] == "a").followed_by(
        "s2", lambda e: e["event_type"] == "b"
    )
    out = p.match_batch(df, ["user_id"], "ts", "event_id").collect()
    assert len(out) == 1 and out[0]["user_id"] == 1
    assert list(out[0]["event_ids"]) == [0, 2]
