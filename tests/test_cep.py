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


def test_times_exact_occurrences(spark):
    df = _events(spark, [
        ("2024-01-01 00:00:00", "a"),
        ("2024-01-01 00:01:00", "a"),
        ("2024-01-01 00:02:00", "a"),
        ("2024-01-01 00:03:00", "b"),
    ])
    p = (
        Pattern.begin("s1", lambda e: e["event_type"] == "a")
        .times(2)
        .followed_by("s2", lambda e: e["event_type"] == "b")
    )
    # times(2), relaxed internal contiguity, skip-till-next-match: each
    # partial takes the FIRST next 'a' (no combinations — Flink's default
    # without allowCombinations), so starts at 0 and 1 reach 'b'.
    assert _matches(df, p) == [(0, 1, 3), (1, 2, 3)]


def test_one_or_more_emits_every_count(spark):
    df = _events(spark, [
        ("2024-01-01 00:00:00", "a"),
        ("2024-01-01 00:01:00", "a"),
        ("2024-01-01 00:02:00", "b"),
    ])
    p = (
        Pattern.begin("s1", lambda e: e["event_type"] == "a")
        .one_or_more()
        .followed_by("s2", lambda e: e["event_type"] == "b")
    )
    assert _matches(df, p) == [(0, 1, 2), (0, 2), (1, 2)]


def test_optional_step_skipped_and_taken(spark):
    df = _events(spark, [
        ("2024-01-01 00:00:00", "a"),
        ("2024-01-01 00:01:00", "b"),
        ("2024-01-01 00:02:00", "c"),
        ("2024-01-01 00:03:00", "a"),
        ("2024-01-01 00:04:00", "c"),
    ])
    p = (
        Pattern.begin("s1", lambda e: e["event_type"] == "a")
        .followed_by("s2", lambda e: e["event_type"] == "b")
        .optional()
        .followed_by("s3", lambda e: e["event_type"] == "c")
    )
    # a→b→c (taken), a→c twice (skipped: event 0 and event 3 reach a 'c').
    assert _matches(df, p) == [(0, 1, 2), (0, 2), (3, 4)]


def test_not_next_blocks_immediate_match(spark):
    df = _events(spark, [
        ("2024-01-01 00:00:00", "a"),
        ("2024-01-01 00:01:00", "x"),   # kills partial from event 0
        ("2024-01-01 00:02:00", "a"),
        ("2024-01-01 00:03:00", "b"),
    ])
    p = (
        Pattern.begin("s1", lambda e: e["event_type"] == "a")
        .not_next("nx", lambda e: e["event_type"] == "x")
        .followed_by("s2", lambda e: e["event_type"] == "b")
    )
    assert _matches(df, p) == [(2, 3)]


def test_not_followed_by_kills_on_intervening_match(spark):
    df = _events(spark, [
        ("2024-01-01 00:00:00", "a"),
        ("2024-01-01 00:01:00", "x"),   # intervening forbidden event
        ("2024-01-01 00:02:00", "b"),
        ("2024-01-01 00:03:00", "a"),
        ("2024-01-01 00:04:00", "b"),
    ])
    p = (
        Pattern.begin("s1", lambda e: e["event_type"] == "a")
        .not_followed_by("nf", lambda e: e["event_type"] == "x")
        .followed_by("s2", lambda e: e["event_type"] == "b")
    )
    assert _matches(df, p) == [(3, 4)]


def test_trailing_not_pattern_rejected(spark):
    p = Pattern.begin("s1", lambda e: True).not_followed_by("nf", lambda e: True)
    df = _events(spark, [("2024-01-01 00:00:00", "a")])
    with pytest.raises(Exception):
        p.match_batch(df, ["user_id"], "ts", "event_id").collect()


def test_step_names_align_with_event_ids(spark):
    df = _events(spark, [
        ("2024-01-01 00:00:00", "a"),
        ("2024-01-01 00:01:00", "a"),
        ("2024-01-01 00:02:00", "b"),
    ])
    p = (
        Pattern.begin("s1", lambda e: e["event_type"] == "a")
        .times(2)
        .followed_by("s2", lambda e: e["event_type"] == "b")
    )
    row = p.match_batch(df, ["user_id"], "ts", "event_id").collect()[0]
    assert list(row["step_names"]) == ["s1", "s1", "s2"]
    assert len(row["step_names"]) == len(row["event_ids"])


def test_match_stream_carries_partials_across_batches(spark, tmp_path):
    import shutil
    import tempfile
    from datetime import datetime

    staging = str(tmp_path / "cep_stream")
    # Two files = two micro-batch-ish splits; the a→b pair spans files.
    rows1 = [(0, datetime.fromisoformat("2024-01-01 00:00:00"), 1, "a", 0.0)]
    rows2 = [
        (1, datetime.fromisoformat("2024-01-01 00:01:00"), 1, "x", 0.0),
        (2, datetime.fromisoformat("2024-01-01 00:02:00"), 1, "b", 0.0),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("overwrite").parquet(staging)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(staging)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(staging)
    p = Pattern.begin("s1", lambda e: e["event_type"] == "a").followed_by(
        "s2", lambda e: e["event_type"] == "b"
    )
    out = p.match_stream(stream, ["user_id"], "ts", "event_id")

    results: list = []
    ckpt = tempfile.mkdtemp(prefix="ckpt_cep_")
    q = (
        out.writeStream.foreachBatch(lambda b, _: results.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)

    assert [(r["user_id"], tuple(r["event_ids"])) for r in results] == [(1, (0, 2))]


def test_iterative_condition_reads_prior_matches(spark):
    """Reference IterativeCondition (1.3): a 2-arg predicate sees the events
    already matched by this partial via ctx.events_for_pattern."""
    data = [
        (0, datetime.fromisoformat("2024-01-01 00:00:00"), 1, "start", 10.0),
        (1, datetime.fromisoformat("2024-01-01 00:01:00"), 1, "x", 5.0),   # not higher
        (2, datetime.fromisoformat("2024-01-01 00:02:00"), 1, "x", 12.0),  # first higher
        (3, datetime.fromisoformat("2024-01-01 00:03:00"), 1, "x", 20.0),
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    p = Pattern.begin("s", lambda e: e["event_type"] == "start").followed_by(
        "hi", lambda e, ctx: e["value"] > ctx.events_for_pattern("s")[0]["value"]
    )
    out = p.match_batch(df, ["user_id"], "ts", "event_id").collect()
    # skip-till-next-match: the partial takes the FIRST higher event only.
    assert sorted(tuple(r["event_ids"]) for r in out) == [(0, 2)]


def test_iterative_condition_one_or_more_increasing_run(spark):
    """Strictly-increasing run via an iterative loop condition: each new
    occurrence must exceed the last accepted one."""
    data = [
        (0, datetime.fromisoformat("2024-01-01 00:00:00"), 1, "a", 1.0),
        (1, datetime.fromisoformat("2024-01-01 00:01:00"), 1, "a", 2.0),
        (2, datetime.fromisoformat("2024-01-01 00:02:00"), 1, "a", 3.0),
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )

    def rising(e, ctx):
        prior = ctx.events_for_pattern("run")
        return not prior or e["value"] > prior[-1]["value"]

    p = Pattern.begin("run", rising).one_or_more().next("end", lambda e: False)
    # No completion possible (end never matches) — use the NFA directly to
    # check partial growth semantics instead.
    nodes = p._compile()
    assert p._has_iterative(nodes)
    events = [
        ({"value": v}, i, i * 10**9) for i, v in enumerate([1.0, 2.0, 1.5, 3.0])
    ]
    partials, matches, _ = p._scan(events)
    runs = sorted(tuple(x["ids"]) for x in partials if x["idx"] == 0)
    # relaxed loop contiguity: the (0,1) run skips the non-rising 1.5 and
    # extends through 3.0; 1.5 also seeds its own run.
    assert (0, 1, 3) in runs and (2, 3) in runs
    assert all(
        all(events[b][0]["value"] > events[a][0]["value"] for a, b in zip(r, r[1:]))
        for r in runs
    )


def test_with_timeouts_batch_emits_pruned_and_flushed(spark):
    df = _events(spark, [
        ("2024-01-01 00:00:00", "a"),   # times out: next event is past within
        ("2024-01-01 01:00:00", "a"),   # completes with event 3
        ("2024-01-01 01:05:00", "b"),
        ("2024-01-01 02:00:00", "a"),   # end-of-input flush → timed out
    ])
    p = (
        Pattern.begin("s1", lambda e: e["event_type"] == "a")
        .followed_by("s2", lambda e: e["event_type"] == "b")
        .within(600)
    )
    out = p.match_batch(df, ["user_id"], "ts", "event_id", with_timeouts=True)
    rows = {tuple(r["event_ids"]): r["timed_out"] for r in out.collect()}
    assert rows == {(0,): True, (1, 2): False, (3,): True}
    # without the flag the schema stays timeout-free and only matches emit
    plain = p.match_batch(df, ["user_id"], "ts", "event_id")
    assert "timed_out" not in plain.columns
    assert [tuple(r["event_ids"]) for r in plain.collect()] == [(1, 2)]


def test_within_boundary_is_strict(spark):
    # Reference NFA prunes at timestamp - start >= windowTime: a completing
    # event landing EXACTLY at start + within is a timeout, not a match.
    df = _events(spark, [
        ("2024-01-01 00:00:00", "a"),
        ("2024-01-01 00:10:00", "b"),   # exactly within=600s later
    ])
    p = (
        Pattern.begin("s1", lambda e: e["event_type"] == "a")
        .followed_by("s2", lambda e: e["event_type"] == "b")
        .within(600)
    )
    out = p.match_batch(df, ["user_id"], "ts", "event_id", with_timeouts=True)
    rows = {tuple(r["event_ids"]): r["timed_out"] for r in out.collect()}
    assert rows == {(0,): True}


def test_string_keys_match_batch(spark):
    data = [
        (0, datetime.fromisoformat("2024-01-01 00:00:00"), "u1", "a", 0.0),
        (1, datetime.fromisoformat("2024-01-01 00:01:00"), "u2", "a", 0.0),
        (2, datetime.fromisoformat("2024-01-01 00:02:00"), "u1", "b", 0.0),
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user string, event_type string, value double"
    )
    p = Pattern.begin("s1", lambda e: e["event_type"] == "a").followed_by(
        "s2", lambda e: e["event_type"] == "b"
    )
    out = p.match_batch(df, ["user"], "ts", "event_id").collect()
    assert [(r["user"], tuple(r["event_ids"])) for r in out] == [("u1", (0, 2))]


def test_string_keys_match_stream(spark, tmp_path):
    import shutil
    import tempfile

    staging = str(tmp_path / "cep_str_stream")
    schema = "event_id long, ts timestamp, user string, event_type string, value double"
    rows = [
        (0, datetime.fromisoformat("2024-01-01 00:00:00"), "u1", "a", 0.0),
        (1, datetime.fromisoformat("2024-01-01 00:01:00"), "u1", "b", 0.0),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(staging)
    stream = spark.readStream.schema(schema).parquet(staging)
    p = Pattern.begin("s1", lambda e: e["event_type"] == "a").followed_by(
        "s2", lambda e: e["event_type"] == "b"
    )
    out = p.match_stream(stream, ["user"], "ts", "event_id")
    results: list = []
    ckpt = tempfile.mkdtemp(prefix="ckpt_cep_str_")
    q = (
        out.writeStream.foreachBatch(lambda b, _: results.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)
    assert [(r["user"], tuple(r["event_ids"])) for r in results] == [("u1", (0, 1))]


def test_with_timeouts_stream_prunes_on_next_event(spark, tmp_path):
    import shutil
    import tempfile

    staging = str(tmp_path / "cep_to_stream")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    # batch 1: 'a' opens a partial; batch 2: an event 1h later prunes it.
    rows1 = [(0, datetime.fromisoformat("2024-01-01 00:00:00"), 1, "a", 0.0)]
    rows2 = [(1, datetime.fromisoformat("2024-01-01 01:00:00"), 1, "x", 0.0)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("overwrite").parquet(staging)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(staging)
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(staging)
    p = (
        Pattern.begin("s1", lambda e: e["event_type"] == "a")
        .followed_by("s2", lambda e: e["event_type"] == "b")
        .within(600)
    )
    out = p.match_stream(stream, ["user_id"], "ts", "event_id", with_timeouts=True)
    results: list = []
    ckpt = tempfile.mkdtemp(prefix="ckpt_cep_to_")
    q = (
        out.writeStream.foreachBatch(lambda b, _: results.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)
    assert [(tuple(r["event_ids"]), r["timed_out"]) for r in results] == [((0,), True)]


def test_iterative_state_survives_json_roundtrip(spark):
    """Partial-match state with carried event values must behave identically
    after a JSON round-trip (what applyInPandasWithState does per batch)."""
    import json as _json

    p = Pattern.begin("s", lambda e: e["event_type"] == "start").followed_by(
        "hi", lambda e, ctx: e["value"] > ctx.events_for_pattern("s")[0]["value"]
    )
    ev = lambda i, t, v: ({"event_type": t, "value": v}, i, i * 10**9)
    partials, m1, _ = p._scan([ev(0, "start", 10.0)])
    partials = _json.loads(_json.dumps(partials))
    _, m2, _ = p._scan([ev(1, "x", 12.0)], partials)
    assert not m1 and [tuple(m["ids"]) for m in m2] == [(0, 1)]


def test_default_arg_predicate_is_simple_condition(spark):
    """The state-binding idiom ``lambda e, t=10: ...`` must stay a SIMPLE
    condition — a bound default is not a ctx parameter."""
    from flink_1_3_2_hopsworks_spark.streaming.cep import _is_iterative

    assert not _is_iterative(lambda e, t=10.0: e["value"] > t)
    assert _is_iterative(lambda e, ctx: True)
    df = _events(spark, [
        ("2024-01-01 00:00:00", "a"),
        ("2024-01-01 00:01:00", "b"),
    ])
    p = Pattern.begin(
        "s1", lambda e, want="a": e["event_type"] == want
    ).followed_by("s2", lambda e: e["event_type"] == "b")
    assert _matches(df, p) == [(0, 1)]


def test_match_batch_key_spanning_arrow_batches(spark):
    """r12 plan change: match_batch scans whole Arrow batches via
    mapInPandas and must carry a key whose rows straddle an Arrow-batch
    boundary inside the task. Force tiny record batches so many keys
    span boundaries, pin ONE partition so every key rides the same task,
    and check the full match set against the per-key NFA run directly."""
    from datetime import datetime, timedelta

    t0 = datetime.fromisoformat("2024-01-01 00:00:00")
    data = []
    eid = 0
    for u in range(40):  # 3 rows per user -> one (a, b) match each
        for step, et in enumerate(["a", "c", "b"]):
            data.append((eid, t0 + timedelta(seconds=10 * step), u, et, 0.0))
            eid += 1
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    p = Pattern.begin("s1", lambda e: e["event_type"] == "a").followed_by(
        "s2", lambda e: e["event_type"] == "b"
    )
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        out = p.match_batch(df, ["user_id"], "ts", "event_id", num_partitions=1)
        got = sorted((r["user_id"], tuple(r["event_ids"])) for r in out.collect())
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    assert got == [(u, (3 * u, 3 * u + 2)) for u in range(40)]


def test_match_batch_keeps_null_key_groups(spark):
    """r13: pandas' groupby default dropna=True silently dropped null-key
    rows from match_batch while Spark's groupBy (the pre-r12 grouped form)
    kept them — match_batch must keep null-key groups too. One null-key
    user and one normal user, both with an (a, b) match."""
    data = [
        (0, datetime.fromisoformat("2024-01-01 00:00:00"), None, "a", 0.0),
        (1, datetime.fromisoformat("2024-01-01 00:01:00"), None, "b", 0.0),
        (2, datetime.fromisoformat("2024-01-01 00:02:00"), "u1", "a", 0.0),
        (3, datetime.fromisoformat("2024-01-01 00:03:00"), "u1", "b", 0.0),
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user string, event_type string, value double",
    )
    p = Pattern.begin("s1", lambda e: e["event_type"] == "a").followed_by(
        "s2", lambda e: e["event_type"] == "b"
    )
    out = p.match_batch(df, ["user"], "ts", "event_id").collect()
    got = sorted(
        ((r["user"], tuple(r["event_ids"])) for r in out),
        key=lambda t: (t[0] is not None, t[0]),
    )
    assert got == [(None, (0, 1)), ("u1", (2, 3))]
