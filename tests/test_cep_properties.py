"""Property-based tests for the CEP NFA (streaming/cep.py) — pure Python,
no Spark session: hypothesis drives the same ``_scan``/``_advance`` kernel
that both ``match_batch`` (applyInPandas) and ``match_stream``
(applyInPandasWithState) execute per key.

Three properties:
1. **Chunk-resume equivalence** — feeding the event sequence in arbitrary
   chunks, carrying partial-match state across chunk boundaries, must emit
   exactly the matches of a single scan. This is the micro-batch/checkpoint
   resume contract of the streaming path (reference: NFA state snapshot in
   AbstractKeyedCEPPatternOperator).
2. **Well-formedness** — every emitted match has increasing event ids,
   non-decreasing timestamps, per-step predicate satisfaction, and honors
   ``within``.
3. **Greedy-chain oracle** — for quantifier-free next/followedBy chains,
   matches must equal a brute-force skip-till-next-match enumerator.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_1_3_2_hopsworks_spark.streaming.cep import Pattern

# -- predicate pool (named so failures shrink readably) ----------------------

PREDICATES = {
    "even": lambda e: e["v"] % 2 == 0,
    "odd": lambda e: e["v"] % 2 == 1,
    "big": lambda e: e["v"] > 5,
    "small": lambda e: e["v"] < 4,
    "div3": lambda e: e["v"] % 3 == 0,
}
PRED_NAMES = sorted(PREDICATES)


def events_strategy(max_len: int = 24):
    return st.lists(
        st.integers(min_value=0, max_value=9), min_size=0, max_size=max_len
    ).map(
        lambda vs: [
            ({"v": v}, i, (i + 1) * 1_000_000_000) for i, v in enumerate(vs)
        ]
    )


@st.composite
def chain_patterns(draw, with_quantifiers: bool):
    """A begin + 0..3 further steps; quantifiers/negations optional."""
    n_steps = draw(st.integers(min_value=1, max_value=4))
    p = Pattern.begin("s0", PREDICATES[draw(st.sampled_from(PRED_NAMES))])
    prev_negative = False
    for i in range(1, n_steps):
        kinds = ["next", "followed_by"]
        if with_quantifiers and not prev_negative:
            kinds += ["not_next", "not_followed_by"]  # consecutive nots invalid
        kind = draw(st.sampled_from(kinds))
        pred = PREDICATES[draw(st.sampled_from(PRED_NAMES))]
        p = getattr(p, kind)(f"s{i}", pred)
        prev_negative = kind.startswith("not_")
        if with_quantifiers and not prev_negative:
            q = draw(st.sampled_from(["none", "none", "times2", "one_or_more", "optional"]))
            if q == "times2":
                p = p.times(2)
            elif q == "one_or_more":
                p = p.one_or_more()
            elif q == "optional":
                p = p.optional()
    # pattern must end in a positive step (library enforces this at compile)
    if p._steps[-1].negated:
        p = p.followed_by(f"s{n_steps}", PREDICATES["even"])
    if draw(st.booleans()):
        p = p.within(draw(st.sampled_from([3.5, 10.0, 100.0])))
    return p


def _canon(matches):
    return sorted((tuple(m["ids"]), tuple(m["names"])) for m in matches)


@settings(max_examples=120, deadline=None)
@given(events=events_strategy(), data=st.data())
def test_chunked_scan_equals_oneshot(events, data):
    pattern = data.draw(chain_patterns(with_quantifiers=True))
    _, oneshot, _ = pattern._scan(events)

    # split into random contiguous chunks, carrying state across boundaries
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(events)), max_size=4
            )
        )
    )
    bounds = [0, *cuts, len(events)]
    partials, collected = None, []
    for lo, hi in zip(bounds, bounds[1:]):
        partials, matches, _ = pattern._scan(events[lo:hi], partials)
        collected.extend(matches)
    assert _canon(collected) == _canon(oneshot)


@settings(max_examples=120, deadline=None)
@given(events=events_strategy(), data=st.data())
def test_matches_are_well_formed(events, data):
    pattern = data.draw(chain_patterns(with_quantifiers=True))
    _, matches, _ = pattern._scan(events)
    by_id = {i: ev for ev, i, _ in events}
    pred_of = {s.name: s.predicate for s in pattern._steps}
    within_ns = None if pattern._within is None else int(pattern._within * 1e9)
    for m in matches:
        assert m["ids"] == sorted(set(m["ids"])), "ids strictly increase"
        assert m["ts"] == sorted(m["ts"]), "timestamps non-decreasing"
        if within_ns is not None:
            # Strict bound (reference NFA prunes at >= windowTime).
            assert m["ts"][-1] - m["ts"][0] < within_ns, "within honored"
        for ev_id, name in zip(m["ids"], m["names"]):
            assert pred_of[name](by_id[ev_id]), f"step {name} predicate"


def _greedy_oracle(events, steps):
    """Brute-force skip-till-next-match for quantifier-free chains:
    every event may start a match; each later step takes the FIRST
    satisfying event (adjacent event for strict steps)."""
    out = []
    for start in range(len(events)):
        ev, ev_id, _ = events[start]
        if not steps[0][1](ev):
            continue
        ids, pos, ok = [ev_id], start, True
        for kind, pred, name in steps[1:]:
            if kind == "next":
                nxt = pos + 1
                if nxt >= len(events) or not pred(events[nxt][0]):
                    ok = False
                    break
                ids.append(events[nxt][1])
                pos = nxt
            else:  # followed_by: first match strictly after pos
                for j in range(pos + 1, len(events)):
                    if pred(events[j][0]):
                        ids.append(events[j][1])
                        pos = j
                        break
                else:
                    ok = False
                    break
        if ok:
            out.append(tuple(ids))
    return sorted(out)


@settings(max_examples=120, deadline=None)
@given(events=events_strategy(), data=st.data())
def test_plain_chains_match_greedy_oracle(events, data):
    n_steps = data.draw(st.integers(min_value=1, max_value=4))
    steps = [("begin", PREDICATES[data.draw(st.sampled_from(PRED_NAMES))], "s0")]
    p = Pattern.begin("s0", steps[0][1])
    for i in range(1, n_steps):
        kind = data.draw(st.sampled_from(["next", "followed_by"]))
        pred = PREDICATES[data.draw(st.sampled_from(PRED_NAMES))]
        steps.append((kind, pred, f"s{i}"))
        p = getattr(p, kind)(f"s{i}", pred)
    _, matches, _ = p._scan(events)
    assert sorted(tuple(m["ids"]) for m in matches) == _greedy_oracle(events, steps)


ITERATIVE_PREDICATES = {
    "gt_first": lambda e, ctx: (
        not ctx.events_for_pattern("s0") or e["v"] > ctx.events_for_pattern("s0")[0]["v"]
    ),
    "ne_last": lambda e, ctx: (
        not ctx.events_for_pattern("s0") or e["v"] != ctx.events_for_pattern("s0")[-1]["v"]
    ),
}


@settings(max_examples=80, deadline=None)
@given(events=events_strategy(), data=st.data())
def test_iterative_chunked_scan_equals_oneshot(events, data):
    """Chunk-resume equivalence must hold when partials carry event values
    for iterative conditions (the JSON keyed-state round-trip path)."""
    import json

    first = PREDICATES[data.draw(st.sampled_from(PRED_NAMES))]
    second = ITERATIVE_PREDICATES[
        data.draw(st.sampled_from(sorted(ITERATIVE_PREDICATES)))
    ]
    p = Pattern.begin("s0", first).followed_by("s1", second)
    if data.draw(st.booleans()):
        p = p.within(data.draw(st.sampled_from([3.5, 10.0])))
    _, oneshot, _ = p._scan(events)

    cuts = sorted(
        data.draw(st.lists(st.integers(min_value=0, max_value=len(events)), max_size=4))
    )
    bounds = [0, *cuts, len(events)]
    partials, collected = None, []
    for lo, hi in zip(bounds, bounds[1:]):
        partials, matches, _ = p._scan(events[lo:hi], partials)
        partials = json.loads(json.dumps(partials))  # keyed-state round-trip
        collected.extend(matches)
    assert _canon(collected) == _canon(oneshot)


@settings(max_examples=80, deadline=None)
@given(events=events_strategy(), data=st.data())
def test_timeout_chunked_scan_equals_oneshot(events, data):
    """Within-pruned partials must be identical whether the scan runs in one
    shot or in chunks with state carried across (streaming timeout path);
    end-of-input flush applies only to the final chunk."""
    pattern = data.draw(chain_patterns(with_quantifiers=False)).within(
        data.draw(st.sampled_from([2.5, 5.0, 10.0]))
    )
    _, oneshot_m, oneshot_t = pattern._scan(events, flush_timeouts=True)

    cuts = sorted(
        data.draw(st.lists(st.integers(min_value=0, max_value=len(events)), max_size=3))
    )
    bounds = [0, *cuts, len(events)]
    partials, matches, timeouts = None, [], []
    for i, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        last = i == len(bounds) - 2
        partials, m, t = pattern._scan(
            events[lo:hi], partials, flush_timeouts=last
        )
        matches.extend(m)
        timeouts.extend(t)
    assert _canon(matches) == _canon(oneshot_m)
    assert _canon(timeouts) == _canon(oneshot_t)
