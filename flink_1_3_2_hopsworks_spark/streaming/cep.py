"""CEP — pattern matching over event sequences (§2.11, flink-cep).

Reference parity: ``Pattern.begin("a").where(cond).next("b")/.followedBy("b")
.notNext/.notFollowedBy`` with quantifiers ``.times(n)/.oneOrMore()/
.optional()`` (quantifiers + not-patterns are the 1.3 additions), bounded by
``.within(time)`` — compiled to an NFA (flink-cep pattern/Pattern.java,
nfa/NFA.java, nfa/compiler/NFACompiler.java), applied per key via
``CEP.pattern(stream.keyBy(...), p)`` → PatternStream.select.

Semantics implemented (Flink 1.3 defaults):
  - ``next``            — strict contiguity: the very next event must match.
  - ``followed_by``     — relaxed contiguity: skip non-matching events; a
                          partial advances at the FIRST event matching the
                          step (skip-till-next-match).
  - ``not_next``        — the event immediately after the previous match
                          must NOT satisfy the predicate.
  - ``not_followed_by`` — no event between the previous match and the next
                          step's match may satisfy the predicate.
  - ``times(n)``        — exactly n occurrences; internal contiguity is
                          relaxed (the 1.3 default), entry contiguity is the
                          step's own.
  - ``one_or_more``     — 1+ occurrences, a match emitted at EVERY count
                          (all-matches semantics); internal contiguity
                          inherits the step's entry contiguity (next→strict
                          ≈ consecutive(), followedBy→relaxed).
  - ``optional``        — the step may be skipped.
  - ``within``          — time window from the first matched event; partial
                          matches exceeding it are pruned. With
                          ``with_timeouts=True`` the pruned partials are
                          EMITTED tagged ``timed_out=true`` (reference
                          PatternStream.select timeout-function overload,
                          flink-cep PatternStream.java) — one output schema,
                          filter on the flag to split, the same DAG-reuse
                          trick as window_op's late tag. Timeouts are
                          detected when the key's next event arrives
                          (micro-batch granularity), not on watermark
                          advance — divergence documented.
  - iterative conditions (reference cep IterativeCondition, 1.3): a
    predicate may take ``(event, ctx)`` — ``ctx.events_for_pattern(name)``
    returns the events already matched by step ``name`` in this partial, so
    "next price > first price" is expressible. Matched event values are
    then carried in partial-match state (JSON-sanitized: numpy scalars →
    python, timestamps → ns ints); single-arg predicates keep the compact
    ids/ts-only state.
  - every event may start a new partial match (all-matches — after-match
    skip strategies arrived post-1.3).
  - a pattern must end in a positive step (Flink likewise rejects trailing
    notFollowedBy; we also reject trailing notNext).

Spark-first mapping: no MATCH_RECOGNIZE in Spark SQL, so this is a custom
operator. Batch: ``applyInPandas`` per key over ts-sorted groups. Streaming:
the same incremental NFA inside ``applyInPandasWithState`` with the
partial-match set as keyed state (JSON — compact: step index + matched
ids/timestamps only, never full events).

Scale notes: one shuffle on the key; per-key work is sequential (inherent to
CEP — the reference serializes per key too). Skewed keys bound throughput;
``within`` pruning bounds state and the combinatorial fan-out of
``one_or_more`` all-matches (unbounded loops without ``within`` grow state —
same caveat as the reference NFA).
"""

from __future__ import annotations

import inspect
import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame

from flink_1_3_2_hopsworks_spark.streaming.keys import key_casters, key_fields_ddl

# 1-arg simple condition, or 2-arg iterative condition (event, ctx).
Predicate = Callable[..., bool]

_NS = 1_000_000_000


def _is_iterative(pred: Predicate) -> bool:
    """True when the predicate takes a second ``ctx`` parameter (reference
    IterativeCondition vs SimpleCondition).

    Only parameters WITHOUT defaults count: the common state-binding idiom
    ``lambda e, t=threshold: e["value"] > t`` is a simple condition — its
    second parameter must keep its bound default, not receive the ctx."""
    try:
        params = [
            p
            for p in inspect.signature(pred).parameters.values()
            if p.kind
            in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD, p.VAR_POSITIONAL)
        ]
    except (TypeError, ValueError):
        return False
    if any(p.kind == p.VAR_POSITIONAL for p in params):
        return True
    required = [p for p in params if p.default is p.empty]
    return len(required) >= 2


def _json_safe(ev: dict) -> dict:
    """Partial-state copy of an event: numpy scalars → python, timestamps →
    epoch-ns ints — identical whether the partial stayed in memory or
    round-tripped through JSON keyed state."""
    out = {}
    for k, v in ev.items():
        if isinstance(v, pd.Timestamp):
            out[k] = int(v.value)
        elif hasattr(v, "item"):
            out[k] = v.item()
        else:
            out[k] = v
    return out


class MatchContext:
    """Iterative-condition context (reference IterativeCondition.Context):
    exposes the events this partial match has already accepted, per step
    name. Values are the JSON-sanitized copies (see ``_json_safe``)."""

    __slots__ = ("_names", "_evs")

    def __init__(self, names: list[str], evs: list[dict]):
        self._names = names
        self._evs = evs

    def events_for_pattern(self, name: str) -> list[dict]:
        return [e for n, e in zip(self._names, self._evs) if n == name]

    # reference spelling
    get_events_for_pattern = events_for_pattern


_EMPTY_CTX = MatchContext([], [])


@dataclass
class _Step:
    name: str
    predicate: Predicate
    strict: bool  # entry contiguity: True = next, False = followedBy
    negated: bool = False
    times: int = 1
    loop: bool = False
    optional: bool = False


@dataclass
class _Node:
    """Compiled NFA node: one positive step occurrence + the negative
    constraints guarding its entry."""

    name: str
    predicate: Predicate
    strict: bool
    loop: bool
    optional: bool
    not_next_pred: Predicate | None = None
    not_followed_pred: Predicate | None = None
    # resolved at compile time so the hot loop never re-inspects signatures
    iterative: bool = False
    not_next_iterative: bool = False
    not_followed_iterative: bool = False


class Pattern:
    """Fluent pattern builder (reference flink-cep pattern/Pattern.java)."""

    def __init__(self, steps: list[_Step], within_seconds: float | None):
        self._steps = steps
        self._within = within_seconds

    @classmethod
    def begin(cls, name: str, predicate: Predicate) -> "Pattern":
        return cls([_Step(name, predicate, strict=False)], None)

    def next(self, name: str, predicate: Predicate) -> "Pattern":
        """Strict contiguity (reference Pattern#next)."""
        return Pattern([*self._steps, _Step(name, predicate, True)], self._within)

    def followed_by(self, name: str, predicate: Predicate) -> "Pattern":
        """Relaxed contiguity (reference Pattern#followedBy)."""
        return Pattern([*self._steps, _Step(name, predicate, False)], self._within)

    def not_next(self, name: str, predicate: Predicate) -> "Pattern":
        """Negative strict step (reference Pattern#notNext, 1.3): the very
        next event must not match."""
        return Pattern(
            [*self._steps, _Step(name, predicate, True, negated=True)], self._within
        )

    def not_followed_by(self, name: str, predicate: Predicate) -> "Pattern":
        """Negative relaxed step (reference Pattern#notFollowedBy, 1.3): no
        matching event before the following step matches."""
        return Pattern(
            [*self._steps, _Step(name, predicate, False, negated=True)], self._within
        )

    def times(self, n: int) -> "Pattern":
        """Exactly-n quantifier on the last step (reference Pattern#times,
        1.3)."""
        if n < 1:
            raise ValueError("times(n) requires n >= 1")
        return self._quantify(times=n)

    def one_or_more(self) -> "Pattern":
        """Kleene-plus quantifier on the last step (reference
        Pattern#oneOrMore, 1.3) — emits a match at every occurrence count."""
        return self._quantify(loop=True)

    def optional(self) -> "Pattern":
        """Zero-or-one quantifier on the last step (reference
        Pattern#optional, 1.3)."""
        return self._quantify(optional=True)

    def within(self, seconds: float) -> "Pattern":
        """Time bound from first to last matched event (reference
        Pattern#within)."""
        return Pattern(self._steps, float(seconds))

    def _quantify(self, **kwargs) -> "Pattern":
        last = self._steps[-1]
        if last.negated:
            raise ValueError("quantifiers cannot apply to not-patterns")
        fields = {
            "times": last.times,
            "loop": last.loop,
            "optional": last.optional,
            **kwargs,
        }
        amended = _Step(last.name, last.predicate, last.strict, False, **fields)
        return Pattern([*self._steps[:-1], amended], self._within)

    # -- compilation --------------------------------------------------------

    def _compile(self) -> list[_Node]:
        """Expand quantifiers and fold negative steps into the entry guards
        of the following positive step (reference NFACompiler)."""
        nodes: list[_Node] = []
        pending_not: _Step | None = None
        for step in self._steps:
            if step.negated:
                if pending_not is not None:
                    raise ValueError("consecutive not-patterns are not supported")
                pending_not = step
                continue
            for occurrence in range(step.times):
                node = _Node(
                    name=step.name,
                    predicate=step.predicate,
                    # times-expansion: entry contiguity on the first copy,
                    # relaxed between copies (1.3 default).
                    strict=step.strict if occurrence == 0 else False,
                    loop=step.loop,
                    optional=step.optional,
                )
                node.iterative = _is_iterative(step.predicate)
                if occurrence == 0 and pending_not is not None:
                    if pending_not.strict:
                        node.not_next_pred = pending_not.predicate
                        node.not_next_iterative = _is_iterative(pending_not.predicate)
                    else:
                        node.not_followed_pred = pending_not.predicate
                        node.not_followed_iterative = _is_iterative(
                            pending_not.predicate
                        )
                    pending_not = None
                nodes.append(node)
        if pending_not is not None:
            raise ValueError("a pattern cannot end with a not-pattern")
        if not nodes:
            raise ValueError("a pattern needs at least one positive step")
        return nodes

    @staticmethod
    def _has_iterative(nodes: list[_Node]) -> bool:
        """True when any condition is 2-arg — only then do partial matches
        carry full (sanitized) event values instead of the compact ids/ts
        state (keyed-state size O(len·payload) vs O(len))."""
        return any(
            n.iterative or n.not_next_iterative or n.not_followed_iterative
            for n in nodes
        )

    # -- matching -----------------------------------------------------------

    @staticmethod
    def _targets(nodes: list[_Node], idx: int) -> list[int]:
        """Node indices reachable from ``idx`` by skipping optional nodes
        (``len(nodes)`` = completion)."""
        out = [idx]
        while idx < len(nodes) and nodes[idx].optional:
            idx += 1
            out.append(idx)
        return out

    def _advance(
        self,
        nodes: list[_Node],
        partials: list[dict],
        ev: dict,
        ev_id: int,
        ev_ns: int,
        carry_evs: bool,
    ) -> tuple[list[dict], list[dict], list[dict]]:
        """One NFA transition: feed one event to all partial matches (and
        try starting new ones). Returns (surviving partials, completions,
        within-pruned partials).

        Partials are JSON-safe: {"idx", "fresh", "ids", "ts", "names"} —
        matched event ids + ns-timestamps. Only when the pattern uses an
        iterative condition (``carry_evs``) does each partial also carry
        ``evs``, the sanitized values of its matched events, so
        ``ctx.events_for_pattern`` works identically in-memory and across
        JSON keyed-state round-trips."""
        within_ns = None if self._within is None else int(self._within * _NS)
        nxt: list[dict] = []
        completed: list[dict] = []
        pruned: list[dict] = []
        safe_ev = _json_safe(ev) if carry_evs else None

        def on_match(from_idx: int, prev: dict | None) -> None:
            node = nodes[from_idx]
            base = prev or {"ids": [], "ts": [], "names": []}
            ids = [*base["ids"], ev_id]
            tss = [*base["ts"], ev_ns]
            names = [*base["names"], node.name]
            m: dict = {"ids": ids, "ts": tss, "names": names}
            if carry_evs:
                m["evs"] = [*base.get("evs", []), safe_ev]
            if node.loop:
                nxt.append({**m, "idx": from_idx, "fresh": True})
            for t in self._targets(nodes, from_idx + 1):
                if t == len(nodes):
                    completed.append(m)
                else:
                    nxt.append({**m, "idx": t, "fresh": True})

        def holds(pred: Predicate, iterative: bool, p: dict | None) -> bool:
            if not iterative:
                return bool(pred(ev))
            ctx = (
                MatchContext(p["names"], p.get("evs", [])) if p else _EMPTY_CTX
            )
            return bool(pred(ev, ctx))

        for p in partials:
            # Strict bound, matching the reference NFA's
            # ``timestamp - startTimestamp >= windowTime`` (flink-cep
            # nfa/NFA.java#isStateTimedOut): an event landing exactly at
            # start + within is a timeout, not a completion.
            if within_ns is not None and ev_ns - p["ts"][0] >= within_ns:
                pruned.append(p)  # timed out by within
                continue
            node = nodes[p["idx"]]
            if (
                node.not_next_pred is not None
                and p["fresh"]
                and holds(node.not_next_pred, node.not_next_iterative, p)
            ):
                continue  # killed by notNext guard
            if holds(node.predicate, node.iterative, p):
                on_match(p["idx"], p)
            elif node.strict:
                continue  # strict step broken by a non-matching event
            elif node.not_followed_pred is not None and holds(
                node.not_followed_pred, node.not_followed_iterative, p
            ):
                continue  # killed by notFollowedBy guard
            else:
                nxt.append({**p, "fresh": False})  # relaxed: keep waiting
        for t in self._targets(nodes, 0):
            if t < len(nodes) and holds(nodes[t].predicate, nodes[t].iterative, None):
                on_match(t, None)
        return nxt, completed, pruned

    def _scan(
        self,
        events: list[tuple[dict, int, int]],
        partials: list[dict] | None = None,
        flush_timeouts: bool = False,
    ) -> tuple[list[dict], list[dict], list[dict]]:
        """Run the NFA over ts-ordered (event, id, ts_ns) tuples starting
        from ``partials`` (empty for batch; keyed state when streaming).
        Returns (surviving partials, matches, timed-out partials).

        ``flush_timeouts`` emits every surviving partial of a ``within``
        pattern as timed out at end-of-input — the reference's bounded-input
        behavior, where the final MAX_WATERMARK prunes all pending matches
        (flink-cep AbstractKeyedCEPPatternOperator). Batch only; streaming
        keys detect timeouts when their next event arrives."""
        nodes = self._compile()
        carry_evs = self._has_iterative(nodes)
        partials = list(partials or [])
        matches: list[dict] = []
        timeouts: list[dict] = []
        for ev, ev_id, ev_ns in events:
            partials, completed, pruned = self._advance(
                nodes, partials, ev, ev_id, ev_ns, carry_evs
            )
            matches.extend(completed)
            timeouts.extend(pruned)
        if flush_timeouts and self._within is not None:
            timeouts.extend(partials)
            partials = []
        # a loop partial and its advanced copy share ids — emit one timeout
        seen: set[tuple] = set()
        unique: list[dict] = []
        for t in timeouts:
            sig = (tuple(t["ids"]), tuple(t["names"]))
            if sig not in seen:
                seen.add(sig)
                unique.append(t)
        return partials, matches, unique

    # -- DataFrame surfaces -------------------------------------------------

    _OUT_COLS = ("start_ts", "end_ts", "step_names", "event_ids")

    def _out_schema(
        self, df: DataFrame, key_cols: list[str], with_timeouts: bool
    ) -> str:
        schema = (
            f"{key_fields_ddl(df, key_cols)}, start_ts timestamp, "
            "end_ts timestamp, step_names array<string>, event_ids array<long>"
        )
        if with_timeouts:
            schema += ", timed_out boolean"
        return schema

    @staticmethod
    def _match_rows(
        matches: list[dict],
        key_vals: dict,
        timeouts: list[dict] | None = None,
    ) -> pd.DataFrame:
        def rows(ms: list[dict], flag: bool | None):
            for m in ms:
                r = {
                    **key_vals,
                    "start_ts": pd.Timestamp(m["ts"][0]),
                    "end_ts": pd.Timestamp(m["ts"][-1]),
                    "step_names": m["names"],
                    "event_ids": m["ids"],
                }
                if flag is not None:
                    r["timed_out"] = flag
                yield r

        if timeouts is None:
            return pd.DataFrame(list(rows(matches, None)))
        return pd.DataFrame(
            [*rows(matches, False), *rows(timeouts, True)]
        )

    @staticmethod
    def _to_events(
        pdf: pd.DataFrame, ts_col: str, id_col: str
    ) -> list[tuple[dict, int, int]]:
        pdf = pdf.sort_values([ts_col, id_col])
        return [
            (row, int(row[id_col]), int(pd.Timestamp(row[ts_col]).value))
            for row in pdf.to_dict("records")
        ]

    def match_batch(
        self,
        df: DataFrame,
        key_cols: list[str],
        ts_col: str = "ts",
        id_col: str = "event_id",
        num_partitions: int | None = None,
        with_timeouts: bool = False,
    ) -> DataFrame:
        """Batch CEP: per-key NFA scan via applyInPandas over sorted groups.

        Output: key cols, start_ts/end_ts, and per-matched-event
        ``step_names``/``event_ids`` arrays (aligned; quantified steps
        repeat their name per occurrence). With ``with_timeouts=True`` the
        output gains a ``timed_out`` flag and also carries every
        within-pruned partial match (including end-of-input flush — the
        reference's bounded-input MAX_WATERMARK behavior); filter on the
        flag to split the two streams from one DAG.

        ``num_partitions`` pins the key-hash partitioning feeding the NFA
        stage. The NFA is Python-bound, so per-task cost is CPU per row, not
        bytes — but AQE sizes the shuffle by BYTES and will happily coalesce
        a small-looking exchange down to one partition, serializing the
        whole Python stage. Pass the cluster's parallelism when the input is
        small relative to its NFA cost (defaults to the session shuffle
        partitioning).

        Plan shape (r12, guide §4): one key-hash repartition + per-partition
        sort feeding ``mapInPandas`` — whole Arrow batches cross the Python
        boundary and keys are split out with a pandas groupby, instead of
        ``groupBy().applyInPandas``'s one Python invocation per key (a
        many-small-keys corpus paid ~10⁴ per-group crossings for the same
        NFA work). Keys are contiguous after the sort; a key spanning two
        Arrow batches is carried over inside the task, so per-key semantics
        are identical to the grouped form.
        """
        schema = self._out_schema(df, key_cols, with_timeouts)
        # Key-locality contract for the batch-wise scan: every row of a key
        # in ONE task, contiguous after the partition-local sort.
        df = (
            df.repartition(num_partitions, *key_cols)
            if num_partitions
            else df.repartition(*key_cols)
        ).sortWithinPartitions(*key_cols, ts_col, id_col)

        def run_one(g: pd.DataFrame) -> pd.DataFrame | None:
            _, matches, timeouts = self._scan(
                self._to_events(g, ts_col, id_col),
                flush_timeouts=with_timeouts,
            )
            if not matches and not (with_timeouts and timeouts):
                return None
            keys = {k: g.iloc[0][k] for k in key_cols}
            return self._match_rows(
                matches, keys, timeouts if with_timeouts else None
            )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            pending: pd.DataFrame | None = None
            for pdf in batches:
                if pdf.empty:
                    continue
                if pending is not None:
                    pdf = pd.concat((pending, pdf), ignore_index=True)
                    pending = None
                # dropna=False: Spark's groupBy keeps null-key groups, so the
                # batch scan must too — pandas' default dropna=True would
                # silently drop every null-key row from the match output.
                groups = [
                    g for _, g in pdf.groupby(key_cols, sort=False, dropna=False)
                ]
                # The batch's last key may continue in the next Arrow batch.
                pending = groups.pop()
                out = [r for g in groups if (r := run_one(g)) is not None]
                if out:
                    yield pd.concat(out, ignore_index=True)
            if pending is not None and (last := run_one(pending)) is not None:
                yield last

        return df.mapInPandas(run, schema)

    def match_stream(
        self,
        df: DataFrame,
        key_cols: list[str],
        ts_col: str = "ts",
        id_col: str = "event_id",
        with_timeouts: bool = False,
    ) -> DataFrame:
        """Streaming CEP (reference AbstractKeyedCEPPatternOperator): the
        incremental NFA runs per micro-batch with the partial-match set in
        keyed state; completed matches are appended as they occur.

        Records are consumed in (ts, id) order within each micro-batch and
        in arrival order across batches (apply a watermark + window upstream
        if cross-batch event-time order matters). ``with_timeouts=True``
        appends within-pruned partials as ``timed_out=true`` rows; a key's
        timeouts surface when its next event arrives (micro-batch
        granularity, documented divergence from watermark-driven pruning).
        """
        schema = self._out_schema(df, key_cols, with_timeouts)
        casters = key_casters(df, key_cols)

        def process(key, pdf_iter, state):
            partials = json.loads(state.get[0]) if state.exists else []
            matches: list[dict] = []
            timeouts: list[dict] = []
            # Concatenate the key's whole micro-batch before sorting —
            # per-chunk scans would leak Arrow-chunk arrival order into the
            # NFA for keys spanning multiple record batches.
            chunks = list(pdf_iter)
            if chunks:
                pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
                partials, matches, timeouts = self._scan(
                    self._to_events(pdf, ts_col, id_col), partials
                )
            state.update((json.dumps(partials),))
            if matches or (with_timeouts and timeouts):
                key_vals = dict(
                    zip(key_cols, (c(k) for c, k in zip(casters, key)))
                )
                yield self._match_rows(
                    matches, key_vals, timeouts if with_timeouts else None
                )

        return df.groupBy(*key_cols).applyInPandasWithState(
            process,
            outputStructType=schema,
            stateStructType="partials string",
            outputMode="append",
            timeoutConf="NoTimeout",
        )
