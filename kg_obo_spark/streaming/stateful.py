"""Custom stateful streaming operator: incremental entity discovery.

``first_seen_terms`` keeps a per-conversation registry of term_ids already
emitted (GroupState) and outputs only NEW (conv_id, term_id) pairs per
micro-batch — cross-batch dedup, the streaming analog of the incremental
skip-if-done semantics (tracking anti-join) at row granularity. This is the
``applyInPandasWithState`` surface from SURVEY §2.7's guidance ("custom
stateful operators").

State stays bounded two ways: per active conversation it is capped by the
dictionary size, and idle conversations are reaped by a ProcessingTimeTimeout
(``idle_timeout_ms``) — on expiry the registry is dropped, so a conversation
that resumes later re-emits its terms (at-least-once semantics on very long
gaps, the standard state-store trade-off).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "conv_id string, term_id string"
STATE_SCHEMA = "seen array<string>"

DEFAULT_IDLE_TIMEOUT_MS = 30 * 60 * 1000  # reap conversations idle > 30 min


def _make_dedup_fn(idle_timeout_ms: int):
    def _dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen: set[str] = set(state.get[0]) if state.exists else set()
        new_terms: list[str] = []
        for pdf in pdfs:
            for t in pdf["term_id"]:
                if t not in seen:
                    seen.add(t)
                    new_terms.append(t)
        state.update((sorted(seen),))
        if idle_timeout_ms > 0:
            # re-arm the idle clock on every batch that touches this key
            state.setTimeoutDuration(idle_timeout_ms)
        if new_terms:
            yield pd.DataFrame(
                {"conv_id": [key[0]] * len(new_terms), "term_id": new_terms}
            )

    return _dedup_fn


def first_seen_terms(
    mention_stream: DataFrame, idle_timeout_ms: int = DEFAULT_IDLE_TIMEOUT_MS
) -> DataFrame:
    """(conv_id, term_id) rows the first time each term appears in each
    conversation, across micro-batches. Conversations idle longer than
    ``idle_timeout_ms`` of processing time have their registry reaped
    (state.hasTimedOut -> remove), bounding total state on long streams.

    ``idle_timeout_ms=0`` disables reaping (GroupStateTimeout.NoTimeout).
    Note for tests/tools: with a timeout configured the engine keeps running
    empty micro-batches to fire timers, so ``processAllAvailable()`` never
    returns — poll the sink with a deadline instead (see
    tests/test_streaming_stateful.py)."""
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        mention_stream.select("conv_id", "term_id")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_dedup_fn(idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )
