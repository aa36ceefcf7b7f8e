"""Streaming conversation rollups: conversation_stats maintained
incrementally as transcript turns arrive.

The north-star input is a continuously-growing transcript table; the batch
rollup (operators/conversations.py conversation_stats) recomputes the whole
corpus, while this operator keeps one small state tuple per ACTIVE
conversation (8 integers) and re-emits a conversation's updated rollup row in
every micro-batch that touches it — so downstream consumers (curation
dashboards, per-conversation quality gates) see fresh totals without a
corpus rescan. Last emission per conv_id == the batch rollup over everything
that has arrived, on ANY arrival order and ANY batching (additions are
commutative; min/max absorb reordering) — pinned by
tests/test_streaming_conversations.py.

State is bounded by the number of active conversations, with the same idle
reaping trade-off as streaming/stateful.py: a reaped conversation that
resumes later restarts its rollup from zero (document the gap or keep
``idle_timeout_ms=0`` when conversations are short-lived).

Token counting uses :func:`~kg_obo_spark.functions.text.py_tokens` — the
Java ``\\s+`` ASCII model — so streamed totals equal the batch operator's
JVM-side ``tokens()`` counts byte-for-byte (the r6 ADVICE token-model rule
for every Python stage).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kg_obo_spark.functions.text import py_tokens

OUTPUT_SCHEMA = (
    "conv_id long, n_turns long, n_user long, n_assistant long, "
    "n_tool_calls long, total_tokens long, assistant_tokens long, "
    "duration_s long"
)
STATE_SCHEMA = (
    "n_turns long, n_user long, n_assistant long, n_tool_calls long, "
    "total_tokens long, assistant_tokens long, min_ts long, max_ts long"
)


def _make_rollup_fn(idle_timeout_ms: int):
    def _rollup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            (n_turns, n_user, n_assistant, n_tool, total_tok, asst_tok,
             min_ts, max_ts) = state.get
        else:
            n_turns = n_user = n_assistant = n_tool = 0
            total_tok = asst_tok = 0
            min_ts = max_ts = None
        for pdf in pdfs:
            for role, tool, ts_s, text in zip(
                pdf["role"], pdf["tool"], pdf["ts_s"], pdf["text"]
            ):
                n_tok = len(py_tokens(text))
                n_turns += 1
                if role == "user":
                    n_user += 1
                elif role == "assistant":
                    n_assistant += 1
                    asst_tok += n_tok
                if tool is not None and not pd.isna(tool):
                    n_tool += 1
                total_tok += n_tok
                ts = int(ts_s)
                min_ts = ts if min_ts is None else min(min_ts, ts)
                max_ts = ts if max_ts is None else max(max_ts, ts)
        state.update(
            (n_turns, n_user, n_assistant, n_tool, total_tok, asst_tok,
             min_ts, max_ts)
        )
        if idle_timeout_ms > 0:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "n_turns": [n_turns],
                "n_user": [n_user],
                "n_assistant": [n_assistant],
                "n_tool_calls": [n_tool],
                "total_tokens": [total_tok],
                "assistant_tokens": [asst_tok],
                "duration_s": [max_ts - min_ts],
            }
        )

    return _rollup


def stream_conversation_stats(
    tr_stream: DataFrame, idle_timeout_ms: int = 0
) -> DataFrame:
    """Per-conversation rollup rows, re-emitted (updated) in every
    micro-batch that touches the conversation. Input columns:
    (conv_id, turn_idx, role, tool, ts_s, text) — the batch operator's
    transcript schema. ``idle_timeout_ms=0`` disables state reaping
    (GroupStateTimeout.NoTimeout — required for processAllAvailable-based
    equivalence tests; see streaming/stateful.py's note)."""
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        tr_stream.select("conv_id", "role", "tool", "ts_s", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_rollup_fn(idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )
