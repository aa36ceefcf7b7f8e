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
from pyspark.sql import functions as F
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


SFT_OUTPUT_SCHEMA = (
    "conv_id long, turn_idx int, context string, response string, "
    "n_context_turns long"
)
SFT_STATE_SCHEMA = (
    "emitted_upto int, "
    "turns array<struct<turn_idx:int, role:string, text:string>>"
)


def _make_sft_fn(idle_timeout_ms: int, sep: str):
    def _sft(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            emitted_upto, turns = state.get
            buf = {t[0]: (t[1], t[2]) for t in turns}
        else:
            emitted_upto = -1
            buf = {}
        for pdf in pdfs:
            for ti, role, text in zip(pdf["turn_idx"], pdf["role"], pdf["text"]):
                ti = int(ti)
                if ti not in buf:  # first arrival per turn wins (replays)
                    buf[ti] = (role, text)
        # longest contiguous prefix 0..prefix_max all present
        prefix_max = -1
        while (prefix_max + 1) in buf:
            prefix_max += 1
        out_rows = []
        for i in range(emitted_upto + 1, prefix_max + 1):
            role, text = buf[i]
            if role == "assistant" and i >= 1:
                lines = [f"{buf[j][0]}: {buf[j][1]}" for j in range(i)]
                out_rows.append((key[0], i, sep.join(lines), text, i))
        state.update(
            (
                prefix_max,
                [(ti, r, x) for ti, (r, x) in sorted(buf.items())],
            )
        )
        if idle_timeout_ms > 0:
            state.setTimeoutDuration(idle_timeout_ms)
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "conv_id", "turn_idx", "context", "response",
                    "n_context_turns",
                ],
            )

    return _sft


def stream_sft_examples(
    tr_stream: DataFrame, idle_timeout_ms: int = 0, sep: str = "\n"
) -> DataFrame:
    """Streaming SFT example assembly: emits each (context, response)
    example exactly once, as soon as the conversation's CONTIGUOUS turn
    prefix reaches that assistant turn — so the emitted set equals the
    batch :func:`~kg_obo_spark.operators.conversations.sft_examples` on ANY
    arrival order and ANY batching (out-of-order turns are buffered in
    state until the gap fills; duplicate deliveries of a turn_idx are
    dropped first-arrival, making the operator replay-tolerant).

    State per active conversation: the received turns (bounded by
    conversation length — prior turns must be retained verbatim because
    they are future contexts) plus the emitted watermark. Same idle-reaping
    trade-off as the rollup above.
    """
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        tr_stream.select("conv_id", "turn_idx", "role", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_sft_fn(idle_timeout_ms, sep),
            outputStructType=SFT_OUTPUT_SCHEMA,
            stateStructType=SFT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )


SFT_BOUNDED_OUTPUT_SCHEMA = (
    "conv_id long, turn_idx int, context string, response string, "
    "n_context_turns long, is_partial boolean, is_correction boolean"
)
SFT_BOUNDED_STATE_SCHEMA = (
    "emitted_upto int, stalled_for int, "
    "turns array<struct<turn_idx:int, role:string, text:string>>, "
    "partial array<struct<turn_idx:int, n_ctx:int>>"
)

GAP_MARKER = "[turn {j} missing]"


def _make_sft_bounded_fn(gap_wait_batches: int, sep: str):
    def _render(buf, i):
        """Context for assistant turn i from the PRESENT prior turns, with a
        gap marker standing in for each missing position."""
        lines, n_present = [], 0
        for j in range(i):
            if j in buf:
                lines.append(f"{buf[j][0]}: {buf[j][1]}")
                n_present += 1
            else:
                lines.append(GAP_MARKER.format(j=j))
        return sep.join(lines), n_present

    def _sft(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            emitted_upto, stalled_for, turns, partial = state.get
            buf = {t[0]: (t[1], t[2]) for t in turns}
            partial_map = {p[0]: p[1] for p in partial}
        else:
            emitted_upto, stalled_for = -1, 0
            buf, partial_map = {}, {}
        for pdf in pdfs:
            for ti, role, text in zip(pdf["turn_idx"], pdf["role"], pdf["text"]):
                ti = int(ti)
                if ti not in buf:  # first arrival per turn wins (replays)
                    buf[ti] = (role, text)
        out_rows = []
        # 1) finalize the contiguous prefix — corrections for turns that
        #    previously went out partial
        prefix_max = -1
        while (prefix_max + 1) in buf:
            prefix_max += 1
        for i in range(emitted_upto + 1, prefix_max + 1):
            role, text = buf[i]
            if role == "assistant" and i >= 1:
                lines = [f"{buf[j][0]}: {buf[j][1]}" for j in range(i)]
                out_rows.append(
                    (key[0], i, sep.join(lines), text, i,
                     False, i in partial_map)
                )
            partial_map.pop(i, None)
        emitted_upto = prefix_max
        # 2) stall accounting: blocked = buffered assistant turns past the gap
        blocked = sorted(
            i for i, (role, _t) in buf.items()
            if i > emitted_upto + 1 and role == "assistant" and i >= 1
        )
        if blocked:
            stalled_for += 1
        else:
            stalled_for = 0
        # 3) bounded wait exhausted: flush gap-marked partial contexts; a
        #    turn re-flushes only when MORE of its context has since arrived
        if blocked and gap_wait_batches > 0 and stalled_for >= gap_wait_batches:
            for i in blocked:
                ctx, n_present = _render(buf, i)
                if partial_map.get(i, -1) < n_present:
                    out_rows.append(
                        (key[0], i, ctx, buf[i][1], n_present, True, False)
                    )
                    partial_map[i] = n_present
            stalled_for = 0
        state.update(
            (
                emitted_upto,
                stalled_for,
                [(ti, r, x) for ti, (r, x) in sorted(buf.items())],
                sorted(partial_map.items()),
            )
        )
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "conv_id", "turn_idx", "context", "response",
                    "n_context_turns", "is_partial", "is_correction",
                ],
            )

    return _sft


def stream_sft_examples_bounded(
    tr_stream: DataFrame, gap_wait_batches: int = 0, sep: str = "\n"
) -> DataFrame:
    """Streaming SFT assembly with a BOUNDED out-of-order wait (ROADMAP #8).

    :func:`stream_sft_examples`' contiguous-prefix rule waits forever for a
    missing turn — correct, but a dropped upstream message stalls every
    later example of that conversation. This variant waits at most
    ``gap_wait_batches`` consecutive micro-batch deliveries for the
    conversation while examples sit blocked behind a gap, then flushes them
    as PARTIAL rows (``is_partial=true``): the context renders the present
    prior turns in position with an explicit ``[turn j missing]`` marker per
    absent slot, and ``n_context_turns`` counts only present turns.

    Correction semantics (the spec the roadmap asked for first):

    - A partial example re-emits (still partial) only when MORE of its
      context has arrived since its last flush — never duplicate rows.
    - When the gap finally fills, the turn finalizes with the complete batch
      context and ``is_correction=true``; the contiguous watermark only ever
      advances over finalized turns, so exactly one final row exists per
      example.
    - Therefore the LAST emission per (conv_id, turn_idx) equals the batch
      :func:`~kg_obo_spark.operators.conversations.sft_examples` row
      whenever every turn eventually arrives, on ANY order — and a consumer
      that filters ``is_partial`` sees exactly the never-resolved gaps.

    ``gap_wait_batches=0`` disables flushing (pure contiguous-prefix
    behavior, just with the two extra constant-false columns). The wait is
    counted in per-conversation micro-batch deliveries, not wall-clock —
    deterministic under replay, which a ProcessingTimeTimeout-based wait is
    not (a replayed stream re-fires timers at different wall times)."""
    return (
        tr_stream.select("conv_id", "turn_idx", "role", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_sft_bounded_fn(gap_wait_batches, sep),
            outputStructType=SFT_BOUNDED_OUTPUT_SCHEMA,
            stateStructType=SFT_BOUNDED_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


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


EMB_OUTPUT_SCHEMA = "conv_id long, n_turns long, cemb array<double>"
EMB_STATE_SCHEMA = (
    "done boolean, vecs array<struct<i:long, v:array<float>>>"
)


def _make_emb_fn(turns_per_conv: int):
    def _emb(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            done, vecs = state.get
            buf = {t[0]: t[1] for t in vecs}
        else:
            done, buf = False, {}
        for pdf in pdfs:
            for vid, vec in zip(pdf["vec_id"], pdf["embedding"]):
                vid = int(vid)
                if vid not in buf:  # first arrival per turn wins (replays)
                    # plain python floats: numpy scalars don't survive the
                    # state-row pickle into the JVM
                    buf[vid] = [float(x) for x in vec]
        if not done and len(buf) >= turns_per_conv:
            # pool in vec_id order — the batch operator's pinned LEFT-FOLD
            # association, so streamed doubles equal batch doubles bitwise
            ordered = [buf[i] for i in sorted(buf)][:turns_per_conv]
            acc = [float(x) for x in ordered[0]]
            for vec in ordered[1:]:
                acc = [a + float(b) for a, b in zip(acc, vec)]
            n = len(ordered)
            done = True
            state.update((True, sorted(buf.items())))
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": [n],
                    "cemb": [[a / n for a in acc]],
                }
            )
            return
        state.update((done, sorted(buf.items())))

    return _emb


def stream_conversation_embeddings(
    emb_stream: DataFrame,
    turns_per_conv: int = 4,
) -> DataFrame:
    """Streaming mean-pooled conversation embeddings: emits each
    conversation's pooled vector EXACTLY ONCE, as soon as all
    ``turns_per_conv`` turn vectors have arrived — the continuous feed for
    downstream semantic indexing (near-dup blocking, topic assignment).
    Input columns: (vec_id, embedding) with conv = vec_id // turns_per_conv
    (the batch operator's keying).

    Out-of-order turn vectors are buffered in state (bounded by
    turns_per_conv); duplicate deliveries are dropped first-arrival
    (replay-tolerant). The pooled sum folds in vec_id order — the SAME
    association order as the batch
    :func:`~kg_obo_spark.operators.conversations.conversation_embeddings` —
    so the streamed doubles equal the batch doubles BITWISE on any arrival
    order (pinned by tests). Incomplete conversations never emit (the batch
    near-dup/clustering consumers filter them too); topic labels stream by
    stream-static joining the emitted pooled rows against fixed centroids
    (:func:`~kg_obo_spark.operators.similarity.ivf_assign` works unchanged
    on the streaming frame — broadcast nested-loop against one literal
    centroid row, no stateful plan)."""
    conv = F.expr(f"vec_id div {int(turns_per_conv)}").alias("conv_id")
    return (
        emb_stream.select(conv, "vec_id", "embedding")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_emb_fn(turns_per_conv),
            outputStructType=EMB_OUTPUT_SCHEMA,
            stateStructType=EMB_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
