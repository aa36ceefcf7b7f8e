"""Streaming corpus dedup: keep-first exact dedup across micro-batches.

A training-data ingest stream wants the batch :func:`~kg_obo_spark.operators
.dedup.dedup_exact` semantics applied continuously: the first document with
a given normalized-content fingerprint is admitted, every later arrival is
dropped — across micro-batch boundaries, surviving restarts through the
checkpointed state store.

``applyInPandasWithState`` keyed by the fingerprint holds one tiny state
row (the admitted id) per DISTINCT document ever seen. State therefore
grows with the distinct corpus, not the stream: right for bounded/rolling
corpora (and the standard shape — Structured Streaming's own
dropDuplicates keeps the same per-key state). For an unbounded multi-tenant
firehose, the durable-registry pattern (streaming/canonical.py: delta
commits against a compacted TableIO snapshot) is the scale path; this
operator is the low-latency in-store variant.

ARRIVAL-ORDER CAVEAT (r6 review): "keep-FIRST" on a stream means first
ARRIVAL. The admitted set equals the batch operator's min-id keepers only
when documents arrive in id order; an out-of-order source that delivers a
smaller id after a larger same-fingerprint id has already been admitted
gets a silently different keeper under the default mode. Two explicit
choices (both pinned by tests/test_streaming_dedup.py):

- ``corrections=False`` (default): first arrival wins, later smaller ids
  are dropped like any duplicate. Deterministic per arrival order.
- ``corrections=True``: the state remembers the admitted id; when a
  SMALLER id for an already-claimed fingerprint arrives later, a
  correction row is emitted (``is_correction = true``) and the state
  re-points. Folding the output to the LAST emission per fingerprint
  yields exactly the batch min-id keepers regardless of arrival order —
  the retraction-style contract for consumers that must converge to the
  batch result.

Within one micro-batch, ties (several same-fingerprint docs in one trigger)
admit the smallest id — the batch operator's min-id rule — so the admitted
set is deterministic for a deterministic batch order.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kg_obo_spark.functions.text import fingerprint_md5


def _make_admit_fn(id_col: str):
    def _admit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            # fingerprint already admitted in an earlier batch: drop all
            for _ in pdfs:
                pass
            return
        best = None
        for pdf in pdfs:
            m = pdf[id_col].min()
            best = m if best is None else min(best, m)
        state.update((True,))
        if best is not None:
            yield pd.DataFrame({id_col: [best], "fingerprint": [key[0]]})

    return _admit


def _make_correcting_admit_fn(id_col: str):
    def _admit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        best = None
        for pdf in pdfs:
            m = pdf[id_col].min()
            best = m if best is None else min(best, m)
        if best is None:
            return
        if state.exists:
            (admitted,) = state.get
            if best >= admitted:
                return  # plain duplicate: drop
            state.update((best,))
            yield pd.DataFrame(
                {
                    id_col: [best],
                    "fingerprint": [key[0]],
                    "is_correction": [True],
                }
            )
        else:
            state.update((best,))
            yield pd.DataFrame(
                {
                    id_col: [best],
                    "fingerprint": [key[0]],
                    "is_correction": [False],
                }
            )

    return _admit


def stream_dedup_exact(
    doc_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    corrections: bool = False,
) -> DataFrame:
    """Admit (``id_col``, ``fingerprint``) for the first document carrying
    each normalized fingerprint; drop every later duplicate, across
    micro-batches.

    Equals the batch keep-first
    :func:`~kg_obo_spark.operators.dedup.dedup_exact` when batches arrive
    in id order. For OUT-OF-ORDER sources the default keeps the first
    ARRIVAL (a different keeper than batch — see the module docstring);
    pass ``corrections=True`` to additionally emit ``is_correction`` rows
    whenever a smaller id re-points an already-claimed fingerprint, so the
    last emission per fingerprint always equals the batch min-id keeper.
    Both behaviors pinned by tests/test_streaming_dedup.py."""
    id_type = doc_stream.schema[id_col].dataType.simpleString()
    keyed = doc_stream.select(
        F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fingerprint")
    )
    if corrections:
        return keyed.groupBy("fingerprint").applyInPandasWithState(
            _make_correcting_admit_fn(id_col),
            outputStructType=(
                f"{id_col} {id_type}, fingerprint string, is_correction boolean"
            ),
            stateStructType=f"admitted {id_type}",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _make_admit_fn(id_col),
        outputStructType=f"{id_col} {id_type}, fingerprint string",
        stateStructType="claimed boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
