"""Streaming KG negative sampling: corrupted-triple negatives generated
continuously as new positive edges arrive.

Production shape: the trainer consumes a committed KG release (the TableIO
snapshot of the edge table) while extraction keeps appending NEW edges; each
arriving edge needs its negatives immediately so training examples ship with
the batch. The corruption stream is the batch operator's md5-bucket
projection UNCHANGED (operators/negatives.py corrupt_edges — stateless, so
it streams as a pure map); the FILTERED check runs as a STREAM-STATIC left
anti join against the committed snapshot — supported by Structured
Streaming without any stateful plan, because the static side is fixed per
query.

Semantics (pinned in tests/test_streaming_negatives.py): the union of
emissions over any batching/order equals ``negative_samples`` run on the
same edges with the same snapshot as the filter side, because every row is
a deterministic function of (edge, slot, seed, snapshot). Duplicate edge
deliveries re-emit IDENTICAL rows (idempotent for any keyed/dedup sink);
an edge whose corruption collides with a SNAPSHOT-ABSENT newer edge is not
re-filtered — the filter is against the release the trainer sees, which is
exactly the filtered-protocol contract (negatives are false w.r.t. the
snapshot, not w.r.t. concurrent arrivals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_obo_spark.operators.negatives import corrupt_edges, filter_corruptions

__all__ = ["stream_negative_samples"]


def stream_negative_samples(
    edge_stream: DataFrame,
    snapshot_edges: DataFrame,
    n_nodes: int,
    n_neg: int = 2,
    seed: int = 7,
) -> DataFrame:
    """(src, dst_neg, slot) for each arriving edge — the streaming face of
    :func:`~kg_obo_spark.operators.negatives.negative_samples`.

    ``edge_stream``: streaming frame, first two columns positionally
    (src, dst). ``snapshot_edges``: the STATIC committed edge table the
    filtered protocol checks membership against (also src/dst positional).
    Self-loops in the stream are dropped; within-batch duplicate deliveries
    are not deduplicated (rows are deterministic, so downstream keyed sinks
    absorb them).
    """
    if n_neg < 1:
        raise ValueError(f"n_neg must be >= 1, got {n_neg}")
    if n_nodes < 2:
        raise ValueError(f"n_nodes must be >= 2, got {n_nodes}")
    s_src, s_dst = edge_stream.columns[:2]
    ed = edge_stream.select(
        F.col(s_src).alias("src"), F.col(s_dst).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    t_src, t_dst = snapshot_edges.columns[:2]
    true_edges = (
        snapshot_edges.select(
            F.col(t_src).alias("src"), F.col(t_dst).alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return filter_corruptions(
        corrupt_edges(ed, n_nodes, n_neg, seed), true_edges
    )
