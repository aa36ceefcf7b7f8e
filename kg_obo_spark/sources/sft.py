"""SFT/JSONL sink: write training examples as newline-delimited JSON.

The standard fine-tuning feed format — one ``{"context": ..., "response":
...}`` object per line, sharded so a data loader streams shards in
parallel. Rendering happens JVM-side (``to_json`` over a struct of every
column), so the writer is a pure map over the example frame: no Python in
the hot path, no collect, one task per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["write_sft_jsonl"]


def write_sft_jsonl(
    examples: DataFrame,
    path: str,
    n_shards: int | None = None,
    mode: str = "error",
) -> None:
    """Write ``examples`` (any schema — every column becomes a JSON field)
    as JSONL text shards under ``path``.

    ``n_shards`` repartitions by ``conv_id`` when present (round-robin
    otherwise) so shard sizes stay balanced and a conversation's examples
    land in one shard; rows are sorted within each shard by
    (conv_id, turn_idx) when those columns exist, so shard content is
    deterministic for a given input. At corpus scale this is the classic
    one-exchange materialization: the repartition is the only shuffle and
    each task writes its shard sequentially.
    """
    cols = examples.columns
    df = examples
    if n_shards is not None:
        if n_shards <= 0:
            raise ValueError(f"n_shards must be positive, got {n_shards}")
        df = (
            df.repartition(n_shards, "conv_id")
            if "conv_id" in cols
            else df.repartition(n_shards)
        )
    sort_cols = [c for c in ("conv_id", "turn_idx") if c in cols]
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    df.select(F.to_json(F.struct(*cols)).alias("value")).write.mode(mode).text(
        path
    )
