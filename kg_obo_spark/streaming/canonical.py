"""Streaming canonicalization: a running entity registry over an
equivalence-edge stream.

As new equivalence evidence lands (shared-synonym / xref edges discovered in
fresh transcript batches), each micro-batch folds its delta into the previous
(id, component) assignment with
:func:`kg_obo_spark.operators.canonicalize.incremental_components` — work per
batch is bounded by the delta, never the accumulated graph — and commits the
updated assignment as a new TableIO snapshot (idempotent on epoch id, so a
replayed batch is skipped exactly-once style, matching ingest.py's sink).

The final assignment equals a from-scratch connected-components run over all
edges seen (pinned by test): incremental star-contraction preserves component
minima, so streaming order does not matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from kg_obo_spark.operators.canonicalize import incremental_components
from kg_obo_spark.sources.tableio import Table

ASSIGNMENT_SCHEMA = "id string, component string"


def start_canonicalization_stream(
    edges_stream: DataFrame,
    out_root: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Maintain the running (id, component) registry from a stream of
    equivalence edges (two string columns, positionally src/dst)."""
    table = Table(f"{out_root}/canonical_assignment")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        tag = f"epoch-{epoch_id}"
        if table.exists():
            prev = table.read(spark)
        else:
            prev = spark.createDataFrame([], ASSIGNMENT_SCHEMA)
        src, dst = batch_df.columns[:2]
        delta = batch_df.select(src, dst).filter(batch_df[src].isNotNull())
        merged, n_reduced, n_rounds = incremental_components(prev, delta)
        # mode=overwrite: the assignment is a full replacement snapshot;
        # if_absent_tag makes a replayed epoch a no-op (exactly-once)
        table.commit(
            merged.localCheckpoint(),
            mode="overwrite",
            if_absent_tag=tag,
            meta={"reduced_edges": n_reduced, "star_rounds": n_rounds},
        )

    return (
        edges_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
