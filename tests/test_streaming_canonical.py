"""Streaming canonicalization: micro-batched equivalence deltas folded into a
running registry equal a from-scratch CC over all edges."""

from pyspark.sql import functions as F

from kg_obo_spark.operators.canonicalize import connected_components
from kg_obo_spark.sources.tableio import Table
from kg_obo_spark.streaming.canonical import start_canonicalization_stream


def test_streaming_registry_equals_batch_cc(spark, tmp_path):
    src = str(tmp_path / "edges")
    # three deltas that progressively merge components across batches
    batches = [
        [("a1", "a2"), ("b1", "b2")],
        [("a2", "a3"), ("c1", "c2")],
        [("a3", "b1"), ("c2", "a1")],  # merges everything into one component
    ]
    all_edges = [e for b in batches for e in b]
    for i, b in enumerate(batches):
        spark.createDataFrame(b, "u string, v string").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.format("parquet")
        .schema("u string, v string")
        .option("maxFilesPerTrigger", 1)  # one delta per micro-batch
        .load(src)
    )
    q = start_canonicalization_stream(stream, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    t = Table(str(tmp_path / "out" / "canonical_assignment"))
    got = {(r["id"], r["component"]) for r in t.read(spark).collect()}
    full = connected_components(spark.createDataFrame(all_edges, "u string, v string"))
    want = {(r["id"], r["component"]) for r in full.collect()}
    assert got == want
    # the per-epoch lineage shows bounded work: reduced edges <= delta size
    for s in t.snapshots():
        assert s.meta.get("reduced_edges", 0) <= 2
