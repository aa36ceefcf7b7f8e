"""Streaming negative sampling == batch on any batching: every emission is a
deterministic function of (edge, slot, seed, snapshot)."""

import os
import time

from kg_obo_spark.operators.negatives import negative_samples
from kg_obo_spark.streaming.negatives import stream_negative_samples

SCHEMA = "src long, dst long"
EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (2, 2), (1, 2)]


def _write_file(spark, rows, path, mtime, stamped):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    for name in os.listdir(path):
        if name.endswith(".parquet") and name not in stamped:
            os.utime(os.path.join(path, name), (mtime, mtime))
            stamped.add(name)


def test_stream_negatives_union_equals_batch(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    base = time.time() - 1000
    stamped: set[str] = set()
    # three micro-batches, one duplicate delivery of (1, 2), a self-loop
    _write_file(spark, EDGES[:3], src_dir, base, stamped)
    _write_file(spark, EDGES[3:5], src_dir, base + 10, stamped)
    _write_file(spark, EDGES[5:], src_dir, base + 20, stamped)

    snapshot = spark.createDataFrame(EDGES, SCHEMA)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream_negative_samples(stream, snapshot, n_nodes=10, n_neg=2)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("snegs")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    emitted = spark.sql("SELECT * FROM snegs").collect()
    got = {(r.src, r.dst_neg, r.slot) for r in emitted}
    batch = {
        (r.src, r.dst_neg, r.slot)
        for r in negative_samples(snapshot, n_nodes=10, n_neg=2).collect()
    }
    assert got == batch
    # the duplicate (1, 2) delivery re-emits identical rows only — the SET
    # is unchanged and every emission is one of the deterministic rows
    assert {(r.src, r.dst_neg, r.slot) for r in emitted} <= batch
