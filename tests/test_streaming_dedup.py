"""Streaming keep-first exact dedup equals the batch dedup_exact when
duplicates arrive after their originals, drops every re-arrival across
micro-batches, and admits the min id on within-batch ties."""

import os
import time

from kg_obo_spark.operators.dedup import dedup_exact
from kg_obo_spark.streaming.dedup import stream_dedup_exact


def _write_file(spark, rows, path, mtime, stamped):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(path)
    # stamp only the newly-appended part files: the file stream orders
    # micro-batches by modification time
    for name in os.listdir(path):
        if name.endswith(".parquet") and name not in stamped:
            os.utime(os.path.join(path, name), (mtime, mtime))
            stamped.add(name)


def test_stream_dedup_equals_batch_keep_first(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = time.time() - 1000
    stamped: set[str] = set()
    # file 0: originals, incl. a within-batch tie (docs 2 and 3 identical
    # after normalization: min id 2 must win); file 1: cross-batch dups +
    # one new doc; file 2: re-arrivals only
    f0 = [(0, "alpha beta"), (1, "gamma delta"), (2, "same text"), (3, "same  TEXT ")]
    f1 = [(10, "ALPHA  beta"), (11, "fresh content"), (12, "gamma delta")]
    f2 = [(20, "alpha beta"), (21, "fresh   CONTENT")]
    _write_file(spark, f0, src, base, stamped)
    _write_file(spark, f1, src, base + 10, stamped)
    _write_file(spark, f2, src, base + 20, stamped)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_dedup_exact(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sdedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["doc_id"], r["fingerprint"])
        for r in spark.sql("SELECT * FROM sdedup").collect()
    }
    batch = spark.createDataFrame(f0 + f1 + f2, "doc_id long, text string")
    want_ids = {r["doc_id"] for r in dedup_exact(batch).collect()}
    assert {d for d, _ in got} == want_ids == {0, 1, 2, 11}
    # exactly one admission per fingerprint, ever
    n = spark.sql("SELECT count(*) c FROM sdedup").first()["c"]
    assert n == len({fp for _, fp in got}) == len(got)
