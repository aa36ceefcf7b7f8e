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


def test_stream_dedup_out_of_order_default_keeps_first_arrival(spark, tmp_path):
    """Pins the documented divergence: without corrections, an out-of-order
    source (smaller id arrives AFTER its duplicate was admitted) keeps the
    first ARRIVAL — a different keeper than batch dedup_exact's min id."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = time.time() - 1000
    stamped: set[str] = set()
    f0 = [(7, "same text")]
    f1 = [(3, "same  TEXT ")]  # smaller id, later arrival
    _write_file(spark, f0, src, base, stamped)
    _write_file(spark, f1, src, base + 10, stamped)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_dedup_exact(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sdedup_ooo")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"] for r in spark.sql("SELECT * FROM sdedup_ooo").collect()}
    assert got == {7}  # first arrival, NOT the batch min id
    batch = spark.createDataFrame(f0 + f1, "doc_id long, text string")
    want = {r["doc_id"] for r in dedup_exact(batch).collect()}
    assert want == {3}  # the documented divergence


def test_stream_dedup_corrections_converge_to_batch(spark, tmp_path):
    """corrections=True: a later smaller id emits an is_correction row and
    re-points the fingerprint; folding to the LAST emission per fingerprint
    equals batch dedup_exact regardless of arrival order."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = time.time() - 1000
    stamped: set[str] = set()
    f0 = [(7, "same text"), (1, "solo one")]
    f1 = [(3, "same  TEXT "), (9, "other doc")]
    f2 = [(5, "same text"), (2, "OTHER  doc")]  # 5: dup above admitted 3 -> drop
    _write_file(spark, f0, src, base, stamped)
    _write_file(spark, f1, src, base + 10, stamped)
    _write_file(spark, f2, src, base + 20, stamped)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_dedup_exact(stream, corrections=True)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sdedup_corr")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM sdedup_corr").collect()
    # fingerprint of "same text": admitted 7, corrected to 3; 5 dropped.
    # "other doc": admitted 9, corrected to 2. "solo one": admitted 1.
    corr = {(r["doc_id"], r["is_correction"]) for r in rows}
    assert (7, False) in corr and (3, True) in corr
    assert (9, False) in corr and (2, True) in corr
    assert (1, False) in corr
    assert not any(d == 5 for d, _ in corr)
    # last emission per fingerprint == batch min-id keepers
    by_fp: dict[str, list] = {}
    for r in rows:
        by_fp.setdefault(r["fingerprint"], []).append(r["doc_id"])
    last = {min(v) for v in by_fp.values()}  # corrections only decrease ids
    batch = spark.createDataFrame(f0 + f1 + f2, "doc_id long, text string")
    want = {r["doc_id"] for r in dedup_exact(batch).collect()}
    assert last == want == {1, 2, 3}
