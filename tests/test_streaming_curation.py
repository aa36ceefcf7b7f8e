"""The Gopher quality filter is a pure stateless projection, so it must run
UNCHANGED on a document stream and produce bit-identical flags per
micro-batch — the continuous-ingest mode of the cleaning pipeline
(ROADMAP candidate 7, first leg). No new operator code: the pin is that
`gopher_quality_filter` accepts a streaming DataFrame as-is."""

import os

from kg_obo_spark.functions.text import gopher_quality_filter


def test_quality_filter_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [
        (0, "the " + " ".join(f"w{i}" for i in range(60))),   # keeps
        (1, "short doc"),                                      # word-count fail
        (2, "the " + "@@ " * 80),                              # symbol fail
        (3, " ".join("supercalifragilistic" for _ in range(55))),  # word-len fail
        (4, ""),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    batch.repartition(3).write.mode("overwrite").parquet(src)

    want = {tuple(r) for r in gopher_quality_filter(batch, min_stop_hits=1).collect()}

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        gopher_quality_filter(stream, min_stop_hits=1)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sqf")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {tuple(r) for r in spark.sql("SELECT * FROM sqf").collect()}
    assert got == want
    assert any(r for r in got)  # non-empty: the pin actually compared rows
