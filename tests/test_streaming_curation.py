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


def test_stream_contamination_equals_batch(spark, tmp_path):
    """The stateless mapInPandas contamination variant equals the batch
    window/groupBy operator row-for-row (IEEE-identical fractions) on a
    multi-micro-batch stream."""
    from kg_obo_spark.functions.text import ngram_contamination
    from kg_obo_spark.streaming.curation import stream_ngram_contamination

    src = str(tmp_path / "csrc")
    corpus = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "spark shuffle partitions and skew salting explained"),
        (2, "the quick brown cat naps"),
        (3, "one two"),       # < n tokens: no row
        (4, ""),
        (5, "quick brown fox jumps high above the fence"),
    ]
    bench = spark.createDataFrame(
        [(0, "the quick brown fox ran"), (1, "skew salting explained well")],
        "bid long, text string",
    )
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    docs.repartition(3).write.mode("overwrite").parquet(src)

    want = {tuple(r) for r in ngram_contamination(docs, bench, n=3).collect()}
    assert any(r[2] > 0 for r in want)  # contamination actually present

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_ngram_contamination(spark, stream, bench, n=3)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("scontam")
        .option("checkpointLocation", str(tmp_path / "cckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM scontam").collect()}
    assert got == want
