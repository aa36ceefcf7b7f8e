"""Structured Streaming ingestion: file-source micro-batches drive the same
extraction stage; exactly-once epoch markers; windowed monitor."""

import os

from kg_obo_spark.datagen import generate_transcripts
from kg_obo_spark.sources.tableio import Table
from kg_obo_spark.streaming.ingest import (
    mention_rate_monitor,
    read_transcript_stream,
    start_mention_ingest,
)


def test_stream_ingest_matches_batch(spark, onto, tmp_path):
    src = str(tmp_path / "src")
    batch_df = generate_transcripts(spark, n_convs=60, seed=21, ontology=onto)
    batch_df.repartition(4).write.mode("overwrite").parquet(src)

    out_root = str(tmp_path / "out")
    q = start_mention_ingest(
        read_transcript_stream(spark, src, max_files_per_trigger=2),
        onto,
        out_root,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    from kg_obo_spark.operators.extract import extract_mentions

    streamed = Table(os.path.join(out_root, "mentions_stream")).read(spark)
    expected = extract_mentions(batch_df, onto)
    assert streamed.count() == expected.count()
    got = {tuple(r) for r in streamed.select("conv_id", "turn_idx", "start", "term_id").collect()}
    exp = {tuple(r) for r in expected.select("conv_id", "turn_idx", "start", "term_id").collect()}
    assert got == exp
    # co-mention edge stream exists and is non-empty
    assert Table(os.path.join(out_root, "co_edges_stream")).read(spark).count() > 0


def test_mention_rate_monitor(spark, onto, tmp_path):
    src = str(tmp_path / "src2")
    generate_transcripts(spark, n_convs=30, seed=22, ontology=onto).write.mode(
        "overwrite"
    ).parquet(src)
    agg = mention_rate_monitor(read_transcript_stream(spark, src), onto, window="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rates")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM rates").collect()
    assert rows and all(r["turns"] > 0 for r in rows)
