"""Structured Streaming ingestion of transcripts.

The reference is batch-with-cron (Jenkinsfile:9 weekly); its streaming-shaped
ideas are chunked incremental download with early stop (transform.py:488-494)
and incremental skip-if-done (transform.py:911-936). This module is the Spark
upgrade of that cadence: a continuously-running query that picks up new
transcript files as they land, runs the SAME extraction stage (the batch
`extract_mentions` is reused verbatim inside foreachBatch), and appends
mentions + per-turn co-mention edges to the snapshot tables with exactly-once
unit markers (epoch id = the unit).

Also provides a windowed mention-rate monitor (watermark + tumbling window)
as the streaming-native aggregation example.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kg_obo_spark.datagen.ontology import Ontology
from kg_obo_spark.datagen.transcripts import SCHEMA as TRANSCRIPTS_SCHEMA
from kg_obo_spark.operators.extract import extract_mentions
from kg_obo_spark.operators.materialize import canonical_mentions, co_mention_pairs
from kg_obo_spark.sources.tableio import Table

TRANSCRIPTS_DDL = TRANSCRIPTS_SCHEMA


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source stream over a transcripts directory (new files = new data).
    On a real deployment this is the Kafka/Iceberg-CDC source; semantics are
    identical from here on."""
    return (
        spark.readStream.format("parquet")
        .schema(TRANSCRIPTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def start_mention_ingest(
    stream: DataFrame,
    onto: Ontology,
    out_root: str,
    checkpoint_dir: str,
    canon_map: DataFrame | None = None,
) -> StreamingQuery:
    """mentions + co-mention edges, appended per micro-batch with exactly-once
    markers (idempotent on epoch id: a replayed batch is skipped)."""
    mentions_t = Table(f"{out_root}/mentions_stream")
    edges_t = Table(f"{out_root}/co_edges_stream")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        tag = f"epoch-{epoch_id}"
        # guard on the LAST-committed table: if mentions carry the tag, the
        # edges commit (done first) landed too; a crash between the two
        # replays cleanly — edges' own tag dedups its already-landed half
        if mentions_t.has_tag(tag):
            return  # replayed epoch -> already committed, exactly-once
        m = extract_mentions(batch_df, onto)
        if canon_map is not None:
            m = canonical_mentions(m, canon_map)
        m = m.localCheckpoint()
        pairs = co_mention_pairs(m).select("a", "b").distinct()
        edges_t.commit(pairs, mode="append", if_absent_tag=tag)
        mentions_t.commit(m, mode="append", if_absent_tag=tag)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def mention_rate_monitor(
    stream: DataFrame,
    onto: Ontology,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming-native windowed aggregation: turns + planted-term hits per
    role per window, tolerating late events up to the watermark."""
    hits = F.size(
        F.filter(
            F.split(F.lower("text"), r"[^a-z0-9:_]+"),
            lambda t: t.isin([x["name"].split(" ")[0].lower() for x in onto.terms[:50]]),
        )
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "role")
        .agg(
            F.count("*").alias("turns"),
            F.sum(hits).alias("kw_hits"),
        )
    )
