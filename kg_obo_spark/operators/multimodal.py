"""Multimodal column plumbing: image/audio/video as opaque binary + typed metadata.

The container has no image/audio libraries, so the DECODE step is a clearly
marked stub (``decode_stub``: deterministic fake features derived from the
payload hash) or raises ``NotImplementedError`` in strict mode — but everything
Spark-side is real and tested: schema, binary handling, Arrow batch shape,
``mapInPandas`` UDF signatures, partition-friendly layout.

At 100 TB the payloads dominate: keep them in their own column (Parquet stores
columns independently, so metadata-only scans never read payload bytes), write
partitioned by ``kind``, and size ``maxRecordsPerBatch`` down for wide binaries.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta map<string,string>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "width int, height int, duration_ms int"
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque payload — exercises the
    binary path with the driver-provided tables (no external data)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/blob").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """Metadata pass that never decodes: byte length + sha256 digest, all
    JVM-side (SQL-expressible; DuckDB oracle mirrors it)."""
    return media.select(
        "media_id",
        "kind",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256"),
    )


def decode_stub(media: DataFrame, strict: bool = False) -> DataFrame:
    """STUB decode/feature-extract stage (real codecs unavailable in this
    container — see module docstring). Deterministic fake: dimensions/duration
    derived from the payload digest, so tests are stable. ``strict=True``
    raises NotImplementedError exactly where a real decoder would plug in.

    The Spark plumbing (Arrow batches of binary columns in, typed feature rows
    out) is the real, tested part."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present in "
                    "this environment; plug a real decoder in here"
                )
            digests = [
                hashlib.sha256(bytes(p) if p is not None else b"").hexdigest()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "sha256": digests,
                    "width": [int(d[:4], 16) % 4096 for d in digests],
                    "height": [int(d[4:8], 16) % 4096 for d in digests],
                    "duration_ms": [int(d[8:14], 16) % 600000 for d in digests],
                }
            )

    return media.mapInPandas(decode, schema=FEATURE_SCHEMA)


def resize_stub(
    media: DataFrame, width: int = 256, height: int = 256, strict: bool = False
) -> DataFrame:
    """STUB resize/transcode stage: binary in -> binary out with updated typed
    metadata (real codecs absent from this container; ``strict=True`` raises
    at the decoder plug point). The Spark plumbing is real: payload stays an
    opaque binary column end-to-end, the output schema carries the new
    dimensions, and the stage is map-only (no shuffle) — at 100 TB the only
    thing that matters about a resize is that it streams batch-wise and never
    widens the exchange. Deterministic fake: output payload = sha256(payload)
    digest bytes repeated to a size proportional to the target area, so
    downstream size/sanity logic is exercised with stable values."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target_len = max(1, (width * height) // 1024)
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media resize requires image codecs not present in this "
                    "environment; plug a real resizer in here"
                )
            payloads = []
            for p in pdf["payload"]:
                digest = hashlib.sha256(bytes(p) if p is not None else b"").digest()
                payloads.append((digest * (target_len // len(digest) + 1))[:target_len])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return media.mapInPandas(
        resize,
        schema="media_id long, kind string, payload binary, width int, height int",
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plan*: (media_id, frame_ts_ms) rows via sequence/explode
    over the (stub-)decoded duration — shows the fan-out shape without codecs."""
    feats = decode_stub(media)
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
