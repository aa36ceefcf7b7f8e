"""Streaming conversation rollup equals the batch conversation_stats on any
arrival order/batching: the LAST emission per conv_id converges to the batch
aggregate over everything that arrived."""

import os
import time

from kg_obo_spark.operators.conversations import conversation_stats
from kg_obo_spark.streaming.conversations import stream_conversation_stats

SCHEMA = (
    "conv_id long, turn_idx int, role string, tool string, "
    "ts_s long, text string"
)


def _write_file(spark, rows, path, mtime, stamped):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    for name in os.listdir(path):
        if name.endswith(".parquet") and name not in stamped:
            os.utime(os.path.join(path, name), (mtime, mtime))
            stamped.add(name)


def test_stream_rollup_converges_to_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = time.time() - 1000
    stamped: set[str] = set()
    # conv 0 split across batches OUT of turn order; conv 1 arrives whole;
    # conv 2's lone turn arrives last
    f0 = [
        (0, 2, "user", None, 220, "more please"),
        (1, 0, "user", None, 400, "question"),
        (1, 1, "assistant", None, 460, "short answer"),
        (1, 2, "user", None, 520, "again"),
        (1, 3, "assistant", "tool_a", 580, "same length"),
    ]
    f1 = [
        (0, 3, "assistant", "tool_b", 280, "ok"),
        (0, 0, "user", None, 100, "hi there"),
    ]
    f2 = [
        (0, 1, "assistant", "tool_a", 160, "hello hello hello"),
        (2, 0, "user", None, 700, "dangling"),
    ]
    _write_file(spark, f0, src, base, stamped)
    _write_file(spark, f1, src, base + 10, stamped)
    _write_file(spark, f2, src, base + 20, stamped)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_conversation_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sconv")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # conv 0 was touched by all three micro-batches -> 3 emissions; the
    # rollup is monotone in n_turns, so "last emission" = max n_turns
    emitted = spark.sql("SELECT * FROM sconv").collect()
    assert sum(1 for r in emitted if r.conv_id == 0) == 3
    last = {}
    for r in emitted:
        if r.conv_id not in last or r.n_turns > last[r.conv_id].n_turns:
            last[r.conv_id] = r

    batch = {
        r.conv_id: r
        for r in conversation_stats(
            spark.createDataFrame(f0 + f1 + f2, SCHEMA)
        ).collect()
    }
    assert set(last) == set(batch) == {0, 1, 2}
    cols = [
        "n_turns", "n_user", "n_assistant", "n_tool_calls",
        "total_tokens", "assistant_tokens", "duration_s",
    ]
    for cid in batch:
        for c in cols:
            assert getattr(last[cid], c) == getattr(batch[cid], c), (cid, c)

    # intermediate emission for conv 0 after its first batch: one turn seen
    first0 = min((r for r in emitted if r.conv_id == 0), key=lambda r: r.n_turns)
    assert (first0.n_turns, first0.total_tokens, first0.duration_s) == (1, 2, 0)


def test_stream_sft_equals_batch_any_order(spark, tmp_path):
    """Out-of-order turns + a duplicate delivery: the streamed example set
    equals batch sft_examples, each emitted exactly once, only after the
    contiguous prefix reaches the assistant turn."""
    from kg_obo_spark.operators.conversations import sft_examples
    from kg_obo_spark.streaming.conversations import stream_sft_examples

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = time.time() - 1000
    stamped: set[str] = set()
    # conv 0 arrives 2,0 | 3,dup(0) | 1 — turn 3's example must wait for 1;
    # conv 1 arrives in order across two files
    f0 = [
        (0, 2, "user", None, 220, "more please"),
        (0, 0, "user", None, 100, "hi there"),
        (1, 0, "user", None, 400, "question"),
        (1, 1, "assistant", None, 460, "short answer"),
    ]
    f1 = [
        (0, 3, "assistant", "tool_b", 280, "ok"),
        (0, 0, "user", None, 100, "hi there DUPLICATE (must be ignored)"),
        (1, 2, "user", None, 520, "again"),
    ]
    f2 = [
        (0, 1, "assistant", "tool_a", 160, "hello hello hello"),
        (1, 3, "assistant", "tool_a", 580, "same length"),
    ]
    _write_file(spark, f0, src, base, stamped)
    _write_file(spark, f1, src, base + 10, stamped)
    _write_file(spark, f2, src, base + 20, stamped)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_sft_examples(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssft")
        .option("checkpointLocation", str(tmp_path / "ckpt_sft"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.sql("SELECT * FROM ssft").collect()
    # exactly once per (conv, turn)
    assert len(got) == len({(r.conv_id, r.turn_idx) for r in got})
    got_map = {(r.conv_id, r.turn_idx):
               (r.context, r.response, r.n_context_turns) for r in got}

    # batch over the FIRST delivery of each turn (dup turn 0 ignored)
    batch_rows = f0 + [f1[0], f1[2]] + f2
    want = {(r.conv_id, r.turn_idx):
            (r.context, r.response, r.n_context_turns)
            for r in sft_examples(
                spark.createDataFrame(batch_rows, SCHEMA)).collect()}
    assert got_map == want
    assert (0, 3) in got_map and got_map[(0, 3)][2] == 3


def test_stream_sft_checkpoint_restart_exactly_once(spark, tmp_path):
    """Kill the query between micro-batches and restart from the same
    checkpoint: buffered out-of-order state survives, nothing re-emits,
    and the final set still equals batch."""
    from kg_obo_spark.operators.conversations import sft_examples
    from kg_obo_spark.streaming.conversations import stream_sft_examples

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = time.time() - 1000
    stamped: set[str] = set()
    f0 = [
        (0, 0, "user", None, 100, "hi there"),
        (0, 2, "user", None, 220, "more please"),  # gap at 1: buffered
    ]
    f1 = [
        (0, 1, "assistant", "tool_a", 160, "hello hello hello"),
        (0, 3, "assistant", "tool_b", 280, "ok"),
    ]
    _write_file(spark, f0, src, base, stamped)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def start():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return (
            stream_sft_examples(stream)
            .writeStream.outputMode("append")
            .format("parquet")  # fault-tolerant sink: supports restart
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()  # crash point: turn 1 not yet arrived, turns 0+2 in state
    assert spark.read.parquet(sink).count() == 0

    _write_file(spark, f1, src, base + 10, stamped)
    q = start()  # restart from the same checkpoint
    q.processAllAvailable()
    q.stop()

    got = {(r.conv_id, r.turn_idx): (r.context, r.response)
           for r in spark.read.parquet(sink).collect()}
    want = {(r.conv_id, r.turn_idx): (r.context, r.response)
            for r in sft_examples(
                spark.createDataFrame(f0 + f1, SCHEMA)).collect()}
    # post-restart emissions cover exactly the examples (state restored:
    # turn 3's context includes the pre-crash buffered turns 0 and 2)
    assert got == want
    assert got[(0, 3)][0] == (
        "user: hi there\nassistant: hello hello hello\nuser: more please"
    )


def test_stream_sft_bounded_gap_flush_and_corrections(spark, tmp_path):
    """ROADMAP #8: after gap_wait_batches stalled deliveries, blocked
    examples flush as gap-marked partial rows; when the gap fills they
    finalize as corrections equal to the batch examples; the last emission
    per (conv, turn) converges to batch."""
    from kg_obo_spark.operators.conversations import sft_examples
    from kg_obo_spark.streaming.conversations import stream_sft_examples_bounded

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = time.time() - 1000
    stamped: set[str] = set()
    # conv 0: turn 1 missing until the 3rd delivery
    f0 = [
        (0, 0, "user", None, 100, "hi there"),
        (0, 2, "assistant", None, 220, "answer two"),
    ]
    f1 = [(0, 4, "assistant", None, 340, "answer four")]
    f2 = [
        (0, 1, "assistant", None, 160, "answer one"),
        (0, 3, "user", None, 280, "more"),
    ]
    _write_file(spark, f0, src, base, stamped)
    _write_file(spark, f1, src, base + 10, stamped)
    _write_file(spark, f2, src, base + 20, stamped)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_sft_examples_bounded(stream, gap_wait_batches=2)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssftb")
        .option("checkpointLocation", str(tmp_path / "ckpt_sftb"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM ssftb").collect()

    partials = {r.turn_idx: r for r in got if r.is_partial}
    # stall counter hit 2 on the second delivery: turns 2 and 4 flushed
    assert set(partials) == {2, 4}
    assert partials[2].context == "user: hi there\n[turn 1 missing]"
    assert partials[2].n_context_turns == 1
    assert partials[4].context == (
        "user: hi there\n[turn 1 missing]\nassistant: answer two"
        "\n[turn 3 missing]"
    )
    assert partials[4].n_context_turns == 2

    finals = {r.turn_idx: r for r in got if not r.is_partial}
    # exactly one final row per assistant turn; 2 and 4 are corrections
    assert len([r for r in got if not r.is_partial]) == 3
    assert {i: r.is_correction for i, r in finals.items()} == {
        1: False, 2: True, 4: True
    }
    want = {
        r.turn_idx: (r.context, r.response, r.n_context_turns)
        for r in sft_examples(
            spark.createDataFrame(f0 + f1 + f2, SCHEMA)).collect()
    }
    assert {
        i: (r.context, r.response, r.n_context_turns)
        for i, r in finals.items()
    } == want


def test_stream_sft_bounded_never_filled_gap_stays_partial(spark, tmp_path):
    """A gap that never fills leaves exactly the partial rows (no finals
    past the gap), and a partial turn re-flushes only when MORE of its
    context arrived since the last flush."""
    from kg_obo_spark.streaming.conversations import stream_sft_examples_bounded

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = time.time() - 1000
    stamped: set[str] = set()
    f0 = [
        (0, 0, "user", None, 100, "hi"),
        (0, 3, "assistant", None, 280, "late answer"),
    ]
    f1 = [(0, 4, "user", None, 340, "noise")]      # stall 2 -> flush turn 3
    f2 = [(0, 5, "assistant", None, 400, "five")]  # stall 1
    f3 = [(0, 2, "user", None, 220, "ctx grows")]  # stall 2 -> reflush 3, flush 5
    f4 = [(0, 6, "user", None, 460, "noise2")]     # stall 1
    f5 = [(0, 7, "user", None, 520, "noise3")]     # stall 2 -> NO reflush (no new ctx)
    for i, f in enumerate([f0, f1, f2, f3, f4, f5]):
        _write_file(spark, f, src, base + 10 * i, stamped)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_sft_examples_bounded(stream, gap_wait_batches=2)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssftb2")
        .option("checkpointLocation", str(tmp_path / "ckpt_sftb2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM ssftb2").collect()
    assert all(r.is_partial for r in got)  # turn 1 never arrives: no finals
    by_turn = {}
    for r in got:
        by_turn.setdefault(r.turn_idx, []).append(r)
    # turn 3 flushed at stall#1 (ctx=1 present), reflushed after turn 2
    # arrived (ctx=2), NOT reflushed at the third stall (no new context)
    assert [r.n_context_turns for r in sorted(
        by_turn[3], key=lambda r: r.n_context_turns)] == [1, 2]
    assert [r.n_context_turns for r in by_turn[5]] == [4]
    assert by_turn[3][-1].context.count("missing") == 1


def test_stream_conversation_embeddings_bitwise_equals_batch(spark, tmp_path):
    """Pooled vectors stream exactly once per complete conversation and
    equal the batch pooling BITWISE on out-of-order + duplicate delivery
    (same vec_id-ordered fold); incomplete conversations never emit."""
    import numpy as np

    from kg_obo_spark.operators.conversations import conversation_embeddings
    from kg_obo_spark.streaming.conversations import (
        stream_conversation_embeddings,
    )

    rng = np.random.RandomState(5)
    vecs = {i: [float(x) for x in rng.randn(6).astype("float32")]
            for i in range(9)}  # convs 0,1 complete; conv 2 has one turn
    eschema = "vec_id long, embedding array<float>"
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = time.time() - 1000
    stamped: set[str] = set()
    f0 = [(3, vecs[3]), (1, vecs[1]), (6, vecs[6])]
    f1 = [(0, vecs[0]), (2, vecs[2]), (1, vecs[1])]   # dup vec 1; conv 0 done
    f2 = [(5, vecs[5]), (4, vecs[4]), (7, vecs[7]), (8, vecs[8])]
    for i, f in enumerate([f0, f1, f2]):
        spark.createDataFrame(f, eschema).coalesce(1).write.mode(
            "append").parquet(src)
        for name in os.listdir(src):
            if name.endswith(".parquet") and name not in stamped:
                os.utime(os.path.join(src, name), (base + 10 * i,) * 2)
                stamped.add(name)

    stream = (
        spark.readStream.schema(eschema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_conversation_embeddings(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sconvemb")
        .option("checkpointLocation", str(tmp_path / "ckpt_emb"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM sconvemb").collect()
    assert len(got) == 2  # exactly once, conv 2 incomplete
    got_map = {r.conv_id: (r.n_turns, list(r.cemb)) for r in got}

    batch = {
        r.conv_id: (r.n_turns, list(r.cemb))
        for r in conversation_embeddings(
            spark.createDataFrame(
                [(i, v) for i, v in vecs.items()], eschema)
        ).collect()
        if r.n_turns == 4
    }
    assert got_map == batch  # BITWISE double equality


def test_stream_topic_labels_via_static_centroids(spark, tmp_path):
    """ivf_assign works unchanged on the streaming pooled frame (broadcast
    nested-loop against one literal centroid row — no stateful plan): the
    streamed topic labels equal the batch assignment."""
    import numpy as np

    from kg_obo_spark.operators.conversations import conversation_embeddings
    from kg_obo_spark.operators.similarity import ivf_assign, kmeans_centroids
    from kg_obo_spark.streaming.conversations import (
        stream_conversation_embeddings,
    )

    rng = np.random.RandomState(9)
    centers = rng.randn(2, 5) * 3
    vecs = {
        c * 4 + t: [float(x) for x in
                    (centers[c % 2] + 0.1 * rng.randn(5)).astype("float32")]
        for c in range(6) for t in range(4)
    }
    eschema = "vec_id long, embedding array<float>"
    emb = spark.createDataFrame([(i, v) for i, v in vecs.items()], eschema)
    pooled = conversation_embeddings(emb).localCheckpoint()
    cents = kmeans_centroids(pooled, 2, iters=2, id_col="conv_id",
                             vec_col="cemb").localCheckpoint()
    want = {r.conv_id: r.centroid_id
            for r in ivf_assign(pooled, cents, "conv_id", "cemb").collect()}

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], eschema
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(eschema).parquet(src)
    labeled = ivf_assign(
        stream_conversation_embeddings(stream), cents, "conv_id", "cemb"
    ).select("conv_id", "centroid_id")
    q = (
        labeled.writeStream.outputMode("append")
        .format("memory")
        .queryName("slabel")
        .option("checkpointLocation", str(tmp_path / "ckpt_label"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r.conv_id: r.centroid_id
           for r in spark.sql("SELECT * FROM slabel").collect()}
    assert got == want and len(got) == 6
