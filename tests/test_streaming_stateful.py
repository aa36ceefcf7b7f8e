"""applyInPandasWithState: cross-micro-batch first-seen dedup equals the batch
distinct, with state carrying between triggers (maxFilesPerTrigger=1 forces
multiple micro-batches over the same conversations)."""

from kg_obo_spark.datagen import generate_transcripts
from kg_obo_spark.operators.extract import extract_mentions
from kg_obo_spark.streaming.ingest import read_transcript_stream
from kg_obo_spark.streaming.stateful import first_seen_terms


def test_first_seen_terms_across_batches(spark, onto, tmp_path):
    src = str(tmp_path / "src")
    batch = generate_transcripts(spark, n_convs=40, seed=17, ontology=onto).cache()
    # several files -> several micro-batches; same conversations span batches
    batch.repartition(5).write.mode("overwrite").parquet(src)

    stream = read_transcript_stream(spark, src, max_files_per_trigger=1)
    mentions = extract_mentions(stream, onto)
    # idle_timeout_ms=0: timer batches never idle, so processAllAvailable()
    # would not return with a ProcessingTimeTimeout configured
    out = first_seen_terms(mentions, idle_timeout_ms=0)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("first_seen")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["conv_id"], r["term_id"])
        for r in spark.sql("SELECT * FROM first_seen").collect()
    }
    expected = {
        (r["conv_id"], r["term_id"])
        for r in extract_mentions(batch, onto).select("conv_id", "term_id").distinct().collect()
    }
    assert got == expected
    # stateful dedup means no (conv, term) appears twice in the output
    n_rows = spark.sql("SELECT count(*) c FROM first_seen").first()["c"]
    assert n_rows == len(got)


def test_idle_conversation_state_reaped_and_reemits(spark, onto, tmp_path):
    """ProcessingTimeTimeout path: an idle conversation's registry is dropped
    after ``idle_timeout_ms``; when it resumes, its terms re-emit (the
    hasTimedOut -> remove branch is live, so state is bounded on long streams).

    With a timeout configured the engine keeps firing timer micro-batches, so
    processAllAvailable() never returns — poll the memory sink instead."""
    import time

    def wait_for(pred, deadline_s=90):
        t0 = time.time()
        while time.time() - t0 < deadline_s:
            if pred():
                return True
            time.sleep(0.5)
        return False

    def a_count():
        return spark.sql(
            f"SELECT count(*) c FROM reap_test WHERE conv_id = '{conv_a}'"
        ).first()["c"]

    src = str(tmp_path / "src")
    batch = generate_transcripts(spark, n_convs=1, seed=23, ontology=onto).cache()
    conv_a = batch.select("conv_id").first()["conv_id"]

    batch.coalesce(1).write.mode("append").parquet(src)
    stream = read_transcript_stream(spark, src)
    out = first_seen_terms(extract_mentions(stream, onto), idle_timeout_ms=700)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("reap_test")
        .trigger(processingTime="300 milliseconds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        assert wait_for(lambda: a_count() > 0)
        first = a_count()
        # idle past the timeout: timer micro-batches reap conv_a's registry
        time.sleep(2.0)
        # conv_a resumes: with its registry gone, its terms emit AGAIN
        batch.coalesce(1).write.mode("append").parquet(src)
        assert wait_for(lambda: a_count() == 2 * first)
    finally:
        q.stop()
