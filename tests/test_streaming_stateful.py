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
    out = first_seen_terms(mentions)
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
