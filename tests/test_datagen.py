"""Transcripts generator contract: exact input_hint schema, determinism across
parallelism levels (the property the scaling benchmark depends on)."""

from pyspark.sql import functions as F

from kg_obo_spark.datagen import generate_transcripts


def test_schema_matches_input_hint(spark, onto):
    df = generate_transcripts(spark, n_convs=20, seed=1, ontology=onto)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("conv_id", "string"),
        ("turn_idx", "int"),
        ("role", "string"),
        ("text", "string"),
        ("tool", "string"),
        ("ts", "timestamp"),
    ]


def test_deterministic_across_partitioning(spark, onto):
    a = generate_transcripts(spark, n_convs=50, seed=9, ontology=onto, num_partitions=1)
    b = generate_transcripts(spark, n_convs=50, seed=9, ontology=onto, num_partitions=7)
    ah = a.select(F.bit_xor(F.xxhash64(*a.columns)).alias("h"), F.count("*").alias("n")).first()
    bh = b.select(F.bit_xor(F.xxhash64(*b.columns)).alias("h"), F.count("*").alias("n")).first()
    assert (ah["h"], ah["n"]) == (bh["h"], bh["n"])


def test_stable_turn_ordering_and_monotone_ts(spark, onto):
    df = generate_transcripts(spark, n_convs=30, seed=3, ontology=onto)
    pdf = df.orderBy("conv_id", "turn_idx").toPandas()
    for _, grp in pdf.groupby("conv_id"):
        assert list(grp["turn_idx"]) == list(range(len(grp)))
        assert grp["ts"].is_monotonic_increasing


def test_planted_variety(spark, onto):
    text = " ".join(
        r["text"] for r in generate_transcripts(spark, n_convs=300, seed=42, ontology=onto).collect()
    )
    assert "OBO:" in text  # malformed CURIE planted
    assert "http://purl.obolibrary.org/obo/" in text  # raw IRI planted
    prefixes = {t["id"].split(":")[0] for t in onto.terms}
    assert any(f"{p.lower()}:" in text for p in prefixes)  # lowercased prefix
