"""End-to-end: triple P/R vs the independent pure-Python oracle (>= 0.95 gate,
BASELINE.json metric), crash/resume identity, lock semantics, lineage."""

import pytest
from pyspark.sql import functions as F

from kg_obo_spark.datagen import build_ontology, generate_transcripts
from kg_obo_spark.oracle.pyoracle import oracle_triples, precision_recall
from kg_obo_spark.plans.pipeline import run_pipeline
from kg_obo_spark.plans.tracking import TrackingStore
from kg_obo_spark.sources.tableio import Lock, LockHeldError


@pytest.fixture(scope="module")
def transcripts(spark, onto):
    return generate_transcripts(spark, n_convs=120, seed=11, ontology=onto).cache()


def test_end_to_end_triples_pr(spark, onto, transcripts, tmp_path):
    res = run_pipeline(spark, transcripts, onto, str(tmp_path / "kg"))
    got = {(r["subject"], r["predicate"], r["object"]) for r in res.edges.collect()}
    rows = [(r["conv_id"], r["turn_idx"], r["text"]) for r in transcripts.collect()]
    expected = oracle_triples(rows, onto)
    p, r = precision_recall(got, expected)
    assert p >= 0.95 and r >= 0.95, f"P={p:.4f} R={r:.4f}"
    # in fact the implementations agree exactly on synthetic data
    assert (p, r) == (1.0, 1.0)


def test_pr_on_heavy_corpus(spark, tmp_path):
    """P/R holds on the bench-shaped corpus: multi-sentence turns, 1000-term
    dictionary (wider trie, 3-word labels, denser mentions)."""
    from kg_obo_spark.datagen import build_ontology

    big_onto = build_ontology(n_terms=1000, seed=7)
    tr = generate_transcripts(
        spark, n_convs=60, seed=33, ontology=big_onto, sentences_range=(2, 6)
    ).cache()
    res = run_pipeline(spark, tr, big_onto, str(tmp_path / "kg_heavy"))
    got = {(r["subject"], r["predicate"], r["object"]) for r in res.edges.collect()}
    rows = [(r["conv_id"], r["turn_idx"], r["text"]) for r in tr.collect()]
    p, r = precision_recall(got, oracle_triples(rows, big_onto))
    assert (p, r) == (1.0, 1.0), f"P={p:.4f} R={r:.4f}"


def test_crash_resume_identical_output(spark, onto, transcripts, tmp_path):
    full_root = str(tmp_path / "full")
    res_full = run_pipeline(spark, transcripts, onto, full_root, n_buckets=4)
    crash_root = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_pipeline(
            spark, transcripts, onto, crash_root,
            n_buckets=4, unit_batch_size=1, fail_after_batches=2,
        )
    # resume: skips the 2 committed units, finishes the rest
    res2 = run_pipeline(spark, transcripts, onto, crash_root, n_buckets=4, unit_batch_size=1)
    assert len(res2.units_skipped) == 2
    full = {(r["subject"], r["predicate"], r["object"]) for r in res_full.edges.collect()}
    resumed = {(r["subject"], r["predicate"], r["object"]) for r in res2.edges.collect()}
    assert full == resumed
    nodes_full = {r["id"] for r in res_full.nodes.collect()}
    nodes_resumed = {r["id"] for r in res2.nodes.collect()}
    assert nodes_full == nodes_resumed


def test_lock_blocks_concurrent_run(spark, onto, transcripts, tmp_path):
    root = str(tmp_path / "locked")
    lock = Lock(f"{root}/_lock")
    lock.acquire()
    try:
        with pytest.raises(LockHeldError):
            run_pipeline(spark, transcripts, onto, root)
    finally:
        lock.release()
    # lock is released after a successful run
    run_pipeline(spark, transcripts, onto, root)
    assert not lock.held()


def test_lineage_and_tracking_written(spark, onto, transcripts, tmp_path):
    root = str(tmp_path / "lin")
    res = run_pipeline(spark, transcripts, onto, root, n_buckets=2)
    store = TrackingStore(root)
    lin = store.lineage.read(spark)
    stages = {r["stage"] for r in lin.select("stage").distinct().collect()}
    assert {"extract+link", "co_edges", "materialize_nodes", "materialize_edges", "unit_done"} <= stages
    # per-partition metrics rows exist
    assert lin.filter(F.col("partition_id") >= 0).count() > 0
    # tracking rotation recorded the ontology version
    t = store.read_tracking(spark).filter(F.col("source") == onto.name).first()
    assert t["current_version"] == onto.version
    assert store.transformed_exists(spark, onto.name, onto.version)
    assert not store.transformed_exists(spark, onto.name, "nope")


def test_repair_ladder_degrades_poisoned_batch(spark, onto, tmp_path):
    """A turn that blows the per-turn candidate budget at level 0 (synonym
    boilerplate) completes at level 1 (synonyms dropped), with a lineage row
    recording the degradation — the robot convert fallback-chain analog."""
    from datetime import datetime

    syn = next(s for t in onto.terms for s in t["synonyms"])
    poisoned = spark.createDataFrame(
        [("conv-poison", 0, "user", (syn + " ") * 30, "", datetime(2026, 1, 1))],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    clean = generate_transcripts(spark, n_convs=6, seed=5, ontology=onto)
    tr = clean.unionByName(poisoned)

    res = run_pipeline(
        spark, tr, onto, str(tmp_path / "kg"),
        n_buckets=2, max_candidates_per_turn=10,
    )
    store = TrackingStore(str(tmp_path / "kg"))
    lin = store.lineage.read(spark)
    deg = lin.filter(F.col("stage") == "extract_degraded").collect()
    assert deg and max(r["remap_count"] for r in deg) == 1
    # the degraded batch still extracted: primary labels + CURIEs survive
    assert res.mentions.count() > 0
    # the poisoned conversation itself produced no synonym-surface mentions
    assert (
        res.mentions.filter(
            (F.col("conv_id") == "conv-poison") & (F.col("surface") == syn)
        ).count()
        == 0
    )


def test_repair_ladder_exhausted_reraises(spark, onto, tmp_path):
    """Canonical-CURIE boilerplate explodes at EVERY level (level 3 still
    matches canonical ids) -> the ladder exhausts and re-raises, mirroring the
    reference's final `return False`."""
    from datetime import datetime

    tid = onto.terms[0]["id"]
    poisoned = spark.createDataFrame(
        [("conv-poison", 0, "user", (tid + " ") * 30, "", datetime(2026, 1, 1))],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    with pytest.raises(Exception, match="ExtractionError|candidates"):
        run_pipeline(
            spark, poisoned, onto, str(tmp_path / "kg2"),
            n_buckets=1, max_candidates_per_turn=10,
        )


def test_ladder_trigger_survives_message_reframing(spark, onto, tmp_path):
    """VERDICT r2 #5: the ladder keys on the unique sentinel in the message,
    so a Py4J-style re-framing of the wrapped text still fires the ladder,
    while an unrelated error that merely MENTIONS the class name does not."""
    from kg_obo_spark.operators.extract import (
        EXTRACTION_BUDGET_MARKER,
        ExtractionError,
    )

    err = ExtractionError("c", 0, 99, 10)
    # simulate Spark wrapping/re-framing the worker traceback
    reframed = RuntimeError(
        "Job aborted due to stage failure: ...\n"
        f"pyspark.errors.PythonException: {err}\n...worker trace truncated..."
    )
    assert EXTRACTION_BUDGET_MARKER in str(reframed)
    impostor = RuntimeError(
        "commit failed while writing ExtractionError log summary"
    )
    assert EXTRACTION_BUDGET_MARKER not in str(impostor)


def test_crash_before_unit_marker_does_not_duplicate_mentions(spark, onto, tmp_path):
    """Crash in the window AFTER the mentions/edges commits but BEFORE the
    unit-done marker: the resumed run re-enters the batch, and the unit tag
    turns the duplicate commit into a lookup — the mentions table holds each
    mention exactly once and triples match an uninterrupted run."""
    from kg_obo_spark.datagen import generate_transcripts
    from kg_obo_spark.plans.tracking import TrackingStore
    from kg_obo_spark.sources.tableio import Table

    tr = generate_transcripts(spark, n_convs=60, seed=11, ontology=onto).cache()
    clean = run_pipeline(spark, tr, onto, str(tmp_path / "clean"), n_buckets=2)
    clean_triples = {(r["subject"], r["predicate"], r["object"])
                     for r in clean.edges.collect()}
    clean_mentions = clean.mentions.count()

    orig = TrackingStore.mark_units_done
    calls = {"n": 0}

    def crash_once(self, spark_, run_id, units):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash before unit marker")
        return orig(self, spark_, run_id, units)

    TrackingStore.mark_units_done = crash_once
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            run_pipeline(spark, tr, onto, str(tmp_path / "kg"), n_buckets=2,
                         unit_batch_size=1)
        res = run_pipeline(spark, tr, onto, str(tmp_path / "kg"), n_buckets=2,
                          unit_batch_size=1)
    finally:
        TrackingStore.mark_units_done = orig
    got = {(r["subject"], r["predicate"], r["object"]) for r in res.edges.collect()}
    assert got == clean_triples
    # the crashed batch's mentions were committed once, not twice
    assert Table(str(tmp_path / "kg" / "mentions")).read(spark).count() == clean_mentions


def test_resume_with_different_batch_size_does_not_duplicate(spark, onto, tmp_path):
    """ADVICE r3: unit_tag encodes the batch composition, so a resume that
    passes a DIFFERENT unit_batch_size after a crash-window crash must still
    replay under the original batching — the recorded run config wins — and
    the replay lookup is the O(1) marker path, never a history scan."""
    from kg_obo_spark.datagen import generate_transcripts
    from kg_obo_spark.plans.tracking import TrackingStore
    from kg_obo_spark.sources.tableio import Table

    tr = generate_transcripts(spark, n_convs=60, seed=13, ontology=onto).cache()
    clean = run_pipeline(spark, tr, onto, str(tmp_path / "clean"), n_buckets=4)
    clean_triples = {(r["subject"], r["predicate"], r["object"])
                     for r in clean.edges.collect()}
    clean_mentions = clean.mentions.count()

    orig = TrackingStore.mark_units_done
    calls = {"n": 0}

    def crash_once(self, spark_, run_id, units):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash before unit marker")
        return orig(self, spark_, run_id, units)

    TrackingStore.mark_units_done = crash_once
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            run_pipeline(spark, tr, onto, str(tmp_path / "kg"), n_buckets=4,
                         unit_batch_size=2)
        # resume asks for batch size 1; the persisted config (2) must win, and
        # the crash-window replay must never call snapshots()
        orig_snaps = Table.snapshots

        def boom(self):
            import os as _os

            if _os.path.exists(self._latest_path):
                raise AssertionError("crash replay must not list history")
            return orig_snaps(self)  # latest()'s one-time new/legacy fallback

        Table.snapshots = boom
        try:
            res = run_pipeline(spark, tr, onto, str(tmp_path / "kg"), n_buckets=4,
                               unit_batch_size=1)
        finally:
            Table.snapshots = orig_snaps
    finally:
        TrackingStore.mark_units_done = orig
    got = {(r["subject"], r["predicate"], r["object"]) for r in res.edges.collect()}
    assert got == clean_triples
    assert Table(str(tmp_path / "kg" / "mentions")).read(spark).count() == clean_mentions
