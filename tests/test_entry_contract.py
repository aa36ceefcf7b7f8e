"""Driver-contract simulation: entry() smoke + a representative subset of the
queries()/oracle_sql() DuckDB parity checks at sf0.001 (the full sweep lives in
tools/parity_check.py; the driver runs the real gate at sf0.01)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SUBSET = [
    "q2_min_price_supplier",
    "q9_profit_by_nation_year",
    "kg_mentions",
    "kg_comention_edges",
    "kg_curie_normalize",
    "cc_nation_region",
    "q1_pricing_summary",
    "j1_broadcast_remap",
    "a5_max_degree",
    "text_quality",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
]


@pytest.fixture(scope="module")
def con():
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not available")
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64).round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.columns == ["subject", "predicate", "object", "relation", "knowledge_source"]
    assert df.count() > 0


def test_every_query_has_callable_and_runs_registered():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 35
    # the driver records at most 50 CORRECTNESS rows (r1+r2 evidence): a
    # registry over the cap silently loses driver verification for the tail
    assert len(qs) <= entrymod.DRIVER_QUERY_CAP
    # queries new this round must hold a driver slot so their first
    # CORRECTNESS row lands; everything with a green row in the last two
    # rounds follows the normal every-other-round rotation (the r6
    # graduations — pipeline_transcripts, minhash/simhash, ann_ivf,
    # emb_near_dup_lsh — earned theirs in CORRECTNESS_r06 and are parked
    # for r7)
    must_check = {
        "pack_sequences_bpe", "chunk_documents_bpe",
        "corpus_scrub_spans_keepfirst",
        # transcript analytics family (new mid-r7)
        "sft_examples", "conversation_stats", "tool_bigrams",
        "preference_pairs", "gram_familiarity", "conversation_entities",
        "sft_examples_budget", "dedup_conversations",
        "conversation_splits", "sft_examples_budget_bpe",
        "pack_sft_examples", "kg_comention_weights",
        "pack_sft_examples_atomic", "chunk_conversations",
        "chunk_conversations_budget",
        # late-r7: subword dialogue-chunk budgets + semantic conv near-dup
        "chunk_conversations_budget_bpe", "conversation_near_dup",
    }
    assert must_check <= set(qs)
    # rotated-out entries still exist and (when oracled) stay parity-checked
    alls = entrymod.all_queries()
    assert set(qs) < set(alls)
    assert set(entrymod.all_oracle_sql()) <= set(alls)
    # r6 graduation: EVERY registry entry is value-oracled — a new rows-only
    # entry is a regression (add an engine-portable variant instead; see
    # minhash_signatures_md5 / hyperplane_signature_literal /
    # deterministic_centroids_md5)
    assert set(entrymod.all_oracle_sql()) == set(alls)


@pytest.mark.parametrize("name", sorted(entrymod._ROTATED_OUT))
def test_rotated_parity(spark, con, name):
    """Rotated-out registry entries keep full local DuckDB parity every run —
    rotation trims the driver gate, never the verification."""
    alls = entrymod.all_queries()
    oracles = entrymod.all_oracle_sql()
    assert name in alls
    if name not in oracles:
        pytest.skip("rows-only entry")
    spdf = _canon(alls[name](spark, SF_DIR).toPandas())
    opdf = _canon(con.execute(oracles[name]).fetchdf())
    assert list(spdf.columns) == list(opdf.columns)
    assert len(spdf) == len(opdf)
    pd.testing.assert_frame_equal(spdf, opdf, check_dtype=False)


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_parity_subset(spark, con, name):
    # all_queries: the subset stays pinned regardless of which entries the
    # per-round rotation schedule parks out of the 50-row driver window
    qs = entrymod.all_queries()
    spdf = _canon(qs[name](spark, SF_DIR).toPandas())
    opdf = _canon(con.execute(entrymod.all_oracle_sql()[name]).fetchdf())
    assert list(spdf.columns) == list(opdf.columns)
    assert len(spdf) == len(opdf)
    pd.testing.assert_frame_equal(spdf, opdf, check_dtype=False)
