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


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_parity_subset(spark, con, name):
    qs = entrymod.queries()
    spdf = _canon(qs[name](spark, SF_DIR).toPandas())
    opdf = _canon(con.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert list(spdf.columns) == list(opdf.columns)
    assert len(spdf) == len(opdf)
    pd.testing.assert_frame_equal(spdf, opdf, check_dtype=False)
