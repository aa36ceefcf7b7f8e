"""Sliding-window chunking: coverage/overlap invariants, exact text
reconstruction, zero-exchange plan shape, determinism, and edge cases."""

import pytest

from kg_obo_spark.operators.chunking import chunk_documents


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    rows = [
        (0, " ".join(f"t{i}" for i in range(23))),  # multiple windows + tail
        (1, "a b c"),  # fits one window
        (2, ""),  # empty: must vanish
        (3, "   \t \n "),  # whitespace-only: must vanish
        (4, " ".join(f"u{i}" for i in range(8))),  # exact multiple of stride
        (5, "solo"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunking_args_validated(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, chunk_tokens=8, stride=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, chunk_tokens=8, stride=9)


def test_chunking_invariants_and_reconstruction(spark):
    """Every token covered; every chunk but a doc's last exactly full;
    consecutive windows overlap by chunk - stride; chunk_text is exactly
    the token slice."""
    chunk, stride = 8, 4
    out = chunk_documents(_docs(spark), chunk, stride).collect()
    texts = {r.doc_id: r.text for r in _docs(spark).collect()}

    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {0, 1, 4, 5}  # 2 and 3 dropped

    for doc_id, rows in by_doc.items():
        toks = texts[doc_id].split()
        rows.sort(key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        for i, r in enumerate(rows):
            assert r.tok_start == i * stride
            want = toks[r.tok_start : r.tok_start + chunk]
            assert r.n_tokens == len(want)
            assert r.chunk_text == " ".join(want)
            if i < len(rows) - 1:
                assert r.n_tokens == chunk  # full except the last
        # the last window reaches the end of the document
        assert rows[-1].tok_start + rows[-1].n_tokens == len(toks)
        # and starts past the previous window's start (no contained chunk)
        if len(rows) > 1:
            assert rows[-1].n_tokens > 0


def test_chunking_disjoint_default_stride(spark):
    """stride defaults to chunk_tokens: disjoint chunks that tile the doc."""
    out = chunk_documents(_docs(spark), chunk_tokens=5).collect()
    doc0 = sorted((r for r in out if r.doc_id == 0), key=lambda r: r.chunk_id)
    assert [r.tok_start for r in doc0] == [0, 5, 10, 15, 20]
    assert [r.n_tokens for r in doc0] == [5, 5, 5, 5, 3]
    assert sum(r.n_tokens for r in doc0) == 23


def test_chunking_partition_independent(spark):
    docs = _docs(spark)
    a = chunk_documents(docs, 8, 4)
    b = chunk_documents(docs.repartition(7), 8, 4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_chunking_zero_exchange_plan(spark, tmp_path):
    """Chunking is a pure map-side projection: no Exchange, no Python, and
    the scan prunes to the referenced columns."""
    path = str(tmp_path / "docs")
    docs = _docs(spark)
    docs.withColumn("extra", docs.doc_id * 2).write.parquet(path)
    out = chunk_documents(spark.read.parquet(path), 8, 4)
    plan = _plan(out)
    assert "Exchange" not in plan
    assert "Python" not in plan
    assert "ReadSchema" in plan and "extra" not in plan.split("ReadSchema")[1]
