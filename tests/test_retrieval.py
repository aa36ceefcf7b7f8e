"""BM25 fixed-point scoring pinned against a sequential Python replay."""

import pytest

from kg_obo_spark.functions.text import py_tokens
from kg_obo_spark.operators.retrieval import bm25_scores, bm25_topk


def py_bm25(rows, terms, k1=(6, 5), b=(3, 4), idf_scale=1000):
    p, q = k1
    r, s = b
    toks = {i: py_tokens(t) for i, t in rows}
    n = len(rows)
    t_total = sum(len(v) for v in toks.values())
    idf = {}
    for term in terms:
        df_t = sum(1 for v in toks.values() if term in v)
        if df_t:
            idf[term] = (idf_scale * (n - df_t + 1)) // (df_t + 1)
    out = {}
    for i, v in toks.items():
        score = 0
        for term in terms:
            tf = v.count(term)
            if tf and term in idf:
                num = idf[term] * s * (p + q) * t_total * tf
                den = q * s * t_total * tf + p * (s - r) * t_total + p * r * len(v) * n
                score += num // den
        if any(term in v for term in terms):
            out[i] = score
    return out


ROWS = [
    (0, "fast table scan the fast way"),
    (1, "slow scan of a big table"),
    (2, "fast fast fast"),
    (3, "nothing relevant here"),
    (4, ""),
    (5, "table"),
]


def test_bm25_matches_python_replay(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {
        r.id: r.score_fp
        for r in bm25_scores(df, ["fast", "table", "scan"]).collect()
    }
    assert got == py_bm25(ROWS, ["fast", "table", "scan"])
    assert 3 not in got and 4 not in got  # no matching term -> no row


def test_bm25_partitioning_independent(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    a = sorted(bm25_scores(df, ["fast", "table"]).collect())
    bb = sorted(bm25_scores(df.repartition(7), ["fast", "table"]).collect())
    assert a == bb


def test_bm25_topk_order_and_ties(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    ref = py_bm25(ROWS, ["fast", "table", "scan"])
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = [
        (r.id, r.score_fp)
        for r in bm25_topk(df, ["fast", "table", "scan"], k=3).collect()
    ]
    assert got == want


def test_bm25_saturation_and_length_norm(spark):
    # equal-length docs with tf 1 vs 3: saturation means more than 1x but
    # strictly less than 3x the score; a longer doc with the same tf
    # scores lower (length normalization)
    rows = [
        (0, "fast pad pad"),
        (1, "fast fast fast"),
        (2, "fast pad pad pad pad pad pad pad"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r.score_fp for r in bm25_scores(df, ["fast"]).collect()}
    assert got == py_bm25(rows, ["fast"])
    assert got[0] < got[1] < 3 * got[0]
    assert got[2] < got[0]


def test_bm25_validates_inputs(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    with pytest.raises(ValueError, match="distinct"):
        bm25_scores(df, ["a", "a"])
    with pytest.raises(ValueError, match="distinct"):
        bm25_scores(df, [])
    # query terms absent from the corpus -> empty result, stable schema
    out = bm25_scores(df, ["zzzmissing"])
    assert out.count() == 0 and out.columns == ["id", "score_fp"]


def test_bm25_topk_queries_matches_literal_variant(spark):
    from kg_obo_spark.operators.retrieval import bm25_topk_queries

    rows = [
        (0, "fast scan of the table"),
        (1, "the table holds a fast index"),
        (2, "scan scan scan"),
        (3, "nothing relevant here"),
        (4, "fast fast table scan fast"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qt = spark.createDataFrame(
        [(0, "fast"), (0, "scan"), (1, "table"), (1, "fast"),
         (1, "fast")],  # duplicate term collapses (set semantics)
        "query_id long, term string",
    )
    out = bm25_topk_queries(docs, qt, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, terms in ((0, ["fast", "scan"]), (1, ["table", "fast"])):
        lit = bm25_topk(docs, terms, k=3).collect()
        got = sorted(((r.id, r.score_fp, r.rank) for r in by_q[qid]))
        exp = sorted(
            (r.id, r.score_fp, i + 1)
            for i, r in enumerate(
                sorted(lit, key=lambda x: (-x.score_fp, x.id))
            )
        )
        assert got == exp, f"query {qid}"
    # deterministic across partitionings
    again = bm25_topk_queries(docs.repartition(4), qt, k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_retrieval_eval_hand_case(spark):
    from kg_obo_spark.operators.retrieval import retrieval_eval

    results = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (1, 30, 1), (1, 31, 2)],
        "query_id long, neighbor_id long, rank long",
    )
    truth = spark.createDataFrame(
        [(0, 11), (0, 12), (1, 40), (2, 50)],
        "query_id long, neighbor_id long",
    )
    out = {r.query_id: r for r in retrieval_eval(results, truth).collect()}
    # q0: one of two truths found, first relevant at rank 2
    assert (out[0].n_truth, out[0].hits) == (2, 1)
    assert out[0].recall_e6 == 500_000 and out[0].rr_e6 == 500_000
    # q1: returned rows are all irrelevant
    assert (out[1].hits, out[1].recall_e6, out[1].rr_e6) == (0, 0, 0)
    # q2: no results at all — still reported
    assert (out[2].n_truth, out[2].hits, out[2].rr_e6) == (1, 0, 0)
    assert set(out) == {0, 1, 2}
