"""TF-IDF keyword extraction: exact values vs a Counter reference,
deterministic tie-breaks, and partition independence."""

import pytest

from kg_obo_spark.operators.keywords import SCORE_SCALE, top_terms_tfidf


def _docs(spark):
    rows = [
        (0, "spark spark spark shuffle join"),
        (1, "shuffle join join window"),
        (2, "spark window window"),
        (3, ""),  # no tokens: no rows
        (4, "unique"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute(texts, k):
    from collections import Counter

    tf = {d: Counter(t.split()) for d, t in texts.items()}
    dfreq = Counter(term for c in tf.values() for term in c)
    out = set()
    for d, c in tf.items():
        ranked = sorted(
            ((SCORE_SCALE * n) // dfreq[t], t, n) for t, n in c.items()
        )
        ranked = sorted(ranked, key=lambda r: (-r[0], r[1]))
        for i, (score, t, n) in enumerate(ranked[:k], start=1):
            out.add((d, t, n, dfreq[t], score, i))
    return out


def test_tfidf_matches_counter_reference(spark):
    texts = {r.doc_id: r.text for r in _docs(spark).collect()}
    got = {tuple(r) for r in top_terms_tfidf(_docs(spark), k=3).collect()}
    assert got == _brute(texts, k=3)
    # doc 3 (empty) absent; doc 4's only term ranks 1 with df=1
    assert not any(d == 3 for d, *_ in got)
    assert (4, "unique", 1, 1, SCORE_SCALE, 1) in got


def test_tfidf_rare_term_beats_common_at_equal_tf(spark):
    # doc 0: 'spark' tf=3 df=2 -> 1.5e6; 'shuffle' tf=1 df=2 -> 0.5e6;
    # 'join' tf=1 df=2 -> 0.5e6; tie between shuffle/join broken by term asc
    rows = {r.doc_id: r for r in top_terms_tfidf(_docs(spark), k=3).collect() if r.doc_id == 0}
    ranked = sorted(
        (r for r in top_terms_tfidf(_docs(spark), k=3).collect() if r.doc_id == 0),
        key=lambda r: r.rank,
    )
    assert [r.term for r in ranked] == ["spark", "join", "shuffle"]


def test_tfidf_args_and_partition_independence(spark):
    with pytest.raises(ValueError, match="k"):
        top_terms_tfidf(_docs(spark), k=0)
    a = sorted(map(tuple, top_terms_tfidf(_docs(spark), k=2).collect()))
    b = sorted(
        map(tuple, top_terms_tfidf(_docs(spark).repartition(7), k=2).collect())
    )
    assert a == b
    assert all(r[5] <= 2 for r in a)
