"""Dedup family: exact, MinHash+LSH, SimHash, n-gram Jaccard."""

from pyspark.sql import functions as F

from kg_obo_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_frame,
    simhash_near_duplicates,
)

BASE = "the quick brown fox jumps over the lazy dog near the old river bank today"
NEAR = "the quick brown fox jumps over the lazy cat near the old river bank today"
FAR = "completely different content about spark shuffle partitions and skew salting"


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),                       # exact dup of 1
        (3, "  " + BASE.upper() + " "),  # normalized dup of 1
        (4, NEAR),                        # near dup of 1
        (5, FAR),
        (6, FAR + " with an extra tail of words here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates_groups(spark):
    g = exact_duplicates(_docs(spark))
    groups = {r["representative"]: r["n_dups"] for r in g.collect()}
    assert groups[1] == 3  # docs 1,2,3 share a normalized fingerprint
    deduped = dedup_exact(_docs(spark))
    assert sorted(r["doc_id"] for r in deduped.collect()) == [1, 4, 5, 6]


def test_minhash_signature_properties(spark):
    sigs = {r["doc_id"]: r["signature"] for r in minhash_signatures(_docs(spark), num_hashes=32).collect()}
    assert sigs[1] == sigs[2]  # identical text -> identical signature
    agree_near = sum(a == b for a, b in zip(sigs[1], sigs[4])) / 32
    agree_far = sum(a == b for a, b in zip(sigs[1], sigs[5])) / 32
    assert agree_near > agree_far


def test_minhash_near_duplicates_finds_near_not_far(spark):
    pairs = {(r["a"], r["b"]) for r in
             minhash_near_duplicates(_docs(spark), num_hashes=32, bands=16, threshold=0.4).collect()}
    assert (1, 2) in pairs
    assert (1, 4) in pairs or (4, 1) in pairs
    assert not any({a, b} == {1, 5} for a, b in pairs)


def test_simhash_hamming(spark):
    sh = {r["doc_id"]: r["simhash"] for r in simhash_frame(_docs(spark)).collect()}
    assert sh[1] == sh[2]
    ham_near = bin(sh[1] ^ sh[4]).count("1")
    ham_far = bin(sh[1] ^ sh[5]).count("1")
    assert ham_near < ham_far
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             simhash_near_duplicates(_docs(spark), max_hamming=10).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 0


def test_ngram_jaccard_stop_shingle_filter(spark):
    # shingles shared by ALL docs get dropped from the join with
    # max_shingle_freq; near-dup pairs still surface, denominator stays exact
    docs = _docs(spark)
    full = {(r["a"], r["b"]): r["jaccard"] for r in
            ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.05).collect()}
    filtered = {(r["a"], r["b"]): r["jaccard"] for r in
                ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.05,
                                    max_shingle_freq=3).collect()}
    assert (1, 2) in filtered and filtered[(1, 2)] <= full[(1, 2)]
    for pair, j in filtered.items():
        assert j <= full[pair] + 1e-9  # lower-bound estimate, never inflated


def test_ngram_jaccard_exact_values(spark):
    out = {(r["a"], r["b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(_docs(spark), shingle_k=3, threshold=0.05).collect()}
    assert out[(1, 2)] == 1.0
    assert 0.4 < out[(1, 4)] < 1.0
    assert (1, 5) not in out
