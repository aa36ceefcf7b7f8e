"""Property-based tests (hypothesis) — invariants that example tests miss.

The reference has no property tests (SURVEY §5); these pin the algorithmic
cores: distributed CC == union-find on arbitrary graphs, matcher span
invariants on arbitrary planted text, sessionization monotonicity.
"""

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from kg_obo_spark.datagen.ontology import build_ontology
from kg_obo_spark.dictionary import build_matcher
from kg_obo_spark.operators.canonicalize import connected_components, union_find

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

nodes_st = st.integers(min_value=0, max_value=15)


@_slow
@given(st.lists(st.tuples(nodes_st, nodes_st), min_size=0, max_size=25))
def test_cc_matches_union_find(spark, pairs):
    pairs = [(f"n{a:02d}", f"n{b:02d}") for a, b in pairs if a != b]
    uf = union_find(pairs)
    if not pairs:
        return
    edges = spark.createDataFrame(pairs, "u string, v string")
    dist = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    for node, root in uf.items():
        assert dist[node] == root


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["material entity", "material", "entity", "xx", "OBO:BFO_0000001", "bfo:0000001"]
        ),
        min_size=1,
        max_size=6,
    )
)
def test_matcher_span_invariants(words):
    onto = build_ontology(n_terms=12, seed=1)
    onto.terms = [
        {
            "id": "BFO:0000001", "iri": "http://purl.obolibrary.org/obo/BFO_0000001",
            "name": "material entity", "synonyms": ["material"],
            "category": "biolink:OntologyClass", "prefix": "BFO",
        }
    ]
    m = build_matcher(onto)
    text = " ".join(words)
    hits = m.find(text)
    last_end = -1
    for start, end, surf, tid, score in hits:
        assert start >= last_end          # non-overlapping, ordered
        assert text[start:end] == surf    # offsets index the original text
        assert 0 < score <= 1.0
        assert tid == "BFO:0000001"
        last_end = end
    # every standalone occurrence of the label is found (recall on clean text)
    expected_label_hits = words.count("material entity")
    label_hits = sum(1 for h in hits if h[2].lower() == "material entity")
    assert label_hits >= expected_label_hits


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30))
def test_union_find_canonical_is_min(deltas):
    # chain with arbitrary gaps: all connected -> canonical is global min
    names = [f"x{sum(deltas[:i+1]):07d}" for i in range(len(deltas))]
    pairs = list(zip(names, names[1:]))
    if not pairs:
        return
    uf = union_find(pairs)
    lo = min(names)
    assert all(v == lo for v in uf.values())


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.sampled_from(
                [
                    "material entity", "material", "MATERIAL Entity",
                    "OBO:BFO_0000001", "bfo:0000001", "BFO:0000001",
                    "http://purl.obolibrary.org/obo/BFO_0000001",
                    "", "İstanbul material", "x" * 30, "a:1234567",
                ]
            ),
            st.text(max_size=25),  # arbitrary unicode incl. NUL-adjacent
        ),
        min_size=0,
        max_size=8,
    )
)
def test_find_batch_equals_per_row_find(texts):
    """The batched scan (NUL-joined haystack, pre-lowered caseless trie,
    offset re-bucketing, possessive id regex) must agree with the per-row
    reference path on ARBITRARY text — including strings containing NUL,
    case-folding length changes (İ), and boundary-adjacent ids."""
    onto = build_ontology(n_terms=12, seed=1)
    onto.terms = [
        {
            "id": "BFO:0000001", "iri": "http://purl.obolibrary.org/obo/BFO_0000001",
            "name": "material entity", "synonyms": ["material"],
            "category": "biolink:OntologyClass", "prefix": "BFO",
        }
    ]
    m = build_matcher(onto)
    # strings containing NUL would break the NUL-separator trick by design;
    # the engine never feeds NUL (parquet text), so strip it like the scan's
    # upstream would
    texts = [t.replace("\x00", " ") for t in texts]
    batch = m.find_batch(texts)
    for t, got in zip(texts, batch):
        assert got == m.find(t)


# ---------------------------------------------------------------- fastscan fuzz

# Arbitrary haystacks mixing: planted ids in every shape, planted surfaces,
# near-miss junk (wrong digit counts, unknown prefixes, boundary violators),
# random words, punctuation, and non-ASCII — the vectorized scanner must agree
# with the per-row regex engine byte-for-byte on ALL of it.
_FUZZ_ATOMS = [
    "material entity", "material", "MATERIAL ENTITY", "Material entity",
    "mat-ent", "BFO:0000001", "bfo:0000001", "OBO:BFO_0000001",
    "OBO:bfo.OWL#BFO_0000001", "http://purl.obolibrary.org/obo/BFO_0000001",
    "BFO:0000002", "BFO:00000012", "BFO:000000", "XX:0000001", "OBO:XX_0000001",
    "xBFO:0000001", "9BFO:0000001", "BFO:0000001x", "BFO:0000001-",
    "_BFO:0000001", "BFO_0000001", ":0000001", "obo:BFO_0000001",
    "material_entity", "materials", "entity", "m", "", " ", "-", "_", ":",
    "\t", "\n", "\x00", ".", ",", "(", ")", "7", "0000001", "café", "ünïcode",
    "a" * 30, "material-entity",
]


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_FUZZ_ATOMS), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from(["", " ", "-", "_", ":", "x"]),
    st.booleans(),
    st.integers(min_value=0, max_value=3),
)
@example(
    rows=[['OBO:bfo.OWL#BFO_0000001', 'OBO:bfo.OWL#BFO_0000001']],
    joiner=' ',
    best_only=False,  # or any other generated value
    level=0,
).via('discovered failure')
def test_fastscan_fuzz_equals_regex_find(rows, joiner, best_only, level):
    onto = build_ontology(n_terms=12, seed=1)
    onto.terms = [
        {
            "id": "BFO:0000001", "iri": "http://purl.obolibrary.org/obo/BFO_0000001",
            "name": "material entity", "synonyms": ["material", "mat-ent"],
            "category": "biolink:OntologyClass", "prefix": "BFO",
        },
        {
            "id": "BFO:0000002", "iri": "http://purl.obolibrary.org/obo/BFO_0000002",
            "name": "material entity part", "synonyms": ["entity"],
            "category": "biolink:OntologyClass", "prefix": "BFO",
        },
    ]
    m = build_matcher(onto, level)
    texts = [joiner.join(r) for r in rows]
    got = m.find_batch(texts, best_only=best_only)
    want = [m.find(t, best_only=best_only) for t in texts]
    assert got == want


@_slow
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "bb", "ccc", "x", "yy", ""]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=5,
    )
)
def test_ngram_repetition_matches_python(spark, docs):
    """Distributed dup/top n-gram metrics equal a Counter-based reference on
    arbitrary token lists. Doubled separators collapse: the operator uses the
    tokens() whitespace-run model (r6 tokenizer unification), mirrored here
    by str.split()."""
    from collections import Counter

    from kg_obo_spark.functions.text import ngram_repetition_stats

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_grams"],
            r["n_distinct_grams"],
            round(r["dup_gram_frac"], 9),
            round(r["dup_gram_char_frac"], 9),
            round(r["top_gram_char_frac"], 9),
        )
        for r in ngram_repetition_stats(df, n=3).collect()
    }
    want = {}
    for doc_id, text in rows:
        ts = text.split()  # mirrors the operator: tokens() whitespace-run model
        grams = [" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)]
        if not grams:
            continue
        c = Counter(grams)
        total, distinct = len(grams), len(c)
        chars = sum(n * len(g) for g, n in c.items())
        dup = sum(n * len(g) for g, n in c.items() if n > 1)
        top = max(n * len(g) for g, n in c.items())
        want[doc_id] = (
            total,
            distinct,
            round(1.0 - distinct / total, 9),
            round(dup / chars, 9) if chars else 0.0,
            round(top / chars, 9) if chars else 0.0,
        )
    assert got == want


@_slow
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "bb", "ccc", "x", "yy"]), min_size=0, max_size=10
        ),
        min_size=1,
        max_size=5,
    ),
    st.lists(
        st.lists(
            st.sampled_from(["a", "bb", "ccc", "x", "yy"]), min_size=0, max_size=10
        ),
        min_size=0,
        max_size=3,
    ),
)
def test_ngram_contamination_matches_python(spark, docs, bench):
    """Distributed benchmark-overlap stats equal a set-based reference on
    arbitrary token lists — distinct doc grams, membership in the union of
    benchmark grams, count/fraction per doc."""
    from kg_obo_spark.functions.text import ngram_contamination

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    brows = [(i, " ".join(ws)) for i, ws in enumerate(bench)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bdf = spark.createDataFrame(
        brows or [(0, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_distinct_grams"],
            r["n_contaminated"],
            round(r["contamination_frac"], 9),
        )
        for r in ngram_contamination(df, bdf, n=3).collect()
    }
    bgrams = set()
    for _, text in brows:
        ts = text.split()
        bgrams.update(" ".join(ts[i : i + 3]) for i in range(len(ts) - 2))
    want = {}
    for doc_id, text in rows:
        ts = text.split()
        grams = {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}
        if not grams:
            continue
        cont = len(grams & bgrams)
        want[doc_id] = (len(grams), cont, round(cont / len(grams), 9))
    assert got == want


# --------------------------------------------- r6 training-data layout fuzz

_docs_st = st.lists(
    st.lists(st.sampled_from(["a", "bb", "ccc", "x", "yy"]), min_size=0, max_size=12),
    min_size=1,
    max_size=5,
)


@_slow
@given(
    docs=_docs_st,
    budget=st.integers(min_value=1, max_value=6),
    n_shards=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2),
)
def test_pack_sequences_matches_python(spark, docs, budget, n_shards, seed):
    """Concat-and-chunk packing equals an exact md5-ordered reference on
    arbitrary corpora and (budget, n_shards, seed)."""
    import hashlib

    from kg_obo_spark.operators.packing import pack_sequences

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {tuple(r) for r in pack_sequences(df, budget, n_shards, seed).collect()}

    placed = []
    for d, t in rows:
        n = len(t.split())
        if n == 0:
            continue
        h = hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
        placed.append((int(h[:8], 16) % n_shards, h, d, n))
    want = set()
    for shard in {p[0] for p in placed}:
        pos = 0
        for _, h, d, n in sorted(
            (p for p in placed if p[0] == shard), key=lambda p: (p[1], p[2])
        ):
            start, end = pos, pos + n
            for q in range(start // budget, (end - 1) // budget + 1):
                s0, s1 = max(start, q * budget), min(end, (q + 1) * budget)
                want.add((shard, q, d, s0 - q * budget, s0 - start, s1 - s0))
            pos = end
    assert got == want


@_slow
@given(
    docs=_docs_st,
    chunk=st.integers(min_value=1, max_value=6),
    stride_frac=st.integers(min_value=1, max_value=6),
)
def test_chunk_documents_matches_python(spark, docs, chunk, stride_frac):
    """Sliding-window chunking equals the reference layout for arbitrary
    (chunk, stride <= chunk) on arbitrary corpora."""
    from kg_obo_spark.operators.chunking import chunk_documents

    stride = min(stride_frac, chunk)
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {tuple(r) for r in chunk_documents(df, chunk, stride).collect()}

    want = set()
    for d, t in rows:
        toks = t.split()
        n = len(toks)
        if n == 0:
            continue
        m1 = 0 if n <= chunk else -(-(n - chunk) // stride)
        for i in range(m1 + 1):
            s = i * stride
            ln = min(chunk, n - s)
            want.add((d, i, s, ln, " ".join(toks[s : s + ln])))
    assert got == want


@_slow
@given(docs=_docs_st, k=st.integers(min_value=2, max_value=3))
def test_duplicate_spans_matches_python_fuzz(spark, docs, k):
    """Maximal duplicated-run detection equals a Counter + island-merge
    reference on arbitrary corpora (tiny vocab forces frequent repeats)."""
    from kg_obo_spark.operators.dedup import duplicate_spans
    from tests.test_dedup import _brute_duplicate_spans

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {tuple(r) for r in duplicate_spans(df, k=k).collect()}
    assert got == _brute_duplicate_spans(dict(rows), k=k)


@_slow
@given(docs=_docs_st, k=st.integers(min_value=2, max_value=3))
def test_scrub_keepfirst_matches_python_fuzz(spark, docs, k):
    """Keep-first exact-substring scrub equals the brute reference (spans ->
    group by run text -> keep global-first occurrence -> cut the rest) on
    arbitrary corpora."""
    from kg_obo_spark.operators.dedup import scrub_spans_keepfirst
    from tests.test_dedup import _brute_scrub_keepfirst

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in scrub_spans_keepfirst(df, k=k).collect()
    }
    assert got == _brute_scrub_keepfirst(dict(rows), k=k)


@_slow
@given(docs=_docs_st, k=st.integers(min_value=1, max_value=3))
def test_top_terms_tfidf_matches_python(spark, docs, k):
    """Exact-integer TF-IDF top-k (scores, ties, ranks) equals a Counter
    reference on arbitrary corpora."""
    from collections import Counter

    from kg_obo_spark.operators.keywords import SCORE_SCALE, top_terms_tfidf

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {tuple(r) for r in top_terms_tfidf(df, k=k).collect()}

    tf = {d: Counter(t.split()) for d, t in rows}
    dfreq = Counter(term for c in tf.values() for term in c)
    want = set()
    for d, c in tf.items():
        ranked = sorted(
            ((SCORE_SCALE * n) // dfreq[t], t, n) for t, n in c.items()
        )
        ranked.sort(key=lambda r: (-r[0], r[1]))
        for i, (score, t, n) in enumerate(ranked[:k], start=1):
            want.add((d, t, n, dfreq[t], score, i))
    assert got == want
