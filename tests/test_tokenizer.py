"""GreedyWordpiece: fuzz vs an independent reference encoder, vocab
validation, and the tokenizer seam in pack_sequences / chunk_documents
(plan shapes must be unchanged: pack ONE exchange, chunk ZERO)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kg_obo_spark.functions.tokenizer import (
    DEFAULT_WORDPIECE_VOCAB,
    GreedyWordpiece,
)


def _ref_encode_word(word: str, vocab: frozenset[str]) -> list[str]:
    """Independent reference: try every vocab piece by descending length
    with startswith (no max-munch window arithmetic, no memo)."""
    by_len = sorted(vocab, key=len, reverse=True)
    out, rest = [], word
    while rest:
        for p in by_len:
            if len(p) > 1 and rest.startswith(p):
                out.append(p)
                rest = rest[len(p):]
                break
        else:
            # longest match could also be a 1-char vocab piece; either way
            # a single char is consumed
            out.append(rest[0])
            rest = rest[1:]
    return out


words = st.text(alphabet="abcdefgh", min_size=1, max_size=12)


@settings(max_examples=300, deadline=None)
@given(
    word=words,
    vocab=st.sets(st.text(alphabet="abcdefgh", min_size=2, max_size=4), min_size=1, max_size=12),
)
def test_fuzz_encode_matches_reference(word, vocab):
    tok = GreedyWordpiece(tuple(sorted(vocab)))
    got = list(tok.encode_word(word))
    assert got == _ref_encode_word(word, frozenset(vocab))
    assert "".join(got) == word  # segmentation is lossless


@settings(max_examples=100, deadline=None)
@given(text=st.lists(words, max_size=8).map(" ".join))
def test_fuzz_encode_text_default_vocab(text):
    tok = GreedyWordpiece()
    pieces = tok.encode(text)
    assert "".join(pieces) == text.replace(" ", "")
    assert tok.n_tokens(text) == len(pieces)


def test_vocab_validation():
    with pytest.raises(ValueError, match="non-empty"):
        GreedyWordpiece(())
    with pytest.raises(ValueError, match="whitespace-free"):
        GreedyWordpiece(("ok", "bad piece"))
    with pytest.raises(ValueError, match="whitespace-free"):
        GreedyWordpiece(("",))


def test_single_char_fallback_and_longest_match():
    tok = GreedyWordpiece(("tab", "ta", "le"))
    assert tok.encode_word("table") == ("tab", "le")  # longest wins over 'ta'
    assert tok.encode_word("xyz") == ("x", "y", "z")  # full fallback
    assert tok.encode_word("taxy") == ("ta", "x", "y")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pack_sequences_bpe_one_exchange_and_reference_layout(spark):
    """The subword tokenizer stage is map-side: pack keeps exactly ONE
    exchange, and the layout equals a pure-Python concat-and-chunk packing
    of the subword counts in the same md5 epoch order."""
    import hashlib

    from kg_obo_spark.operators.packing import pack_sequences

    tok = GreedyWordpiece()
    rows = [
        (0, "table value scan"),
        (1, " ".join(["customer query stream"] * 5)),
        (2, ""),
        (3, "the a big row"),
        (4, "window order data column join"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    budget, shards, seed = 4, 2, 7
    out = pack_sequences(df, budget=budget, n_shards=shards, seed=seed, tokenizer=tok)
    got = {
        (r.shard, r.seq_id, r.doc_id, r.seq_pos, r.doc_offset, r.n_tokens)
        for r in out.collect()
    }
    assert _plan(out).split("== Initial Plan ==")[0].count("Exchange") == 1

    # pure-Python reference packing
    want = set()
    per_shard: dict[int, list[tuple[str, int]]] = {}
    for d, t in rows:
        n = tok.n_tokens(t)
        if n == 0:
            continue
        key = hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
        per_shard.setdefault(int(key[:8], 16) % shards, []).append((key, d, n))
    for shard, docs in per_shard.items():
        pos = 0
        for _, d, n in sorted(docs):
            start, end = pos, pos + n
            for seq in range(start // budget, (end - 1) // budget + 1):
                s0 = max(start, seq * budget)
                s1 = min(end, (seq + 1) * budget)
                want.add((shard, seq, d, s0 - seq * budget, s0 - start, s1 - s0))
            pos = end
    assert got == want


def test_chunk_documents_bpe_zero_exchange_and_piece_text(spark):
    from kg_obo_spark.operators.chunking import chunk_documents

    tok = GreedyWordpiece()
    df = spark.createDataFrame(
        [(0, "customer table"), (1, "")], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=3, stride=2, tokenizer=tok)
    got = sorted(
        (r.doc_id, r.chunk_id, r.tok_start, r.n_tokens, r.chunk_text)
        for r in out.collect()
    )
    assert _plan(out).split("== Initial Plan ==")[0].count("Exchange") == 0
    # pieces: customer -> cust om er, table -> tab le (5 pieces)
    assert got == [
        (0, 0, 0, 3, "cust om er"),
        (0, 1, 2, 3, "er tab le"),
    ]


def test_tokenizer_partition_independence(spark):
    from kg_obo_spark.operators.packing import pack_sequences

    tok = GreedyWordpiece()
    df = spark.createDataFrame(
        [(i, "customer query stream table value") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, pack_sequences(df, budget=8, n_shards=4, tokenizer=tok).collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(
                df.repartition(7), budget=8, n_shards=4, tokenizer=tok
            ).collect(),
        )
    )
    assert a == b


def test_default_vocab_is_engine_portable():
    """Every default piece survives the vocab validator and the whole vocab
    round-trips through the oracle literal embedding (single quotes would
    break the VALUES list)."""
    GreedyWordpiece(DEFAULT_WORDPIECE_VOCAB)
    for p in DEFAULT_WORDPIECE_VOCAB:
        assert "'" not in p and p.isascii()
