"""Sequence packing: layout invariants, determinism, and the one-exchange
plan shape. Packing is a training-data layout — a wrong slice silently
corrupts every training sequence downstream, so the invariants are checked
exhaustively on a reconstructed token stream."""

import pytest
from pyspark.sql import functions as F

from kg_obo_spark.operators.packing import pack_sequences


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    rows = [
        (0, "a b c"),
        (1, " ".join(f"t{i}" for i in range(17))),  # spans boundaries
        (2, ""),  # empty: must vanish
        (3, "   \t  "),  # whitespace-only: must vanish
        (4, "x"),
        (5, " ".join(f"u{i}" for i in range(9))),
        (6, "p q"),
        (7, " ".join(f"v{i}" for i in range(5))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_budget_must_be_positive(spark):
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(_docs(spark), budget=0)


def test_packing_invariants(spark):
    """Slices partition each document; every sequence except a shard's last
    is exactly full; seq_pos stays inside the budget; empty docs vanish."""
    budget = 4
    out = pack_sequences(
        _docs(spark), budget=budget, n_shards=2, seed=7
    ).collect()

    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {0, 1, 4, 5, 6, 7}  # 2 and 3 dropped

    tok_counts = {0: 3, 1: 17, 4: 1, 5: 9, 6: 2, 7: 5}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.doc_offset)
        # contiguous slices starting at 0, covering the whole document
        assert rows[0].doc_offset == 0
        for a, b in zip(rows, rows[1:]):
            assert a.doc_offset + a.n_tokens == b.doc_offset
        assert sum(r.n_tokens for r in rows) == tok_counts[doc_id]
        for r in rows:
            assert 0 <= r.seq_pos < budget
            assert 1 <= r.n_tokens <= budget

    by_seq: dict[tuple, int] = {}
    for r in out:
        by_seq[(r.shard, r.seq_id)] = by_seq.get((r.shard, r.seq_id), 0) + r.n_tokens
    for shard in {s for s, _ in by_seq}:
        seqs = sorted(q for s, q in by_seq if s == shard)
        assert seqs == list(range(len(seqs)))  # dense 0..k
        for q in seqs[:-1]:
            assert by_seq[(shard, q)] == budget  # all but the last are full
        assert 1 <= by_seq[(shard, seqs[-1])] <= budget


def test_packing_reconstructs_the_token_stream(spark):
    """Assembling every sequence from its (doc_offset, n_tokens) slices
    reproduces the exact concatenated per-shard token stream."""
    budget = 4
    docs = _docs(spark)
    out = pack_sequences(docs, budget=budget, n_shards=2, seed=7)
    joined = (
        out.join(docs, "doc_id")
        .select(
            "shard",
            "seq_id",
            "seq_pos",
            F.slice(
                F.filter(F.split(F.trim("text"), r"\s+"), lambda t: F.length(t) > 0),
                F.col("doc_offset").cast("int") + 1,
                F.col("n_tokens").cast("int"),
            ).alias("toks"),
        )
        .collect()
    )
    # per (shard, seq): slices laid at seq_pos must tile [0, fill) exactly
    seqs: dict[tuple, list] = {}
    for r in joined:
        seqs.setdefault((r.shard, r.seq_id), []).append((r.seq_pos, r.toks))
    streams: dict[int, list] = {}
    for (shard, seq_id), parts in sorted(seqs.items()):
        parts.sort()
        pos = 0
        for seq_pos, toks in parts:
            assert seq_pos == pos
            pos += len(toks)
            streams.setdefault(shard, []).extend(toks)
    # the reassembled stream equals concatenating docs in epoch order
    from kg_obo_spark.operators.sampling import epoch_shard_assignment

    order = (
        epoch_shard_assignment(docs, n_shards=2, seed=7)
        .select("shard", "order_key", "doc_id", "text")
        .collect()
    )
    expect: dict[int, list] = {}
    for r in sorted(order, key=lambda r: (r.shard, r.order_key, r.doc_id)):
        expect.setdefault(r.shard, []).extend(r.text.split())
    assert streams == {s: v for s, v in expect.items() if v}


def test_packing_partition_independent(spark):
    """The layout is a pure function of (corpus, budget, n_shards, seed):
    repartitioning the input changes nothing."""
    docs = _docs(spark)
    a = pack_sequences(docs, budget=4, n_shards=2, seed=7)
    b = pack_sequences(docs.repartition(7), budget=4, n_shards=2, seed=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_packing_single_exchange(spark):
    """ONE shuffle total: the per-shard running-count window's hash exchange;
    shard/order-key assignment, the boundary explode, and slice arithmetic
    are all map-side on top of it."""
    out = pack_sequences(_docs(spark), budget=4, n_shards=2, seed=7)
    plan = _plan(out)
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(shard" in plan


def test_pack_sft_examples_mask_geometry(spark):
    """Per example: slices partition context+response tokens and the
    loss-active tokens are exactly the response tokens; a slice entirely
    inside the context has n_loss_tokens = 0."""
    from kg_obo_spark.operators.packing import pack_sft_examples

    rows = [
        (0, "user: one two three", "four five"),          # 3 ctx + 2 resp
        (1, "", "lone response"),                          # no context
        (2, "user: " + " ".join(f"c{i}" for i in range(9)), "r1 r2 r3"),
    ]
    ex = spark.createDataFrame(
        rows, "example_id long, context string, response string"
    )
    out = pack_sft_examples(ex, budget=4, n_shards=2, seed=7).collect()
    ctx = {0: 4, 1: 0, 2: 10}   # rendered context token counts
    resp = {0: 2, 1: 2, 2: 3}

    by_ex: dict[int, list] = {}
    for r in out:
        by_ex.setdefault(r.example_id, []).append(r)
    assert set(by_ex) == {0, 1, 2}
    for eid, slices in by_ex.items():
        slices.sort(key=lambda r: r.ex_offset)
        # contiguous partition of the example's token span
        assert slices[0].ex_offset == 0
        for p, q in zip(slices, slices[1:]):
            assert p.ex_offset + p.n_tokens == q.ex_offset
        assert sum(r.n_tokens for r in slices) == ctx[eid] + resp[eid]
        assert sum(r.n_loss_tokens for r in slices) == resp[eid]
        for r in slices:
            # loss overlap is exactly |slice ∩ [nctx, total)|
            want = max(0, min(r.ex_offset + r.n_tokens, ctx[eid] + resp[eid])
                       - max(r.ex_offset, ctx[eid]))
            assert r.n_loss_tokens == want
            assert 0 <= r.seq_pos < 4 and 1 <= r.n_tokens <= 4
    # example 2 spans multiple sequences and its first full-context slice
    # carries zero loss tokens
    assert any(r.n_loss_tokens == 0 for r in by_ex[2])


def test_pack_sft_examples_single_exchange(spark):
    from kg_obo_spark.operators.packing import pack_sft_examples

    ex = spark.createDataFrame(
        [(i, "user: a b c", "d e") for i in range(6)],
        "example_id long, context string, response string",
    )
    out = pack_sft_examples(ex, budget=4, n_shards=2, seed=7)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1
    assert "hashpartitioning(shard" in plan
    assert "Join" not in plan  # the mask boundary is a passthrough column


def _brute_atomic(units, budget):
    """Reference greedy first-fit over (key, id, n_tok) sorted by key."""
    out = {}
    seq, pos = 0, 0
    for _, uid, n in sorted(units):
        if pos + n > budget:
            seq, pos = seq + 1, 0
        out[uid] = (seq, pos)
        pos += n
    return out


def test_pack_examples_atomic_matches_brute_force(spark):
    from kg_obo_spark.operators.packing import pack_examples_atomic
    from kg_obo_spark.operators.sampling import epoch_shard_assignment

    counts = spark.createDataFrame(
        [(i, (i * 7) % 11 + 1) for i in range(40)] + [(100, 99), (101, 0)],
        "example_id long, n_tok long",
    )
    budget, n_shards, seed = 12, 3, 5
    out = pack_examples_atomic(counts, budget, n_shards=n_shards, seed=seed)
    got = {r.example_id: (r.shard, r.seq_id, r.seq_pos, r.n_tokens)
           for r in out.collect()}
    assert 100 not in got and 101 not in got  # oversized + empty excluded

    order = epoch_shard_assignment(
        counts.filter("n_tok > 0 and n_tok <= 12"),
        n_shards=n_shards, seed=seed, id_col="example_id",
    ).collect()
    by_shard: dict[int, list] = {}
    for r in order:
        by_shard.setdefault(r.shard, []).append(
            ((r.order_key, r.example_id), r.example_id, r.n_tok)
        )
    for shard, units in by_shard.items():
        want = _brute_atomic(units, budget)
        for (_, uid, n) in units:
            s, sq, pos, nt = got[uid]
            assert s == shard and nt == n
            assert (sq, pos) == want[uid], uid

    # no split: every example appears exactly once; fills never overflow
    assert len(got) == len([u for s in by_shard.values() for u in s])
    fills: dict[tuple, int] = {}
    for uid, (s, sq, pos, nt) in got.items():
        fills[(s, sq)] = max(fills.get((s, sq), 0), pos + nt)
    assert all(v <= budget for v in fills.values())


def test_pack_examples_atomic_partition_independent(spark):
    from kg_obo_spark.operators.packing import pack_examples_atomic

    counts = spark.createDataFrame(
        [(i, i % 5 + 1) for i in range(30)], "example_id long, n_tok long"
    )
    a = pack_examples_atomic(counts, 7, n_shards=2, seed=1)
    b = pack_examples_atomic(counts.repartition(11), 7, n_shards=2, seed=1)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_sft_examples_atomic_loss_is_response(spark):
    from kg_obo_spark.operators.packing import pack_sft_examples_atomic

    ex = spark.createDataFrame(
        [
            (0, "user: a b", "r1 r2 r3"),
            (1, "", "only response"),
            (2, "user: " + " ".join(f"c{i}" for i in range(20)), "x"),  # 22>8
        ],
        "example_id long, context string, response string",
    )
    out = {r.example_id: r
           for r in pack_sft_examples_atomic(ex, 8, n_shards=1, seed=0).collect()}
    assert set(out) == {0, 1}  # example 2 oversized, excluded
    assert (out[0].n_tokens, out[0].n_loss_tokens) == (6, 3)
    assert (out[1].n_tokens, out[1].n_loss_tokens) == (2, 2)
