"""Vocab-int pair-shuffle A/B (ROADMAP #1, VERDICT r6 next #5).

Question: does carrying integer term RANKS through the pipeline's pair
expansion (two int32s through the distinct shuffle, element_at unmap —
no joins) beat the string-CURIE path at the 2M-conversation corpus?
The r3 measurement (5000 terms / 1.7M turns, broadcast-JOIN unmap) was a
wash; both the corpus (10x) and the unmap (projection, not join) changed.

Method (memory: all A/Bs on this VM must interleave in one session window):
each rep runs BOTH sides in fresh subprocess JVMs, alternating, on the
cached 2M-conv transcripts at local[32]. Per side and pass we time
(a) scan+persist (extract_turn_terms vs extract_turn_ranks) and (b) the
edge materialization from the persisted frame (the pair distinct under
test). Best-of-reps per stage. Writes BENCH/VOCAB_INT_AB.md.

Usage: python scripts/vocab_int_ab.py [reps] [n_convs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
side = {side!r}
n_convs = {n_convs}
import bench
from kg_obo_spark.session import get_spark
from kg_obo_spark.operators.canonicalize import canonical_map

spark = get_spark(master=f"local[{{int(os.environ.get('SPARK_GRAFT_CPUS', '32'))}}]")
tpath = bench._ensure_transcripts(spark, n_convs)
onto = bench._bench_ontology()
tr = spark.read.parquet(tpath)
eq = spark.createDataFrame(onto.xrefs, "a string, b string")
terms_df = spark.createDataFrame([(t["id"],) for t in onto.terms], "id string")
cdict = {{r["term_id"]: r["canonical_id"]
         for r in canonical_map(terms_df, eq).collect()}}

from kg_obo_spark.operators.extract import extract_turn_ranks, extract_turn_terms
from kg_obo_spark.operators.materialize import (
    edges_from_per_turn, edges_from_per_turn_ranks)
from kg_obo_spark.dictionary import get_matcher

# warmup
bench._noop(extract_turn_terms(tr.limit(2000), onto, cdict))

best = {{"scan": float("inf"), "edges": float("inf"), "total": float("inf")}}
triples = 0
for _ in range(2):
    t0 = time.time()
    if side == "string":
        pt = extract_turn_terms(tr, onto, cdict).persist()
        pt.count()
        t1 = time.time()
        edges = edges_from_per_turn(pt, onto)
    else:
        cu = get_matcher(onto, 0).canon_rank_table(cdict)[1]
        pt = extract_turn_ranks(tr, onto, cdict).persist()
        pt.count()
        t1 = time.time()
        edges = edges_from_per_turn_ranks(pt, cu, onto)
    triples = edges.count()
    t2 = time.time()
    best["scan"] = min(best["scan"], t1 - t0)
    best["edges"] = min(best["edges"], t2 - t1)
    best["total"] = min(best["total"], t2 - t0)
    pt.unpersist()
print("RESULT " + json.dumps({{"side": side, "triples": triples, **best}}))
"""


def run_side(side: str, n_convs: int) -> dict:
    code = _CHILD.format(repo=REPO, side=side, n_convs=n_convs)
    env = dict(os.environ)
    # workers need the repo importable too (PYTHONPATH reaches the Python
    # workers; the driver-side sys.path insert alone does not)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd="/tmp",
        env=env,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"{side} child failed rc={out.returncode}\n{out.stderr[-3000:]}"
        )
    return json.loads(lines[-1][len("RESULT "):])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    runs: dict[str, list[dict]] = {"string": [], "int": []}
    for i in range(reps):
        for side in ("string", "int"):
            r = run_side(side, n_convs)
            runs[side].append(r)
            print(
                f"rep {i + 1} {side}: scan={r['scan']:.2f}s "
                f"edges={r['edges']:.2f}s total={r['total']:.2f}s "
                f"triples={r['triples']}",
                flush=True,
            )
    best = {
        s: {k: min(r[k] for r in rs) for k in ("scan", "edges", "total")}
        for s, rs in runs.items()
    }
    triples = {s: rs[0]["triples"] for s, rs in runs.items()}
    assert triples["string"] == triples["int"], triples
    lines = [
        "# Vocab-int pair-shuffle A/B (r7)",
        "",
        f"Corpus: {n_convs:,} conversations (bench cache), local[32], "
        f"interleaved fresh-JVM best-of-{reps} per side, 2 passes per JVM.",
        f"Both sides produce the identical {triples['string']:,} distinct "
        "triples (equality also pinned by tests/test_materialize_ranks.py).",
        "",
        "| stage | string CURIEs | int ranks | speedup |",
        "|---|---|---|---|",
    ]
    for k, label in (
        ("scan", "fused scan + persist"),
        ("edges", "pair expand + distinct + unmap + is_a"),
        ("total", "pipeline total"),
    ):
        s, i2 = best["string"][k], best["int"][k]
        lines.append(f"| {label} | {s:.2f} s | {i2:.2f} s | {s / i2:.2f}x |")
    lines += [
        "",
        "Raw reps: " + json.dumps(runs),
        "",
    ]
    out = os.path.join(REPO, "BENCH", "VOCAB_INT_AB.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", out)


if __name__ == "__main__":
    main()
