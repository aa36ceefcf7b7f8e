"""Interleaved round-over-round bench A/B (VERDICT r4 next #7).

Runs `python bench.py` alternately in two checkouts (fresh JVM each run,
same corpus cache, same sf dir), takes per-query best-of-N across the
interleaved reps, and writes BENCH/ROUND_AB.md. Interleaving is the only
admissible comparison on this VM: single uninterleaved sessions vary ~2x
(the r4 driver window burned a round on phantom regressions).

Usage: python scripts/round_ab.py OLD_DIR NEW_DIR [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(checkout: str) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=checkout,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    json_lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if out.returncode != 0 or not json_lines:
        raise RuntimeError(
            f"bench in {checkout} failed (rc={out.returncode}, "
            f"{len(json_lines)} JSON lines); stderr tail:\n{out.stderr[-2000:]}"
        )
    return json.loads(json_lines[-1])


def best(results: list[dict]) -> dict:
    queries: dict[str, float] = {}
    for r in results:
        for q, s in r["queries"].items():
            queries[q] = min(queries.get(q, float("inf")), s)
    return {
        "value": min(r["value"] for r in results),
        "queries": queries,
        "pipeline_sec": min(r["queries"].get("kg_pipeline", float("inf")) for r in results),
        "triples_per_sec": max(r.get("triples_per_sec", 0) for r in results),
    }


def main() -> None:
    old_dir, new_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    old_runs, new_runs = [], []
    for i in range(reps):
        for label, cwd, acc in (("old", old_dir, old_runs), ("new", new_dir, new_runs)):
            r = run_bench(cwd)
            acc.append(r)
            print(f"rep {i + 1} {label}: suite={r['value']}s "
                  f"pipeline={r['queries'].get('kg_pipeline')}s", flush=True)
    b_old, b_new = best(old_runs), best(new_runs)
    names = sorted(set(b_old["queries"]) | set(b_new["queries"]))
    rows = "\n".join(
        f"| {q} | {b_old['queries'].get(q, '-')} | {b_new['queries'].get(q, '-')} |"
        for q in names
    )
    md = (
        "# Round-over-round interleaved bench A/B\n\n"
        f"(scripts/round_ab.py — {reps} reps per side, alternating fresh JVMs\n"
        "in one session; per-query best-of-reps. Single uninterleaved runs on\n"
        "this VM vary ~2x, so only this comparison is admissible.)\n\n"
        f"- old: `{old_dir}` ({old_label()})\n"
        f"- new: `{new_dir}` ({new_label()})\n\n"
        "| query | old best (s) | new best (s) |\n|---|---|---|\n"
        + rows
        + "\n\n| metric | old | new |\n|---|---|---|\n"
        f"| headline suite (s) | {b_old['value']} | {b_new['value']} |\n"
        f"| pipeline (s) | {b_old['pipeline_sec']} | {b_new['pipeline_sec']} |\n"
        f"| triples/s | {b_old['triples_per_sec']} | {b_new['triples_per_sec']} |\n\n"
        "Raw per-rep suite seconds (old): "
        + str([r["value"] for r in old_runs])
        + "\nRaw per-rep suite seconds (new): "
        + str([r["value"] for r in new_runs])
        + "\n"
    )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ROUND_AB.md"), "w") as f:
        f.write(md)
    print(json.dumps({"old": b_old, "new": b_new}))


def _git_desc(d: str) -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=d, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        return "?"


def old_label() -> str:
    return _git_desc(sys.argv[1])


def new_label() -> str:
    return _git_desc(sys.argv[2])


if __name__ == "__main__":
    main()
