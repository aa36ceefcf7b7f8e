"""PID-owned tmpfs scratch sweep (r6 ADVICE): only dirs whose owner process
is gone are removed; live owners and other-uid processes are untouched; the
caller's own dir is (re)claimed. No SparkSession needed — the helper is
pure filesystem + kill(pid, 0)."""

import os

from kg_obo_spark.session import _sweep_dead_scratch


def test_sweep_removes_only_dead_owners(tmp_path):
    root = str(tmp_path / "scratch")
    dead = 999_999  # far above any live pid in this sandbox
    try:
        os.kill(dead, 0)
    except ProcessLookupError:
        pass
    else:  # pragma: no cover - absurdly high pid actually alive
        dead = 999_998
    os.makedirs(f"{root}/pid-{dead}/blockmgr-x", exist_ok=True)
    os.makedirs(f"{root}/pid-1", exist_ok=True)  # init: alive, not ours
    os.makedirs(f"{root}/pid-{os.getpid()}/old-stuff", exist_ok=True)
    os.makedirs(f"{root}/legacy", exist_ok=True)  # pre-PID layout

    scratch = _sweep_dead_scratch(root)

    assert scratch == f"{root}/pid-{os.getpid()}"
    assert os.path.isdir(scratch)
    # own dir reclaimed, contents untouched (we are alive)
    assert os.path.isdir(f"{scratch}/old-stuff")
    assert not os.path.isdir(f"{root}/pid-{dead}")  # dead owner swept
    assert os.path.isdir(f"{root}/pid-1")  # live owner kept
    assert not os.path.isdir(f"{root}/legacy")  # un-owned legacy removed


def test_sweep_creates_root_when_missing(tmp_path):
    root = str(tmp_path / "does" / "not" / "exist")
    scratch = _sweep_dead_scratch(root)
    assert os.path.isdir(scratch)
    assert scratch.endswith(f"pid-{os.getpid()}")
