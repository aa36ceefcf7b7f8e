"""spark-submit entry point: arg wiring + end-to-end synthetic run."""

import sys


def test_submit_synthetic(spark, tmp_path, capsys):
    sys.path.insert(0, "/root/repo/scripts")
    import submit_pipeline

    rc = submit_pipeline.main(
        ["--synthetic", "40", "--out", str(tmp_path / "out"), "--buckets", "2",
         "--export-targz"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "nodes=" in out and "edges=" in out and "exported" in out


def test_real_spark_submit_py_files(tmp_path):
    """The north-rule deployment path, for real: package kg_obo_spark as a
    zip, run `spark-submit --py-files` from a cwd where the package is NOT
    importable, and require the full pipeline + export to succeed from the
    shipped zip alone."""
    import shutil
    import subprocess
    import zipfile
    from pathlib import Path

    submit = shutil.which("spark-submit")
    if submit is None:
        import pytest

        pytest.skip("spark-submit not on PATH")
    repo = Path("/root/repo")
    zpath = tmp_path / "kg_obo_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for f in (repo / "kg_obo_spark").rglob("*.py"):
            z.write(f, f.relative_to(repo))
    out = tmp_path / "out"
    proc = subprocess.run(
        [submit, "--master", "local[4]", "--py-files", str(zpath),
         str(repo / "scripts" / "submit_pipeline.py"),
         "--synthetic", "30", "--out", str(out), "--buckets", "2",
         "--export-targz"],
        cwd=tmp_path, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "nodes=" in proc.stdout and "exported" in proc.stdout
    assert (out / "synth_kgx_tsv.tar.gz").exists()
