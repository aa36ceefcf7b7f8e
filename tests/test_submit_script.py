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
