"""Smoke-run the examples end-to-end (VERDICT r3 #9: the reference's
examples are CI-run shapes — ``/root/reference/examples/
simple_vlm_inference.py`` executes in its CI; ours must not rot).

Each example owns its SparkSession lifecycle (get_spark + stop), so
they run as subprocesses rather than inside the shared test session.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def _run(args: list[str]) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )


def test_dedup_and_search_example_runs():
    p = _run(["examples/dedup_and_search.py", SF])
    assert p.returncode == 0, p.stderr[-2000:]
    assert "documents:" in p.stdout and "sample neighbors:" in p.stdout


def test_vlm_caption_pipeline_example_runs(tmp_path):
    p = _run(["examples/vlm_caption_pipeline.py", SF, str(tmp_path / "captions")])
    assert p.returncode == 0, p.stderr[-2000:]
    assert "captioned" in p.stdout


def test_curate_and_shard_example_runs():
    p = _run(["examples/curate_and_shard.py", SF])
    assert p.returncode == 0, p.stderr[-2000:]
    assert "DQ report:" in p.stdout and "shards, sizes" in p.stdout


def test_tokenize_and_train_prep_example_runs():
    r = _run(["examples/tokenize_and_train_prep.py", SF])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "learned" in r.stdout and "training sequences" in r.stdout


def test_quality_audit_and_fusion_example_runs():
    r = _run(["examples/quality_audit_and_fusion.py", SF])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "hybrid top-" in r.stdout


def test_streaming_analytics_example_runs():
    r = _run(["examples/streaming_analytics.py", SF])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "live OHLC bars" in r.stdout and "attributed" in r.stdout


def test_web_curation_pipeline_runs(tmp_path):
    r = _run(["examples/web_curation_pipeline.py", SF])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "clusters straddling splits: 0" in r.stdout
    assert "OK" in r.stdout


def test_graph_analytics_pipeline_runs():
    r = _run(["examples/graph_analytics_pipeline.py", SF])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "trade loops:" in r.stdout
    assert "modularity" in r.stdout
    assert "OK" in r.stdout


def test_data_selection_pipeline_example_runs():
    p = _run(["examples/data_selection_pipeline.py", SF])
    assert p.returncode == 0, p.stderr[-2000:]
    assert "mixture plan" in p.stdout and "after surprisal tail cut" in p.stdout


def test_video_curation_pipeline_example_runs():
    p = _run(["examples/video_curation_pipeline.py", SF])
    assert p.returncode == 0, p.stderr[-2000:]
    assert "after IoU dedup" in p.stdout and "resolution buckets" in p.stdout
    assert "GPS-clean" in p.stdout and "shards" in p.stdout


def test_continuous_serving_pipeline_example_runs():
    p = _run(["examples/continuous_serving_pipeline.py"])
    assert p.returncode == 0, p.stderr[-2000:]
    assert "continuous serving done: 600 requests scored" in p.stdout


def test_experiment_analysis_pipeline_example_runs():
    p = _run(["examples/experiment_analysis_pipeline.py", SF])
    assert p.returncode == 0, p.stderr[-2000:]
    assert "experiment analysis done over" in p.stdout
    assert "SRM: split" in p.stdout and "Qini final:" in p.stdout
